"""Multi-dimensional data layout: Z-order (Morton) keys.

Writing a 100 TB table sorted by ONE column gives min/max file-skipping
on that column only; interleaving the bits of two columns into a
Z-order key and range-partitioning by it gives useful skipping on BOTH
(the technique behind Delta's OPTIMIZE ZORDER BY and Iceberg's sort
orders). The key itself is pure integer bit arithmetic — exact,
engine-portable, and cheap enough to compute in the write path's
narrow map.

`zorder_key` is the composable Column expression; `zorder_layout`
(the query-surface form) range-buckets a table by the key and reports
per-bucket spans — the measurable claim being that both dimensions'
spans per bucket are narrow, which is exactly what makes min/max
pruning effective for either predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPREAD = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(c: Column) -> Column:
    """Spread a non-negative < 2^31 int64 onto the even bit positions
    (the standard magic-mask interleave ladder)."""
    x = c.cast("long")
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """64-bit Morton key of two non-negative < 2^31 integer columns:
    bits of ``a`` on even positions, ``b`` on odd. Raises at runtime
    on out-of-range inputs instead of silently wrapping — a wrapped
    key would scatter a hot range across the keyspace and quietly
    destroy the locality the layout exists to provide."""
    guard = (
        (a >= 0) & (a < F.lit(1 << 31)) & (b >= 0) & (b < F.lit(1 << 31))
    )
    z = _spread_bits(a).bitwiseOR(F.shiftleft(_spread_bits(b), 1))
    return F.when(guard, z).otherwise(
        F.raise_error(F.lit("zorder_key: input outside [0, 2^31)"))
    )


def sql_zorder_expr(a: str, b: str) -> str:
    """DuckDB twin of :func:`zorder_key` (same ladder, same masks)."""

    def spread(x: str) -> str:
        e = f"CAST({x} AS BIGINT)"
        for shift, mask in _SPREAD:
            e = f"(({e} | ({e} << {shift})) & {mask})"
        return e

    return f"({spread(a)} | ({spread(b)} << 1))"


def zorder_layout(
    df: DataFrame,
    a_col: str,
    b_col: str,
    bucket_bits: int = 52,
) -> DataFrame:
    """Per-bucket layout report after Z-ordering by (a, b): bucket =
    zkey >> ``bucket_bits`` (a contiguous Z-range ≈ one target file),
    with row count and BOTH dimensions' min/max spans — the numbers a
    writer would persist as file-level statistics for pruning."""
    z = zorder_key(F.col(a_col), F.col(b_col))
    return (
        df.select(F.col(a_col), F.col(b_col), z.alias("_z"))
        .groupBy(F.shiftrightunsigned("_z", bucket_bits).alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min(a_col).alias("min_a"),
            F.max(a_col).alias("max_a"),
            F.min(b_col).alias("min_b"),
            F.max(b_col).alias("max_b"),
        )
        .orderBy("bucket")
    )


def sql_zorder_layout(
    table_expr: str,
    a_col: str,
    b_col: str,
    bucket_bits: int = 52,
) -> str:
    """DuckDB twin of :func:`zorder_layout`."""
    z = sql_zorder_expr(a_col, b_col)
    return f"""
    SELECT ({z} >> {bucket_bits}) AS bucket,
           count(*) AS n_rows,
           min({a_col}) AS min_a, max({a_col}) AS max_a,
           min({b_col}) AS min_b, max({b_col}) AS max_b
    FROM {table_expr}
    GROUP BY 1 ORDER BY 1
    """


def zorder_key4(a: Column, b: Column, c: Column, d: Column) -> Column:
    """True 4-D Morton key by pairwise composition:
    ``interleave2(interleave2(a, c), interleave2(b, d))`` cycles bits
    a0,b0,c0,d0,a1,b1,… — exactly the 4-way interleave — because the
    outer interleave alternates the two inner keys, each of which
    alternates its own pair. Each dimension must be < 2^15 (the inner
    keys then stay < 2^30, inside :func:`zorder_key`'s domain); for 3
    dimensions pass a zero column as ``d`` (its bit positions idle but
    the order restricted to (a, b, c) is still Morton). Same guard
    discipline: out-of-range raises rather than wrapping."""
    lim = F.lit(1 << 15)
    guard = (
        (a >= 0) & (a < lim) & (b >= 0) & (b < lim)
        & (c >= 0) & (c < lim) & (d >= 0) & (d < lim)
    )
    z = zorder_key(zorder_key(a, c), zorder_key(b, d))
    return F.when(guard, z).otherwise(
        F.raise_error(F.lit("zorder_key4: input outside [0, 2^15)"))
    )


def sql_zorder_expr4(a: str, b: str, c: str, d: str) -> str:
    """DuckDB twin of :func:`zorder_key4` (same composition)."""
    return sql_zorder_expr(
        sql_zorder_expr(a, c), sql_zorder_expr(b, d)
    )


# ---------------------------------------------------------------------------
# Bucketed (hive-style) table layout — the co-located-join technique.
#
# A 100 TB fact table joined repeatedly on the same key should not pay
# the join's shuffle every query: persisting BOTH sides bucketed (and
# sorted) on the key lets Spark plan a SortMergeJoin with NO Exchange
# (and no per-query sort when sortBy matches), because the bucket
# layout already satisfies the join's required distribution. Same for
# aggregations keyed on the bucket column. This is the storage-level
# complement of operators/skew.py's runtime salting: lay the data out
# once, join shuffle-free forever after.
# ---------------------------------------------------------------------------


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int,
    sort_cols: tuple[str, ...] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed catalog table: ``bucketBy(n, key)``
    (+ ``sortBy`` when given) via ``saveAsTable`` — the layout that
    makes every later equi-join or aggregation on ``key`` against a
    same-bucket-count table exchange-free. ``path`` places the data
    outside the default warehouse dir (tests / multi-tenant roots).

    Both join sides MUST use the same ``n_buckets``; mismatched counts
    fall back to a shuffled join (Spark refuses to coalesce unaligned
    bucket layouts silently into wrong results — it just loses the
    optimization)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(name)


def colocated_join(
    spark,
    left_name: str,
    right_name: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their shared bucket key.
    With matching bucket counts the executed plan contains NO Exchange
    on either side (gated in tests/test_plans.py) — each task merges
    bucket i with bucket i, which is what survives a 1000-executor
    100 TB join without moving either table."""
    return spark.table(left_name).join(
        spark.table(right_name), key, how
    )
