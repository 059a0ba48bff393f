"""Skew-handling joins (SURVEY §4 / the 100 TB checklist).

Spark's AQE skew-join (enabled in session.py) splits oversized
*partitions*, which covers most skew. What it cannot fix is a single
hot KEY too large for any one task — e.g. one organization producing
half the webhook volume joined against its integration metadata. The
classic remedy is salting:

- the BIG side gets a per-row salt in [0, salt) (deterministic hash,
  see :func:`salted_join`); the SMALL side is exploded ``salt`` times,
  once per salt value;
- the join key becomes (key, salt), spreading the hot key over
  ``salt`` tasks;
- the small side grows ``salt``×, which is fine because it was small —
  and if it's broadcastable, prefer ``F.broadcast`` and skip salting
  entirely (a broadcast join has no shuffle to skew).

``salted_join`` is deterministic-output (same rows, any salt) and
covers inner/left joins — the shapes the engine's dependency lookups
use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
    row_key_cols: list[str] | None = None,
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on column ``on`` with the hot-key salt
    trick. Output columns = big's columns + small's non-key columns
    (same as a plain ``join(on=...)``).

    The salt is DETERMINISTIC — ``pmod(hash(row_key_cols), salt)``
    (default: every big-side column) rather than ``rand()`` — so task
    retries and A/B reruns produce byte-identical partitioning.
    Output is identical either way (the small side carries every salt
    value); determinism is free. Pass ``row_key_cols`` naming a
    unique/near-unique column when big rows can be fully duplicated —
    identical rows share a salt, which only matters if one value
    dominates."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = row_key_cols or big.columns
    b = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in keys]), F.lit(salt)).cast("int")
    )
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = b.join(s, on=[on, "_salt"], how=how).drop("_salt")
    return out


def join_key_skew_audit(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """Top-``top_k`` heaviest join keys with their share of the table
    and their multiple of the mean group size — the pre-flight a
    100 TB join runs to decide whether to salt
    (:func:`salted_skew_join`) or let AQE's skew split handle it. One
    key-keyed groupBy, a top-k (TakeOrderedAndProject, no global
    sort), and a broadcast 1-row total.

    share_ppm = floor(n / total_rows * 1e6); x_mean = floor(n *
    total_keys / total_rows * 1e6) / 1e6 — both from exact longs, so
    the audit hash-matches its SQL twin.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(
        F.sum("n").alias("_rows"), F.count(F.lit(1)).alias("_keys")
    )
    top = counts.orderBy(F.desc("n"), F.col("key")).limit(top_k)
    return top.crossJoin(F.broadcast(tot)).select(
        "key",
        F.col("n").cast("long").alias("n"),
        F.floor(
            F.col("n") * F.lit(1_000_000) / F.col("_rows")
        ).cast("long").alias("share_ppm"),
        (
            F.floor(
                F.col("n").cast("double")
                * F.col("_keys").cast("double")
                / F.col("_rows").cast("double")
                * F.lit(1e6)
            )
            / F.lit(1e6)
        ).alias("x_mean"),
        F.col("_rows").cast("long").alias("total_rows"),
        F.col("_keys").cast("long").alias("total_keys"),
    )


def sql_join_key_skew_audit(table: str, key_col: str, top_k: int = 10) -> str:
    """DuckDB twin of :func:`join_key_skew_audit`."""
    return f"""
    WITH counts AS (
      SELECT {key_col} AS key, count(*) AS n FROM {table} GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS _rows, count(*) AS _keys FROM counts),
    top AS (SELECT * FROM counts ORDER BY n DESC, key LIMIT {top_k})
    SELECT key, CAST(n AS BIGINT) AS n,
           CAST(floor(n * 1000000 / _rows) AS BIGINT) AS share_ppm,
           floor(CAST(n AS DOUBLE) * CAST(_keys AS DOUBLE)
                 / CAST(_rows AS DOUBLE) * 1e6) / 1e6 AS x_mean,
           CAST(_rows AS BIGINT) AS total_rows,
           CAST(_keys AS BIGINT) AS total_keys
    FROM top CROSS JOIN tot
    """
