"""Order-insensitive table digests for replica verification.

A sync pipeline (Postgres staging-merge, Snowflake stage-MERGE, org DB
migration — `sinks/sync_target.py`, `sinks/migration.py`) needs a
cheap way to answer "does the replica hold the same rows?" without
shipping either side's data. The standard trick: a COMMUTATIVE digest —
hash every row to an integer and SUM per key-range — so the check is
one aggregate on each side and a tiny diff of (bucket, digest) pairs;
mismatched buckets are re-synced individually (anti-entropy).

Everything is the repo's portable 28-bit md5 arithmetic, so the digest
computed by Spark equals the one DuckDB (or any engine with md5 +
integer sums) computes on the same rows — which also makes it
oracle-checkable. Canonicalization reuses the profiler's rules:
numerics route through the string repr into DECIMAL(38,6) (exact
cross-engine, see operators/profile.py), everything else casts to
string; NULL encodes as a sentinel so (NULL, "x") differs from
("x", NULL). Per-row 28 bits is plenty for drift DETECTION over many
rows (a missing/extra/changed row shifts the bucket sum with
probability 1 - 2^-28); it is not a cryptographic commitment.

100 TB shape: one narrow map (concat + md5 + parse) and one map-side
combined SUM onto n_buckets keys — no shuffle wider than the bucket
count, no row movement at all beyond partial-agg merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUM_TYPES = ("int", "bigint", "double", "float", "decimal", "smallint", "tinyint")
_NULL_SENTINEL = "\x1enull"
_SEP = "\x1f"


def _canon_dt(c: str, dt: str):
    """Canonicalized string form of column ``c`` of dtype ``dt``."""
    if any(dt.startswith(t) for t in _NUM_TYPES):
        v = F.col(c).cast("string").try_cast("decimal(38,6)").cast("string")
    else:
        v = F.col(c).cast("string")
    return F.coalesce(v, F.lit(_NULL_SENTINEL))


def _canon(df: DataFrame, c: str):
    return _canon_dt(c, dict(df.dtypes)[c])


def _row_hash(dts: tuple[tuple[str, str], ...]):
    """28-bit md5 row hash over the canonicalized unit-separated column
    string — a pure tree of the (name, dtype) tuple, memoized: the
    digest/diff composites rebuild it per snapshot side per cycle, and
    ``df.dtypes`` alone is one JVM round-trip per call (guide §5)."""
    from webhookdb_spark.operators.util import memo_col

    return memo_col(
        ("digest_row_hash", dts),
        lambda: F.conv(
            F.substring(
                F.md5(F.concat_ws(_SEP, *[_canon_dt(c, d) for c, d in dts])),
                1,
                7,
            ),
            16,
            10,
        ).cast("long"),
    )


def table_digest(
    df: DataFrame,
    cols: list[str] | None = None,
    key_col: str | None = None,
    n_buckets: int = 32,
) -> DataFrame:
    """(bucket, n_rows, digest): commutative per-bucket checksum.

    ``bucket`` is the portable hash of ``key_col`` (default: the first
    column) mod ``n_buckets`` — align it with the replica's routing so
    a mismatch localizes the re-sync. ``digest`` is the BIGINT sum of
    each row's 28-bit md5 over the canonicalized, sentinel-NULL,
    unit-separated column string."""
    from webhookdb_spark.operators.util import memo_col

    use = cols or df.columns
    key = key_col or use[0]
    dt_map = dict(df.dtypes)
    row_h = _row_hash(tuple((c, dt_map[c]) for c in use))
    bucket = memo_col(
        ("digest_bucket", key, n_buckets),
        lambda: (
            (
                F.conv(
                    F.substring(F.md5(F.col(key).cast("string")), 1, 7),
                    16,
                    10,
                ).cast("long")
                % n_buckets
            )
            .cast("int")
            .alias("bucket")
        ),
    )
    return (
        df.select(bucket, row_h.alias("_h"))
        .groupBy("bucket")
        .agg(
            memo_col(
                ("digest_nrows",),
                lambda: F.count("*").cast("long").alias("n_rows"),
            ),
            memo_col(
                ("digest_sum",),
                lambda: F.sum("_h").cast("long").alias("digest"),
            ),
        )
        .orderBy("bucket")
    )


def digest_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Buckets where two digests disagree — the re-sync worklist.
    Outer-joins the (tiny) digest tables; a bucket missing on one side
    counts as a mismatch."""
    aa = a.select(
        "bucket",
        F.col("n_rows").alias("n_rows_a"),
        F.col("digest").alias("digest_a"),
    )
    bb = b.select(
        "bucket",
        F.col("n_rows").alias("n_rows_b"),
        F.col("digest").alias("digest_b"),
    )
    return (
        aa.join(bb, "bucket", "full_outer")
        .where(
            ~(
                F.col("digest_a").eqNullSafe(F.col("digest_b"))
                & F.col("n_rows_a").eqNullSafe(F.col("n_rows_b"))
            )
        )
        .orderBy("bucket")
    )


def changed_buckets(table, from_txn: int, to_txn: int) -> list[int]:
    """Bucket ids whose data differs between two retained snapshots of
    a managed table — derived from the MANIFESTS alone, zero I/O:
    bucket version dirs (``buckets/<b>/v<txn>_<writer>``) are immutable
    once written, so a bucket with the same relative dir in both
    snapshots is byte-identical by construction. This is the pruning
    step that makes :func:`snapshot_diff` read only touched buckets:
    after an incremental MERGE, a 100 TB table diffs by reading the
    handful of buckets that transaction rewrote."""
    m = table.manifest

    def bucket_map(txn: int) -> dict:
        if txn == m.txn:
            return m.buckets
        for snap in m.history or []:
            if snap["txn"] == txn:
                return snap["buckets"]
        raise ValueError(
            f"txn {txn} is not a retained snapshot (retained: "
            f"{[s['txn'] for s in m.history or []]} + {m.txn})"
        )

    old_b, new_b = bucket_map(from_txn), bucket_map(to_txn)
    return sorted(
        int(b)
        for b in set(old_b) | set(new_b)
        if old_b.get(b) != new_b.get(b)
    )


def snapshot_diff(
    table, from_txn: int, to_txn: int | None = None
) -> DataFrame:
    """Row-level diff between two retained snapshots of a managed
    table: one ``(key, change)`` row per key whose stored row differs,
    with ``change`` in 'added' / 'removed' / 'changed' — the "what did
    this table gain since yesterday's snapshot" question time travel
    alone doesn't answer.

    Distributed shape: manifest-level bucket pruning first
    (:func:`changed_buckets` — immutable version dirs make it exact),
    then ONE key-equi full-outer join over only the changed buckets of
    the two snapshots, comparing a canonicalized full-row hash (the
    digest family's portable md5 arithmetic). Unchanged buckets are
    never opened; both sides of the join are bucket-aligned reads of
    the same keyspace partitioning."""
    m = table.manifest
    if to_txn is None:
        to_txn = m.txn
    key = m.key
    touched = changed_buckets(table, from_txn, to_txn)
    if not touched:
        return table.spark.createDataFrame(
            [], f"{key} {dict(table.read().dtypes)[key]}, change string"
        )
    old = table.read(buckets=touched, at_txn=from_txn)
    new = table.read(buckets=touched, at_txn=to_txn)

    from webhookdb_spark.operators.util import memo_col

    def hashed(df, side):
        dts = tuple(df.dtypes)
        h = _row_hash(dts)
        return df.select(
            memo_col(
                ("snapdiff_k", key, side),
                lambda: F.col(key).alias(f"_k_{side}"),
            ),
            h.alias(f"_h_{side}"),
        )

    o, n = hashed(old, "o"), hashed(new, "n")
    joined = o.join(n, o["_k_o"] == n["_k_n"], "full_outer")
    return (
        joined.select(
            F.coalesce(F.col("_k_o"), F.col("_k_n")).alias(key),
            F.when(F.col("_k_o").isNull(), F.lit("added"))
            .when(F.col("_k_n").isNull(), F.lit("removed"))
            .when(
                F.col("_h_o") != F.col("_h_n"), F.lit("changed")
            )
            .alias("change"),
        )
        .where(F.col("change").isNotNull())
    )


def sql_table_digest(
    table: str,
    col_kinds: dict[str, str],
    key_col: str | None = None,
    n_buckets: int = 32,
) -> str:
    """DuckDB twin of :func:`table_digest`. ``col_kinds`` maps columns
    to 'num'/'raw' as in the profiler twins."""
    key = key_col or next(iter(col_kinds))
    parts = []
    for c, kind in col_kinds.items():
        canon = (
            f"CAST(TRY_CAST(CAST({c} AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR)"
            if kind == "num" else f"CAST({c} AS VARCHAR)"
        )
        parts.append(f"coalesce({canon}, chr(30) || 'null')")
    row_str = f"concat_ws(chr(31), {', '.join(parts)})"
    return f"""
    WITH r AS (
      SELECT CAST(CAST('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 7)
               AS BIGINT) % {n_buckets} AS INTEGER) AS bucket,
             CAST('0x' || substr(md5({row_str}), 1, 7) AS BIGINT) AS h
      FROM {table}
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(h) AS BIGINT) AS digest
    FROM r GROUP BY bucket ORDER BY bucket
    """
