"""Deterministic cardinality sketching.

Spark's ``approx_count_distinct`` and DuckDB's equivalent are both
HyperLogLog variants, but with different register layouts and hash
functions — their estimates can never hash-match across engines, so a
pipeline that checkpoints sketch outputs cannot be verified against an
oracle. The KMV (k-minimum-values) sketch (Bar-Yossef et al., "Counting
distinct elements in a data stream") has none of that problem when the
hash is fixed: keep the ``k`` smallest md5-derived hash values per
group; if the k-th smallest of uniform hashes on [0, M) is ``h_k``,
the distinct count is estimated by ``(k-1) * M / h_k``.

Everything here is integer arithmetic over the same 28-bit md5 prefix
used by the sampling operators, so Spark and DuckDB produce the SAME
estimate bit-for-bit — a sketch with a value-hash oracle.

100 TB shape: the per-group k-smallest selection compiles to a window
whose ``row_number <= k`` Spark rewrites into WindowGroupLimit — each
map task keeps only its local k minima per group BEFORE the shuffle,
so the exchange carries ~k * n_partitions rows per group, not the
group. That local-prune-then-merge is exactly how a distributed KMV
union works on a real cluster (sketches merge by keeping the k
smallest of the union), and it is why the operator never materializes
a group's distinct set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_M = 1 << 28


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """(group, est_distinct, exact_k): KMV distinct-count estimate per
    group. ``exact_k`` flags groups whose observed hash count was below
    ``k`` — there the estimate IS the exact distinct count (the sketch
    saw every element)."""
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 7), 16, 10
    ).cast("long")
    hashes = df.select(F.col(group_col), h.alias("_h")).distinct()
    w = Window.partitionBy(group_col).orderBy(F.col("_h").asc())
    topk = hashes.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    )
    return topk.groupBy(group_col).agg(
        F.when(
            F.count("*") < k, F.count("*")
        )
        .otherwise(
            F.expr(f"({k} - 1) * {_M}L div max(_h)")
        )
        .cast("long")
        .alias("est_distinct"),
        (F.count("*") < k).alias("exact_k"),
    )


def sql_kmv_distinct(
    table: str = "documents",
    group_col: str = "lang",
    value_expr: str = "text",
    k: int = 64,
) -> str:
    """DuckDB twin of :func:`kmv_distinct` — identical md5-prefix hash,
    identical integer estimator."""
    return f"""
    WITH h AS (
      SELECT DISTINCT {group_col},
             CAST('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 7) AS BIGINT) AS hv
      FROM {table}
    ), topk AS (
      SELECT {group_col}, hv,
             row_number() OVER (PARTITION BY {group_col} ORDER BY hv ASC) AS rn
      FROM h
    )
    SELECT {group_col},
           CAST(CASE WHEN count(*) < {k} THEN count(*)
                     ELSE CAST({k} - 1 AS BIGINT) * {_M} // max(hv) END AS BIGINT) AS est_distinct,
           count(*) < {k} AS exact_k
    FROM topk WHERE rn <= {k}
    GROUP BY {group_col}
    """



def _cm_entries(value: Column, depth: int, width: int) -> Column:
    """Array of (row, bucket) probes for one value: ONE md5 of the
    salted value; row j parses its own 7 hex digits [7j, 7j+7) of the
    digest (28 independent bits each, depth <= 4). Measured on the sf1
    token stream: codegen does NOT common-subexpression a shared
    parsed word across the array's struct fields, so a single
    15-hex-char ``conv`` re-evaluated per field was ~1.4x SLOWER than
    four 7-char parses — short per-row slices win. Identical
    arithmetic in DuckDB; width must stay <= 2^28."""
    if depth > 4:
        raise ValueError("countmin depth > 4 needs more digest bits")
    if width > (1 << 28):
        raise ValueError("countmin width > 2^28 exceeds the slice range")
    h = F.md5(F.concat(F.lit("cm:"), value.cast("string")))
    return F.array(*[
        F.struct(
            F.lit(j).alias("row"),
            (
                F.conv(F.substring(h, 1 + 7 * j, 7), 16, 10).cast("long")
                % width
            ).cast("int").alias("bucket"),
        )
        for j in range(depth)
    ])


def countmin_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(row, bucket, cnt): count-min sketch of the value stream —
    ``depth`` independent hash rows of ``width`` counters; a value's
    frequency estimate is the MIN over rows of its counter, an upper
    bound that overshoots by at most ~n/width w.h.p. (Cormode &
    Muthukrishnan). Unlike Misra-Gries, the sketch is a pure MULTISET
    function of the input — counter sums commute — so it is
    deterministic, mergeable across partitions/batches by cell-wise
    addition, and (with the fixed md5-prefix hash) bit-identical across
    engines: a frequency sketch with a value-hash oracle.

    One scan: each input row explodes into ``depth`` (row, bucket)
    entries, then ONE narrow groupBy; sketch size is depth*width cells
    regardless of input size — the 100 TB heavy-hitter pass ships
    KB-sized partials, never token counts."""
    # explode applies DIRECTLY to the array expression: staging the
    # array in a named projection first measured ~1.6x slower at sf1
    # (the generator path then materializes the array column instead
    # of streaming the inline elements)
    entries = df.select(
        F.explode(_cm_entries(F.col(value_col), depth, width)).alias("_e")
    ).select("_e.row", "_e.bucket")
    return entries.groupBy("row", "bucket").agg(
        F.count("*").cast("long").alias("cnt")
    )


def countmin_estimate(
    sketch: DataFrame,
    values: list[str],
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(value, est): frequency upper-bound per candidate value = min
    over the sketch's rows of the value's counter. The candidate list
    is literal-sized; its (row, bucket) probes broadcast-join the
    sketch (depth*width rows — always the small side)."""
    spark = sketch.sparkSession
    probes = spark.createDataFrame(
        [(v,) for v in values], "value string"
    ).select(
        "value", F.explode(_cm_entries(F.col("value"), depth, width)).alias("_p")
    ).select("value", "_p.row", "_p.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est"))
    )


def sql_countmin_sketch(
    table_expr: str,
    value_expr: str,
    depth: int = 4,
    width: int = 1024,
) -> str:
    """DuckDB twin of :func:`countmin_sketch` — same salted md5-prefix
    hash per row, same modulo."""
    unions = " UNION ALL ".join(
        f"""SELECT {j} AS row,
           CAST(CAST('0x' || substr(md5('cm:' || CAST({value_expr} AS VARCHAR)), {1 + 7 * j}, 7)
                AS BIGINT) % {width} AS INTEGER) AS bucket
        FROM {table_expr}"""
        for j in range(depth)
    )
    return f"""
    SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
    FROM ({unions}) GROUP BY row, bucket
    """


def sql_countmin_estimate(
    table_expr: str,
    value_expr: str,
    values: list[str],
    depth: int = 4,
    width: int = 1024,
) -> str:
    """DuckDB twin of :func:`countmin_sketch` + :func:`countmin_estimate`
    composed: build the sketch, probe it with the literal candidate
    list, min over rows."""
    from webhookdb_spark.operators.util import sql_str_lit

    sketch = sql_countmin_sketch(table_expr, value_expr, depth, width)
    vals = ", ".join(f"({sql_str_lit(v)})" for v in values)
    probe_unions = " UNION ALL ".join(
        f"""SELECT value, {j} AS row,
           CAST(CAST('0x' || substr(md5('cm:' || value), {1 + 7 * j}, 7)
                AS BIGINT) % {width} AS INTEGER) AS bucket
        FROM probes"""
        for j in range(depth)
    )
    return f"""
    WITH sk AS ({sketch}),
    probes(value) AS (VALUES {vals}),
    p AS ({probe_unions})
    SELECT p.value, CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est
    FROM p LEFT JOIN sk ON p.row = sk.row AND p.bucket = sk.bucket
    GROUP BY p.value
    """


# ---------------------------------------------------------------------------
# Incremental KMV — the sketch as MERGEABLE STATE: persist per-group
# k-minimum hash arrays, fold new batches in without rescanning old
# data, estimate at any point. merge(union) == one-shot build EXACTLY
# (k smallest of a union = k smallest of the two k-smallest sets), so
# the incremental path carries the same value-hash oracle as the
# one-shot sketch.
# ---------------------------------------------------------------------------

def kmv_state(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """(group, hs): per-group sorted array of the k smallest distinct
    value hashes — the sketch state (<= k longs per group, the bounded
    footprint that makes a 100 TB cardinality audit shippable)."""
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 7), 16, 10
    ).cast("long")
    hashes = df.select(F.col(group_col), h.alias("_h")).distinct()
    w = Window.partitionBy(group_col).orderBy(F.col("_h").asc())
    return (
        hashes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy(group_col)
        .agg(F.sort_array(F.collect_list("_h")).alias("hs"))
    )


def kmv_merge(state_a: DataFrame, state_b: DataFrame, k: int = 64) -> DataFrame:
    """Fold two sketch states: per group, the k smallest of the union
    of hash sets — pure array arithmetic on <= 2k elements per group,
    one co-partitioned outer join, no raw data touched."""
    group = [c for c in state_a.columns if c != "hs"][0]
    a = state_a.select(group, F.col("hs").alias("_a"))
    b = state_b.select(group, F.col("hs").alias("_b"))
    merged = F.slice(
        F.array_sort(
            F.array_distinct(
                F.concat(
                    F.coalesce(F.col("_a"), F.array()),
                    F.coalesce(F.col("_b"), F.array()),
                )
            )
        ),
        1, k,
    )
    return a.join(b, group, "full_outer").select(
        group, merged.alias("hs")
    )


def kmv_estimate_from_state(state: DataFrame, k: int = 64) -> DataFrame:
    """(group, est_distinct, exact_k) from sketch state — identical
    estimator (and therefore identical oracle) to :func:`kmv_distinct`."""
    group = [c for c in state.columns if c != "hs"][0]
    n = F.size("hs")
    return state.select(
        F.col(group),
        F.when(n < k, n.cast("long"))
        .otherwise(
            F.expr(f"({k} - 1) * {_M}L div element_at(hs, -1)")
        )
        .cast("long")
        .alias("est_distinct"),
        (n < k).alias("exact_k"),
    )


# ---------------------------------------------------------------------------
# Log-bucketed histogram quantile sketch (mergeable, one pass)
# ---------------------------------------------------------------------------
#
# Exact percentiles sort per group; at 100 TB the one-pass path is a
# bounded-memory mergeable sketch. This one log-buckets positive
# values at (1+eps) resolution: bucket counts are EXACT integers, so
# the sketch state — unlike t-digest — is deterministic,
# engine-reproducible (full value-hash oracle on both the state and
# the quantile estimates), and merges by plain addition. Relative
# error is bounded by eps by construction (every value in bucket b
# lies within [(1+eps)^b, (1+eps)^(b+1))). The same idea underlies
# DDSketch (Masson et al., VLDB'19 — public literature).


def log_histogram_state(
    df: DataFrame, value_col: str, eps_bp: int = 100
) -> DataFrame:
    """(bucket, n) exact counts of positive values log-bucketed at
    (1 + eps_bp/10000) resolution, plus sentinel bucket -2^31 for
    non-positive values (counted, excluded from quantiles). One
    map-side bucket expression + one narrow groupBy; state size is
    O(log(range)/eps), independent of row count. Merge = unionByName +
    re-groupBy sum (:func:`log_histogram_merge`)."""
    gamma = 1.0 + eps_bp / 10000.0
    x = F.col(value_col).cast("double")
    # floor here is the DDSketch bucket definition (round would shift
    # every boundary by half a bucket). Ulp-audit (r10): log is libm,
    # but the seam needs log(x)/log(gamma) within an ulp of an integer
    # — i.e. x within a ~1e-16 relative slice of gamma^k, an
    # IRRATIONAL boundary no data attracts to (unlike the ppm
    # quantizations, whose 1e6-grids integer-valued data lands on).
    bucket = F.when(
        x > 0, F.floor(F.log(x) / F.lit(float(__import__("math").log(gamma))))
    ).otherwise(F.lit(-(1 << 31))).cast("int")
    return (
        df.where(x.isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def log_histogram_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two sketch states: bucket-wise count addition."""
    return (
        a.unionByName(b).groupBy("bucket").agg(F.sum("n").alias("n"))
    )


def log_histogram_quantiles(
    state: DataFrame, pcts: list[float], eps_bp: int = 100
) -> DataFrame:
    """(p, est, n_total): quantile estimates from the sketch state —
    for each p, the geometric midpoint of the first bucket whose
    cumulative count reaches ceil(p * n). The cumulative window runs
    over the STATE table (O(log(range)/eps) rows — sketch-sized, not
    data-sized), so the single-partition sort is over ~thousands of
    buckets at any data scale. Estimates round-quantized to 1e-6
    (exp is libm; floor would flip at integral micro boundaries)."""
    import math

    gamma = 1.0 + eps_bp / 10000.0
    pos = state.where(F.col("bucket") != -(1 << 31))
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = pos.select(
        "bucket", "n", F.sum("n").over(w).alias("_cum")
    ).crossJoin(
        F.broadcast(pos.agg(F.sum("n").alias("_tot")))
    )
    out = None
    lg = math.log(gamma)
    for p in pcts:
        rank = F.ceil(F.lit(p) * F.col("_tot"))
        hit = (
            cum.where(F.col("_cum") >= rank)
            .orderBy("bucket")
            .limit(1)
            .select(
                F.lit(p).alias("p"),
                (
                    # round: exp is a libm estimate (engines differ by
                    # an ulp), so floor could flip at an integral
                    # micro boundary (mixture_plan ulp class, r10)
                    F.round(
                        F.exp((F.col("bucket") + F.lit(0.5)) * F.lit(lg))
                        * F.lit(1e6), 0
                    )
                    / F.lit(1e6)
                ).alias("est"),
                F.col("_tot").cast("long").alias("n_total"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out


def sql_log_histogram_quantiles(
    table: str, value_expr: str, pcts: list[float], eps_bp: int = 100
) -> str:
    """DuckDB twin of state+quantiles — identical bucketing, rank
    rule, and midpoint arithmetic."""
    import math

    gamma = 1.0 + eps_bp / 10000.0
    lg = repr(math.log(gamma))
    selects = []
    for p in pcts:
        selects.append(f"""
        SELECT CAST({p} AS DOUBLE) AS p,
               (SELECT round(exp((bucket + 0.5) * {lg}) * 1e6, 0) / 1e6
                FROM cum CROSS JOIN tot
                WHERE _cum >= ceil({p} * _tot)
                ORDER BY bucket LIMIT 1) AS est,
               (SELECT CAST(_tot AS BIGINT) FROM tot) AS n_total""")
    body = " UNION ALL ".join(selects)
    return f"""
    WITH state AS (
      SELECT CAST(floor(ln(x) / {lg}) AS INTEGER) AS bucket,
             count(*) AS n
      FROM (SELECT CAST({value_expr} AS DOUBLE) AS x FROM {table})
      WHERE x > 0
      GROUP BY 1
    ),
    cum AS (
      SELECT bucket, n,
             sum(n) OVER (ORDER BY bucket
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS _cum
      FROM state
    ),
    tot AS (SELECT sum(n) AS _tot FROM state)
    {body}
    """


def log_histogram_state_by(
    df: DataFrame, group_col: str, value_col: str, eps_bp: int = 100
) -> DataFrame:
    """(group, bucket, n): the grouped form of
    :func:`log_histogram_state` — one narrow (group, bucket) groupBy;
    per-group state stays O(log(range)/eps). Merge across batches =
    unionByName + re-groupBy sum on the same keys."""
    gamma = 1.0 + eps_bp / 10000.0
    import math

    x = F.col(value_col).cast("double")
    # floor = DDSketch bucket definition; gamma^k boundaries are
    # irrational, no integer attractor (see log_histogram's note).
    bucket = F.when(
        x > 0, F.floor(F.log(x) / F.lit(float(math.log(gamma))))
    ).otherwise(F.lit(-(1 << 31))).cast("int")
    return (
        df.where(x.isNotNull())
        .select(F.col(group_col).alias("group"), bucket.alias("bucket"))
        .groupBy("group", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def log_histogram_quantiles_by(
    state: DataFrame, pcts: list[float], eps_bp: int = 100
) -> DataFrame:
    """(group, p, est, n_total): per-group quantile estimates from a
    grouped sketch state. The cumulative window PARTITIONS on the
    group — per-group work over sketch-sized rows, so this scales to
    any number of groups with no single-partition stage at all."""
    import math

    gamma = 1.0 + eps_bp / 10000.0
    lg = math.log(gamma)
    pos = state.where(F.col("bucket") != -(1 << 31))
    w = (
        Window.partitionBy("group")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("group")
    cum = pos.select(
        "group",
        "bucket",
        F.sum("n").over(w).alias("_cum"),
        F.sum("n").over(wt).alias("_tot"),
    )
    out = None
    for p in pcts:
        rank = F.ceil(F.lit(p) * F.col("_tot"))
        hit = (
            cum.where(F.col("_cum") >= rank)
            .groupBy("group")
            .agg(
                F.min("bucket").alias("_b"),
                F.max("_tot").alias("_tot"),
            )
            .select(
                "group",
                F.lit(p).alias("p"),
                (
                    # round, not floor: exp is a libm estimate (see
                    # log_histogram_quantiles)
                    F.round(
                        F.exp((F.col("_b") + F.lit(0.5)) * F.lit(lg))
                        * F.lit(1e6), 0
                    )
                    / F.lit(1e6)
                ).alias("est"),
                F.col("_tot").cast("long").alias("n_total"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out


def sql_log_histogram_quantiles_by(
    table: str,
    group_col: str,
    value_expr: str,
    pcts: list[float],
    eps_bp: int = 100,
) -> str:
    """DuckDB twin of the grouped sketch quantiles."""
    import math

    gamma = 1.0 + eps_bp / 10000.0
    lg = repr(math.log(gamma))
    selects = []
    for p in pcts:
        selects.append(f"""
        SELECT "group", CAST({p} AS DOUBLE) AS p,
               round(exp((min(bucket) + 0.5) * {lg}) * 1e6, 0) / 1e6 AS est,
               CAST(max(_tot) AS BIGINT) AS n_total
        FROM cum WHERE _cum >= ceil({p} * _tot) GROUP BY "group" """)
    body = " UNION ALL ".join(selects)
    return f"""
    WITH state AS (
      SELECT g AS "group",
             CAST(floor(ln(x) / {lg}) AS INTEGER) AS bucket,
             count(*) AS n
      FROM (SELECT {group_col} AS g, CAST({value_expr} AS DOUBLE) AS x
            FROM {table})
      WHERE x > 0
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT "group", bucket, n,
             sum(n) OVER (PARTITION BY "group" ORDER BY bucket
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS _cum,
             sum(n) OVER (PARTITION BY "group") AS _tot
      FROM state
    )
    {body}
    """


def kmv_overlap(
    state_a: DataFrame, state_b: DataFrame, k: int = 64
) -> DataFrame:
    """Per-group set-overlap estimate from two KMV states — "how much
    does crawl B overlap crawl A" WITHOUT joining the raw corpora:
    est_union from the merged sketch, est_intersection by
    inclusion-exclusion (|A| + |B| - |A∪B|, floored at 0), and the
    Jaccard estimate from the two. All arithmetic runs on the integer
    KMV estimates, so the result hash-matches an oracle that computes
    the same estimators in SQL; sketch error carries through
    inclusion-exclusion (worst when the true overlap is small relative
    to either set — the standard KMV trade).

    Everything is per-group array arithmetic on <= k longs: the only
    joins are the group-keyed state joins.
    """
    group = [c for c in state_a.columns if c != "hs"][0]
    ea = kmv_estimate_from_state(state_a, k).select(
        F.col(group), F.col("est_distinct").alias("est_a")
    )
    eb = kmv_estimate_from_state(state_b, k).select(
        F.col(group), F.col("est_distinct").alias("est_b")
    )
    # the merged sketch covers every group present on either side, so
    # it drives the join — plain left joins, no full-outer chaining
    eu = kmv_estimate_from_state(
        kmv_merge(state_a, state_b, k), k
    ).select(F.col(group), F.col("est_distinct").alias("est_union"))
    out = eu.join(ea, group, "left").join(eb, group, "left").select(
        F.col(group),
        F.coalesce("est_a", F.lit(0)).alias("est_a"),
        F.coalesce("est_b", F.lit(0)).alias("est_b"),
        F.col("est_union"),
    )
    inter = F.greatest(
        F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0)
    )
    return out.select(
        group,
        "est_a",
        "est_b",
        "est_union",
        inter.cast("long").alias("est_intersection"),
        F.when(
            F.col("est_union") > 0,
            F.floor(
                inter.cast("double") / F.col("est_union").cast("double") * 1e6
            )
            / 1e6,
        )
        .otherwise(F.lit(0.0))
        .alias("jaccard_est"),
    )


def sql_kmv_overlap(
    table: str,
    group_col: str,
    value_expr: str,
    pred_a: str,
    pred_b: str,
    k: int = 64,
) -> str:
    """DuckDB twin of :func:`kmv_overlap` over two predicates of the
    same table — identical per-side and merged KMV estimators."""

    def side(pred, alias):
        return f"""
    {alias}_h AS (
      SELECT DISTINCT {group_col} AS g,
             CAST('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 7) AS BIGINT) AS hv
      FROM {table} WHERE {pred}
    ),
    {alias}_top AS (
      SELECT g, hv, row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
      FROM {alias}_h
    ),
    {alias}_e AS (
      SELECT g, CAST(CASE WHEN count(*) < {k} THEN count(*)
                 ELSE CAST({k} - 1 AS BIGINT) * {_M} // max(hv) END AS BIGINT) AS est
      FROM {alias}_top WHERE rn <= {k} GROUP BY g
    )"""

    union_side = f"""
    u_h AS (
      SELECT g, hv FROM a_h UNION SELECT g, hv FROM b_h
    ),
    u_top AS (
      SELECT g, hv, row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
      FROM u_h
    ),
    u_e AS (
      SELECT g, CAST(CASE WHEN count(*) < {k} THEN count(*)
                 ELSE CAST({k} - 1 AS BIGINT) * {_M} // max(hv) END AS BIGINT) AS est
      FROM u_top WHERE rn <= {k} GROUP BY g
    )"""
    return f"""
    WITH {side(pred_a, 'a')},
    {side(pred_b, 'b')},
    {union_side}
    SELECT u.g AS {group_col},
           COALESCE(a.est, 0) AS est_a,
           COALESCE(b.est, 0) AS est_b,
           u.est AS est_union,
           CAST(greatest(COALESCE(a.est, 0) + COALESCE(b.est, 0)
                         - u.est, 0) AS BIGINT) AS est_intersection,
           CASE WHEN u.est > 0
                THEN floor(CAST(greatest(COALESCE(a.est, 0) + COALESCE(b.est, 0)
                                         - u.est, 0) AS DOUBLE)
                           / CAST(u.est AS DOUBLE) * 1e6) / 1e6
                ELSE 0.0 END AS jaccard_est
    FROM u_e u LEFT JOIN a_e a ON a.g = u.g LEFT JOIN b_e b ON b.g = u.g
    """
