"""Deterministic sampling operators for training-data pipelines.

A corpus mix is usually specified as quotas per stratum ("200k docs per
language", "cap each source at 1%"), and the sample must be REPRODUCIBLE
across runs and engines — rand()-based sampling is neither. The operators
here order rows inside each stratum by the md5 of their id (a fixed,
uniform, engine-portable permutation — the same md5-prefix discipline as
functions/converters.str2inthash) and take the first N / first fraction.

100 TB shape: the per-stratum pick compiles to a window whose
``row_number <= N`` predicate Spark turns into a WindowGroupLimit —
each map task keeps only its local top-N per stratum BEFORE the
shuffle, so the exchange carries ~N * n_partitions rows per stratum,
not the stratum. A giant stratum (half the corpus one language) never
sorts in full; skew is bounded by the limit pushdown. The hash-fraction
variant is a pure map-side filter — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from webhookdb_spark.operators.util import sql_str_lit


def sample_order(id_col: Column) -> Column:
    """The deterministic shuffle key: md5 of the id rendered as text.
    Uniform over rows, stable across runs, identical in any engine with
    md5() — which is what makes sampled pipelines diffable."""
    return F.md5(id_col.cast("string"))


def stratified_sample_n(
    df: DataFrame,
    strata_col: str,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, deterministically:
    the first ``n`` rows of each stratum in md5(id) order (ties by id —
    md5 collisions on distinct ids are practically impossible but the
    tiebreak keeps the plan formally deterministic)."""
    w = Window.partitionBy(strata_col).orderBy(
        sample_order(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def hash_fraction_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose md5(id)
    prefix, read as a 28-bit integer, falls under the cutoff. Pure
    map-side filter — the scale path when quotas are fractions rather
    than exact counts (no shuffle, no window; composable with any
    downstream op). The same row set is selected on every engine."""
    cutoff = int(fraction * float(1 << 28))
    bucket = F.conv(F.substring(sample_order(F.col(id_col)), 1, 7), 16, 10).cast(
        "long"
    )
    return df.where(bucket < F.lit(cutoff))


def _bucket28(id_col: Column, salt: str) -> Column:
    """28-bit integer from the md5 of salt+id. Each operator salts its
    hash differently so composed stages (split -> mix -> sample) draw
    INDEPENDENT permutations — sharing one hash would correlate them
    (e.g. every sampled row landing in 'train')."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 7),
        16,
        10,
    ).cast("long")


def _sql_bucket28(id_col: str, salt: str) -> str:
    return (
        f"CAST('0x' || substr(md5('{salt}' || CAST({id_col} AS VARCHAR)), 1, 7)"
        " AS BIGINT)"
    )


def corpus_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: a ``split`` column from
    the row's salted 28-bit hash against the cumulative weight
    thresholds. Every engine and every run assigns each id to the same
    split — the property that keeps eval sets leak-free when the corpus
    is re-materialized. Pure map-side (no shuffle); weights are
    normalized, so {9, 0.5, 0.5} works as well as fractions."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = _bucket28(F.col(id_col), "split:")
    expr: Column | None = None
    acc = 0.0
    items = list(weights.items())
    for name, wt in items[:-1]:
        acc += wt / total
        cutoff = int(acc * float(1 << 28))
        expr = (
            F.when(bucket < cutoff, F.lit(name))
            if expr is None
            else expr.when(bucket < cutoff, F.lit(name))
        )
    last = items[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", split)


def weighted_mix(
    df: DataFrame,
    source_weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source subsampling — the corpus-mixture step ("keep 100% of
    wiki, 30% of web, 5% of forum"): a row survives when its salted
    hash falls under its source's keep-fraction. Sources not listed
    pass through whole (weight 1.0). Map-side only, reproducible, and
    composable with :func:`corpus_split` (independent salts)."""
    pairs: list[Column] = []
    for s, wt in source_weights.items():
        pairs += [F.lit(s), F.lit(int(min(max(wt, 0.0), 1.0) * float(1 << 28)))]
    cutoff = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(source_col)),
        F.lit(1 << 28),
    )
    return df.where(_bucket28(F.col(id_col), "mix:") < cutoff)


def sql_corpus_split(
    table: str = "documents",
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    cols: str = "doc_id, lang, source",
) -> str:
    """DuckDB twin of :func:`corpus_split`."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    b = _sql_bucket28(id_col, "split:")
    acc = 0.0
    whens = []
    items = list(weights.items())
    for name, wt in items[:-1]:
        acc += wt / total
        whens.append(
            f"WHEN {b} < {int(acc * float(1 << 28))} THEN {sql_str_lit(name)}"
        )
    case = "CASE " + " ".join(whens) + f" ELSE {sql_str_lit(items[-1][0])} END"
    return f"SELECT {cols}, {case} AS split FROM {table}"


def sql_weighted_mix(
    table: str = "documents",
    source_weights: dict[str, float] | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
    cols: str = "doc_id, lang, source",
) -> str:
    """DuckDB twin of :func:`weighted_mix`."""
    source_weights = source_weights or {}
    whens = " ".join(
        f"WHEN {sql_str_lit(s)} THEN {int(min(max(w, 0.0), 1.0) * float(1 << 28))}"
        for s, w in source_weights.items()
    )
    cutoff = f"CASE {source_col} {whens} ELSE {1 << 28} END"
    return f"""
    SELECT {cols} FROM {table}
    WHERE {_sql_bucket28(id_col, 'mix:')} < {cutoff}
    """


def sql_stratified_sample_n(
    table: str = "documents",
    strata_col: str = "lang",
    n: int = 20,
    id_col: str = "doc_id",
    cols: str = "doc_id, lang, source, n_chars",
) -> str:
    """DuckDB twin of :func:`stratified_sample_n`."""
    return f"""
    SELECT {cols} FROM (
      SELECT *, row_number() OVER (
        PARTITION BY {strata_col}
        ORDER BY md5(CAST({id_col} AS VARCHAR)) ASC, {id_col} ASC
      ) AS _rn
      FROM {table}
    ) WHERE _rn <= {n}
    """


def sql_hash_fraction_sample(
    table: str = "documents",
    fraction: float = 0.1,
    id_col: str = "doc_id",
    cols: str = "doc_id, lang, source, n_chars",
) -> str:
    """DuckDB twin of :func:`hash_fraction_sample`."""
    cutoff = int(fraction * float(1 << 28))
    return f"""
    SELECT {cols} FROM {table}
    WHERE CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 7) AS BIGINT)
          < {cutoff}
    """


# -- Training-order shuffle + sequence packing -------------------------------

def corpus_shuffle(df: DataFrame, salt: str = "shuffle:", id_col: str = "doc_id") -> DataFrame:
    """Deterministic global training-order shuffle: order by the salted
    md5 of the id. The physical shape is Spark's distributed sort
    (range partition + per-partition sort) — NEVER a single-partition
    window — so a 100 TB corpus shuffles with full parallelism and the
    writer emits part files already in global order. Reproducible
    across runs/engines like every sampling op here."""
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return (
        df.withColumn("shuffle_key", key)
        .sort(F.col("shuffle_key").asc(), F.col(id_col).asc())
    )


def sequence_pack(
    df: DataFrame,
    context_len: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "pack:",
) -> DataFrame:
    """GPT-style sequence packing: documents are laid out in the
    deterministic shuffle order, concatenated token-wise, and chopped
    into fixed ``context_len`` windows; a document may straddle packs
    (the standard concat-then-chunk training layout). Emits, per doc:
    its global token offset, starting pack, offset inside that pack,
    and how many packs it spans.

    The layout needs a GLOBAL prefix sum of token counts — the naive
    ``Window.orderBy(key)`` collapses to a single partition at scale,
    so this computes it as a distributed two-phase prefix sum:

    1. bucket = first byte of the shuffle key (the bucket is a PREFIX
       of the sort key, so (bucket, key) order == key order),
    2. per-bucket cumulative sums in parallel windows,
    3. per-bucket totals (256 rows — metadata) get their own running
       offsets and broadcast-join back.

    Every quantity is exact integer arithmetic over deterministic
    hashes, so the layout is reproducible in any engine and carries a
    value-hash oracle (the DuckDB twin uses the equivalent single
    cumulative window — same math, different physical plan)."""
    from webhookdb_spark.operators.text import WS

    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    b = (
        df.select(id_col, text_col)
        .withColumn("_key", key)
        .withColumn("_bucket", F.conv(F.substring("_key", 1, 2), 16, 10).cast("int"))
        .withColumn(
            "n_tokens",
            F.size(F.split(F.trim(F.col(text_col)), WS)).cast("long"),
        )
    )
    w = (
        Window.partitionBy("_bucket")
        .orderBy(F.col("_key").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("_cum", F.sum("n_tokens").over(w))
    totals = local.groupBy("_bucket").agg(F.sum("n_tokens").alias("_total"))
    wo = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "_bucket",
        (F.sum("_total").over(wo) - F.col("_total")).alias("_offset"),
    )
    L = int(context_len)
    g = local.join(F.broadcast(offsets), "_bucket").select(
        id_col,
        "n_tokens",
        (F.col("_offset") + F.col("_cum") - F.col("n_tokens")).alias("_gs"),
    )
    return g.select(
        id_col,
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("_gs").alias("global_offset"),
        F.expr(f"_gs div {L}").alias("pack_id"),
        (F.col("_gs") % L).cast("int").alias("pack_offset"),
        (
            F.expr(f"(_gs + n_tokens - 1) div {L}") - F.expr(f"_gs div {L}") + 1
        ).cast("int").alias("n_packs"),
    )


def sql_sequence_pack(
    table: str = "documents",
    context_len: int = 256,
    id_col: str = "doc_id",
    salt: str = "pack:",
) -> str:
    """DuckDB twin of :func:`sequence_pack`: one cumulative window in
    shuffle-key order (the two-phase prefix sum is a physical-plan
    strategy, not a semantics change)."""
    L = int(context_len)
    t = "regexp_split_to_array(trim(text, ' '), '[ \\t\\n\\r\\f\\x0B]+')"
    return f"""
    WITH b AS (
      SELECT {id_col},
             md5('{salt}' || CAST({id_col} AS VARCHAR)) AS key,
             CAST(len({t}) AS BIGINT) AS n_tokens
      FROM {table}
    ), c AS (
      SELECT {id_col}, n_tokens,
             sum(n_tokens) OVER (ORDER BY key ASC, {id_col} ASC
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS gs
      FROM b
    )
    SELECT {id_col},
           CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST(gs AS BIGINT) AS global_offset,
           CAST(gs // {L} AS BIGINT) AS pack_id,
           CAST(gs % {L} AS INTEGER) AS pack_offset,
           CAST((gs + n_tokens - 1) // {L} - gs // {L} + 1 AS INTEGER) AS n_packs
    FROM c
    """


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    bucket_partitions: int = 64,
) -> DataFrame:
    """1-based rank of every row in the total order ``order_cols``
    (which must be a TOTAL order — include a unique tie-break column),
    without a single-partition global window.

    Shape: repartitionByRange splits the total order into
    ``bucket_partitions`` contiguous ranges (Spark samples split
    points; partition id order == key order), per-range row_numbers
    run in parallel windows, and per-range counts (metadata-sized)
    get running offsets that broadcast-join back — the same two-phase
    prefix sum as :func:`sequence_pack`. Output ranks are invariant to
    where the sampled split points land, so the result is
    deterministic even though the partitioning isn't.

    The bucketed frame is localCheckpoint'ed (lazily) before the
    ``local``/``offsets`` branches fork: both must see the SAME
    sampled range boundaries, and without materialization that
    correctness hangs on Catalyst deduplicating the identical exchange
    subtrees (ReuseExchange) — disabled reuse or divergent re-planning
    would silently corrupt every rank. The checkpoint makes the
    single-computation guarantee structural, and costs nothing extra
    in principle: a two-phase rank reads the bucketed data twice
    either way."""
    cols = [F.col(c) for c in order_cols]
    d = df.repartitionByRange(bucket_partitions, *cols).withColumn(
        "_grb", F.spark_partition_id()
    ).localCheckpoint(eager=False)
    w = Window.partitionBy("_grb").orderBy(*cols)
    local = d.withColumn("_grl", F.row_number().over(w))
    wo = Window.orderBy("_grb").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        local.groupBy("_grb")
        .agg(F.count("*").alias("_grc"))
        .select("_grb", (F.sum("_grc").over(wo) - F.col("_grc")).alias("_gro"))
    )
    return (
        local.join(F.broadcast(offsets), "_grb")
        .withColumn(rank_col, (F.col("_gro") + F.col("_grl")).cast("long"))
        .drop("_grb", "_grl", "_gro")
    )


def ntile_assign(rank: Column, total: Column, n: int) -> Column:
    """SQL NTILE(n) bucket (1-based) from a 1-based global rank and the
    total row count, in exact integer arithmetic: the first
    ``total % n`` buckets hold ``total div n + 1`` rows, the rest
    ``total div n`` — the ANSI remainder rule, computed without any
    window at all."""
    r0 = rank - 1
    q = F.floor(total / n).cast("long")
    rem = (total % n).cast("long")
    big = rem * (q + 1)
    return (
        F.when(r0 < big, F.floor(r0 / (q + 1)))
        .otherwise(rem + F.floor((r0 - big) / F.greatest(q, F.lit(1))))
        .cast("int")
        + 1
    )


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample:",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the k rows
    with the largest Efraimidis-Spirakis order keys u^(1/w) (public
    IPL 2006 result) — inclusion probability proportional to weight,
    no two draws of the same row, and the SAME k rows on every engine
    and every run because u comes from the salted 28-bit md5 hash of
    the id, not a PRNG.

    Numerics: u = (bucket + 0.5) / 2^28 is an exact dyadic double in
    (0, 1); keys compare as ln(u)/w (monotone in u^(1/w)), ties broken
    by id. Everything after the per-row key is a top-k —
    TakeOrderedAndProject, per-partition heads then one k-row merge on
    the driver side of the exchange; no global sort, no window, no
    shuffle of the full table. Rows with non-positive weight can never
    be drawn and are filtered.
    """
    u = (_bucket28(F.col(id_col), salt) + F.lit(0.5)) / F.lit(float(1 << 28))
    es = F.log(u) / F.col(weight_col)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_es", es)
        .orderBy(F.desc("_es"), F.col(id_col))
        .limit(k)
        .drop("_es")
    )


def sql_weighted_sample_k(
    table: str,
    k: int,
    weight_col: str,
    id_col: str,
    cols: str = "*",
    salt: str = "wsample:",
) -> str:
    """DuckDB twin of :func:`weighted_sample_k` — identical hash, u,
    key, and tie-break."""
    b = _sql_bucket28(id_col, salt)
    return f"""
    SELECT {cols} FROM (
      SELECT *, ln(({b} + 0.5) / 268435456.0) / {weight_col} AS _es
      FROM {table} WHERE {weight_col} > 0
      ORDER BY _es DESC, {id_col} LIMIT {k}
    )
    """


def weighted_sample_k_per_group(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample:",
) -> DataFrame:
    """Per-group deterministic weighted sampling without replacement:
    within each ``group_col`` value, the k rows with the largest
    Efraimidis-Spirakis keys — per-source corpus quotas where rows
    should win in proportion to a quality/importance weight.

    Same hash-derived uniforms as :func:`weighted_sample_k`; selection
    is a rank window PARTITIONED on the group (per-group work, never a
    global sort). Groups with fewer than k positive-weight rows keep
    them all.
    """
    from pyspark.sql.window import Window

    u = (_bucket28(F.col(id_col), salt) + F.lit(0.5)) / F.lit(float(1 << 28))
    es = F.log(u) / F.col(weight_col)
    w = Window.partitionBy(group_col).orderBy(
        F.desc("_es"), F.col(id_col)
    )
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_es", es)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_es", "_rk")
    )


def sql_weighted_sample_k_per_group(
    table: str,
    k: int,
    weight_col: str,
    group_col: str,
    id_col: str,
    cols: str = "*",
    salt: str = "wsample:",
) -> str:
    """DuckDB twin of :func:`weighted_sample_k_per_group`."""
    b = _sql_bucket28(id_col, salt)
    return f"""
    SELECT {cols} FROM (
      SELECT *, row_number() OVER (
        PARTITION BY {group_col}
        ORDER BY ln(({b} + 0.5) / 268435456.0) / {weight_col} DESC, {id_col}
      ) AS _rk
      FROM {table} WHERE {weight_col} > 0
    ) WHERE _rk <= {k}
    """


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order_col: str,
    id_col: str = "doc_id",
    descending: bool = True,
) -> DataFrame:
    """Keep the BEST ``n`` rows per group by ``order_col`` — the
    per-domain/per-language quality cap of a corpus mixing recipe
    ("at most N documents per source, highest quality first"), as
    opposed to :func:`stratified_sample_n`'s hash-random quota.
    Deterministic tie-break on ``id_col``.

    100 TB shape: the rank-limit predicate compiles to
    WindowGroupLimit, so each task prunes to its local top-n per group
    BEFORE the single group-keyed shuffle — the shuffle carries at
    most n rows per (task, group), not the corpus."""
    from pyspark.sql.window import Window

    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        F.col(id_col).asc(),
    ]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def sql_cap_per_group(
    table: str,
    group_col: str,
    n: int,
    order_col: str,
    id_col: str = "doc_id",
    cols: str = "*",
    descending: bool = True,
) -> str:
    """DuckDB twin of :func:`cap_per_group` — same window, same
    tie-break."""
    d = "DESC" if descending else "ASC"
    return f"""
    SELECT {cols} FROM (
      SELECT *, row_number() OVER (
        PARTITION BY {group_col} ORDER BY {order_col} {d}, {id_col} ASC
      ) AS _rn
      FROM {table}
    ) WHERE _rn <= {n}
    """


# -- Temperature-scaled source mixture planning ------------------------------

def mixture_plan(
    df: DataFrame,
    alpha: float = 0.7,
    budget_tokens: int = 10_000_000,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pretraining mixture plan: per-source sampling weights under
    temperature scaling ``w_s ∝ n_s^alpha`` (the multilingual /
    multi-source rebalancing rule of mBERT/XLM-R and every LLM data
    recipe: alpha < 1 upsamples small sources), plus the expected
    epoch count each source runs at to fill ``budget_tokens``.

    Returns one row per source: (source, n_docs, n_tokens,
    mix_weight_micro, epochs_micro) where ``mix_weight_micro =
    round(1e6 * n^alpha / Σ n^alpha)`` and ``epochs_micro = round(1e6
    * budget * weight / n)`` — epochs_micro > 1e6 means that source
    repeats (the signal to cap or collect more of it).

    THE ACTUAL r9/r10 driver-red root cause (found r11, round 4): the
    oracle twin's ``sum()`` returned DuckDB HUGEINT for ``n_tokens``
    — int128 has no pandas dtype, so any pandas-path fetch renders it
    float64 ('1364.0' vs Spark's BIGINT '1364') and byte-identical
    values hash-mismatch. The only two oracles in the registry
    projecting HUGEINT were this family; the twin now casts to BIGINT
    and tests/test_oracle_parity.py guards the whole registry against
    the class. The arithmetic rebuild below predates that finding but
    stands on its own merits as the stronger cross-engine contract.

    Cross-engine arithmetic contract (rebuilt r11): the ONLY
    floating-point step is libm ``pow``, and its output is quantized
    to integer micro-units (``round(pow(n, alpha) * 1e6)`` → BIGINT)
    at that boundary. Everything downstream — the
    normalizer sum, both ratios, and both micro quantizations — runs
    in exact integer/decimal arithmetic via the half-up identity
    ``round(a/b) = (2a + b) div (2b)`` (positive operands), which is
    order-free and engine-identical by construction. The earlier
    floor→round patch (eebe07f) quantized AFTER an unquantized double
    SUM + division, leaving the whole chain exposed to accumulation-
    order and division rounding differences between the JVM and
    DuckDB; measurement showed the red rows sat ~1.5e5 ulps from any
    round boundary, so only a structural rebuild could close it.
    Residual exposure: a pow ulp flips one element's micro-quant only
    when pow(n, alpha)*1e6 lies within ~1e-5 of a half-integer at
    magnitude ~1e11 (~6e-5 per element; property-pinned invariant
    under ±200-ulp perturbation in tests/test_property.py).

    Shape: one narrow token-count map, one groupBy on the source key
    (partial-agg friendly, a few dozen groups), one broadcast of the
    1-row normalizer. Driver-free at any corpus size; the decimal ops
    stay inside whole-stage codegen.
    """
    toks = F.size(F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f\x0B]+"))
    per = (
        df.select(F.col(group_col).alias("source"), toks.alias("_n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_n").cast("long").alias("n_tokens"),
        )
    )
    # libm boundary: quantize pow to integer micro-units immediately.
    pm = F.round(
        F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) * F.lit(1e6), 0
    ).cast("decimal(38,0)")
    per = per.withColumn("_pm", pm)
    tot = per.agg(F.sum("_pm").cast("decimal(38,0)").alias("_tm"))
    j = per.crossJoin(F.broadcast(tot))
    # Exact half-up rounding of integer ratios: round(a/b) = (2a+b) div (2b).
    # Spark's `div` on decimals is BigDecimal.divideToIntegralValue — exact.
    mix = F.expr(
        "CAST((2 * CAST(1000000 AS DECIMAL(38,0)) * _pm + _tm)"
        " div (2 * _tm) AS BIGINT)"
    )
    ep = F.expr(
        f"CAST((2 * CAST(1000000 AS DECIMAL(38,0))"
        f" * CAST({int(budget_tokens)} AS DECIMAL(38,0)) * _pm"
        f" + _tm * n_tokens)"
        f" div (2 * _tm * n_tokens) AS BIGINT)"
    )
    return j.select(
        "source", "n_docs", "n_tokens",
        mix.alias("mix_weight_micro"),
        ep.alias("epochs_micro"),
    )


def sql_mixture_plan(
    table: str = "documents",
    alpha: float = 0.7,
    budget_tokens: int = 10_000_000,
) -> str:
    """DuckDB twin of :func:`mixture_plan`: identical quantize-at-the-
    libm-boundary contract — ``round(pow * 1e6)`` per element, then
    exact 128-bit integer sum/ratio/quantization (HUGEINT ``//``
    mirrors Spark's exact decimal ``div``; the half-up identity
    ``round(a/b) = (2a+b) // (2b)`` is shared with the Spark twin)."""
    return f"""
    WITH per AS (
      SELECT source,
             count(*) AS n_docs,
             -- BIGINT, not DuckDB's HUGEINT sum default: HUGEINT has no
             -- pandas dtype and float-renders ('1364.0' vs '1364'), which
             -- was the real r9-r10 driver hash seam on this query — see
             -- sql_mixture_plan_tokens. Exact decimal arithmetic below is
             -- unaffected (pm/tm recast where 128-bit range matters).
             CAST(sum(len(regexp_split_to_array(trim(text, ' '), '[ \\t\\n\\r\\f\\x0B]+'))) AS BIGINT) AS n_tokens
      FROM {table} GROUP BY source
    ), pw AS (
      SELECT *, CAST(round(pow(CAST(n_tokens AS DOUBLE), {alpha}) * 1e6, 0) AS HUGEINT) AS pm FROM per
    ), tot AS (
      SELECT CAST(sum(pm) AS HUGEINT) AS tm FROM pw
    )
    SELECT source, n_docs, n_tokens,
           CAST((2 * CAST(1000000 AS HUGEINT) * pm + tm) // (2 * tm) AS BIGINT) AS mix_weight_micro,
           CAST((2 * CAST(1000000 AS HUGEINT) * CAST({int(budget_tokens)} AS HUGEINT) * pm + tm * CAST(n_tokens AS HUGEINT))
                // (2 * tm * CAST(n_tokens AS HUGEINT)) AS BIGINT) AS epochs_micro
    FROM pw, tot
    """


def mixture_plan_tokens(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Differential-diagnosis prefix of :func:`mixture_plan`: the
    pure-integer (source, n_docs, n_tokens) aggregate BEFORE any
    floating-point step. Registered as its own driver row so a
    cross-engine divergence localizes definitively — this row red ⇒
    the data/tokenizer seam (regexp split semantics), this row green
    with ``mixture_plan`` red ⇒ the pow/arithmetic chain. Retire once
    ``mixture_plan`` holds a green driver row (VERDICT r10 Next #1b).
    """
    toks = F.size(F.split(F.trim(F.col(text_col)), r"[ \t\n\r\f\x0B]+"))
    return (
        df.select(F.col(group_col).alias("source"), toks.alias("_n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_n").cast("long").alias("n_tokens"),
        )
    )


def sql_mixture_plan_tokens(table: str = "documents") -> str:
    """DuckDB twin of :func:`mixture_plan_tokens` (integer-only).

    ``n_tokens`` is cast to BIGINT: DuckDB's integer ``sum`` returns
    HUGEINT (int128), which has no pandas dtype and surfaces as
    float64 — so an uncast sum renders '1364.0' against Spark's
    '1364' and hash-mismatches on BYTE-IDENTICAL values. This was the
    actual two-round `mixture_plan` driver seam (r9-r10): the only
    two oracles in the whole 213-query registry that projected a
    HUGEINT column were this family. Corpus token counts fit BIGINT
    (9.2e18) at any realistic scale."""
    return f"""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(regexp_split_to_array(trim(text, ' '), '[ \\t\\n\\r\\f\\x0B]+'))) AS BIGINT) AS n_tokens
    FROM {table} GROUP BY source
    """


def token_budget_select(
    df: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Greedy best-first corpus fill under a per-source TOKEN budget:
    rank each source's documents by composite quality (the exact-
    decimal :func:`webhookdb_spark.operators.text.quality_score`
    arithmetic, engine-portable) descending with a ``doc_id``
    tie-break, and keep documents while the running token sum stays
    within ``budget_tokens`` — the selection step of every
    pretraining-data recipe ("take the best N billion tokens per
    source"), budget-capped by TOKENS where :func:`cap_per_group` caps
    by document count.

    Returns (source, doc_id, n_tokens, cum_tokens) of the selected
    documents.

    Shape: one quality pass, one doc_id-keyed join to recover the
    source, one per-source sort for the running sum (the single wide
    shuffle — a running sum cannot WindowGroupLimit-prune the way a
    rank cap can). 100 TB path: bound the sorted set first with an
    approximate per-source quality cutoff (quantile sketch at
    budget/mean-doc-tokens rank), then run this exact pass on the
    survivors — the cutoff never changes the result, only the sort
    input size."""
    from webhookdb_spark.operators.text import quality_score

    # quality_score keys its output on doc_id, so the id column is
    # fixed — a configurable id_col here would fail inside it anyway.
    q = quality_score(df, text_col).select(
        "doc_id", "n_tokens", "quality_score"
    )
    src = df.select("doc_id", F.col(group_col).alias("source"))
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality_score").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        q.join(src, "doc_id")
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .where(F.col("cum_tokens") <= F.lit(int(budget_tokens)))
        .select(
            "source", "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            "cum_tokens",
        )
    )


def sql_token_budget_select(
    table: str = "documents", budget_tokens: int = 50_000
) -> str:
    """DuckDB twin of :func:`token_budget_select` — same quality
    ranking, same tie-break, same rows-frame running sum."""
    from webhookdb_spark.operators.text import sql_quality_score

    return f"""
    WITH q AS ({sql_quality_score(table)}),
    s AS (
      SELECT d.source, q.doc_id,
             CAST(q.n_tokens AS INTEGER) AS n_tokens,
             CAST(SUM(q.n_tokens) OVER (
               PARTITION BY d.source
               ORDER BY q.quality_score DESC, q.doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM q JOIN {table} d USING (doc_id)
    )
    SELECT source, doc_id, n_tokens, cum_tokens
    FROM s WHERE cum_tokens <= {int(budget_tokens)}
    """


# ---------------------------------------------------------------------------
# Neyman-allocation stratified sampling — variance-optimal subsampling:
# given a total budget, allocate draws to strata proportionally to
# N_h * S_h (stratum size x stddev), the allocation that minimizes the
# variance of the stratified mean estimator. The principled version of
# "sample big noisy sources more".
# ---------------------------------------------------------------------------


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    total_n: int,
) -> DataFrame:
    """(stratum, n_rows, weight, alloc): per-stratum Neyman allocation
    of ``total_n`` draws. ``weight = floor(N_h * sqrt(pop-variance) *
    1e6)`` as a BIGINT so the cross-stratum total is an exact integer
    sum (double addition order would make the allocation
    nondeterministic); ``alloc = min(N_h, (weight * total_n) div
    total_weight)`` in integer arithmetic. Variance comes from exact
    decimal moment sums (the numeric_correlations discipline: quantize
    to decimal(18,6), sum squares as decimal(38,12)) so the only
    doubles are one division and one sqrt — both correctly-rounded
    IEEE, identical in any engine. Bound: |value| < 1e12 and
    N_h * stddev * 1e6 * total_n must fit int64 (documented, checked
    by construction for fixture scales).

    ONE stratum-keyed aggregate + a 1-row total broadcast — the stats
    pass is partial-agg friendly at any scale.
    """
    d = F.col(value_col).cast("string").try_cast("decimal(18,6)")
    per = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(d).alias("n_rows"),
        F.sum(d).alias("s1"),
        F.sum((d * d).cast("decimal(38,12)")).alias("s2"),
    )
    n = F.col("n_rows").cast("double")
    mean = F.col("s1").cast("double") / n
    var = F.greatest(
        F.col("s2").cast("double") / n - mean * mean, F.lit(0.0)
    )
    w = F.floor(n * F.sqrt(var) * 1e6).cast("long")
    base = per.select("stratum", F.col("n_rows").cast("long").alias("n_rows"),
                      w.alias("weight"))
    tot = base.agg(F.sum("weight").alias("_W"))
    return base.crossJoin(F.broadcast(tot)).select(
        "stratum", "n_rows", "weight",
        F.when(F.col("_W") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.col("n_rows"),
                F.expr(f"(weight * {int(total_n)}L) div _W"),
            )
        )
        .cast("long")
        .alias("alloc"),
    )


def sql_neyman_allocation(
    table: str, stratum_col: str, value_col: str, total_n: int
) -> str:
    """DuckDB twin of :func:`neyman_allocation` — same exact decimal
    moments, same integer weight/allocation arithmetic."""
    return f"""
    WITH per AS (
      SELECT {stratum_col} AS stratum,
             COUNT(TRY_CAST(CAST({value_col} AS VARCHAR)
                   AS DECIMAL(18,6))) AS n_rows,
             SUM(TRY_CAST(CAST({value_col} AS VARCHAR)
                 AS DECIMAL(18,6))) AS s1,
             SUM(CAST(TRY_CAST(CAST({value_col} AS VARCHAR)
                      AS DECIMAL(18,6))
                      * TRY_CAST(CAST({value_col} AS VARCHAR)
                        AS DECIMAL(18,6))
                      AS DECIMAL(38,12))) AS s2
      FROM {table} GROUP BY 1
    ), wts AS (
      SELECT stratum, CAST(n_rows AS BIGINT) AS n_rows,
             CAST(floor(CAST(n_rows AS DOUBLE)
                  * sqrt(greatest(
                      CAST(s2 AS DOUBLE) / CAST(n_rows AS DOUBLE)
                      - (CAST(s1 AS DOUBLE) / CAST(n_rows AS DOUBLE))
                        * (CAST(s1 AS DOUBLE) / CAST(n_rows AS DOUBLE)),
                      0.0)) * 1e6) AS BIGINT) AS weight
      FROM per
    ), tot AS (SELECT SUM(weight) AS _W FROM wts)
    SELECT stratum, n_rows, weight,
           CAST(CASE WHEN _W = 0 THEN 0
                ELSE least(n_rows, (weight * {int(total_n)}) // _W)
                END AS BIGINT) AS alloc
    FROM wts, tot
    """


def neyman_sample(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    id_col: str,
    total_n: int,
) -> DataFrame:
    """The draw itself: per-stratum deterministic md5-order pick of
    each stratum's Neyman ``alloc``. Two passes over the data — the
    stats aggregate and the sample filter — which is the inherent
    shape of allocation-by-observed-variance; the pick itself rides
    the same WindowGroupLimit pushdown as :func:`stratified_sample`
    (each task keeps only its local per-stratum top-alloc... bounded
    by the max alloc, never the stratum)."""
    alloc = neyman_allocation(df, stratum_col, value_col, total_n).select(
        F.col("stratum").alias(stratum_col), "alloc"
    )
    w = Window.partitionBy(stratum_col).orderBy(
        sample_order(F.col(id_col)), F.col(id_col)
    )
    return (
        df.join(F.broadcast(alloc), stratum_col)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.col("alloc"))
        .select(id_col, stratum_col, value_col)
    )


def sql_neyman_sample(
    table: str, stratum_col: str, value_col: str, id_col: str, total_n: int
) -> str:
    """DuckDB twin of :func:`neyman_sample`."""
    alloc = sql_neyman_allocation(table, stratum_col, value_col, total_n)
    return f"""
    WITH alloc_ AS ({alloc}),
    ranked AS (
      SELECT {id_col}, {stratum_col}, {value_col},
             row_number() OVER (
               PARTITION BY {stratum_col}
               ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}) AS _rn
      FROM {table}
    )
    SELECT r.{id_col}, r.{stratum_col}, r.{value_col}
    FROM ranked r JOIN alloc_ a ON a.stratum = r.{stratum_col}
    WHERE r._rn <= a.alloc
    """


def prefix_sums(
    df: DataFrame,
    order_cols: list[str],
    sum_cols: list[str],
    bucket_partitions: int = 64,
) -> DataFrame:
    """Running (inclusive) sums of ``sum_cols`` in the total order
    ``order_cols`` — the reusable form of the two-phase distributed
    prefix sum :func:`global_rank` and :func:`sequence_pack` inline
    (range-partition the order, per-range window sums in parallel,
    range totals get metadata-sized running offsets broadcast back).
    Adds ``<col>_cum`` per sum column; never a single-partition
    window. ``order_cols`` must be a total order for deterministic
    output. Sums should be integral/decimal types (the per-range and
    offset additions reassociate — exact types keep that harmless).
    """
    cols = [F.col(c) for c in order_cols]
    d = df.repartitionByRange(bucket_partitions, *cols).withColumn(
        "_psb", F.spark_partition_id()
    ).localCheckpoint(eager=False)
    w = Window.partitionBy("_psb").orderBy(*cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = d
    for c in sum_cols:
        local = local.withColumn(f"_psl_{c}", F.sum(c).over(w))
    wo = Window.orderBy("_psb").rowsBetween(Window.unboundedPreceding, 0)
    offsets = (
        local.groupBy("_psb")
        .agg(*[F.sum(c).alias(f"_pst_{c}") for c in sum_cols])
        .select(
            "_psb",
            *[(F.sum(f"_pst_{c}").over(wo) - F.col(f"_pst_{c}"))
              .alias(f"_pso_{c}") for c in sum_cols],
        )
    )
    out = local.join(F.broadcast(offsets), "_psb")
    for c in sum_cols:
        out = out.withColumn(
            f"{c}_cum", F.col(f"_pso_{c}") + F.col(f"_psl_{c}")
        ).drop(f"_psl_{c}", f"_pso_{c}")
    return out.drop("_psb")
