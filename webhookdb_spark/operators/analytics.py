"""Event-stream and column analytics: funnel conversion, cohort
retention, equi-width histograms, pairwise correlations.

The reference's users run exactly these shapes as raw SQL against
their replicated event tables (the read-only SQL surface,
lib/webhookdb/organization.rb:146-164 — funnel/cohort queries over
webhook event streams are the canonical WebhookDB use case); here they
are first-class scale-safe operators with DuckDB oracle twins.

Distributed shapes:

- ``funnel``: k-step conversion is a chain of k user-keyed joins —
  each step's candidate set joins the previous step's per-user
  first-completion time and keeps strictly-later events. Every join
  and aggregate is keyed on user_id, so all stages share one hash
  partitioning (AQE reuses the exchange); no window ever sees more
  than one user's events. The alternative (collect each user's full
  event array and scan it) is unbounded per row; the join chain is
  bounded and co-partitioned.
- ``cohort_retention``: two aggregates keyed on user_id /
  (cohort_week, period). Weeks are integer epoch-day arithmetic
  (floor(days/7)) — engine-portable, no date_trunc('week') whose week
  start differs across engines.
- ``column_histogram``: two narrow passes — a 1-row min/max aggregate
  broadcast to the scan, then a groupBy on the bin id. Bin assignment
  uses one fixed expression shape so both engines run the identical
  IEEE double sequence.
- ``numeric_correlations``: ONE aggregate pass computing all pairwise
  (n, Sx, Sy, Sxy, Sxx, Syy) moment sums in EXACT decimal arithmetic
  (values quantized to decimal(18,6); products decimal(38,12)) —
  decimal sums are order-independent, so Spark's partial aggregation
  and DuckDB's sequential sum agree bit-for-bit, where double sums
  would drift. The final Pearson division happens once per pair in
  doubles from the exact sums. Magnitudes beyond decimal(18,6) (|x| >=
  1e12) would need a wider quantization — documented bound, same
  trade as profile.py's decimal(38,6) canon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webhookdb_spark.operators.util import scale_out, sql_str_lit

_EPOCH = "1970-01-01"


def _day(col):
    return F.datediff(col.cast("date"), F.lit(_EPOCH).cast("date"))


def funnel(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """(step_idx, step, n_users): how many users completed each funnel
    prefix IN ORDER — step i counts users with an event of type
    ``steps[i]`` strictly after their first completion of step i-1
    (first-touch semantics: each step matches at its earliest valid
    time, the standard funnel definition). ``within_seconds`` bounds
    the whole funnel to a horizon after step 1's first touch.
    """
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("etype"),
        F.col(ts_col).alias("ts"),
    )
    cur = (
        base.where(F.col("etype") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
        .withColumn("t0", F.col("t"))
    )
    out = None
    for i, step in enumerate(steps):
        if i:
            nxt = (
                base.where(F.col("etype") == step)
                .join(cur.select("user_id", "t", "t0"), "user_id")
                .where(F.col("ts") > F.col("t"))
            )
            if within_seconds is not None:
                # the cast lifts TIMESTAMP_NTZ inputs (session TZ is
                # UTC, so the epoch agrees with DuckDB's epoch_us on
                # the same naive values)
                us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
                nxt = nxt.where(
                    us(F.col("ts"))
                    <= us(F.col("t0")) + within_seconds * 1_000_000
                )
            cur = nxt.groupBy("user_id").agg(
                F.min("ts").alias("t"), F.min("t0").alias("t0")
            )
        row = cur.agg(
            F.lit(i).cast("int").alias("step_idx"),
            F.lit(step).alias("step"),
            F.count("*").cast("long").alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def sql_funnel(
    steps: tuple[str, ...],
    table: str = "events",
    within_seconds: int | None = None,
) -> str:
    """DuckDB twin of :func:`funnel` — the same join chain as CTEs."""
    ctes = [
        f"s0 AS (SELECT user_id, min(ts) AS t, min(ts) AS t0 FROM {table}"
        f" WHERE event_type = {sql_str_lit(steps[0])} GROUP BY user_id)"
    ]
    for i, step in enumerate(steps[1:], start=1):
        horizon = (
            f" AND epoch_us(e.ts) <= epoch_us(p.t0) + {within_seconds}000000"
            if within_seconds is not None
            else ""
        )
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(e.ts) AS t, min(p.t0) AS t0"
            f" FROM {table} e JOIN s{i-1} p USING (user_id)"
            f" WHERE e.event_type = {sql_str_lit(step)} AND e.ts > p.t"
            f"{horizon} GROUP BY e.user_id)"
        )
    selects = [
        f"SELECT CAST({i} AS INTEGER) AS step_idx,"
        f" {sql_str_lit(s)} AS step,"
        f" CAST(count(*) AS BIGINT) AS n_users FROM s{i}"
        for i, s in enumerate(steps)
    ]
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_periods: int = 52,
) -> DataFrame:
    """(cohort_week, period, n_users): classic retention matrix —
    users grouped by the epoch-week of their FIRST event, counted
    distinct in each later week-offset they were active.
    ``cohort_week`` is integer weeks since 1970-01-01 (engine-portable;
    multiply by 7 for the date). Two user-keyed aggregates; the
    distinct count is per (cohort, period) — narrow keys, map-side
    combinable after the first shuffle."""
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.floor(_day(F.col(ts_col)) / 7).cast("int").alias("wk"),
    )
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        ev.join(first, "user_id")
        .withColumn("period", (F.col("wk") - F.col("cohort_week")).cast("int"))
        .where(F.col("period") <= max_periods)
        .groupBy("cohort_week", "period")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


def sql_cohort_retention(table: str = "events", max_periods: int = 52) -> str:
    """DuckDB twin of :func:`cohort_retention` — same epoch-week
    integer arithmetic."""
    day = f"datediff('day', DATE '{_EPOCH}', CAST(ts AS DATE))"
    return f"""
    WITH ev AS (
      SELECT user_id, CAST(floor(({day}) / 7) AS INTEGER) AS wk FROM {table}
    ), first AS (
      SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY user_id
    )
    SELECT f.cohort_week, CAST(e.wk - f.cohort_week AS INTEGER) AS period,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM ev e JOIN first f USING (user_id)
    WHERE e.wk - f.cohort_week <= {max_periods}
    GROUP BY f.cohort_week, period
    """


def column_histogram(
    df: DataFrame, col: str, n_bins: int = 20
) -> DataFrame:
    """(bin, lo, hi, n): equi-width histogram over a numeric column —
    the range-profile pass of a data audit. Pass 1 is a 1-row min/max
    aggregate that broadcasts onto the scan; pass 2 groups by the bin
    id (at most ``n_bins`` keys). Only non-empty bins are returned.
    ``lo``/``hi`` are floor-quantized to 1e-6 for cross-engine hash
    stability; the bin assignment keeps ONE expression shape —
    ``floor(((x - min) * n) / (max - min))`` clamped to n-1 — so both
    engines execute the identical IEEE double sequence."""
    x = F.col(col).cast("double")
    mm = df.agg(
        F.min(x).alias("_mn"), F.max(x).alias("_mx")
    )
    width = F.col("_mx") - F.col("_mn")
    raw_bin = F.floor(((x - F.col("_mn")) * F.lit(n_bins)) / width)
    bin_id = (
        F.when(width == 0, F.lit(0))
        .otherwise(F.least(raw_bin, F.lit(n_bins - 1)))
        .cast("int")
    )
    lo = F.col("_mn") + (F.col("bin").cast("double") * width) / F.lit(n_bins)
    hi = F.col("_mn") + ((F.col("bin") + 1).cast("double") * width) / F.lit(n_bins)
    # floor is ulp-safe here (r10 audit): lo/hi come from min/max
    # through +,-,*,/ only — every op correctly-rounded IEEE, so the
    # pre-quantization double is bit-identical in both engines (no
    # libm estimate, no order-dependent sum in the chain).
    q = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return (
        df.where(x.isNotNull())
        .crossJoin(F.broadcast(mm))
        .select(bin_id.alias("bin"), "_mn", "_mx")
        .groupBy("bin", "_mn", "_mx")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "bin", q(lo).alias("lo"), q(hi).alias("hi"), "n"
        )
    )


def sql_column_histogram(
    col: str, table: str, n_bins: int = 20
) -> str:
    """DuckDB twin of :func:`column_histogram` — identical expression
    shapes."""
    x = f"CAST({col} AS DOUBLE)"
    return f"""
    WITH mm AS (
      SELECT min({x}) AS mn, max({x}) AS mx FROM {table}
    ), binned AS (
      SELECT CAST(CASE WHEN mm.mx - mm.mn = 0 THEN 0
                  ELSE least(floor((({x} - mm.mn) * {n_bins}) / (mm.mx - mm.mn)),
                             {n_bins} - 1) END AS INTEGER) AS bin,
             mm.mn, mm.mx
      FROM {table} CROSS JOIN mm WHERE {x} IS NOT NULL
    )
    SELECT bin,
           floor((mn + (CAST(bin AS DOUBLE) * (mx - mn)) / {n_bins}) * 1e6) / 1e6 AS lo,
           floor((mn + (CAST(bin + 1 AS DOUBLE) * (mx - mn)) / {n_bins}) * 1e6) / 1e6 AS hi,
           CAST(count(*) AS BIGINT) AS n
    FROM binned GROUP BY bin, mn, mx
    """


def numeric_correlations(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_a, col_b, n, corr): pairwise Pearson correlation over the
    given numeric columns, pairwise-complete (rows where either side
    is NULL are excluded for that pair), corr floor-quantized to 1e-6.

    ONE aggregate pass computes every pair's moment sums in EXACT
    decimal arithmetic — quantize each value to decimal(18,6), sum
    products as decimal(38,12) — so the result is independent of
    partial-aggregation order (double sums would make corr
    nondeterministic at the 1e-15 level and break the value-hash
    oracle). Bound: |x| must fit decimal(18,6) (< 1e12); wider data
    needs a wider quantization."""
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]

    def dec(c):
        return F.col(c).cast("string").try_cast("decimal(18,6)")

    aggs = []
    for a, b in pairs:
        ok = dec(a).isNotNull() & dec(b).isNotNull()
        x = F.when(ok, dec(a))
        y = F.when(ok, dec(b))
        tag = f"{a}__{b}"
        aggs += [
            F.count(x).alias(f"n_{tag}"),
            F.sum(x).alias(f"sx_{tag}"),
            F.sum(y).alias(f"sy_{tag}"),
            F.sum((x * y).cast("decimal(38,12)")).alias(f"sxy_{tag}"),
            F.sum((x * x).cast("decimal(38,12)")).alias(f"sxx_{tag}"),
            F.sum((y * y).cast("decimal(38,12)")).alias(f"syy_{tag}"),
        ]
    # Partial aggregation of the 6*|pairs| decimal moment sums happens
    # in the scan stage; scale_out spreads it when the input is one fat
    # file (no-op on a many-split scan). Project to the needed columns
    # first so the round-robin exchange moves only them. Decimal sums
    # are order-independent, so the result is partitioning-invariant.
    moments = scale_out(df.select(*cols)).agg(*aggs)
    # All pair rows come from the ONE moments row via a single explode
    # — a per-pair union would re-execute the aggregate (and rescan the
    # table) once per pair, which the plan gate
    # test_correlations_single_scan_single_aggregate pins against.
    structs = []
    for a, b in pairs:
        tag = f"{a}__{b}"
        n = F.col(f"n_{tag}").cast("double")
        sx = F.col(f"sx_{tag}").cast("double")
        sy = F.col(f"sy_{tag}").cast("double")
        sxy = F.col(f"sxy_{tag}").cast("double")
        sxx = F.col(f"sxx_{tag}").cast("double")
        syy = F.col(f"syy_{tag}").cast("double")
        # greatest(.., 0): the moment sums are exact but the final
        # double products can land 1 ulp below zero on a
        # zero-variance column; sqrt(NaN) semantics then differ
        # between engines, a clamped 0 does not
        denom = F.sqrt(F.greatest(n * sxx - sx * sx, F.lit(0.0))) * F.sqrt(
            F.greatest(n * syy - sy * sy, F.lit(0.0))
        )
        # floor is ulp-safe here (r10 audit): moments are exact
        # decimals, and the double chain is +,-,*,/ and sqrt — ALL
        # correctly-rounded IEEE (sqrt is not a libm estimate), so
        # both engines floor the bit-identical double.
        corr = F.when(
            denom != 0, F.floor(((n * sxy - sx * sy) / denom) * 1e6) / 1e6
        )
        structs.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"n_{tag}").cast("long").alias("n"),
                corr.alias("corr"),
            )
        )
    return moments.select(
        F.explode(F.array(*structs)).alias("_r")
    ).select("_r.*")


def sql_numeric_correlations(cols: list[str], table: str) -> str:
    """DuckDB twin of :func:`numeric_correlations` — same exact-decimal
    moment sums, same final double arithmetic."""
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    parts = []
    for a, b in pairs:
        da = f"TRY_CAST(CAST({a} AS VARCHAR) AS DECIMAL(18,6))"
        db = f"TRY_CAST(CAST({b} AS VARCHAR) AS DECIMAL(18,6))"
        ok = f"({da} IS NOT NULL AND {db} IS NOT NULL)"
        # operand width 19: DuckDB multiplies at the INPUT width (a
        # (18,6)x(18,6) product overflows before widening); 19+19=38
        # puts the exact product in DECIMAL(38,12) like Spark's
        # (18,6)x(18,6)->(37,12)
        x = f"CAST(CASE WHEN {ok} THEN {da} END AS DECIMAL(19,6))"
        y = f"CAST(CASE WHEN {ok} THEN {db} END AS DECIMAL(19,6))"
        nn = f"CAST(count({x}) AS DOUBLE)"
        sx = f"CAST(sum({x}) AS DOUBLE)"
        sy = f"CAST(sum({y}) AS DOUBLE)"
        sxy = f"CAST(sum(CAST(({x}) * ({y}) AS DECIMAL(38,12))) AS DOUBLE)"
        sxx = f"CAST(sum(CAST(({x}) * ({x}) AS DECIMAL(38,12))) AS DOUBLE)"
        syy = f"CAST(sum(CAST(({y}) * ({y}) AS DECIMAL(38,12))) AS DOUBLE)"
        denom = (
            f"(sqrt(greatest({nn} * {sxx} - {sx} * {sx}, 0.0))"
            f" * sqrt(greatest({nn} * {syy} - {sy} * {sy}, 0.0)))"
        )
        parts.append(f"""
        SELECT {sql_str_lit(a)} AS col_a, {sql_str_lit(b)} AS col_b,
               CAST(count({x}) AS BIGINT) AS n,
               CASE WHEN {denom} != 0
               THEN floor((({nn} * {sxy} - {sx} * {sy}) / {denom}) * 1e6) / 1e6
               END AS corr
        FROM {table}""")
    return " UNION ALL ".join(parts)


def pareto_front(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> DataFrame:
    """(id, x, y): the 2-D Pareto front (skyline) maximizing both
    columns — the multi-objective data-selection primitive ("keep
    documents no other document beats on BOTH quality and length").
    Dominance: r is dropped iff some r' has x' >= x, y' >= y and beats
    it strictly in at least one. Equal (x, y) pairs do not dominate
    each other — duplicates of a front point are all kept.

    Distributed shape (never the O(n²) dominance join the SQL oracle
    runs): decompose the test as  keep r ⇔ y = max(y) over r's exact-x
    group AND y > max(y) over all strictly-greater x. The second term
    is a SUFFIX MAX over the x-GROUP table, computed with the
    distributed prefix-scan pattern (sequence packing's trick):
    equi-width buckets on x, a per-bucket running max window
    (partitioned — never a global single-partition window), and an
    n_buckets-row offset join for the cross-bucket carry. Everything
    shuffles on x or bucket keys; the only driver data is the 1-row
    min/max."""
    from pyspark.sql.window import Window

    s = df.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    ).where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    # per-exact-x groups: the front keeps only each group's max-y rows
    groups = s.groupBy("x").agg(F.max("y").alias("gy"))
    mm = groups.agg(F.min("x").alias("_mn"), F.max("x").alias("_mx"))
    width = F.col("_mx") - F.col("_mn")
    bucket = (
        F.when(width == 0, F.lit(0))
        .otherwise(
            F.least(
                F.floor(((F.col("x") - F.col("_mn")) * n_buckets) / width),
                F.lit(n_buckets - 1),
            )
        )
        .cast("int")
    )
    gb = groups.crossJoin(F.broadcast(mm)).select("x", "gy", bucket.alias("b"))
    # within-bucket suffix max of gy over strictly-greater x
    w_in = (
        Window.partitionBy("b")
        .orderBy(F.col("x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    gb = gb.withColumn("in_suffix", F.max("gy").over(w_in))
    # cross-bucket carry: max gy of every HIGHER bucket (n_buckets rows)
    bmax = gb.groupBy("b").agg(F.max("gy").alias("bm"))
    w_b = (
        Window.orderBy(F.col("b").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = bmax.withColumn("carry", F.max("bm").over(w_b)).select("b", "carry")
    suffix = (
        gb.join(F.broadcast(carry), "b")
        .select(
            "x", "gy",
            F.greatest(
                F.coalesce("in_suffix", F.lit(float("-inf"))),
                F.coalesce("carry", F.lit(float("-inf"))),
            ).alias("suffix_max"),
        )
    )
    front_groups = suffix.where(
        (F.col("suffix_max") == float("-inf")) | (F.col("gy") > F.col("suffix_max"))
    )
    return (
        s.join(front_groups.select("x", "gy"), "x")
        .where(F.col("y") == F.col("gy"))
        .select("id", "x", "y")
    )


def sql_pareto_front(
    x_col: str, y_col: str, table: str, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`pareto_front` — the O(n log n) sort-based
    skyline sweep (group to exact-x max-y, one suffix-max window over
    descending x, keep groups beating every strictly-greater-x group).
    The previous O(n²) NOT-EXISTS dominance oracle made the sf0.1
    cross-engine sweep infeasible (~3h at 600k rows; VERDICT r11 Next
    #4); :func:`sql_pareto_front_direct` keeps that
    correct-by-construction form, and tests pin sweep ≡ direct."""
    return f"""
    WITH s AS (
      SELECT {id_col} AS id, CAST({x_col} AS DOUBLE) AS x,
             CAST({y_col} AS DOUBLE) AS y
      FROM {table}
      WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
    ), g AS (
      SELECT x, max(y) AS gy FROM s GROUP BY x
    ), sweep AS (
      SELECT x, gy, max(gy) OVER (ORDER BY x DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS suffix_max
      FROM g
    )
    SELECT s.id, s.x, s.y
    FROM s JOIN sweep ON s.x = sweep.x AND s.y = sweep.gy
    WHERE sweep.suffix_max IS NULL OR sweep.gy > sweep.suffix_max
    """


def sql_pareto_front_direct(
    x_col: str, y_col: str, table: str, id_col: str = "doc_id"
) -> str:
    """The direct O(n²) NOT-EXISTS dominance DEFINITION of the skyline
    (correct by construction). Not the registry oracle — quadratic in
    the table — but the ground truth the sweep oracle is pinned
    against (tests/test_property.py)."""
    return f"""
    SELECT r.{id_col} AS id, CAST(r.{x_col} AS DOUBLE) AS x,
           CAST(r.{y_col} AS DOUBLE) AS y
    FROM {table} r
    WHERE r.{x_col} IS NOT NULL AND r.{y_col} IS NOT NULL
      AND NOT EXISTS (
        SELECT 1 FROM {table} s
        WHERE s.{x_col} >= r.{x_col} AND s.{y_col} >= r.{y_col}
          AND (s.{x_col} > r.{x_col} OR s.{y_col} > r.{y_col})
      )
    """


def co_occurrence(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 20,
    min_support: int = 2,
) -> DataFrame:
    """(item_a, item_b, n_baskets, confidence_ppm): top-k most frequent
    item PAIRS across baskets (market-basket affinity), with
    ``confidence_ppm = support(a,b) * 1e6 div support(a)`` in integer
    arithmetic (exact, oracle-hashable — float ratios would drift).

    Distributed shape: the pair stream is a SELF-JOIN ON THE BASKET
    KEY (co-partitioned — one shuffle each side, never an all-pairs
    cross); ``item_a < item_b`` halves the stream; pair counting is a
    map-side-combinable aggregate on (a, b); per-item supports join
    back broadcast (distinct items are dimension-sized next to the
    pair stream). A basket with B items emits B(B-1)/2 pairs — bound B
    upstream for degenerate baskets (carts, not crawls)."""
    s = (
        df.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .distinct()
        # Three consumers (both join sides + the support aggregate)
        # re-executed the scan+distinct subtree — two of them under
        # broadcast builds, where exchange reuse never applies. Pin it
        # once; blocks are freed when the RDD is GC'd (same posture as
        # pagerank's edge pin).
        .localCheckpoint(eager=True)
    )
    a = s.select("basket", F.col("item").alias("item_a"))
    b = s.select("basket", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("n_baskets"))
        .where(F.col("n_baskets") >= min_support)
    )
    support = s.groupBy("item").agg(F.count("*").cast("long").alias("sup"))
    out = (
        pairs.join(
            F.broadcast(support.withColumnRenamed("item", "item_a")), "item_a"
        )
        .select(
            "item_a", "item_b", "n_baskets",
            F.expr("n_baskets * 1000000L div sup").alias("confidence_ppm"),
        )
    )
    top = out.orderBy(
        F.col("n_baskets").desc(), F.col("item_a").asc(), F.col("item_b").asc()
    ).limit(k)
    return top


def sql_co_occurrence(
    basket_col: str,
    item_col: str,
    table: str,
    k: int = 20,
    min_support: int = 2,
) -> str:
    """DuckDB twin of :func:`co_occurrence` — same integer confidence,
    same deterministic top-k tie-break."""
    return f"""
    WITH s AS (
      SELECT DISTINCT {basket_col} AS basket, {item_col} AS item FROM {table}
    ), pairs AS (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(count(*) AS BIGINT) AS n_baskets
      FROM s a JOIN s b USING (basket)
      WHERE a.item < b.item
      GROUP BY a.item, b.item
      HAVING count(*) >= {min_support}
    ), sup AS (
      SELECT item, CAST(count(*) AS BIGINT) AS sup FROM s GROUP BY item
    )
    SELECT item_a, item_b, n_baskets,
           CAST(n_baskets * 1000000 // sup AS BIGINT) AS confidence_ppm
    FROM pairs JOIN sup ON pairs.item_a = sup.item
    ORDER BY n_baskets DESC, item_a ASC, item_b ASC
    LIMIT {k}
    """


def outliers_iqr(
    df: DataFrame,
    col: str,
    id_col: str,
    factor_tenths: int = 15,
) -> DataFrame:
    """(id, value, lo_fence, hi_fence, side): rows outside the Tukey
    fences [q1 - f*IQR, q3 + f*IQR] — the standard numeric-outlier
    audit. ``factor_tenths`` keeps the fence factor an exact 1-dp
    decimal literal (15 = 1.5), and the quartiles are quantized to
    6-dp decimal straight off the percentile BEFORE any fence
    arithmetic: the engines' quantile INTERPOLATION formulas differ
    in the last ulp (Spark ``a + f*(b-a)`` vs DuckDB ``(1-f)*a + f*b``
    — the winsorize bug class), so fence membership decided on raw
    doubles could flip between engines. After quantization every
    fence op (subtract, multiply by 1.5, compare against the 7-dp
    quantized value) is EXACT decimal arithmetic, identical anywhere.
    Two passes: a 1-row quartile aggregate broadcast onto the scan,
    then the fence filter — the filter is the only per-row work, so
    at 100 TB this costs one profile + one scan. Fences are
    floor-quantized to 1e-6 for hash stability.

    DOMAIN BOUND: |q1| and |q3| must be < 1e12 — the quantized
    quartiles ride in decimal(18,6), and a magnitude past its 12
    integer digits try_casts to NULL, making the fence predicate NULL
    and the result silently empty (same bound as neyman_allocation's
    documented contract). Pre-scale wider-ranged columns before the
    audit."""
    x = F.col(col).cast("double")
    q = df.agg(
        F.percentile(x, F.lit(0.25)).alias("_q1"),
        F.percentile(x, F.lit(0.75)).alias("_q3"),
    )
    q1d = F.col("_q1").cast("string").try_cast("decimal(18,6)")
    q3d = F.col("_q3").cast("string").try_cast("decimal(18,6)")
    fac = F.lit(f"{factor_tenths / 10:.1f}").cast("decimal(4,1)")
    lo = q1d - (q3d - q1d) * fac  # decimal scale 7, exact
    hi = q3d + (q3d - q1d) * fac
    xd = x.cast("string").try_cast("decimal(28,7)")
    # floor is ulp-safe here (r10 audit): the fences are EXACT decimal
    # values, so decimal*1e6 and its floor are exact in both engines
    # — no double enters until the final display cast.
    qq = lambda c: (F.floor(c * 1000000) / F.lit(1e6)).cast("double")  # noqa: E731
    return (
        df.where(x.isNotNull())
        .crossJoin(F.broadcast(q))
        .where((xd < lo) | (xd > hi))
        .select(
            F.col(id_col).alias("id"),
            x.alias("value"),
            qq(lo).alias("lo_fence"),
            qq(hi).alias("hi_fence"),
            F.when(xd < lo, F.lit("low")).otherwise(F.lit("high")).alias("side"),
        )
    )


def sql_outliers_iqr(
    col: str, id_col: str, table: str, factor_tenths: int = 15
) -> str:
    """DuckDB twin of :func:`outliers_iqr` — same 6-dp quartile
    quantization before the exact-decimal fence arithmetic (see the
    Spark docstring: the engines' quantile interpolation formulas
    differ in the last ulp)."""
    x = f"CAST({col} AS DOUBLE)"
    fac = f"CAST({factor_tenths / 10:.1f} AS DECIMAL(4,1))"
    return f"""
    WITH q AS (
      SELECT quantile_cont({x}, 0.25) AS q1,
             quantile_cont({x}, 0.75) AS q3
      FROM {table}
    ), qd AS (
      SELECT TRY_CAST(CAST(q1 AS VARCHAR) AS DECIMAL(18,6)) AS q1d,
             TRY_CAST(CAST(q3 AS VARCHAR) AS DECIMAL(18,6)) AS q3d
      FROM q
    ), f AS (
      SELECT q1d - (q3d - q1d) * {fac} AS lo,
             q3d + (q3d - q1d) * {fac} AS hi
      FROM qd
    )
    SELECT {id_col} AS id, {x} AS value,
           CAST(floor(f.lo * 1000000) / 1e6 AS DOUBLE) AS lo_fence,
           CAST(floor(f.hi * 1000000) / 1e6 AS DOUBLE) AS hi_fence,
           CASE WHEN TRY_CAST(CAST({x} AS VARCHAR) AS DECIMAL(28,7)) < f.lo
                THEN 'low' ELSE 'high' END AS side
    FROM {table} CROSS JOIN f
    WHERE {x} IS NOT NULL
      AND (TRY_CAST(CAST({x} AS VARCHAR) AS DECIMAL(28,7)) < f.lo
           OR TRY_CAST(CAST({x} AS VARCHAR) AS DECIMAL(28,7)) > f.hi)
    """


def activity_gaps(
    events: DataFrame,
    min_gap_seconds: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, gap_start, gap_end, gap_seconds): silences longer than
    ``min_gap_seconds`` inside each user's event stream — the
    monitoring primitive behind "did this integration stop sending?".
    One user-keyed window (LAG over the per-user ts order) and a
    filter; gap lengths in integer epoch seconds (floor), so the twin
    hashes exactly."""
    from pyspark.sql.window import Window

    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    lagged = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("_ts"),
        F.lag(ts_col).over(
            Window.partitionBy(user_col).orderBy(ts_col)
        ).alias("_prev"),
    )
    gap_s = F.floor((us(F.col("_ts")) - us(F.col("_prev"))) / 1_000_000)
    return (
        lagged.where(F.col("_prev").isNotNull())
        .where(gap_s >= min_gap_seconds)
        .select(
            "user_id",
            F.col("_prev").alias("gap_start"),
            F.col("_ts").alias("gap_end"),
            gap_s.cast("long").alias("gap_seconds"),
        )
    )


def sql_activity_gaps(
    table: str = "events", min_gap_seconds: int = 3600
) -> str:
    """DuckDB twin of :func:`activity_gaps` — same LAG, same integer
    epoch arithmetic."""
    return f"""
    WITH lagged AS (
      SELECT user_id, ts AS gap_end,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS gap_start
      FROM {table}
    )
    SELECT user_id, gap_start, gap_end,
           CAST(floor((epoch_us(gap_end) - epoch_us(gap_start)) / 1000000) AS BIGINT) AS gap_seconds
    FROM lagged
    WHERE gap_start IS NOT NULL
      AND floor((epoch_us(gap_end) - epoch_us(gap_start)) / 1000000) >= {min_gap_seconds}
    """


# ---------------------------------------------------------------------------
# Calendar gap-fill / forward-fill and trailing rolling windows
# ---------------------------------------------------------------------------
#
# Webhook event streams are sparse in calendar time; dashboards and
# training-data recency features need a DENSE series ("revenue per day
# including zero days", "last observed value as of day d", "trailing
# 7-day volume"). Distributed shape for both operators: one groupBy on
# (user, day) — a single shuffle keyed on the user — then per-user
# spine generation via sequence/explode (no driver loop, no cross
# join), a co-keyed left join, and user-partitioned windows that reuse
# the same hash partitioning. Daily sums are quantized to
# decimal(18,6) via the canonical string route (see
# numeric_correlations above) so partial-aggregation order can't drift
# the values; doubles appear only in the final cast.


def _dec_value(c: str):
    return F.col(c).cast("string").try_cast("decimal(18,6)")


def _daily(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """(user_id, day_num, events_n, _dsum decimal) per active day."""
    return (
        events.select(
            F.col(user_col).alias("user_id"),
            _day(F.col(ts_col)).alias("day_num"),
            _dec_value(value_col).alias("_v"),
        )
        .groupBy("user_id", "day_num")
        .agg(
            F.count(F.lit(1)).alias("events_n"),
            F.sum("_v").alias("_dsum"),
        )
    )


def gapfill_daily(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Dense per-user daily series between each user's first and last
    active day: zero-filled event counts, the day's exact value sum
    (NULL on silent days), and the forward-filled last observed sum.

    Spine = per-user sequence(min_day, max_day) exploded — generated
    distributed, proportional to each user's span, never a global
    calendar cross join.
    """
    from pyspark.sql.window import Window

    daily = _daily(events, user_col, ts_col, value_col)
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day_num").alias("_d0"), F.max("day_num").alias("_d1"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("_d0"), F.col("_d1"))).alias("day_num"),
        )
    )
    joined = spine.join(daily, ["user_id", "day_num"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_num")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NULL-free output contract: silent days report 0.0 (a day whose
    # every value is NULL also lands on 0.0 — documented conflation);
    # ff carries the last ACTIVE day's sum and is defined from day one
    # because the spine starts at each user's first active day.
    daily_value = F.col("_dsum").cast("double")
    return joined.select(
        "user_id",
        F.date_add(F.lit(_EPOCH).cast("date"), F.col("day_num")).alias("day"),
        F.coalesce(F.col("events_n"), F.lit(0)).cast("long").alias("events_n"),
        F.coalesce(daily_value, F.lit(0.0)).alias("daily_value"),
        F.coalesce(
            F.last(daily_value, ignorenulls=True).over(w), F.lit(0.0)
        ).alias("ff_value"),
    )


def sql_gapfill_daily(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    """DuckDB twin of :func:`gapfill_daily` — same integer day
    arithmetic, same decimal quantization, same IGNORE NULLS fill."""
    return f"""
    WITH daily AS (
      SELECT {user_col} AS user_id,
             date_diff('day', DATE '1970-01-01', CAST({ts_col} AS DATE)) AS day_num,
             COUNT(*) AS events_n,
             SUM(TRY_CAST(CAST({value_col} AS VARCHAR) AS DECIMAL(18,6))) AS _dsum
      FROM {table}
      GROUP BY 1, 2
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(_d0, _d1)) AS day_num
      FROM (SELECT user_id, min(day_num) AS _d0, max(day_num) AS _d1
            FROM daily GROUP BY user_id)
    )
    SELECT s.user_id,
           DATE '1970-01-01' + CAST(s.day_num AS INTEGER) AS day,
           COALESCE(d.events_n, 0) AS events_n,
           COALESCE(CAST(d._dsum AS DOUBLE), 0.0) AS daily_value,
           COALESCE(last_value(CAST(d._dsum AS DOUBLE) IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day_num
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 0.0) AS ff_value
    FROM spine s LEFT JOIN daily d
      ON s.user_id = d.user_id AND s.day_num = d.day_num
    """


def rolling_daily_sum(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user trailing ``window_days``-day value sum on each ACTIVE
    day, via a value-based RANGE frame over the integer day number —
    silent days inside the trailing window are skipped by the frame
    itself, no spine materialization needed. Sums stay exact decimal
    until the final double cast.
    """
    from pyspark.sql.window import Window

    daily = _daily(events, user_col, ts_col, value_col)
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_num")
        .rangeBetween(-(window_days - 1), 0)
    )
    return daily.select(
        "user_id",
        F.date_add(F.lit(_EPOCH).cast("date"), F.col("day_num")).alias("day"),
        F.coalesce(F.col("_dsum").cast("double"), F.lit(0.0)).alias(
            "daily_value"
        ),
        F.coalesce(F.sum("_dsum").over(w).cast("double"), F.lit(0.0)).alias(
            "rolling_value"
        ),
        F.sum("events_n").over(w).cast("long").alias("rolling_n"),
    )


def sql_rolling_daily_sum(
    table: str = "events",
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    """DuckDB twin of :func:`rolling_daily_sum` — same RANGE frame on
    the integer day number, same exact-decimal sums."""
    prec = window_days - 1
    return f"""
    WITH daily AS (
      SELECT {user_col} AS user_id,
             date_diff('day', DATE '1970-01-01', CAST({ts_col} AS DATE)) AS day_num,
             COUNT(*) AS events_n,
             SUM(TRY_CAST(CAST({value_col} AS VARCHAR) AS DECIMAL(18,6))) AS _dsum
      FROM {table}
      GROUP BY 1, 2
    )
    SELECT user_id,
           DATE '1970-01-01' + CAST(day_num AS INTEGER) AS day,
           COALESCE(CAST(_dsum AS DOUBLE), 0.0) AS daily_value,
           COALESCE(CAST(sum(_dsum) OVER w AS DOUBLE), 0.0) AS rolling_value,
           CAST(sum(events_n) OVER w AS BIGINT) AS rolling_n
    FROM daily
    WINDOW w AS (PARTITION BY user_id ORDER BY day_num
                 RANGE BETWEEN {prec} PRECEDING AND CURRENT ROW)
    """


def categorical_dependence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """One row (col_a, col_b, n, mi, h_a, h_b, nmi): mutual
    information and marginal entropies (nats) between two categorical
    columns — the feature-dependence / drift audit a data pipeline
    runs before keeping a redundant label. Rows where either side is
    NULL are excluded.

    Distributed shape: ONE groupBy on the (a, b) pair, then every
    further aggregate runs over the CELL table (|V_a|x|V_b| rows, not
    data rows): vocabulary-keyed marginal joins (broadcast) and a
    1-row total broadcast onto the cells. Determinism: each cell's
    p*ln-ratio term is computed in doubles from exact long counts,
    scaled by 1e12 and ROUNDED to a LONG (round, not floor: ln is a
    libm estimate whose last ulp differs between engines, and floor
    flips at integral boundaries — worst at the near-zero terms of
    near-independent columns), so the cross-cell sum is integer-exact
    and independent of partial-aggregation order (a double sum would
    drift at the 1e-15 level and break the value-hash oracle); mi/h
    land floor-quantized to 1e-6 (safe: exact-long inputs through
    correctly-rounded ops only), and nmi derives from the
    already-quantized values.
    """
    pairs = df.where(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
    joint = pairs.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("_nab"))
    ma = joint.groupBy("_a").agg(F.sum("_nab").alias("_na"))
    mb = joint.groupBy("_b").agg(F.sum("_nab").alias("_nb"))
    tot = joint.agg(F.sum("_nab").alias("_n"))

    cells = (
        joint.join(F.broadcast(ma), "_a")
        .join(F.broadcast(mb), "_b")
        .crossJoin(F.broadcast(tot))
    )
    nab = F.col("_nab").cast("double")
    na = F.col("_na").cast("double")
    nb = F.col("_nb").cast("double")
    n = F.col("_n").cast("double")
    # round, not floor, at the term layer: ln is a libm ESTIMATE (JVM
    # and glibc differ in the last ulp), and for near-independent
    # columns mi_term hovers at ±ulp around 0 where floor flips
    # between 0 and -1 across engines (the mixture_plan ulp class,
    # r10). round maps both sides of an integer to the same long.
    mi_term = (nab / n) * F.log((nab * n) / (na * nb))
    scaled = F.round(mi_term * F.lit(1e12), 0).cast("long")
    mi_sum = cells.agg(
        F.sum(scaled).alias("_mi12"), F.max("_n").alias("_n")
    )

    def h_of(marg, cnt_col):
        m = marg.crossJoin(F.broadcast(tot))
        p = F.col(cnt_col).cast("double") / F.col("_n").cast("double")
        t = F.round((-p * F.log(p)) * F.lit(1e12), 0).cast("long")
        return m.agg(F.sum(t).alias("_h12"))

    ha = h_of(ma, "_na")
    hb = h_of(mb, "_nb")

    # q6/nmi keep floor: their inputs are exact longs (identical
    # cross-engine once the term layer rounds) pushed through
    # correctly-rounded /,*,sqrt only — bit-identical in any IEEE
    # engine, so a deterministic floor cannot disagree.
    q6 = lambda c: F.floor(c / F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    out = (
        mi_sum.crossJoin(ha.select(F.col("_h12").alias("_ha12")))
        .crossJoin(hb.select(F.col("_h12").alias("_hb12")))
        .select(
            F.lit(col_a).alias("col_a"),
            F.lit(col_b).alias("col_b"),
            F.col("_n").cast("long").alias("n"),
            q6(F.col("_mi12")).alias("mi"),
            q6(F.col("_ha12")).alias("h_a"),
            q6(F.col("_hb12")).alias("h_b"),
        )
    )
    nmi = F.when(
        (F.col("h_a") > 0) & (F.col("h_b") > 0),
        F.floor(
            F.col("mi") / F.sqrt(F.col("h_a") * F.col("h_b")) * 1e6
        )
        / 1e6,
    ).otherwise(F.lit(0.0))
    return out.withColumn("nmi", nmi)


def sql_categorical_dependence(table: str, col_a: str, col_b: str) -> str:
    """DuckDB twin of :func:`categorical_dependence` — identical
    long-scaled term sums and quantization."""
    return f"""
    WITH pairs AS (
      SELECT {col_a} AS _a, {col_b} AS _b FROM {table}
      WHERE {col_a} IS NOT NULL AND {col_b} IS NOT NULL
    ),
    joint AS (SELECT _a, _b, count(*) AS _nab FROM pairs GROUP BY 1, 2),
    ma AS (SELECT _a, sum(_nab) AS _na FROM joint GROUP BY 1),
    mb AS (SELECT _b, sum(_nab) AS _nb FROM joint GROUP BY 1),
    tot AS (SELECT sum(_nab) AS _n FROM joint),
    mi AS (
      SELECT sum(CAST(round(
               ((CAST(_nab AS DOUBLE) / CAST(_n AS DOUBLE))
                * ln((CAST(_nab AS DOUBLE) * CAST(_n AS DOUBLE))
                     / (CAST(_na AS DOUBLE) * CAST(_nb AS DOUBLE)))) * 1e12, 0
             ) AS BIGINT)) AS _mi12,
             max(_n) AS _n
      FROM joint JOIN ma USING (_a) JOIN mb USING (_b) CROSS JOIN tot
    ),
    ha AS (
      SELECT sum(CAST(round(
               (-(CAST(_na AS DOUBLE) / CAST(_n AS DOUBLE))
                * ln(CAST(_na AS DOUBLE) / CAST(_n AS DOUBLE))) * 1e12, 0
             ) AS BIGINT)) AS _ha12
      FROM ma CROSS JOIN tot
    ),
    hb AS (
      SELECT sum(CAST(round(
               (-(CAST(_nb AS DOUBLE) / CAST(_n AS DOUBLE))
                * ln(CAST(_nb AS DOUBLE) / CAST(_n AS DOUBLE))) * 1e12, 0
             ) AS BIGINT)) AS _hb12
      FROM mb CROSS JOIN tot
    ),
    q AS (
      SELECT '{col_a}' AS col_a, '{col_b}' AS col_b,
             CAST(_n AS BIGINT) AS n,
             floor(_mi12 / 1e6) / 1e6 AS mi,
             floor(_ha12 / 1e6) / 1e6 AS h_a,
             floor(_hb12 / 1e6) / 1e6 AS h_b
      FROM mi CROSS JOIN ha CROSS JOIN hb
    )
    SELECT *,
           CASE WHEN h_a > 0 AND h_b > 0
                THEN floor(mi / sqrt(h_a * h_b) * 1e6) / 1e6
                ELSE 0.0 END AS nmi
    FROM q
    """


def distribution_drift(
    df: DataFrame,
    cat_col: str,
    split_predicate: Column,
) -> DataFrame:
    """Per-category drift audit between two snapshots of the SAME
    stream (rows matching ``split_predicate`` = snapshot P, the rest =
    snapshot Q): one row per category with both proportions and its
    Jensen-Shannon divergence contribution, plus the category's
    absolute-difference share — "which categories shifted between
    crawls/weeks". The total JS divergence is the sum of the js_term
    column (bounded by ln 2; symmetric; defined even where one side is
    zero, unlike KL).

    Shape: ONE groupBy on the category computing both snapshots'
    counts via conditional sums, then per-category arithmetic against
    broadcast 1-row totals — a second scan or a self-join would double
    the read for no reason. Determinism: per-category js terms are
    long-scaled (1e12) and ROUNDED (ln's libm ulp puts near-identical
    snapshots at ±ulp of 0, where floor flips sign across engines)
    before any cross-category consumer sums them, same discipline as
    categorical_dependence; the pure-division proportions are
    floor-quantized to 1e-6 (bit-identical inputs, safe).
    """
    counts = (
        df.where(F.col(cat_col).isNotNull())
        .groupBy(F.col(cat_col).alias("category"))
        .agg(
            F.sum(F.when(split_predicate, 1).otherwise(0)).alias("_np"),
            F.sum(F.when(split_predicate, 0).otherwise(1)).alias("_nq"),
        )
    )
    tot = counts.agg(
        F.sum("_np").alias("_tp"), F.sum("_nq").alias("_tq")
    )
    cells = counts.crossJoin(F.broadcast(tot))
    p = F.col("_np").cast("double") / F.col("_tp").cast("double")
    q = F.col("_nq").cast("double") / F.col("_tq").cast("double")
    m = (p + q) / F.lit(2.0)
    kl_p = F.when(F.col("_np") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
    kl_q = F.when(F.col("_nq") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    js_term = (kl_p + kl_q) / F.lit(2.0)
    # p/q/abs_diff keep floor: pure correctly-rounded divisions of
    # exact longs are bit-identical cross-engine. js_term carries ln
    # (libm estimate, engines differ by an ulp; near-identical
    # snapshots put it at ±ulp of 0 where floor flips sign) → round.
    q6 = lambda c: F.floor(c * F.lit(1e6)) / F.lit(1e6)  # noqa: E731
    return cells.select(
        "category",
        F.col("_np").cast("long").alias("n_p"),
        F.col("_nq").cast("long").alias("n_q"),
        q6(p).alias("p"),
        q6(q).alias("q"),
        (F.round(js_term * F.lit(1e12), 0) / F.lit(1e12)).alias("js_term"),
        q6(F.abs(p - q)).alias("abs_diff"),
    )


def sql_distribution_drift(
    table: str, cat_col: str, split_predicate_sql: str
) -> str:
    """DuckDB twin of :func:`distribution_drift` — same conditional
    one-pass counts, same JS-term arithmetic and quantization."""
    return f"""
    WITH counts AS (
      SELECT {cat_col} AS category,
             sum(CASE WHEN {split_predicate_sql} THEN 1 ELSE 0 END) AS _np,
             sum(CASE WHEN {split_predicate_sql} THEN 0 ELSE 1 END) AS _nq
      FROM {table}
      WHERE {cat_col} IS NOT NULL
      GROUP BY 1
    ),
    tot AS (SELECT sum(_np) AS _tp, sum(_nq) AS _tq FROM counts),
    cells AS (
      SELECT category, _np, _nq,
             CAST(_np AS DOUBLE) / CAST(_tp AS DOUBLE) AS p,
             CAST(_nq AS DOUBLE) / CAST(_tq AS DOUBLE) AS q
      FROM counts CROSS JOIN tot
    )
    SELECT category,
           CAST(_np AS BIGINT) AS n_p,
           CAST(_nq AS BIGINT) AS n_q,
           floor(p * 1e6) / 1e6 AS p,
           floor(q * 1e6) / 1e6 AS q,
           round(((CASE WHEN _np > 0 THEN p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END
                   + CASE WHEN _nq > 0 THEN q * ln(q / ((p + q) / 2.0)) ELSE 0.0 END)
                  / 2.0) * 1e12, 0) / 1e12 AS js_term,
           floor(abs(p - q) * 1e6) / 1e6 AS abs_diff
    FROM cells
    """


def rolling_anomalies(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_days: int = 7,
    z_micro_threshold: int = 3_000_000,
    min_window_n: int = 5,
) -> DataFrame:
    """Trailing-window z-score anomaly detection: an event is
    anomalous when its value sits more than ``z_micro_threshold/1e6``
    population standard deviations from the mean of the SAME user's
    events in the preceding ``window_days`` (the event itself and
    same-microsecond peers excluded — the frame ends 1 microsecond
    before, so the baseline never contains the point under test).
    Returns only the anomalies: (event_id, user_id, ts, value,
    n_window, z_micro) with z floor-quantized to 1e-6.

    Determinism discipline: the window ORDER key is exact integer
    epoch microseconds (unix_micros / epoch_us — sub-second
    timestamps make a seconds key collapse distinct events into RANGE
    peer groups differently per engine); the moment sums are exact
    decimals, so the only doubles are the final mean/variance/sqrt
    chain, identical IEEE in both engines. Windows with fewer than
    ``min_window_n`` baseline events or zero variance flag nothing.

    100 TB shape: ONE shuffle on the user key; the RANGE frame is
    value-based so silent periods cost nothing, and state per user is
    the in-frame running sums. The hot-user skew case is the same
    AQE/salting story as every user-keyed window.
    """
    from pyspark.sql.window import Window

    d = F.col(value_col).cast("string").try_cast("decimal(18,6)")
    b = events.select(
        "event_id", F.col(user_col).alias("user_id"), ts_col,
        F.col(value_col).alias("value"),
        # parquet loads ts as TIMESTAMP_NTZ; the session TZ is pinned
        # UTC, so the LTZ cast is instant-identical and unlocks
        # unix_micros (which rejects NTZ input)
        F.unix_micros(F.col(ts_col).cast("timestamp_ltz")).alias("_us"),
        d.alias("_d"),
        (d * d).cast("decimal(38,12)").alias("_dd"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("_us")
        .rangeBetween(-window_days * 86_400 * 1_000_000, -1)
    )
    n = F.count("_d").over(w)
    s1 = F.sum("_d").over(w)
    s2 = F.sum("_dd").over(w)
    scored = b.select(
        "event_id", "user_id", ts_col, "value",
        n.cast("long").alias("n_window"),
        s1.alias("_s1"), s2.alias("_s2"),
    )
    nn = F.col("n_window").cast("double")
    mean = F.col("_s1").cast("double") / nn
    var = F.greatest(F.col("_s2").cast("double") / nn - mean * mean, F.lit(0.0))
    sigma = F.sqrt(var)
    # round, not floor: z lands EXACTLY on integral micro units for
    # simple series (sigma = 1, integer deviations), and the engines'
    # decimal->double conversion differs by an ulp there (the
    # winsorize/Welch bug class) — floor would flip both the value and
    # the threshold-filter membership.
    z_micro = F.round(
        F.abs(F.col("value") - mean) / sigma * 1e6, 0
    ).cast("long")
    return (
        scored.where(F.col("n_window") >= min_window_n)
        .select(
            "event_id", "user_id", ts_col, "value", "n_window",
            F.when(sigma > 0, z_micro).alias("z_micro"),
        )
        .where(F.col("z_micro") > z_micro_threshold)
    )


def sql_rolling_anomalies(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_days: int = 7,
    z_micro_threshold: int = 3_000_000,
    min_window_n: int = 5,
) -> str:
    """DuckDB twin of :func:`rolling_anomalies` — same microsecond
    RANGE frame, same exact-decimal moments, same double chain."""
    span = window_days * 86_400 * 1_000_000
    return f"""
    WITH b AS (
      SELECT event_id, {user_col} AS user_id, {ts_col}, {value_col} AS value,
             epoch_us({ts_col}) AS _us,
             TRY_CAST(CAST({value_col} AS VARCHAR) AS DECIMAL(18,6)) AS _d,
             CAST(TRY_CAST(CAST({value_col} AS VARCHAR) AS DECIMAL(18,6))
                  * TRY_CAST(CAST({value_col} AS VARCHAR) AS DECIMAL(18,6))
                  AS DECIMAL(38,12)) AS _dd
      FROM {table}
    ), scored AS (
      SELECT event_id, user_id, {ts_col}, value,
             CAST(count(_d) OVER w AS BIGINT) AS n_window,
             sum(_d) OVER w AS _s1,
             sum(_dd) OVER w AS _s2
      FROM b
      WINDOW w AS (PARTITION BY user_id ORDER BY _us
                   RANGE BETWEEN {span} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, {ts_col}, value, n_window,
           CAST(round(abs(value - CAST(_s1 AS DOUBLE) / CAST(n_window AS DOUBLE))
                / sqrt(greatest(
                    CAST(_s2 AS DOUBLE) / CAST(n_window AS DOUBLE)
                    - (CAST(_s1 AS DOUBLE) / CAST(n_window AS DOUBLE))
                      * (CAST(_s1 AS DOUBLE) / CAST(n_window AS DOUBLE)),
                    0.0)) * 1e6) AS BIGINT) AS z_micro
    FROM scored
    WHERE n_window >= {min_window_n}
      AND sqrt(greatest(
            CAST(_s2 AS DOUBLE) / CAST(n_window AS DOUBLE)
            - (CAST(_s1 AS DOUBLE) / CAST(n_window AS DOUBLE))
              * (CAST(_s1 AS DOUBLE) / CAST(n_window AS DOUBLE)), 0.0)) > 0
      AND round(abs(value - CAST(_s1 AS DOUBLE) / CAST(n_window AS DOUBLE))
            / sqrt(greatest(
                CAST(_s2 AS DOUBLE) / CAST(n_window AS DOUBLE)
                - (CAST(_s1 AS DOUBLE) / CAST(n_window AS DOUBLE))
                  * (CAST(_s1 AS DOUBLE) / CAST(n_window AS DOUBLE)),
                0.0)) * 1e6) > {z_micro_threshold}
    ORDER BY event_id
    """


def multi_touch_attribution(
    events: DataFrame,
    conv_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view", "signup"),
    window_days: int = 7,
) -> DataFrame:
    """Position-weighted (U-shaped) multi-touch attribution: every
    conversion distributes exactly 1,000,000 credit-ppm over the same
    user's touches in the lookback window — 40%/40% to the first and
    last touch, the middle 20% split evenly over interior touches
    (integer division, remainder to the LAST interior touch so the
    per-conversion total is exactly 1e6); one touch takes 100%, two
    take 50/50, zero touches credit a '(none)' bucket. Touch order is
    (ts, type, event_id) — fully deterministic under ties. Returns
    per touch type: (touch_type, n_touchpoints, total_credit_ppm,
    attributed_value_micro) where attributed_value_micro =
    sum(conversion_value * credit_ppm) in exact decimal (divide by
    1e6 for value units).

    Scale shape: ONE user-keyed equi-join (the window predicate is a
    post-filter on the joined pair — touches per user per week is
    bounded in any real event stream), one window per conversion key,
    one touch-type aggregate. The hot-user case is the standard
    skew-join story.
    """
    from pyspark.sql.window import Window

    dv = F.col("value").cast("string").try_cast("decimal(18,6)")
    conv = events.where(F.col("event_type") == conv_type).select(
        F.col("event_id").alias("_cid"),
        F.col("user_id").alias("_cuser"),
        F.col("ts").alias("_cts"),
        dv.alias("_cval"),
    )
    touch = events.where(F.col("event_type").isin(*touch_types)).select(
        F.col("user_id").alias("_tuser"),
        F.col("ts").alias("_tts"),
        F.col("event_type").alias("_ttype"),
        F.col("event_id").alias("_tid"),
    )
    span_us = window_days * 86_400 * 1_000_000
    cus = F.unix_micros(F.col("_cts").cast("timestamp_ltz"))
    tus = F.unix_micros(F.col("_tts").cast("timestamp_ltz"))
    j = conv.join(
        touch,
        (F.col("_cuser") == F.col("_tuser"))
        & (tus <= cus)
        & (cus - tus <= span_us),
        "left",
    )
    w = Window.partitionBy("_cid").orderBy("_tts", "_ttype", "_tid")
    n = F.count("_tid").over(Window.partitionBy("_cid"))
    r = F.row_number().over(w)
    base_mid = F.expr("200000 div (_n - 2)")
    credit = (
        F.when(F.col("_tid").isNull(), F.lit(1_000_000))
        .when(F.col("_n") == 1, F.lit(1_000_000))
        .when(F.col("_n") == 2, F.lit(500_000))
        .when(F.col("_r") == 1, F.lit(400_000))
        .when(F.col("_r") == F.col("_n"), F.lit(400_000))
        .when(
            F.col("_r") == F.col("_n") - 1,
            base_mid + F.expr("200000 - (200000 div (_n - 2)) * (_n - 2)"),
        )
        .otherwise(base_mid)
    )
    scored = (
        j.withColumn("_n", n)
        .withColumn("_r", r)
        .withColumn("_credit", credit.cast("long"))
    )
    return (
        scored.groupBy(
            F.coalesce(F.col("_ttype"), F.lit("(none)")).alias("touch_type")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touchpoints"),
            F.sum("_credit").cast("long").alias("total_credit_ppm"),
            F.sum(
                (F.col("_cval") * F.col("_credit")).cast("decimal(38,6)")
            ).cast("double").alias("attributed_value_micro"),
        )
    )


def sql_multi_touch_attribution(
    table: str = "events",
    conv_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view", "signup"),
    window_days: int = 7,
) -> str:
    """DuckDB twin of :func:`multi_touch_attribution`."""
    span_us = window_days * 86_400 * 1_000_000
    tt = ", ".join(f"'{t}'" for t in touch_types)
    return f"""
    WITH conv AS (
      SELECT event_id AS _cid, user_id AS _cuser, ts AS _cts,
             TRY_CAST(CAST(value AS VARCHAR) AS DECIMAL(18,6)) AS _cval
      FROM {table} WHERE event_type = '{conv_type}'
    ), touch AS (
      SELECT user_id AS _tuser, ts AS _tts, event_type AS _ttype,
             event_id AS _tid
      FROM {table} WHERE event_type IN ({tt})
    ), j AS (
      SELECT c.*, t._tts, t._ttype, t._tid
      FROM conv c LEFT JOIN touch t
        ON c._cuser = t._tuser
       AND epoch_us(t._tts) <= epoch_us(c._cts)
       AND epoch_us(c._cts) - epoch_us(t._tts) <= {span_us}
    ), ranked AS (
      SELECT *,
             count(_tid) OVER (PARTITION BY _cid) AS _n,
             row_number() OVER (
               PARTITION BY _cid ORDER BY _tts, _ttype, _tid) AS _r
      FROM j
    ), credited AS (
      SELECT _ttype, _cval,
             CAST(CASE
               WHEN _tid IS NULL THEN 1000000
               WHEN _n = 1 THEN 1000000
               WHEN _n = 2 THEN 500000
               WHEN _r = 1 THEN 400000
               WHEN _r = _n THEN 400000
               WHEN _r = _n - 1
                 THEN (200000 // (_n - 2)) + (200000 - (200000 // (_n - 2)) * (_n - 2))
               ELSE 200000 // (_n - 2)
             END AS BIGINT) AS _credit
      FROM ranked
    )
    SELECT COALESCE(_ttype, '(none)') AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_touchpoints,
           CAST(SUM(_credit) AS BIGINT) AS total_credit_ppm,
           CAST(CAST(SUM(_cval * _credit) AS DECIMAL(38,6)) AS DOUBLE)
             AS attributed_value_micro
    FROM credited
    GROUP BY 1
    """


def winsorize_summary(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_pct: float = 0.05,
    hi_pct: float = 0.95,
) -> DataFrame:
    """Per-group winsorization audit: interpolated percentile bounds
    (Spark ``percentile`` / DuckDB ``quantile_cont`` share the rank
    p*(n-1) definition), rows clipped below/above, and the
    exact-decimal sum of the CLIPPED column. ALL clip decisions and
    the clamp itself run at 6-dp decimal resolution — the engines'
    interpolation FORMULAS differ in the last ulp (Spark computes
    ``a + f*(b - a)``, exact on ties; DuckDB computes
    ``(1-f)*a + f*b``, which drifts one ulp on tied values — found by
    the hypothesis cross-engine pin), so a raw-double ``v < lo``
    comparison can flip between engines. Quantizing bound and value
    through the VARCHAR->decimal(18,6) path first makes the predicate
    and the clamp engine-portable, and the decimal sum is
    partial-agg-order-proof. The outlier-taming pass a feature
    pipeline runs before normalization; two group-keyed aggregates,
    the bounds re-attached by a broadcast-sized join.

    DOMAIN BOUND: |value| must be < 1e12 — values and percentile
    bounds ride in decimal(18,6), and a magnitude past its 12 integer
    digits try_casts to NULL, which silently changes the clamp (a
    NULL bound makes least/greatest pass values through). Same
    contract as neyman_allocation and outliers_iqr; pre-scale
    wider-ranged columns first.
    """
    v = F.col(value_col)

    def q6(c):
        return c.cast("string").try_cast("decimal(18,6)")

    bounds = df.groupBy(group_col).agg(
        F.percentile(v, F.lit(lo_pct)).alias("_lo"),
        F.percentile(v, F.lit(hi_pct)).alias("_hi"),
    )
    j = df.select(group_col, value_col).join(F.broadcast(bounds), group_col)
    vq, loq, hiq = q6(v), q6(F.col("_lo")), q6(F.col("_hi"))
    clipped = F.least(F.greatest(vq, loq), hiq)  # exact decimal clamp
    return (
        j.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min(loq).cast("double").alias("lo_bound"),
            F.min(hiq).cast("double").alias("hi_bound"),
            F.sum((vq < loq).cast("long")).cast("long")
            .alias("n_clipped_low"),
            F.sum((vq > hiq).cast("long")).cast("long")
            .alias("n_clipped_high"),
            # the decimal sum is exact at 6dp; round(cast(double), 6)
            # erases the engines' decimal->double conversion ulp
            # (DuckDB multiplies by 1e-6 — inexact; the JVM divides)
            F.round(F.sum(clipped).cast("double"), 6)
            .alias("winsorized_sum"),
        )
    )


def sql_winsorize_summary(
    table: str,
    group_col: str,
    value_col: str,
    lo_pct: float = 0.05,
    hi_pct: float = 0.95,
) -> str:
    """DuckDB twin of :func:`winsorize_summary` — same 6-dp decimal
    quantization of value AND bounds before every clip decision (see
    the Spark docstring: the engines' quantile interpolation formulas
    differ in the last ulp)."""
    q = "TRY_CAST(CAST({c} AS VARCHAR) AS DECIMAL(18,6))"
    vq, loq, hiq = (q.format(c=c) for c in (value_col, "b._lo", "b._hi"))
    return f"""
    WITH bounds AS (
      SELECT {group_col},
             quantile_cont({value_col}, {lo_pct}) AS _lo,
             quantile_cont({value_col}, {hi_pct}) AS _hi
      FROM {table} GROUP BY {group_col}
    ), j AS (
      SELECT t.{group_col},
             {vq} AS _vq, {loq} AS _loq, {hiq} AS _hiq,
             least(greatest({vq}, {loq}), {hiq}) AS _clip
      FROM {table} t JOIN bounds b USING ({group_col})
    )
    SELECT {group_col},
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(_loq) AS DOUBLE) AS lo_bound,
           CAST(MIN(_hiq) AS DOUBLE) AS hi_bound,
           CAST(SUM(CASE WHEN _vq < _loq THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(SUM(CASE WHEN _vq > _hiq THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high,
           round(CAST(SUM(_clip) AS DOUBLE), 6) AS winsorized_sum
    FROM j GROUP BY {group_col}
    """


def groupwise_ols(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Group-wise simple linear regression — the SQL-standard
    REGR_SLOPE / REGR_INTERCEPT / REGR_R2 family, hardened for
    cross-engine determinism: the built-in regr_* aggregates sum
    DOUBLES (partial-aggregation order drifts the last bits, breaking
    a value-hash oracle), so the moments here are exact decimals (the
    numeric_correlations discipline) and only the final slope /
    intercept / r2 divisions run in doubles, floor-quantized to ppm.
    Pairwise-complete (rows with NULL on either side drop). Returns
    (group, n, slope_ppm, intercept_ppm, r2_ppm) — r2 NULL when x or
    y has zero variance, slope/intercept NULL when x does. ONE
    group-keyed aggregate; partial-agg friendly at any scale.
    """

    def dec(c):
        return F.col(c).cast("string").try_cast("decimal(18,6)")

    ok = dec(x_col).isNotNull() & dec(y_col).isNotNull()
    x = F.when(ok, dec(x_col))
    y = F.when(ok, dec(y_col))
    m = df.groupBy(group_col).agg(
        F.count(x).cast("long").alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum((x * y).cast("decimal(38,12)")).alias("_sxy"),
        F.sum((x * x).cast("decimal(38,12)")).alias("_sxx"),
        F.sum((y * y).cast("decimal(38,12)")).alias("_syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    slope = cov / vx
    intercept = (sy - slope * sx) / n
    r2 = (cov * cov) / (vx * vy)
    # round, not floor: perfect fits (slope/r2 exactly integral ppm —
    # any 2-point group, x==y) are common, and the engines'
    # decimal->double conversions differ by an ulp around exact
    # integers (the winsorize/Welch/autocorrelation bug class, caught
    # by the hypothesis cross-engine pin).
    return m.select(
        group_col, "n",
        F.when(vx != 0, F.round(slope * 1e6, 0)).cast("long")
        .alias("slope_ppm"),
        F.when(vx != 0, F.round(intercept * 1e6, 0)).cast("long")
        .alias("intercept_ppm"),
        F.when((vx != 0) & (vy != 0), F.round(r2 * 1e6, 0)).cast("long")
        .alias("r2_ppm"),
    )


def sql_groupwise_ols(table: str, group_col: str, x_col: str, y_col: str) -> str:
    """DuckDB twin of :func:`groupwise_ols` — same exact-decimal
    moments, same double chain, same guards."""
    dx = f"TRY_CAST(CAST({x_col} AS VARCHAR) AS DECIMAL(18,6))"
    dy = f"TRY_CAST(CAST({y_col} AS VARCHAR) AS DECIMAL(18,6))"
    return f"""
    WITH m AS (
      SELECT {group_col},
             CAST(COUNT(CASE WHEN {dx} IS NOT NULL AND {dy} IS NOT NULL
                        THEN 1 END) AS BIGINT) AS n,
             SUM(CASE WHEN {dy} IS NOT NULL THEN {dx} END) AS _sx,
             SUM(CASE WHEN {dx} IS NOT NULL THEN {dy} END) AS _sy,
             SUM(CAST({dx} * {dy} AS DECIMAL(38,12))) AS _sxy,
             SUM(CASE WHEN {dy} IS NOT NULL
                 THEN CAST({dx} * {dx} AS DECIMAL(38,12)) END) AS _sxx,
             SUM(CASE WHEN {dx} IS NOT NULL
                 THEN CAST({dy} * {dy} AS DECIMAL(38,12)) END) AS _syy
      FROM {table} GROUP BY {group_col}
    )
    SELECT {group_col}, n,
      CASE WHEN CAST(n AS DOUBLE) * CAST(_sxx AS DOUBLE)
                - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE) != 0 THEN
        CAST(round((CAST(n AS DOUBLE) * CAST(_sxy AS DOUBLE)
             - CAST(_sx AS DOUBLE) * CAST(_sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(_sxx AS DOUBLE)
                - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE)) * 1e6) AS BIGINT)
      END AS slope_ppm,
      CASE WHEN CAST(n AS DOUBLE) * CAST(_sxx AS DOUBLE)
                - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE) != 0 THEN
        CAST(round((CAST(_sy AS DOUBLE)
             - ((CAST(n AS DOUBLE) * CAST(_sxy AS DOUBLE)
                 - CAST(_sx AS DOUBLE) * CAST(_sy AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(_sxx AS DOUBLE)
                   - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE)))
               * CAST(_sx AS DOUBLE)) / CAST(n AS DOUBLE) * 1e6) AS BIGINT)
      END AS intercept_ppm,
      CASE WHEN (CAST(n AS DOUBLE) * CAST(_sxx AS DOUBLE)
                 - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE)) != 0
            AND (CAST(n AS DOUBLE) * CAST(_syy AS DOUBLE)
                 - CAST(_sy AS DOUBLE) * CAST(_sy AS DOUBLE)) != 0 THEN
        CAST(round(((CAST(n AS DOUBLE) * CAST(_sxy AS DOUBLE)
             - CAST(_sx AS DOUBLE) * CAST(_sy AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(_sxy AS DOUBLE)
                - CAST(_sx AS DOUBLE) * CAST(_sy AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(_sxx AS DOUBLE)
                 - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(_syy AS DOUBLE)
                   - CAST(_sy AS DOUBLE) * CAST(_sy AS DOUBLE))) * 1e6)
             AS BIGINT)
      END AS r2_ppm
    FROM m
    """


# Poisson(1) CDF thresholds in ppm for the deterministic Poisson
# bootstrap: a uniform ppm draw maps to the smallest k with
# u < CDF(k)*1e6. LITERAL constants (floor(CDF*1e6)) — no runtime
# exp/factorial, no libm seam.
_POISSON1_CDF_PPM = (367879, 735758, 919698, 981011, 996340, 999405, 999916)


def poisson_bootstrap_ci(
    df: DataFrame,
    id_col: str,
    value_col: str,
    n_replicates: int = 100,
    lo_pct: float = 0.025,
    hi_pct: float = 0.975,
) -> DataFrame:
    """Deterministic Poisson bootstrap of the mean — the distributed
    bootstrap (each row's multiplicity in replicate b is an
    independent Poisson(1) draw, so no replicate ever needs a global
    resample): the draw is the md5-uniform of (id, b) pushed through
    LITERAL Poisson(1) CDF thresholds, so every replicate is
    reproducible in any engine. Replicate means use exact decimal
    weighted sums (order-independent); the CI is the exact
    interpolated percentile over the replicate means. Returns ONE row
    (n_rows, mean, boot_lo, boot_hi), all doubles rounded to 6dp.

    Scale shape: one explode by n_replicates (the multiplicity column
    rides the row — data is never physically resampled), one
    replicate-keyed aggregate (perfectly partial-agg friendly), one
    percentile over n_replicates values. The replicate explode IS the
    cost (measured: ~100x the base scan; hashing is NOT the
    bottleneck — packing 4 draws per digest was measured neutral and
    rejected for complexity), and it parallelizes embarrassingly.
    """
    d = F.col(value_col).cast("string").try_cast("decimal(18,6)")
    b = df.select(F.col(id_col).alias("_id"), d.alias("_d")).where(
        d.isNotNull()
    )
    # The n_replicates-way explode + per-(id,b) md5 + CASE ladder all
    # run in the SCAN stage; a coarse input (one row group) would pin
    # that 100x-amplified work to one task. scale_out is a no-op on an
    # already-parallel scan and costs one narrow shuffle of the (id,
    # value) pairs — 1/n_replicates of the work it parallelizes.
    b = scale_out(b)
    reps = b.select(
        "_id", "_d",
        F.explode(F.sequence(F.lit(0), F.lit(n_replicates - 1))).alias("_b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("_id").cast("string"),
                                  F.col("_b").cast("string"))), 1, 7),
            16, 10,
        ).cast("long") % 1_000_000
    )
    w = None
    for k, thr in enumerate(_POISSON1_CDF_PPM):
        arm = F.when(u < thr, F.lit(k))
        w = arm if w is None else w.when(u < thr, F.lit(k))
    w = w.otherwise(F.lit(len(_POISSON1_CDF_PPM)))
    per = (
        reps.select("_b", "_d", w.alias("_w"))
        .groupBy("_b")
        .agg(
            F.sum(F.col("_d") * F.col("_w")).alias("_swx"),
            F.sum("_w").cast("long").alias("_sw"),
        )
        .where(F.col("_sw") > 0)
        .select(
            (F.col("_swx").cast("double") / F.col("_sw").cast("double"))
            .alias("_m")
        )
    )
    base = b.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.sum("_d").cast("double") / F.count(F.lit(1))).alias("_mean"),
    )
    ci = per.agg(
        F.percentile(F.col("_m"), F.lit(lo_pct)).alias("_lo"),
        F.percentile(F.col("_m"), F.lit(hi_pct)).alias("_hi"),
    )
    return base.crossJoin(F.broadcast(ci)).select(
        "n_rows",
        F.round("_mean", 6).alias("mean"),
        F.round("_lo", 6).alias("boot_lo"),
        F.round("_hi", 6).alias("boot_hi"),
    )


def sql_poisson_bootstrap_ci(
    table: str,
    id_col: str,
    value_col: str,
    n_replicates: int = 100,
    lo_pct: float = 0.025,
    hi_pct: float = 0.975,
) -> str:
    """DuckDB twin of :func:`poisson_bootstrap_ci`."""
    arms = " ".join(
        f"WHEN u < {thr} THEN {k}"
        for k, thr in enumerate(_POISSON1_CDF_PPM)
    )
    d = f"TRY_CAST(CAST({value_col} AS VARCHAR) AS DECIMAL(18,6))"
    return f"""
    WITH b AS (
      SELECT {id_col} AS _id, {d} AS _d FROM {table}
      WHERE {d} IS NOT NULL
    ), reps AS (
      SELECT _id, _d, CAST(t.b AS INTEGER) AS _b,
             CAST('0x' || substr(md5(CAST(_id AS VARCHAR) || ':' ||
                  CAST(CAST(t.b AS INTEGER) AS VARCHAR)), 1, 7) AS BIGINT)
               % 1000000 AS u
      FROM b, unnest(range({n_replicates})) AS t(b)
    ), weighted AS (
      SELECT _b, _d, CASE {arms} ELSE {len(_POISSON1_CDF_PPM)} END AS _w
      FROM reps
    ), per AS (
      SELECT CAST(SUM(_d * _w) AS DOUBLE) / CAST(SUM(_w) AS DOUBLE) AS _m
      FROM weighted GROUP BY _b HAVING SUM(_w) > 0
    ), base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(_d) AS DOUBLE) / COUNT(*) AS _mean
      FROM b
    ), ci AS (
      SELECT quantile_cont(_m, {lo_pct}) AS _lo,
             quantile_cont(_m, {hi_pct}) AS _hi
      FROM per
    )
    SELECT n_rows, round(_mean, 6) AS mean,
           round(_lo, 6) AS boot_lo, round(_hi, 6) AS boot_hi
    FROM base CROSS JOIN ci
    """
