"""Temporal joins Spark lacks as built-ins: as-of and point-in-interval
(range) joins, implemented with scale-safe plans.

SURVEY §2.5 notes the reference engine has neither (users hand-write
them in SQL); these are the Spark-first constructions a 100 TB event
store actually needs, because the naive formulations collapse at scale:

- **as-of** written as an inequality join (`l.ts >= r.ts` + keep max)
  is a per-key cross product — O(|L|·|R|) pairs per key before the
  window prunes them. The union-merge construction here is ONE shuffle
  on the key and a single ordered window pass: right rows are merged
  into the left stream and each left row picks up the running "last
  right row seen" with `last(ignorenulls)` — linear in rows, skew
  bounded by key cardinality, no pair blow-up.
- **range** (point-in-interval) written as a raw inequality join is the
  same cross product. Bucketing intervals to a fixed grid turns it
  into an equi-join on (key, grid_cell) + an exact residual filter;
  with cell width >= max interval width every interval lands in at
  most 2 cells, so the join fan-out is bounded by 2x the true match
  candidates. (This is the published grid-bucketing strategy behind
  interval-join support in Flink and Databricks' range-join hints.)

Both are deterministic (ties broken by an id ordering) and carry full
value-hash oracles — DuckDB's native ``ASOF JOIN`` verifies the as-of
semantics are the standard ones, not a private variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    suffix: str = "_r",
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join in pandas ``merge_asof``'s three directions:
    ``backward`` (default — latest right row with ``right.ts <=
    left.ts``), ``forward`` (earliest right row with ``right.ts >=
    left.ts``), and ``nearest`` (the closer of the two; ties go
    backward, pandas's rule). NULLs when no match on the key.

    Plan shape: tag both sides, union, one window partitioned by
    ``key`` ordered by (ts, side, right-row): at equal timestamps the
    right row sorts FIRST so it is visible to a left row at the same
    instant (the <= convention, matching DuckDB/pandas ``merge_asof``
    backward semantics). ``tolerance_seconds`` nulls out matches older
    than the horizon after the fact — same contract as pandas.

    All carried columns ride in ONE struct and the window takes
    ``last(ignorenulls)`` over that struct, so every carried field
    comes from the SAME matched right row — a right row whose carried
    column is NULL must not inherit an older row's value for just that
    field (per-column ``last(ignorenulls)`` would mix rows, diverging
    from DuckDB ASOF / pandas merge_asof when right columns contain
    NULLs).

    ``forward`` is the mirrored traversal (ts desc; right rows still
    visible at the equal instant; struct order flipped so equal-ts
    ties deterministically pick the LOWEST right struct, matching an
    ``ORDER BY ts_r, tie_cols`` oracle). ``nearest`` runs both
    single-shuffle passes and picks per row — two shuffles total,
    still no per-key cross product.
    """
    if direction == "nearest":
        b = asof_join(left, right, key, ts, right_cols, suffix,
                      tolerance_seconds, "backward")
        bwd = {c: f"_b_{c}" for c in [f"{ts}{suffix}"]
               + [f"{c}{suffix}" for c in right_cols]}
        for old, new in bwd.items():
            b = b.withColumnRenamed(old, new)
        f = asof_join(b, right, key, ts, right_cols, suffix,
                      tolerance_seconds, "forward")
        # distances in MICROSECONDS, not truncated seconds: the DuckDB
        # twin compares fractional epoch() (µs-exact), so on sub-second
        # data a whole-second cast could flip the pick for candidates
        # within ~2s of equidistant
        ts_l = F.unix_micros(F.col(ts).cast("timestamp"))
        d_b = ts_l - F.unix_micros(F.col(f"_b_{ts}{suffix}").cast("timestamp"))
        d_f = F.unix_micros(F.col(f"{ts}{suffix}").cast("timestamp")) - ts_l
        take_b = F.col(f"{ts}{suffix}").isNull() | (
            F.col(f"_b_{ts}{suffix}").isNotNull() & (d_b <= d_f)
        )
        out_cols = [f"{ts}{suffix}"] + [f"{c}{suffix}" for c in right_cols]
        return f.select(
            *left.columns,
            *[
                F.when(take_b, F.col(f"_b_{c}")).otherwise(F.col(c)).alias(c)
                for c in out_cols
            ],
        )
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join direction {direction!r}")
    from pyspark.sql.types import StructField, StructType

    rts = f"{ts}{suffix}"
    lcols = [c for c in left.columns]
    carried = [rts] + [f"{c}{suffix}" for c in right_cols]
    rtype = StructType(
        [StructField(rts, right.schema[ts].dataType)]
        + [StructField(f"{c}{suffix}", right.schema[c].dataType)
           for c in right_cols]
    )
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(rtype).alias("_rrow"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(ts).alias(rts),
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        ).alias("_rrow"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (key, ts)],
    )
    u = l_tag.unionByName(r_tag)
    # struct comparison is lexicographic by field, so ties between
    # right rows at the same instant resolve deterministically:
    # backward keeps the HIGHEST struct (last traversed ascending),
    # forward the LOWEST (last traversed in the mirrored order)
    if direction == "backward":
        order = [F.col(ts).asc(), F.col("_side").asc(), F.col("_rrow").asc()]
    else:
        order = [F.col(ts).desc(), F.col("_side").asc(), F.col("_rrow").desc()]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.select(
        *lcols,
        "_side",
        F.last("_rrow", ignorenulls=True).over(w).alias("_m"),
    ).where(F.col("_side") == 1)
    if tolerance_seconds is not None:
        # microseconds, matching the nearest-direction comparison: a
        # whole-second truncation would admit matches up to 1s past
        # the horizon on sub-second data
        ts_l = F.unix_micros(F.col(ts).cast("timestamp"))
        ts_r = F.unix_micros(F.col("_m")[rts].cast("timestamp"))
        gap = ts_l - ts_r if direction == "backward" else ts_r - ts_l
        horizon = gap <= F.lit(int(tolerance_seconds * 1_000_000))
        return matched.select(
            *lcols,
            *[F.when(horizon, F.col("_m")[c]).alias(c) for c in carried],
        )
    return matched.select(
        *lcols, *[F.col("_m")[c].alias(c) for c in carried]
    )


def sql_asof_join_events(
    table: str = "events",
    left_type: str = "purchase",
    right_type: str = "click",
) -> str:
    """DuckDB twin of the event-attribution as-of query, written with
    DuckDB's NATIVE ``ASOF LEFT JOIN`` — the oracle proves the Spark
    construction reproduces the standard backward as-of semantics."""
    return f"""
    SELECT l.event_id, l.user_id, l.ts,
           r.ts AS ts_r, r.event_id AS event_id_r, r.value AS value_r
    FROM (SELECT * FROM {table} WHERE event_type = '{left_type}') l
    ASOF LEFT JOIN (SELECT * FROM {table} WHERE event_type = '{right_type}') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    grid_seconds: int = 300,
    interval_cols: tuple[str, ...] = (),
    suffix: str = "_i",
) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair on the same
    key with ``start <= point_ts < end``. Intervals wider than
    ``grid_seconds`` raise — widen the grid or split the interval (the
    2-cells-per-interval bound is what keeps the fan-out linear).
    """
    p_cell = F.floor(F.col(point_ts).cast("timestamp").cast("long") / grid_seconds)
    pts = points.withColumn("_cell", p_cell)
    ivs = (
        intervals.select(
            F.col(key),
            F.col(start_col).alias(f"{start_col}{suffix}"),
            F.col(end_col).alias(f"{end_col}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in interval_cols],
        )
        .withColumn(
            "_cells",
            F.sequence(
                F.floor(F.col(f"{start_col}{suffix}").cast("timestamp").cast("long") / grid_seconds),
                F.floor(F.col(f"{end_col}{suffix}").cast("timestamp").cast("long") / grid_seconds),
            ),
        )
    )
    # the at-most-2-cells guarantee; a wider interval silently exploding
    # the join is exactly the scale bug this operator exists to prevent
    ivs = ivs.withColumn(
        "_ncells", F.size("_cells")
    ).withColumn(
        "_cell",
        F.explode(
            F.when(F.col("_ncells") <= 2, F.col("_cells")).otherwise(
                F.raise_error(
                    F.lit("range_join: interval wider than grid_seconds")
                )
            )
        ),
    ).drop("_cells", "_ncells")
    joined = pts.join(ivs, [key, "_cell"]).where(
        (F.col(f"{start_col}{suffix}") <= F.col(point_ts))
        & (F.col(point_ts) < F.col(f"{end_col}{suffix}"))
    )
    # a point can meet the same interval through both of its cells
    return joined.drop("_cell").distinct()


def sql_range_join_events(
    table: str = "events",
    point_type: str = "click",
    interval_type: str = "error",
    window_seconds: int = 300,
) -> str:
    """DuckDB twin of the clicks-inside-error-windows range query —
    the plain inequality join the grid construction must reproduce."""
    return f"""
    SELECT DISTINCT p.user_id, p.ts,
           i.ts AS start_ts_i,
           i.ts + INTERVAL {window_seconds} SECOND AS end_ts_i,
           i.event_id AS event_id_i
    FROM (SELECT * FROM {table} WHERE event_type = '{point_type}') p
    JOIN (SELECT * FROM {table} WHERE event_type = '{interval_type}') i
      ON p.user_id = i.user_id
     AND i.ts <= p.ts AND p.ts < i.ts + INTERVAL {window_seconds} SECOND
    """


def sql_asof_forward_events(
    table: str = "events",
    left_type: str = "purchase",
    right_type: str = "click",
) -> str:
    """DuckDB twin of the forward as-of query — native ``ASOF LEFT
    JOIN`` with the mirrored inequality."""
    return f"""
    SELECT l.event_id, l.user_id, l.ts,
           r.ts AS ts_r, r.event_id AS event_id_r, r.value AS value_r
    FROM (SELECT * FROM {table} WHERE event_type = '{left_type}') l
    ASOF LEFT JOIN (SELECT * FROM {table} WHERE event_type = '{right_type}') r
      ON l.user_id = r.user_id AND l.ts <= r.ts
    """


def sql_asof_nearest_events(
    table: str = "events",
    left_type: str = "purchase",
    right_type: str = "click",
) -> str:
    """DuckDB twin of the nearest as-of query: both native ASOF
    directions, then the pandas pick rule (closer wins, ties go
    backward, NULLs yield to the other side)."""
    return f"""
    WITH l AS (SELECT * FROM {table} WHERE event_type = '{left_type}'),
    r AS (SELECT * FROM {table} WHERE event_type = '{right_type}'),
    b AS (
      SELECT l.event_id, l.user_id, l.ts,
             r.ts AS b_ts, r.event_id AS b_eid, r.value AS b_val
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    ),
    f AS (
      SELECT l.event_id, l.user_id, l.ts,
             r.ts AS f_ts, r.event_id AS f_eid, r.value AS f_val
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
    )
    SELECT b.event_id, b.user_id, b.ts,
           CASE WHEN take_b THEN b_ts ELSE f_ts END AS ts_r,
           CASE WHEN take_b THEN b_eid ELSE f_eid END AS event_id_r,
           CASE WHEN take_b THEN b_val ELSE f_val END AS value_r
    FROM (
      SELECT b.*, f.f_ts, f.f_eid, f.f_val,
             (f.f_ts IS NULL OR (b.b_ts IS NOT NULL AND
              epoch(b.ts) - epoch(b.b_ts) <= epoch(f.f_ts) - epoch(b.ts)))
               AS take_b
      FROM b JOIN f ON b.event_id = f.event_id
    ) b
    """


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    key: str,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    grid_seconds: int = 300,
    a_cols: tuple[str, ...] = (),
    b_cols: tuple[str, ...] = (),
    suffix_a: str = "_a",
    suffix_b: str = "_b",
) -> DataFrame:
    """Interval×interval overlap join: every (a, b) pair on the same
    key whose half-open spans intersect (``a.start < b.end AND
    b.start < a.end``) — the third temporal-join shape after as-of and
    point-in-interval, and the same scale argument: the naive double
    inequality is a per-key cross product, grid-bucketing both sides
    turns it into an equi-join on (key, cell) + exact residual filter.
    Intervals wider than ``grid_seconds`` raise (the 2-cells bound);
    two intervals overlap iff they co-occupy at least one grid cell,
    so no pair is missed. Cross-cell double-hits dedup via distinct.
    Degenerate intervals (``end <= start``) raise too: an empty
    half-open span [t, t) overlaps nothing, but ``F.sequence`` with
    stop < start yields a DESCENDING 2-cell array that would slip the
    cells bound and the residual filter would then report the empty
    interval as overlapping any interval containing t.
    """
    def cells(side: DataFrame, s: str, e: str, keep: list) -> DataFrame:
        out = side.select(*keep).withColumn(
            "_cells",
            F.when(
                F.col(e).cast("timestamp") > F.col(s).cast("timestamp"),
                F.sequence(
                    F.floor(
                        F.col(s).cast("timestamp").cast("long") / grid_seconds
                    ),
                    F.floor(
                        (F.col(e).cast("timestamp").cast("long") - 1)
                        / grid_seconds
                    ),
                ),
            ).otherwise(
                F.raise_error(
                    F.lit(
                        "interval_overlap_join: empty or inverted interval"
                        " (end_col must be > start_col)"
                    )
                )
            ),
        ).withColumn("_ncells", F.size("_cells"))
        return out.withColumn(
            "_cell",
            F.explode(
                F.when(F.col("_ncells") <= 2, F.col("_cells")).otherwise(
                    F.raise_error(
                        F.lit("interval_overlap_join: interval wider than grid")
                    )
                )
            ),
        ).drop("_cells", "_ncells")

    sa, ea = f"{start_col}{suffix_a}", f"{end_col}{suffix_a}"
    sb, eb = f"{start_col}{suffix_b}", f"{end_col}{suffix_b}"
    da = a.select(
        F.col(key),
        F.col(start_col).alias(sa),
        F.col(end_col).alias(ea),
        *[F.col(c).alias(f"{c}{suffix_a}") for c in a_cols],
    )
    db = b.select(
        F.col(key),
        F.col(start_col).alias(sb),
        F.col(end_col).alias(eb),
        *[F.col(c).alias(f"{c}{suffix_b}") for c in b_cols],
    )
    ja = cells(da, sa, ea, da.columns)
    jb = cells(db, sb, eb, db.columns)
    out = ja.join(jb, [key, "_cell"]).where(
        (F.col(sa) < F.col(eb)) & (F.col(sb) < F.col(ea))
    )
    return out.drop("_cell").distinct()


def sql_interval_overlap_events(
    table: str = "events",
    a_type: str = "error",
    b_type: str = "signup",
    width_seconds: int = 900,
) -> str:
    """DuckDB twin of the error-window × signup-window overlap query —
    the plain double-inequality join the grid construction must
    reproduce."""
    w = width_seconds
    return f"""
    WITH a AS (
      SELECT user_id, ts AS start_ts, ts + INTERVAL {w} SECOND AS end_ts,
             event_id
      FROM {table} WHERE event_type = '{a_type}'
    ), b AS (
      SELECT user_id, ts AS start_ts, ts + INTERVAL {w} SECOND AS end_ts,
             event_id
      FROM {table} WHERE event_type = '{b_type}'
    )
    SELECT DISTINCT a.user_id,
           a.start_ts AS start_ts_a, a.end_ts AS end_ts_a,
           a.event_id AS event_id_a,
           b.start_ts AS start_ts_b, b.end_ts AS end_ts_b,
           b.event_id AS event_id_b
    FROM a JOIN b ON a.user_id = b.user_id
     AND a.start_ts < b.end_ts AND b.start_ts < a.end_ts
    """


# ---------------------------------------------------------------------------
# Fuzzy record linkage — blocked edit-distance matching (entity
# resolution): find cross-table (or self) pairs whose key strings are
# within an edit-distance threshold, WITHOUT the all-pairs cross join.
# Reference surface: the reference's users hand-write fuzzy matching
# in SQL over replicated tables (organization.rb:146-164); Spark and
# DuckDB both ship exact integer levenshtein, which is what makes the
# operator value-hash oracle-able.
# ---------------------------------------------------------------------------

def fuzzy_link_candidates(
    left,
    right,
    left_key: str,
    right_key: str,
    text_col_left: str,
    text_col_right: str,
    max_dist: int = 1,
    block_chars: int = 3,
    split_threshold: int | None = None,
    split_extra: int = 3,
):
    """Candidate pairs of :func:`fuzzy_link` BEFORE the distance
    filter: (left_id, left_text, right_id, right_text) from the
    blocking equi-join. Factored out so the candidate VOLUME — the
    scale cost of the whole operator — is directly measurable and
    plan-gateable (tests/test_plans.py bounds it on a hot-suffix
    corpus)."""
    from pyspark.sql import functions as F

    def suffix_key(c, n):
        # suffix block, whole string when shorter than the block (the
        # positive-index form — negative substring starts behave
        # differently for short strings across engines)
        return F.when(
            F.length(c) >= n, F.substring(c, -n, n)
        ).otherwise(c)

    def keyed(df, idc, tc, side):
        c = F.col(tc)
        return df.select(
            F.col(idc).alias(f"{side}_id"),
            c.alias(f"{side}_text"),
            suffix_key(c, block_chars).alias("_blk"),
            # length band: |len(a) - len(b)| <= max_dist is necessary
            # for dist <= max_dist, so band id = len div (max_dist+1)
            # puts every admissible pair in same-or-adjacent bands;
            # the left side explodes its band +-1 to cover both
            F.length(c).alias("_len"),
        )

    lt = keyed(left, left_key, text_col_left, "left")
    rt = keyed(right, right_key, text_col_right, "right")

    if split_threshold is not None:
        # Cardinality-adaptive second blocking pass: buckets whose
        # total (left+right) row count exceeds ``split_threshold``
        # re-key to a LONGER suffix (block_chars + split_extra), so
        # in-bucket pair counts stop growing quadratically with corpus
        # cardinality — the fixed-length knob a 100x corpus would
        # otherwise have to hand-retune. The bucket-count aggregate is
        # one groupBy over the block keys (output is bounded by
        # distinct-suffix cardinality, tiny next to the data); the
        # oversize set has <= total_rows/threshold entries, an
        # equi-join both engines plan as a hash join (AQE broadcasts
        # it when small — no hint, so a billion-row corpus with
        # millions of hot buckets degrades to a shuffle join instead
        # of an OOM broadcast). Recall contract mirrors the base pass:
        # pairs inside an oversize bucket must share the longer
        # suffix; the SQL twin reproduces the split exactly so the
        # value-hash oracle holds, misses included.
        ext = block_chars + split_extra
        big = (
            lt.select("_blk").unionAll(rt.select("_blk"))
            .groupBy("_blk")
            .agg(F.count(F.lit(1)).alias("_c"))
            .where(F.col("_c") > split_threshold)
            .select("_blk", F.lit(True).alias("_big"))
        )

        def rekey(df, side):
            c = F.col(f"{side}_text")
            return (
                df.join(big, "_blk", "left")
                .withColumn(
                    "_blk",
                    F.when(
                        F.col("_big").isNotNull(), suffix_key(c, ext)
                    ).otherwise(F.col("_blk")),
                )
                .drop("_big")
            )

        lt, rt = rekey(lt, "left"), rekey(rt, "right")

    band = max_dist + 1
    lt = lt.select(
        "*", F.explode(F.array(
            (F.col("_len") / band).cast("int"),
            (F.col("_len") / band).cast("int") + 1,
            (F.col("_len") / band).cast("int") - 1,
        )).alias("_band"),
    )
    rt = rt.withColumn("_band", (F.col("_len") / band).cast("int"))
    return (
        lt.join(rt, ["_blk", "_band"])
        .where(F.col("left_id") != F.col("right_id"))
        .select("left_id", "left_text", "right_id", "right_text")
    )


def fuzzy_link(
    left,
    right,
    left_key: str,
    right_key: str,
    text_col_left: str,
    text_col_right: str,
    max_dist: int = 1,
    block_chars: int = 3,
    split_threshold: int | None = None,
    split_extra: int = 3,
):
    """(left_id, right_id, dist): pairs whose strings match within
    ``max_dist`` edits, candidates generated by BLOCKING — an
    equi-join on (suffix of ``block_chars`` chars, length band) — so
    the expensive distance runs only inside blocks, never over the
    cross product. Recall contract (documented, inherent to suffix
    blocking): pairs whose edit difference touches the block suffix
    are missed; production linkage runs several blocking passes
    (prefix, suffix, sorted-ngram) and unions them — each pass is this
    same operator with a different ``_block`` expression. Self-links
    (same id) are excluded; for self-joins pass the same DF twice and
    dedupe (a < b) downstream.

    ``split_threshold`` enables cardinality-ADAPTIVE blocking: buckets
    larger than the threshold re-key to a suffix ``split_extra`` chars
    longer, bounding in-bucket quadratic growth without retuning
    ``block_chars`` per corpus size (see
    :func:`fuzzy_link_candidates`). At 100 TB: the join shuffles on
    the block key; with the split pass, hot blocks are capped by the
    longer suffix's cardinality instead of degenerating."""
    from pyspark.sql import functions as F

    return (
        fuzzy_link_candidates(
            left, right, left_key, right_key,
            text_col_left, text_col_right,
            max_dist, block_chars, split_threshold, split_extra,
        )
        .select(
            "left_id", "right_id",
            F.levenshtein(
                F.col("left_text"), F.col("right_text")
            ).alias("dist"),
        )
        # dist <= max_dist implies the length-band admissibility, so no
        # separate length filter is needed for the RESULT; the bands
        # only bound which candidates are scored
        .where(F.col("dist") <= max_dist)
        .distinct()
    )


def sql_fuzzy_link(
    left_sql: str,
    right_sql: str,
    left_key: str,
    right_key: str,
    text_col_left: str,
    text_col_right: str,
    max_dist: int = 1,
    block_chars: int = 3,
    split_threshold: int | None = None,
    split_extra: int = 3,
) -> str:
    """DuckDB twin of :func:`fuzzy_link` — the same blocking join
    (including the adaptive oversize-bucket split when
    ``split_threshold`` is set) and the same exact integer levenshtein
    (NOT the brute cross join: the oracle must reproduce the
    operator's recall contract exactly, misses included)."""

    def suffix(text, n):
        return (
            f"CASE WHEN len({text}) >= {n}"
            f" THEN substring({text}, len({text}) - {n} + 1, {n})"
            f" ELSE {text} END"
        )

    base = f"""
    WITH lt0 AS (
      SELECT {left_key} AS left_id, {text_col_left} AS left_text,
             {suffix(text_col_left, block_chars)} AS _blk
      FROM {left_sql}
    ), rt0 AS (
      SELECT {right_key} AS right_id, {text_col_right} AS right_text,
             {suffix(text_col_right, block_chars)} AS _blk
      FROM {right_sql}
    )"""
    if split_threshold is None:
        body = ", lt AS (SELECT * FROM lt0), rt AS (SELECT * FROM rt0)"
    else:
        ext = block_chars + split_extra
        body = f""",
    _big AS (
      SELECT _blk FROM (
        SELECT _blk, count(*) AS _c FROM (
          SELECT _blk FROM lt0 UNION ALL SELECT _blk FROM rt0
        ) GROUP BY _blk
      ) WHERE _c > {split_threshold}
    ),
    lt AS (
      SELECT left_id, left_text,
             CASE WHEN _blk IN (SELECT _blk FROM _big)
                  THEN {suffix('left_text', ext)}
                  ELSE _blk END AS _blk
      FROM lt0
    ),
    rt AS (
      SELECT right_id, right_text,
             CASE WHEN _blk IN (SELECT _blk FROM _big)
                  THEN {suffix('right_text', ext)}
                  ELSE _blk END AS _blk
      FROM rt0
    )"""
    return f"""{base}{body}
    SELECT DISTINCT left_id, right_id,
           CAST(levenshtein(left_text, right_text) AS INTEGER) AS dist
    FROM lt JOIN rt USING (_blk)
    WHERE left_id != right_id
      AND abs(len(left_text) - len(right_text)) <= {max_dist}
      AND levenshtein(left_text, right_text) <= {max_dist}
    """


def fuzzy_link_deletions(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    text_col_left: str,
    text_col_right: str,
) -> DataFrame:
    """(left_id, right_id, dist): pairs within edit distance 1 via
    DELETION-NEIGHBORHOOD blocking (the FastSS idea — public
    literature): each string emits itself plus every single-character
    deletion as candidate keys; two strings with levenshtein <= 1
    ALWAYS share a key (equality shares the string itself, a
    substitution shares the deletion at the edited position, an
    insertion/deletion makes one string a deletion variant of the
    other), so recall is EXACT — no blocking miss contract to carry.

    Scale shape: candidate volume tracks each string's true
    neighborhood (strings per deletion key), not bucket size — unlike
    suffix blocking, whose fixed-alphabet buckets grow linearly with
    cardinality and whose in-bucket pair count grows QUADRATICALLY
    (measured 22.5M candidate pairs at 150k customers for 3-char
    suffixes vs 225k at 15k: the 49x sf1 blow-up this operator
    replaces). Cost is (len+1) keys per row; the verification
    levenshtein runs once per distinct candidate pair.
    """

    def variants(df, key, text, side):
        t = F.col("_t")
        # bind the text once: lambda bodies get no CSE, so referencing
        # the raw column would re-evaluate it per deletion position
        base = df.select(
            F.col(key).alias(f"{side}_id"),
            F.col(text).alias("_t"),
        )
        dels = F.transform(
            F.sequence(F.lit(1), F.length(t)),
            lambda i: F.concat(
                F.substring(t, F.lit(1), (i - 1).cast("int")),
                F.col("_t").substr((i + 1).cast("int"), F.length(t)),
            ),
        )
        keys = F.array_union(F.array(t), dels)
        return base.select(
            f"{side}_id",
            F.col("_t").alias(f"{side}_text"),
            F.explode(keys).alias("_k"),
        )

    lt = variants(left, left_key, text_col_left, "left")
    rt = variants(right, right_key, text_col_right, "right")
    cands = (
        lt.join(rt, "_k")
        .where(F.col("left_id") != F.col("right_id"))
        .select("left_id", "left_text", "right_id", "right_text")
        .distinct()
    )
    return (
        cands.select(
            "left_id",
            "right_id",
            F.levenshtein("left_text", "right_text").cast("int").alias(
                "dist"
            ),
        )
        .where(F.col("dist") <= 1)
    )


def sql_fuzzy_link_deletions(
    left_sql: str,
    right_sql: str,
    left_key: str,
    right_key: str,
    text_col_left: str,
    text_col_right: str,
) -> str:
    """DuckDB twin of :func:`fuzzy_link_deletions` — same deletion
    keys, same verification."""

    def side(sql, key, text, alias):
        return f"""
    {alias} AS (
      SELECT {key} AS {alias[0]}id, {text} AS {alias[0]}text,
             unnest(list_distinct(list_append(
               list_transform(range(1, len({text}) + 1),
                 i -> substring({text}, 1, CAST(i - 1 AS INTEGER))
                      || substring({text}, CAST(i + 1 AS INTEGER),
                                   len({text}))),
               {text}))) AS _k
      FROM {sql}
    )"""

    return f"""
    WITH {side(left_sql, left_key, text_col_left, 'lt')},
    {side(right_sql, right_key, text_col_right, 'rt')},
    cands AS (
      SELECT DISTINCT lid AS left_id, ltext AS left_text,
                      rid AS right_id, rtext AS right_text
      FROM lt JOIN rt USING (_k)
      WHERE lid != rid
    )
    SELECT left_id, right_id,
           CAST(levenshtein(left_text, right_text) AS INTEGER) AS dist
    FROM cands
    WHERE levenshtein(left_text, right_text) <= 1
    """


def golden_records(
    members: DataFrame,
    entity_col: str,
    key_col: str,
    text_col: str,
    cat_col: str,
    num_col: str,
) -> DataFrame:
    """Survivorship: collapse each resolved entity's member records
    into ONE golden record under deterministic field-level rules —
    the merge step after blocked linkage + connected components
    (detect -> cluster -> THIS). Rules (classic MDM defaults, each
    engine-portable):

    - canonical key: the smallest member key (stable across runs);
    - text field: the LONGEST value, ties to the lexicographically
      largest (richest-data-wins);
    - categorical field: majority vote, ties to the smallest value;
    - numeric field: the maximum in exact decimal.

    Returns (entity, canonical_key, survived_text, survived_cat,
    max_num, n_members, n_cat_distinct).

    Scale shape: one entity-keyed aggregate + one (entity, cat)
    count with a per-entity top-1 window — every key is the entity
    id, so all stages share a partitioning; nothing corpus-sized
    crosses stages twice.
    """
    e = F.col(entity_col)
    w_txt = Window.partitionBy(entity_col).orderBy(
        F.length(text_col).desc(), F.col(text_col).desc()
    )
    base = (
        members.withColumn("_rt", F.row_number().over(w_txt))
        .groupBy(entity_col)
        .agg(
            F.min(key_col).cast("long").alias("canonical_key"),
            F.max(F.when(F.col("_rt") == 1, F.col(text_col))).alias(
                "survived_text"
            ),
            F.max(
                F.col(num_col).cast("string").try_cast("decimal(18,6)")
            ).cast("double").alias("max_num"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.count_distinct(cat_col).cast("long").alias("n_cat_distinct"),
        )
    )
    w_cat = Window.partitionBy(entity_col).orderBy(
        F.col("_n").desc(), F.col(cat_col).asc()
    )
    cat = (
        members.groupBy(entity_col, cat_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_rc", F.row_number().over(w_cat))
        .where(F.col("_rc") == 1)
        .select(e.alias("_e2"), F.col(cat_col).alias("survived_cat"))
    )
    return base.join(cat, base[entity_col] == F.col("_e2")).select(
        entity_col, "canonical_key", "survived_text", "survived_cat",
        "max_num", "n_members", "n_cat_distinct",
    )


def sql_golden_records(
    members_cte: str,
    entity_col: str,
    key_col: str,
    text_col: str,
    cat_col: str,
    num_col: str,
) -> str:
    """DuckDB twin of :func:`golden_records` (``members_cte`` yields
    the member rows with their entity labels)."""
    return f"""
    WITH m AS ({members_cte}),
    base AS (
      SELECT {entity_col},
             CAST(MIN({key_col}) AS BIGINT) AS canonical_key,
             MAX(CASE WHEN _rt = 1 THEN {text_col} END) AS survived_text,
             CAST(MAX(TRY_CAST(CAST({num_col} AS VARCHAR) AS DECIMAL(18,6)))
                  AS DOUBLE) AS max_num,
             CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST(COUNT(DISTINCT {cat_col}) AS BIGINT) AS n_cat_distinct
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY {entity_col}
          ORDER BY length({text_col}) DESC, {text_col} DESC) AS _rt
        FROM m
      ) GROUP BY {entity_col}
    ),
    cat AS (
      SELECT {entity_col}, {cat_col} AS survived_cat
      FROM (
        SELECT {entity_col}, {cat_col}, row_number() OVER (
          PARTITION BY {entity_col}
          ORDER BY COUNT(*) DESC, {cat_col} ASC) AS _rc
        FROM m GROUP BY {entity_col}, {cat_col}
      ) WHERE _rc = 1
    )
    SELECT b.{entity_col}, b.canonical_key, b.survived_text,
           c.survived_cat, b.max_num, b.n_members, b.n_cat_distinct
    FROM base b JOIN cat c USING ({entity_col})
    """
