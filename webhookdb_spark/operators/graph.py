"""Link-graph analytics: PageRank in exact integer fixed point.

A training-data pipeline ranks hosts/documents by link structure
before sampling (the Common Crawl host-graph quality signal); the
reference's users would hand-write iterative rank in SQL against
replicated link tables. Here it is a first-class iterative operator
built the Spark way — ``iters`` rounds of (join on src → group by
dst), every shuffle keyed on a vertex id — with the arithmetic held
in BIGINT fixed point (rank × 1e6) so each round is EXACT: no float
accumulation order to drift, which is what lets a 5-round distributed
PageRank carry a full value-hash DuckDB oracle (the twin unrolls the
same rounds as chained CTEs — byte-identical integer math).

Semantics (documented, matched exactly by the twin):
- damping d = num/den as integers (default 85/100);
- per-round: rank'(v) = (1-d)·SCALE + d · Σ_{u→v} floor(rank(u) /
  outdeg(u)), with the damped sum floored once per vertex;
- vertices = src ∪ dst of the edge table; dangling vertices (no
  out-edges) contribute nothing (their mass leaks — the simple
  variant; redistribution is a one-line change both sides would make
  together);
- multi-edges count once (edges are distinct'd).

At 100 TB: each round is one co-partitioned join + one aggregate on
vertex keys; AQE reuses the exchange across rounds; rank state is 16
bytes per vertex. No driver-side iteration state beyond the loop
counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(v, rank_fp): integer fixed-point PageRank after ``iters``
    rounds; ``rank_fp`` is rank × 1e6 as BIGINT."""
    e = (
        edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        # The edge set feeds every iteration's contrib join PLUS outdeg
        # and verts (~2 + iters lineage references); pin it once so the
        # upstream scan+distinct runs a single time instead of being
        # re-executed per reference. (Blocks are freed when the ranks
        # RDD is GC'd — same posture as scd2_apply's history pin.)
        .localCheckpoint(eager=True)
    )
    verts = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    base = (SCALE * (damping_den - damping_num)) // damping_den
    ranks = verts.select("v", F.lit(SCALE).cast("long").alias("rank_fp"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e.src == ranks.v)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("v"),
                F.floor(F.col("rank_fp") / F.col("deg")).alias("c"),
            )
            .groupBy("v")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            verts.join(contrib, "v", "left")
            .select(
                "v",
                (
                    F.lit(base)
                    + F.floor(
                        F.coalesce(F.col("in_sum"), F.lit(0))
                        * damping_num
                        / damping_den
                    )
                ).cast("long").alias("rank_fp"),
            )
        )
    return ranks


def sql_pagerank(
    edges_sql: str,
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
) -> str:
    """DuckDB twin of :func:`pagerank`: the same rounds unrolled as
    chained CTEs — identical integer arithmetic, so the oracle is a
    full value-hash match. ``edges_sql`` is a query/table producing
    (src, dst)."""
    base = (SCALE * (damping_den - damping_num)) // damping_den
    ctes = [
        f"e AS (SELECT DISTINCT CAST(src AS BIGINT) AS src,"
        f" CAST(dst AS BIGINT) AS dst FROM {edges_sql}"
        " WHERE src IS NOT NULL AND dst IS NOT NULL)",
        "verts AS (SELECT src AS v FROM e UNION SELECT dst FROM e)",
        "outdeg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        f"r0 AS (SELECT v, CAST({SCALE} AS BIGINT) AS rank_fp FROM verts)",
    ]
    for i in range(iters):
        ctes.append(
            f"c{i} AS (SELECT e.dst AS v,"
            f" sum(CAST(floor(r{i}.rank_fp / outdeg.deg) AS BIGINT)) AS in_sum"
            f" FROM e JOIN r{i} ON e.src = r{i}.v"
            " JOIN outdeg ON e.src = outdeg.src GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i + 1} AS (SELECT verts.v,"
            f" CAST({base} + floor(COALESCE(c{i}.in_sum, 0)"
            f" * {damping_num} / {damping_den}) AS BIGINT) AS rank_fp"
            f" FROM verts LEFT JOIN c{i} ON verts.v = c{i}.v)"
        )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT v, rank_fp FROM r{iters}"
    )
