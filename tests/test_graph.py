"""PageRank semantics: hand-computed fixed point, mass conservation,
determinism, and scale-shape properties."""

from __future__ import annotations

import duckdb

from webhookdb_spark.operators.graph import SCALE, pagerank, sql_pagerank


def test_pagerank_hand_computed_one_round(spark):
    # a -> b, a -> c, b -> c: after 1 round with d=85/100:
    # base = 150000
    # b: base + floor(floor(1e6/2) * 85/100) = 150000 + 425000 = 575000
    # c: base + floor((floor(1e6/2) + floor(1e6/1)) * 85/100)
    #    = 150000 + floor(1500000*0.85) = 150000 + 1275000 = 1425000
    # a: dangling receiver: base = 150000
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    got = {r.v: r.rank_fp for r in pagerank(edges, iters=1).collect()}
    assert got == {1: 150000, 2: 575000, 3: 1425000}


def test_pagerank_matches_duckdb_iterated(spark):
    """5 rounds on a ring + chord graph: exact BIGINT equality with the
    unrolled-CTE twin (the property that makes the oracle a value-hash
    match, not an approximate comparison)."""
    ring = [(i, (i + 1) % 10) for i in range(10)] + [(0, 5), (3, 8)]
    edges = spark.createDataFrame(ring, "src long, dst long")
    got = sorted((r.v, r.rank_fp) for r in pagerank(edges, iters=5).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE ed (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO ed VALUES (?, ?)", ring)
    want = sorted(con.execute(
        "SELECT v, rank_fp FROM (" + sql_pagerank("ed", iters=5) + ")"
    ).fetchall())
    assert got == want


def test_pagerank_mass_and_determinism(spark):
    # symmetric clique: every vertex identical rank == SCALE at any
    # iteration count (uniform is the fixed point); repartitioning
    # changes nothing (integer arithmetic has no order sensitivity)
    clique = [(i, j) for i in range(5) for j in range(5) if i != j]
    edges = spark.createDataFrame(clique, "src long, dst long")
    got = {r.v: r.rank_fp for r in pagerank(edges, iters=4).collect()}
    assert set(got.values()) == {SCALE}
    again = {r.v: r.rank_fp
             for r in pagerank(edges.repartition(7), iters=4).collect()}
    assert again == got


def test_pagerank_plan_keyed_joins_only(spark):
    edges = spark.createDataFrame(
        [(i, (i + 1) % 50) for i in range(50)], "src long, dst long"
    )
    plan = pagerank(edges, iters=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
