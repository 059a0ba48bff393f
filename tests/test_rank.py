"""global_rank / ntile_assign: the distributed substitutes for
single-partition ORDER BY windows (sampling.py)."""
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from webhookdb_spark.operators.sampling import global_rank, ntile_assign


def test_global_rank_matches_window_rank(spark):
    df = spark.range(0, 997).select(
        (F.col("id") * 37 % 1000).alias("v"), F.col("id").alias("k")
    )
    got = {
        (r.v, r.k): r.rank
        for r in global_rank(df, ["v", "k"], bucket_partitions=8).collect()
    }
    w = Window.orderBy("v", "k")
    want = {
        (r.v, r.k): r.rank
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_rank_invariant_to_bucket_count(spark):
    df = spark.range(0, 500).select((F.col("id") % 7).alias("v"), "id")
    a = sorted(
        (r.v, r.id, r.rank)
        for r in global_rank(df, ["v", "id"], bucket_partitions=3).collect()
    )
    b = sorted(
        (r.v, r.id, r.rank)
        for r in global_rank(df, ["v", "id"], bucket_partitions=64).collect()
    )
    assert a == b


def test_ntile_assign_matches_window_ntile(spark):
    # sizes that hit every remainder class of n=10, incl. n > N
    for n_rows in (7, 10, 11, 99, 100, 101):
        df = spark.range(0, n_rows).select(F.col("id").alias("k"))
        ranked = global_rank(df, ["k"], bucket_partitions=4)
        total = F.broadcast(ranked.agg(F.count("*").alias("_n")))
        got = {
            r.k: r.t
            for r in ranked.crossJoin(total)
            .select("k", ntile_assign(F.col("rank"), F.col("_n"), 10).alias("t"))
            .collect()
        }
        w = Window.orderBy("k")
        want = {
            r.k: r.t
            for r in df.withColumn("t", F.ntile(10).over(w)).collect()
        }
        assert got == want, n_rows


def test_zorder_key_matches_python_interleave(spark):
    from webhookdb_spark.operators.layout import sql_zorder_expr, zorder_key
    import duckdb

    def py_z(a, b):
        z = 0
        for i in range(31):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    vals = [(0, 0), (1, 0), (0, 1), (2**31 - 1, 2**31 - 1),
            (12345, 67890), (1704067798, 1499)]
    df = spark.createDataFrame(vals, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    con = duckdb.connect()
    for a, b in vals:
        want = py_z(a, b)
        assert got[(a, b)] == want, (a, b)
        (dz,) = con.execute(
            f"SELECT {sql_zorder_expr(str(a), str(b))}"
        ).fetchone()
        assert dz == want, (a, b)

    import pytest as _pt
    bad = spark.createDataFrame([(2**31, 0)], "a long, b long")
    with _pt.raises(Exception, match="outside"):
        bad.select(zorder_key(F.col("a"), F.col("b"))).collect()
