"""salted_join: result parity with a plain join, under skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webhookdb_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # one hot key (90% of rows) + a long tail
    big = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("org"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [("hot", "HOT-META")] + [(f"k{i}", f"m{i}") for i in range(1800, 1900)],
        "org string, meta string",
    )
    plain = big.join(small, on="org", how="inner")
    salted = salted_join(big, small, on="org", how="inner", salt=8)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    small = spark.createDataFrame([("a", "x")], "k string, m string")
    out = salted_join(big, small, on="k", how="left", salt=4).collect()
    rows = {(r.k, r.v, r.m) for r in out}
    assert rows == {("a", 1, "x"), ("b", 2, None)}


def test_salted_join_rejects_unsupported_how(spark):
    df = spark.range(1).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError):
        salted_join(df, df, on="k", how="full_outer")


def test_join_key_skew_audit_finds_planted_hot_key(spark):
    from pyspark.sql import functions as F

    from webhookdb_spark.operators.skew import join_key_skew_audit

    rows = [(1,)] * 900 + [(k,) for k in range(2, 102)]
    df = spark.createDataFrame(rows, "k long")
    out = join_key_skew_audit(df, "k", 3).collect()
    assert out[0].key not in (None,)
    by = {r.key: r for r in out}
    hot = by[1]
    assert hot.n == 900 and hot.total_rows == 1000 and hot.total_keys == 101
    assert hot.share_ppm == 900000
    assert abs(hot.x_mean - 90.9) < 0.01  # 900 * 101 / 1000
    plan = join_key_skew_audit(df, "k", 3)._jdf.queryExecution() \
        .explainString(spark._jvm.org.apache.spark.sql.execution
                       .ExplainMode.fromString("formatted"))
    assert "TakeOrderedAndProject" in plan, plan
