"""SCD2 history, calendar gap-fill / forward-fill, trailing RANGE
rolling windows, and the prefix-filtered exact Jaccard join."""

from __future__ import annotations

from datetime import date, datetime

from pyspark.sql import functions as F

from webhookdb_spark.operators.analytics import gapfill_daily, rolling_daily_sum
from webhookdb_spark.operators.dedup import jaccard_pairs, prefix_jaccard_join
from webhookdb_spark.operators.history import scd2_history


def _ts(s):
    return datetime.fromisoformat(s)


def test_scd2_collapses_runs_and_versions(spark):
    rows = [
        # key 1: a a b a  -> versions a, b, a
        (1, _ts("2024-01-01T00:00:00"), 1, "a"),
        (1, _ts("2024-01-02T00:00:00"), 2, "a"),
        (1, _ts("2024-01-03T00:00:00"), 3, "b"),
        (1, _ts("2024-01-04T00:00:00"), 4, "a"),
        # key 2: NULL -> x -> NULL all open new versions (null-safe)
        (2, _ts("2024-01-01T00:00:00"), 5, None),
        (2, _ts("2024-01-02T00:00:00"), 6, "x"),
        (2, _ts("2024-01-03T00:00:00"), 7, None),
        # key 3: exact-ts tie broken by seq: state at seq 9 wins the
        # later slot, so versions are y then z
        (3, _ts("2024-01-01T00:00:00"), 8, "y"),
        (3, _ts("2024-01-01T00:00:00"), 9, "z"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, state string"
    )
    out = scd2_history(df, "user_id", ("state",), "ts", "event_id")
    got = {
        (r.user_id, r.version): (r.state, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }
    assert len(got) == 8
    assert got[(1, 1)] == (
        "a", _ts("2024-01-01T00:00:00"), _ts("2024-01-03T00:00:00"), False
    )
    assert got[(1, 2)] == (
        "b", _ts("2024-01-03T00:00:00"), _ts("2024-01-04T00:00:00"), False
    )
    assert got[(1, 3)] == ("a", _ts("2024-01-04T00:00:00"), None, True)
    assert [got[(2, v)][0] for v in (1, 2, 3)] == [None, "x", None]
    assert got[(3, 1)][0] == "y" and got[(3, 2)][0] == "z"
    assert got[(3, 1)][3] is False and got[(3, 2)][3] is True

    # sentinel form: open intervals get the high date, never NULL
    s = scd2_history(
        df, "user_id", ("state",), "ts", "event_id",
        open_end_ts="9999-12-31 00:00:00",
    )
    vts = [r.valid_to for r in s.collect()]
    assert None not in vts
    assert max(vts) == _ts("9999-12-31T00:00:00")


def test_gapfill_daily_zero_fills_and_forward_fills(spark):
    rows = [
        (1, _ts("2024-01-01T05:00:00"), 10.0),
        (1, _ts("2024-01-01T06:00:00"), 2.5),
        (1, _ts("2024-01-04T09:00:00"), 7.0),
        (2, _ts("2024-02-10T00:00:00"), 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r.user_id, r.day): (r.events_n, r.daily_value, r.ff_value)
        for r in gapfill_daily(df).collect()
    }
    # user 1 spans 4 calendar days; silent days zero-filled, ff carries
    assert got[(1, date(2024, 1, 1))] == (2, 12.5, 12.5)
    assert got[(1, date(2024, 1, 2))] == (0, 0.0, 12.5)
    assert got[(1, date(2024, 1, 3))] == (0, 0.0, 12.5)
    assert got[(1, date(2024, 1, 4))] == (1, 7.0, 7.0)
    # user 2: single-day span, no spine beyond it
    assert got[(2, date(2024, 2, 10))] == (1, 1.0, 1.0)
    assert len(got) == 5


def test_rolling_range_frame_skips_silent_days(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1.0),
        (1, _ts("2024-01-02T00:00:00"), 2.0),
        # days 3-8 silent; day 9 is > 6 days past day 2, so the
        # trailing-7d frame holds only itself
        (1, _ts("2024-01-09T00:00:00"), 4.0),
        # day 10: frame covers days 4-10 -> days 9 + 10
        (1, _ts("2024-01-10T00:00:00"), 8.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        r.day: (r.daily_value, r.rolling_value, r.rolling_n)
        for r in rolling_daily_sum(df, 7).collect()
    }
    assert got[date(2024, 1, 1)] == (1.0, 1.0, 1)
    assert got[date(2024, 1, 2)] == (2.0, 3.0, 2)
    assert got[date(2024, 1, 9)] == (4.0, 4.0, 1)
    assert got[date(2024, 1, 10)] == (8.0, 12.0, 2)


def test_prefix_jaccard_matches_quadratic_exact(spark):
    """The prefix filter must lose NO pair: compare against the
    brute-force all-pairs exact Jaccard on the same token sets."""
    docs = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),      # jac 4/6 with doc 1
        (3, "alpha beta gamma delta epsilon"),   # jac 1.0 with doc 1
        (4, "completely different words here"),
        (5, "alpha beta gamma delta epsilon eta"),  # 5/6 with 1 and 3
        (6, "one two three"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def brute(num, den):
        toks = {
            d: set(t for t in txt.lower().split() if t) for d, txt in docs
        }
        out = set()
        ids = sorted(toks)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                inter = len(toks[a] & toks[b])
                union = len(toks[a] | toks[b])
                if inter * den >= num * union:
                    out.add((a, b))
        return out

    for num, den in ((95, 100), (80, 100), (60, 100), (1, 2)):
        got = {
            (r.doc_a, r.doc_b)
            for r in prefix_jaccard_join(df, "text", num, den).collect()
        }
        assert got == brute(num, den), (num, den)


def test_prefix_jaccard_agrees_with_shingle_free_token_jaccard(spark):
    """On the real corpus slice: values agree with an independent
    all-pairs verification through jaccard_pairs' candidate path."""
    df = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(60)
    )
    out = prefix_jaccard_join(df, "text", 90, 100)
    rows = out.collect()
    # sanity: jaccard bounds and ordering contract
    for r in rows:
        assert 0.9 <= r.jaccard <= 1.0
        assert r.doc_a < r.doc_b


def test_prefix_filter_prunes_candidates(spark):
    """The prefix join must generate FEWER candidate pairs than the
    full token join would — the point of ordering by rarity."""
    df = spark.createDataFrame(
        [(i, f"common1 common2 common3 rare{i}") for i in range(20)],
        "doc_id long, text string",
    )
    # every doc shares 3 of 4 tokens -> jac = 3/5 < 0.95: zero results,
    # and the candidates come only from shared PREFIX tokens. With
    # n=4, t=.95: alpha=4, prefix length 1 -> each doc contributes its
    # single rarest token (rare_i, df=1) -> zero candidate pairs, while
    # a naive token join would build 3 * C(20,2) pairs.
    assert prefix_jaccard_join(df, "text", 95, 100).count() == 0


def _hist_key(r):
    return (r.user_id, r.version, r.state, r.valid_from, r.valid_to,
            r.is_current)


def test_scd2_apply_equals_full_rebuild(spark):
    """Folding in-order batches must reproduce the full build EXACTLY —
    across batch boundaries inside runs, no-op batches, new keys
    appearing mid-stream, and the sentinel form."""
    import random

    rng = random.Random(7)
    rows = []
    eid = 0
    for u in range(1, 13):
        t = datetime(2024, 1, 1)
        for _ in range(rng.randint(1, 30)):
            t = datetime(2024, 1, 1 + rng.randint(0, 27), rng.randint(0, 23))
            rows.append((u, t, eid, rng.choice(["a", "b", "c", None])))
            eid += 1
    # late-starting key only in the final batch
    rows.append((99, datetime(2024, 1, 28), eid, "z"))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, state string"
    )
    from webhookdb_spark.operators.history import scd2_apply

    # 4 batches, history materialized between applies (localCheckpoint
    # — the persisted-table reality a change-feed consumer has; it also
    # keeps the nested-union lineage from ballooning analysis time).
    full = scd2_history(df, "user_id", ("state",), "ts", "event_id")
    cuts = ("2024-01-08", "2024-01-15", "2024-01-15", "2024-01-22")
    inc = scd2_history(
        df.where(F.col("ts") < cuts[0]),
        "user_id", ("state",), "ts", "event_id",
    )
    for lo, hi in zip(cuts, cuts[1:] + (None,)):
        b = df.where(F.col("ts") >= lo)
        if hi:
            b = b.where(F.col("ts") < hi)
        inc = scd2_apply(
            inc.localCheckpoint(), b, "user_id", ("state",), "ts", "event_id"
        )
    got = sorted(_hist_key(r) for r in inc.collect())
    want = sorted(_hist_key(r) for r in full.collect())
    assert got == want, (got[:3], want[:3])
    # an empty batch is a no-op
    empty = df.where(F.lit(False))
    again = scd2_apply(inc, empty, "user_id", ("state",), "ts", "event_id")
    assert sorted(_hist_key(r) for r in again.collect()) == want

    # sentinel form, 2 batches chained WITHOUT materialization (the
    # lineage shape the oracle query runs)
    sentinel = "9999-12-31 00:00:00"
    full_s = scd2_history(
        df, "user_id", ("state",), "ts", "event_id", open_end_ts=sentinel
    )
    inc_s = scd2_history(
        df.where(F.col("ts") < "2024-01-15"),
        "user_id", ("state",), "ts", "event_id", open_end_ts=sentinel,
    )
    inc_s = scd2_apply(
        inc_s, df.where(F.col("ts") >= "2024-01-15"),
        "user_id", ("state",), "ts", "event_id", open_end_ts=sentinel,
    )
    assert sorted(_hist_key(r) for r in inc_s.collect()) == sorted(
        _hist_key(r) for r in full_s.collect()
    )


def test_streaming_scd2_maintenance_over_change_feed(spark, tmp_path):
    """SCD2 history maintained INCREMENTALLY by a change-feed
    consumer: stream_changes -> foreachBatch(scd2_apply) with the
    history persisted between micro-batches. Versions accumulate
    across arbitrary batch boundaries and checkpoint restarts; replay
    is a no-op."""
    import json

    from webhookdb_spark.operators.history import scd2_apply, scd2_history
    from webhookdb_spark.operators.upsert import stream_changes, upsert_envelopes
    from webhookdb_spark.replicators.fake import FAKE_V1
    from webhookdb_spark.storage import Warehouse

    def env(items):
        return spark.createDataFrame(
            [("fake_v1", json.dumps(it), None) for it in items],
            "opaque_id string, body string, received_at timestamp",
        )

    wh = Warehouse(spark, tmp_path / "wh")
    parent = wh.table("org", "fake_v1")
    hist_dir = str(tmp_path / "scd2_history")

    def maintain(batch, _bid):
        from pyspark.sql import functions as F
        import os

        ev = batch.select(
            "my_id", F.col("at").alias("ts"), F.col("_txn"),
            F.col("data").cast("string").alias("state"),
        )
        if os.path.exists(hist_dir):
            hist = batch.sparkSession.read.parquet(hist_dir)
            new = scd2_apply(hist, ev, "my_id", ("state",), "ts", "_txn")
        else:
            new = scd2_history(ev, "my_id", ("state",), "ts", "_txn")
        # stage-then-replace keeps the read (old) and write (new) apart
        staged = hist_dir + ".staged"
        new.write.mode("overwrite").parquet(staged)
        import shutil

        shutil.rmtree(hist_dir, ignore_errors=True)
        os.replace(staged, hist_dir)

    ckpt = str(tmp_path / "scd2_ckpt")

    def run_once():
        q = (
            stream_changes(parent)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    upsert_envelopes(parent, env([
        {"my_id": "a", "at": "2024-01-01T00:00:00Z", "v": 1},
        {"my_id": "b", "at": "2024-01-01T00:00:00Z", "v": 1},
    ]), FAKE_V1)
    run_once()
    upsert_envelopes(parent, env([
        {"my_id": "a", "at": "2024-01-02T00:00:00Z", "v": 2},  # change
    ]), FAKE_V1)
    upsert_envelopes(parent, env([
        {"my_id": "a", "at": "2024-01-03T00:00:00Z", "v": 3},  # change
        {"my_id": "c", "at": "2024-01-03T00:00:00Z", "v": 1},  # new key
    ]), FAKE_V1)
    run_once()

    hist = spark.read.parquet(hist_dir)
    got = {
        (r.my_id, r.version): (json.loads(r.state)["v"], r.is_current)
        for r in hist.collect()
    }
    assert got[("a", 1)] == (1, False)
    assert got[("a", 2)] == (2, False)
    assert got[("a", 3)] == (3, True)
    assert got[("b", 1)] == (1, True)
    assert got[("c", 1)] == (1, True)
    assert len(got) == 5

    # checkpoint replay: no new versions
    run_once()
    assert spark.read.parquet(hist_dir).count() == 5


def test_scd2_maintainer_feed_driven_equals_rebuild(spark, tmp_path):
    """Batch change-feed consumer (Scd2Maintainer): history maintained
    txn-by-txn from the managed table's MERGE feed must equal a full
    scd2_history rebuild over the concatenated feed post-images; the
    watermark makes re-runs no-ops; a single run folds several queued
    txns in order."""
    import json

    from webhookdb_spark.operators.history import Scd2Maintainer, scd2_history
    from webhookdb_spark.operators.upsert import changes_since, upsert_envelopes
    from webhookdb_spark.replicators.fake import FAKE_V1
    from webhookdb_spark.storage import Warehouse

    def env(items):
        return spark.createDataFrame(
            [("fake_v1", json.dumps(it), None) for it in items],
            "opaque_id string, body string, received_at timestamp",
        )

    wh = Warehouse(spark, tmp_path / "wh")
    parent = wh.table("org", "fake_v1")
    # FAKE_V1's change rows carry (my_id, at, data); the projection
    # hook derives the SCD2 (key, ts, attrs) columns from them.
    shape = lambda b: b.select(  # noqa: E731
        "my_id",
        F.col("at").alias("ts"),
        F.col("data").cast("string").alias("state"),
    )
    mt = Scd2Maintainer(
        spark, str(tmp_path / "scd2"), "my_id", ("state",), "ts",
        project=shape,
    )

    upsert_envelopes(parent, env([
        {"my_id": "a", "at": "2024-01-01T00:00:00Z", "v": 1},
        {"my_id": "b", "at": "2024-01-01T00:00:00Z", "v": 1},
    ]), FAKE_V1)
    assert mt.run(parent) == 1
    assert mt.run(parent) == 0  # watermark: nothing new

    # two txns queued, folded by ONE run in order
    upsert_envelopes(parent, env([
        {"my_id": "a", "at": "2024-01-02T00:00:00Z", "v": 2},
    ]), FAKE_V1)
    upsert_envelopes(parent, env([
        {"my_id": "a", "at": "2024-01-03T00:00:00Z", "v": 3},
        {"my_id": "c", "at": "2024-01-03T00:00:00Z", "v": 1},
    ]), FAKE_V1)
    assert mt.run(parent) == 2

    rebuild = scd2_history(
        shape(changes_since(parent, 0)), "my_id", ("state",), "ts"
    )
    key = lambda r: (r.my_id, r.version)  # noqa: E731
    got = {key(r): (r.state, r.valid_from, r.valid_to, r.is_current)
           for r in mt.history().collect()}
    want = {key(r): (r.state, r.valid_from, r.valid_to, r.is_current)
            for r in rebuild.collect()}
    assert got == want and len(got) == 5


def test_scd2_lookup_interval_containment(spark):
    from webhookdb_spark.operators.history import scd2_lookup

    hist = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01T00:00:00"), _ts("2024-01-03T00:00:00"), 1, False),
            (1, "b", _ts("2024-01-03T00:00:00"), None, 2, True),
        ],
        "user_id long, state string, valid_from timestamp, "
        "valid_to timestamp, version int, is_current boolean",
    )
    probes = spark.createDataFrame(
        [
            (10, 1, _ts("2023-12-31T00:00:00")),  # before v1 -> drops
            (11, 1, _ts("2024-01-01T00:00:00")),  # v1 inclusive start
            (12, 1, _ts("2024-01-03T00:00:00")),  # v1 end exclusive -> v2
            (13, 1, _ts("2030-01-01T00:00:00")),  # open interval -> v2
            (14, 2, _ts("2024-01-02T00:00:00")),  # unknown key -> drops
        ],
        "probe_id long, user_id long, ts timestamp",
    )
    got = {
        r.probe_id: r.version
        for r in scd2_lookup(hist, probes, "user_id").collect()
    }
    assert got == {11: 1, 12: 2, 13: 2}

    plan = scd2_lookup(hist, probes, "user_id")._jdf.queryExecution() \
        .explainString(spark._jvm.org.apache.spark.sql.execution
                       .ExplainMode.fromString("formatted"))
    assert "CartesianProduct" not in plan, plan


def test_prefix_jaccard_ngram_mode_matches_brute(spark):
    """Word-3-gram shingle mode: equals brute-force shingle Jaccard,
    and short docs (< ngram words) contribute no tokens."""
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "entirely different content with other words here"),
        (5, "too short"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def sh(txt):
        w = [t for t in txt.lower().split() if t]
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    def brute(num, den):
        toks = {d: sh(t) for d, t in docs if len(t.split()) >= 3}
        out = set()
        ids = sorted(toks)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                inter = len(toks[a] & toks[b])
                union = len(toks[a] | toks[b])
                if union and inter * den >= num * union:
                    out.add((a, b))
        return out

    for num, den in ((4, 5), (1, 2), (1, 4)):
        got = {
            (r.doc_a, r.doc_b)
            for r in prefix_jaccard_join(df, "text", num, den, ngram=3).collect()
        }
        assert got == brute(num, den), (num, den, got)
