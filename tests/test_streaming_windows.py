"""Windowed/sessionized aggregation values (batch = same plan) and the
cross-batch changed-rows stateful operator on a real stream."""

from __future__ import annotations

import datetime as dt
import json
import shutil
import tempfile
import time
from pathlib import Path

from webhookdb_spark.streaming.windows import (
    changed_rows_stream,
    sessionized_counts,
    windowed_event_counts,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, user_id long, event_type string")


def test_windowed_counts_batch_values(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 5)
    df = _events(
        spark,
        [
            (t0, 1, "click"),
            (t0 + dt.timedelta(minutes=10), 2, "click"),
            (t0 + dt.timedelta(hours=1), 1, "click"),
            (t0 + dt.timedelta(hours=1, minutes=2), 1, "error"),
        ],
    )
    out = {
        (r.window_start.hour, r.event_type): r.n_events
        for r in windowed_event_counts(df, window="1 hour").collect()
    }
    assert out == {(10, "click"): 2, (11, "click"): 1, (11, "error"): 1}


def test_sessionized_counts_batch_values(spark):
    t0 = dt.datetime(2024, 1, 1, 9, 0)
    df = _events(
        spark,
        [
            (t0, 7, "a"),
            (t0 + dt.timedelta(minutes=10), 7, "a"),   # same session (gap 30m)
            (t0 + dt.timedelta(hours=2), 7, "a"),      # new session
            (t0, 8, "a"),
        ],
    )
    rows = sessionized_counts(df, gap="30 minutes", key_col="user_id").collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r.n_events)
    assert sorted(per_user[7]) == [1, 2]
    assert per_user[8] == [1]


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the grouped function."""

    def __init__(self, value=None):
        self._value = value

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, value):
        self._value = value


def test_changed_rows_fn_orders_by_received_at():
    """Rows arrive shuffle-scrambled within a micro-batch; the retained
    state hash must belong to the LATEST payload by received_at, so a
    later re-send of that payload is correctly suppressed."""
    import hashlib

    import pandas as pd

    from webhookdb_spark.streaming.windows import _changed_rows_fn

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    scrambled = pd.DataFrame(
        {
            "key": ["k"] * 3,
            "body": ['{"v": 3}', '{"v": 1}', '{"v": 2}'],  # v3 is newest
            "received_at": [t0 + dt.timedelta(seconds=9), t0, t0 + dt.timedelta(seconds=5)],
        }
    )
    state = _FakeState()
    out = pd.concat(list(_changed_rows_fn(("k",), iter([scrambled]), state)))
    assert list(out["body"]) == ['{"v": 1}', '{"v": 2}', '{"v": 3}']
    assert list(out["change"]) == ["insert", "update", "update"]
    assert state.get[0] == hashlib.md5(b'{"v": 3}').hexdigest()

    # re-send of the true latest payload is suppressed as unchanged
    resend = scrambled.iloc[[0]].assign(received_at=t0 + dt.timedelta(seconds=20))
    again = list(_changed_rows_fn(("k",), iter([resend]), state))
    assert again == []


def test_changed_rows_stream_cross_batch_state(spark):
    """Feed two micro-batches through a file stream: the second batch
    repeats an unchanged payload (suppressed) and changes another."""
    src = Path(tempfile.mkdtemp(prefix="whdb_stream_src_"))
    ckpt = Path(tempfile.mkdtemp(prefix="whdb_stream_ckpt_"))
    try:
        b1 = [
            {"opaque_id": "a", "body": json.dumps({"v": 1})},
            {"opaque_id": "b", "body": json.dumps({"v": 10})},
        ]
        (src / "batch1.json").write_text("\n".join(json.dumps(r) for r in b1))

        stream = spark.readStream.schema("opaque_id string, body string").json(str(src))
        q = (
            changed_rows_stream(stream)
            .writeStream.format("memory")
            .queryName("changed_rows_t")
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(processingTime="500 milliseconds")
            .start()
        )

        def rows_snapshot():
            return {
                (r.key, r.change)
                for r in spark.sql("SELECT * FROM changed_rows_t").collect()
            }

        def wait_for(pred, timeout=90):
            deadline = time.time() + timeout
            while time.time() < deadline:
                if pred(rows_snapshot()):
                    return rows_snapshot()
                time.sleep(0.5)
            raise AssertionError(f"timeout; last snapshot: {rows_snapshot()}")

        first = wait_for(lambda s: len(s) >= 2)
        assert first == {("a", "insert"), ("b", "insert")}

        b2 = [
            {"opaque_id": "a", "body": json.dumps({"v": 1})},   # unchanged → drop
            {"opaque_id": "b", "body": json.dumps({"v": 11})},  # changed → update
            {"opaque_id": "c", "body": json.dumps({"v": 5})},   # new → insert
        ]
        (src / "batch2.json").write_text("\n".join(json.dumps(r) for r in b2))
        second = wait_for(lambda s: len(s) >= 4)
        q.stop()
        # same running state store: only the delta of batch2 was emitted
        assert ("b", "update") in second and ("c", "insert") in second
        assert ("a", "update") not in second
        assert sum(1 for k, _ in second if k == "a") == 1  # no re-emit for a
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_dedup_deliveries_stream_drops_redelivery_across_batches(spark):
    """Two micro-batches; batch 2 re-delivers an id from batch 1 (a
    provider retry) plus one new id — the retry must be dropped by the
    watermark-bounded state, the new id kept."""
    from webhookdb_spark.streaming.windows import dedup_deliveries_stream

    src = Path(tempfile.mkdtemp(prefix="whdb_ddl_src_"))
    ckpt = Path(tempfile.mkdtemp(prefix="whdb_ddl_ckpt_"))
    try:
        t0 = "2026-01-01T00:00:"
        b1 = [
            {"opaque_id": "a", "body": "1", "received_at": t0 + "01"},
            {"opaque_id": "b", "body": "2", "received_at": t0 + "02"},
        ]
        (src / "b1.json").write_text("\n".join(json.dumps(r) for r in b1))

        stream = spark.readStream.schema(
            "opaque_id string, body string, received_at timestamp"
        ).json(str(src))
        q = (
            dedup_deliveries_stream(stream)
            .writeStream.format("memory")
            .queryName("dedup_deliveries_t")
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(processingTime="500 milliseconds")
            .start()
        )

        def ids():
            return sorted(
                r.opaque_id
                for r in spark.sql("SELECT * FROM dedup_deliveries_t").collect()
            )

        def wait_for(pred, timeout=90):
            deadline = time.time() + timeout
            while time.time() < deadline:
                if pred():
                    return True
                time.sleep(0.5)
            return False

        assert wait_for(lambda: ids() == ["a", "b"]), ids()

        b2 = [
            {"opaque_id": "a", "body": "1", "received_at": t0 + "03"},  # retry
            {"opaque_id": "c", "body": "3", "received_at": t0 + "04"},
        ]
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in b2))
        assert wait_for(lambda: ids() == ["a", "b", "c"]), ids()
        q.stop()
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_dedup_deliveries_batch_degrades_to_exact(spark):
    from webhookdb_spark.streaming.windows import dedup_deliveries_stream

    df = spark.createDataFrame(
        [("a", "1"), ("a", "1"), ("b", "2")], "opaque_id string, body string"
    )
    out = dedup_deliveries_stream(df)
    assert out.count() == 2


# -- transformWithState quota processor (streaming/quota.py) -----------------

class _FakeValueState:
    def __init__(self):
        self._v = None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttl=None):
        self.states[name] = _FakeValueState()
        return self.states[name]


def test_quota_processor_cumulative_and_throttle_accounting():
    """The transformWithState processor's quota math, driven directly
    (the streaming form needs protobuf workers, absent in this
    sandbox — the operator gates on that with a clear error)."""
    import pandas as pd

    from webhookdb_spark.streaming.quota import _QuotaProcessor

    p = _QuotaProcessor(quota=4, state_ttl_ms=None)
    p.init(_FakeHandle())

    def feed(n):
        out = list(p.handleInputRows(("a",), iter([pd.DataFrame({"org": ["a"] * n})]), None))
        assert len(out) == 1
        r = out[0].iloc[0]
        return (int(r.batch_n), int(r.total_n), int(r.throttled_n))

    assert feed(3) == (3, 3, 0)      # under quota
    assert feed(2) == (2, 5, 1)      # crosses: only the overflow row throttles
    assert feed(2) == (2, 7, 2)      # already over: whole batch throttles
    assert feed(0) == (0, 7, 0)      # empty batch reports, throttles nothing


def test_quota_stream_tws_gates_without_protobuf(spark):
    """Explicitly requesting the transformWithState backend without
    protobuf fails fast with the real reason; auto falls back to
    applyInPandasWithState instead (exercised end-to-end below)."""
    import pytest as _pt

    from webhookdb_spark.streaming.quota import org_quota_stream

    try:
        from google.protobuf import descriptor  # noqa: F401
        _pt.skip("protobuf present; gate not applicable")
    except ImportError:
        pass
    df = spark.createDataFrame([("a",)], "org string")
    with _pt.raises(ImportError, match="protobuf"):
        org_quota_stream(df, quota=4, impl="tws")


def test_quota_stream_end_to_end_two_microbatches(spark):
    """Drive org_quota_stream over two file-source micro-batches in
    THIS environment (apws backend): batch 1 stays under org a's
    quota, batch 2 pushes a over (partial throttle) and b fully over —
    the cumulative counter must survive the batch boundary."""
    import json
    from webhookdb_spark.streaming.quota import org_quota_stream

    src = Path(tempfile.mkdtemp(prefix="whdb_quota_src_"))
    ckpt = Path(tempfile.mkdtemp(prefix="whdb_quota_ckpt_"))
    try:
        b1 = [{"org": "a"}] * 3 + [{"org": "b"}] * 4
        (src / "batch1.json").write_text("\n".join(json.dumps(r) for r in b1))
        stream = spark.readStream.schema("org string").json(str(src))
        q = (
            org_quota_stream(stream, quota=4)
            .writeStream.format("memory")
            .queryName("quota_t")
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(processingTime="500 milliseconds")
            .start()
        )

        def snapshot():
            return {
                (r.org, int(r.batch_n), int(r.total_n), int(r.throttled_n))
                for r in spark.sql("SELECT * FROM quota_t").collect()
            }

        def wait_for(n, timeout=90):
            deadline = time.time() + timeout
            while time.time() < deadline:
                if len(snapshot()) >= n:
                    return snapshot()
                time.sleep(0.5)
            raise AssertionError(f"timeout; last snapshot: {snapshot()}")

        first = wait_for(2)
        assert ("a", 3, 3, 0) in first      # under quota
        assert ("b", 4, 4, 0) in first      # exactly at quota

        b2 = [{"org": "a"}] * 3 + [{"org": "b"}] * 2
        (src / "batch2.json").write_text("\n".join(json.dumps(r) for r in b2))
        second = wait_for(4)
        q.stop()
        assert ("a", 3, 6, 2) in second     # crossed: overflow of 2
        assert ("b", 2, 6, 2) in second     # already at cap: all throttle
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_countmin_sketch_runs_unchanged_on_a_stream(spark):
    """The count-min sketch is a pure multiset aggregate, so the SAME
    operator runs on a readStream with outputMode=complete — after two
    micro-batches the streaming state must equal the batch sketch of
    the union (the mergeability property, now held by Spark's agg
    state instead of a manual cell-wise sum)."""
    import json

    from webhookdb_spark.operators.sketches import countmin_sketch

    src = Path(tempfile.mkdtemp(prefix="whdb_cm_src_"))
    ckpt = Path(tempfile.mkdtemp(prefix="whdb_cm_ckpt_"))
    try:
        b1 = [{"v": "hot"}] * 30 + [{"v": f"c{i}"} for i in range(20)]
        b2 = [{"v": "hot"}] * 25 + [{"v": f"d{i}"} for i in range(10)]
        (src / "b1.json").write_text("\n".join(json.dumps(r) for r in b1))
        stream = spark.readStream.schema("v string").json(str(src))
        q = (
            countmin_sketch(stream, "v", depth=4, width=64)
            .writeStream.format("memory")
            .queryName("cm_t")
            .outputMode("complete")
            .option("checkpointLocation", str(ckpt))
            .trigger(processingTime="500 milliseconds")
            .start()
        )

        def snapshot():
            return {
                (r.row, r.bucket): r.cnt
                for r in spark.sql("SELECT * FROM cm_t").collect()
            }

        def wait_until(pred, timeout=90):
            deadline = time.time() + timeout
            while time.time() < deadline:
                s = snapshot()
                if pred(s):
                    return s
                time.sleep(0.5)
            raise AssertionError(f"timeout; last: {snapshot()}")

        def total(s):
            return sum(s.values())

        wait_until(lambda s: total(s) == 4 * len(b1))
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in b2))
        final = wait_until(lambda s: total(s) == 4 * (len(b1) + len(b2)))
        q.stop()

        both = spark.createDataFrame([(r["v"],) for r in b1 + b2], "v string")
        want = {
            (r.row, r.bucket): r.cnt
            for r in countmin_sketch(both, "v", depth=4, width=64).collect()
        }
        assert final == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


class _FakeTtlState(_FakeState):
    def __init__(self, value=None, timed_out=False):
        super().__init__(value)
        self.timed_out = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def hasTimedOut(self):
        return self.timed_out

    def remove(self):
        self.removed = True
        self._value = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_quota_fn_ttl_expiry_clears_idle_org():
    """The apws quota fallback's TTL path: every active batch re-arms
    the ProcessingTimeTimeout; a timed-out invocation (no rows) removes
    the idle org's counter and emits nothing — after which the org
    starts a fresh quota window."""
    import pandas as pd

    from webhookdb_spark.streaming.quota import _quota_fn

    fn = _quota_fn(quota=4, state_ttl_ms=60_000)
    st = _FakeTtlState()
    out = list(fn(("a",), iter([pd.DataFrame({"org": ["a"] * 3})]), st))
    assert len(out) == 1 and int(out[0].iloc[0].total_n) == 3
    assert st.timeout_set == 60_000            # armed
    assert st.get == (3,)

    # idle expiry: harness calls with hasTimedOut and no rows
    st.timed_out = True
    assert list(fn(("a",), iter([]), st)) == []
    assert st.removed and not st.exists

    # fresh window after expiry
    st2 = _FakeTtlState()
    out2 = list(fn(("a",), iter([pd.DataFrame({"org": ["a"] * 2})]), st2))
    assert int(out2[0].iloc[0].total_n) == 2   # counter restarted


def test_attribution_stream_joins_within_window_across_batches(spark):
    """Stream-stream join over two file sources: a purchase matches
    clicks within the 30-min window on the same user — including a
    click from the PREVIOUS micro-batch (buffered state) — and not
    clicks outside the window or other users."""
    import json

    from webhookdb_spark.streaming.windows import attribution_stream

    csrc = Path(tempfile.mkdtemp(prefix="whdb_att_c_"))
    psrc = Path(tempfile.mkdtemp(prefix="whdb_att_p_"))
    ckpt = Path(tempfile.mkdtemp(prefix="whdb_att_ck_"))
    try:
        t = "2026-01-01T10:{m:02d}:00"
        clicks1 = [
            {"user_id": 1, "event_id": 100, "ts": t.format(m=0)},
            {"user_id": 1, "event_id": 101, "ts": t.format(m=5)},
            {"user_id": 2, "event_id": 102, "ts": t.format(m=5)},
        ]
        (csrc / "b1.json").write_text("\n".join(json.dumps(r) for r in clicks1))

        schema = "user_id long, event_id long, ts timestamp"
        cs = spark.readStream.schema(schema).json(str(csrc))
        ps = spark.readStream.schema(schema).json(str(psrc))
        q = (
            attribution_stream(cs, ps, window_seconds=1800)
            .writeStream.format("memory")
            .queryName("attr_t")
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(processingTime="500 milliseconds")
            .start()
        )

        def snapshot():
            return {
                (r.user_id, r.purchase_id, r.click_id)
                for r in spark.sql("SELECT * FROM attr_t").collect()
            }

        def wait_for(n, timeout=90):
            deadline = time.time() + timeout
            while time.time() < deadline:
                if len(snapshot()) >= n:
                    return snapshot()
                time.sleep(0.5)
            raise AssertionError(f"timeout; last: {snapshot()}")

        # batch 2: user 1 purchases at 10:20 — clicks at 10:00 (1200s)
        # and 10:05 (900s) both inside the 1800s window; user 2's click
        # must not attach; a 9:40 click for user 1 (2400s) is outside
        purchases1 = [{"user_id": 1, "event_id": 200, "ts": t.format(m=20)}]
        (psrc / "b1.json").write_text("\n".join(json.dumps(r) for r in purchases1))
        got = wait_for(2)
        q.stop()
        assert got == {(1, 200, 100), (1, 200, 101)}
    finally:
        shutil.rmtree(csrc, ignore_errors=True)
        shutil.rmtree(psrc, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_silence_alerts_fire_on_watermark_and_rearm(spark):
    """Two micro-batches: batch 1's keys go quiet; batch 2 advances
    the watermark past key a's last_seen + silence -> exactly one
    alert for a (b stays active via a fresh event and does not fire).
    Event-time semantics: the data, not the wall clock, proves the
    silence."""
    import json

    from webhookdb_spark.streaming.windows import silence_alerts_stream

    src = Path(tempfile.mkdtemp(prefix="whdb_silence_src_"))
    ckpt = Path(tempfile.mkdtemp(prefix="whdb_silence_ckpt_"))
    try:
        b1 = [
            {"user_id": 1, "ts": "2024-01-01T00:00:00"},
            {"user_id": 1, "ts": "2024-01-01T00:00:30"},
            {"user_id": 2, "ts": "2024-01-01T00:00:40"},
        ]
        (src / "b1.json").write_text("\n".join(json.dumps(r) for r in b1))
        stream = spark.readStream.schema("user_id long, ts timestamp").json(
            str(src)
        )
        q = (
            silence_alerts_stream(stream, silence_seconds=60, watermark="5 seconds")
            .writeStream.format("memory")
            .queryName("silence_t")
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(processingTime="500 milliseconds")
            .start()
        )

        def alerts():
            return {
                (r.key, str(r.last_seen), int(r.silence_seconds))
                for r in spark.sql("SELECT * FROM silence_t").collect()
            }

        def wait_for(n, timeout=90):
            deadline = time.time() + timeout
            while time.time() < deadline:
                if len(alerts()) >= n:
                    return alerts()
                time.sleep(0.5)
            raise AssertionError(f"timeout; alerts: {alerts()}")

        # batch 2: key 2 stays active late enough that the watermark
        # (max_ts - 5s) passes key 1's deadline (00:00:30 + 60s)
        b2 = [{"user_id": 2, "ts": "2024-01-01T00:02:00"}]
        time.sleep(2)
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in b2))
        # a third batch advances the watermark again so the timer fires
        b3 = [{"user_id": 3, "ts": "2024-01-01T00:02:10"}]
        time.sleep(2)
        (src / "b3.json").write_text("\n".join(json.dumps(r) for r in b3))

        got = wait_for(1)
        q.stop()
        assert (1, "2024-01-01 00:00:30", 60) in got
        assert all(k != 2 for k, *_ in got), got
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_log_histogram_sketch_runs_unchanged_on_a_stream(spark):
    """The log-bucketed quantile sketch state is a pure multiset
    aggregate (exact bucket counts), so the SAME operator runs on a
    readStream with outputMode=complete — after two micro-batches the
    streaming state must equal the batch sketch of the union, and the
    quantiles extracted from it match the batch pipeline."""
    import json

    from webhookdb_spark.operators.sketches import (
        log_histogram_quantiles,
        log_histogram_state,
    )

    src = Path(tempfile.mkdtemp(prefix="whdb_lh_src_"))
    ckpt = Path(tempfile.mkdtemp(prefix="whdb_lh_ckpt_"))
    try:
        b1 = [{"x": float(1 + i % 40)} for i in range(60)]
        b2 = [{"x": float(100 + i)} for i in range(40)]
        (src / "b1.json").write_text("\n".join(json.dumps(r) for r in b1))
        (src / "b2.json").write_text("\n".join(json.dumps(r) for r in b2))
        stream = spark.readStream.schema("x double").json(str(src))
        q = (
            log_histogram_state(stream, "x")
            .writeStream.format("memory")
            .queryName("lh_t")
            .outputMode("complete")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.bucket): r.n for r in spark.sql("SELECT * FROM lh_t").collect()
        }
        batch = spark.createDataFrame(
            [(r["x"],) for r in b1 + b2], "x double"
        )
        want = {
            r.bucket: r.n
            for r in log_histogram_state(batch, "x").collect()
        }
        assert got == want
        est = {
            r.p: r.est
            for r in log_histogram_quantiles(
                spark.sql("SELECT * FROM lh_t"), [0.5, 0.9]
            ).collect()
        }
        want_est = {
            r.p: r.est
            for r in log_histogram_quantiles(
                log_histogram_state(batch, "x"), [0.5, 0.9]
            ).collect()
        }
        assert est == want_est
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_incremental_agg_maintenance(spark, tmp_path):
    """The IVM maintainer runs as a change-feed STREAM consumer:
    stream_changes -> foreachBatch(maintainer.run) keeps the grouped
    aggregate equal to a from-scratch recompute across micro-batches
    and checkpoint replays (the maintainer's own txn watermark makes
    replayed batches no-ops)."""
    import json

    from pyspark.sql import functions as F

    from webhookdb_spark.operators.matview import IncrementalAggMaintainer
    from webhookdb_spark.operators.upsert import (
        stream_changes,
        upsert_envelopes,
    )
    from webhookdb_spark.replicators.fake import FAKE_V1
    from webhookdb_spark.storage import Warehouse

    def env(items):
        return spark.createDataFrame(
            [("fake_v1", json.dumps(it), None) for it in items],
            "opaque_id string, body string, received_at timestamp",
        )

    t = Warehouse(spark, tmp_path / "wh").table("org", "fake_v1")
    shape = lambda b: b.select(  # noqa: E731
        "my_id",
        F.get_json_object(F.col("data").cast("string"), "$.g").alias("g"),
        F.get_json_object(F.col("data").cast("string"), "$.v")
        .cast("long")
        .alias("v"),
    )
    mt = IncrementalAggMaintainer(
        spark, str(tmp_path / "ivm"), "my_id", "g", "v", project=shape
    )
    ckpt = str(tmp_path / "ivm_ckpt")

    def run_once():
        q = (
            stream_changes(t)
            .writeStream.foreachBatch(lambda _b, _i: mt.run(t))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    upsert_envelopes(t, env([
        {"my_id": "a", "at": "2024-01-01T00:00:00Z", "g": "x", "v": 3},
        {"my_id": "b", "at": "2024-01-01T00:00:00Z", "g": "y", "v": 4},
    ]), FAKE_V1)
    run_once()
    upsert_envelopes(t, env([
        {"my_id": "a", "at": "2024-01-02T00:00:00Z", "g": "y", "v": 8},
    ]), FAKE_V1)
    run_once()

    got = {(r.group, r.n_keys, r.total) for r in mt.aggregate().collect()}
    assert got == {("y", 2, 12)}

    run_once()  # checkpoint replay: still exact
    got = {(r.group, r.n_keys, r.total) for r in mt.aggregate().collect()}
    assert got == {("y", 2, 12)}


def test_span_store_streaming_consumer_matches_batch(spark, tmp_path):
    """The span store runs as a STREAM consumer: each micro-batch of
    documents is scored against the standing store, then appended to
    it (score-then-absorb, the arrival-order semantics of an
    ingest-time novelty gate). The streamed scores must equal a
    sequential batch-fed replay of the same arrival order — the
    store's grown == one-shot contract lifted to streaming."""
    from webhookdb_spark.operators.dedup import (
        append_span_store,
        batch_span_novelty,
        write_span_store,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    seed = mk([(1, shared + " a1 a2 a3 a4 a5 a6 a7")])
    b1 = [(10, shared + " n1 n2 n3 n4 n5 n6 n7"),
          (11, "u1 u2 u3 u4 u5 u6 u7 u8 u9")]
    b2 = [(20, "u1 u2 u3 u4 u5 u6 u7 u8 fresh"),  # hits b1's span via store
          (21, "w1 w2 w3 w4 w5 w6 w7 w8")]

    stream_store = str(tmp_path / "stream_store")
    write_span_store(seed, stream_store, k=8)

    src = tmp_path / "src"
    src.mkdir()
    mk(b1).coalesce(1).write.parquet(str(src / "d=0"))
    mk(b2).coalesce(1).write.parquet(str(src / "d=1"))

    got = []

    def handle(batch, _bid):
        rows = [r.doc_id for r in batch.select("doc_id").collect()]
        if not rows:
            return
        scored = {tuple(r) for r in
                  batch_span_novelty(batch, spark, stream_store).collect()}
        got.append((min(rows), scored))
        append_span_store(batch, stream_store)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "d=*"))
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(got) == 2

    # batch-fed replay in the SAME arrival order
    replay_store = str(tmp_path / "replay_store")
    write_span_store(seed, replay_store, k=8)
    batches = {10: mk(b1), 20: mk(b2)}
    for first_doc, scored in got:
        b = batches[first_doc]
        want = {tuple(r) for r in
                batch_span_novelty(b, spark, replay_store).collect()}
        assert scored == want
        append_span_store(b, replay_store)


def test_span_store_streaming_identical(spark):
    """Streaming-identical proof for the span store (the dedup-family
    member of the house standard: count-min/quantile sketches, IVM,
    SCD2 feed). Novelty-at-arrival is ORDER-DEFINED, so the contract
    is two-sided: (a) foreachBatch delivery of the doc stream — score
    each micro-batch against the standing store, then fold it in —
    yields exactly the per-batch results of the same-order batch loop;
    (b) the final appended store, compacted, holds the same window-
    hash counts as a one-shot write_span_store over the full corpus."""
    from pyspark.sql import functions as F

    from webhookdb_spark.operators.dedup import (
        _span_store_frames,
        append_span_store,
        batch_span_novelty,
        compact_span_store,
        write_span_store,
    )

    src = Path(tempfile.mkdtemp(prefix="whdb_spanstream_src_"))
    root = Path(tempfile.mkdtemp(prefix="whdb_spanstream_"))
    stream_store = str(root / "stream")
    loop_store = str(root / "loop")
    ckpt = str(root / "ckpt")
    base = "alpha beta gamma delta epsilon zeta eta theta"
    batches = [
        [(0, f"{base} one two"), (1, f"{base} one two")],     # intra-dup
        [(2, f"{base} three x"), (3, "totally different words here now ok yes")],
        [(4, f"{base} one two"), (5, "fresh unique windows not seen before at all")],
    ]
    try:
        results_stream: dict[int, list] = {}

        def on_batch(bdf, bid):
            docs = bdf.select("doc_id", "text")
            if not docs.head(1):
                return
            i = min(r.doc_id for r in docs.select("doc_id").collect()) // 2
            if Path(stream_store, "_span_meta.json").exists():
                nov = batch_span_novelty(docs, spark, stream_store)
                results_stream[i] = sorted(map(tuple, nov.collect()))
                append_span_store(docs, stream_store)
            else:
                # first batch: no standing store; one-shot semantics
                from webhookdb_spark.operators.dedup import span_novelty

                results_stream[i] = sorted(
                    map(tuple, span_novelty(docs, k=4).collect())
                )
                write_span_store(docs, stream_store, k=4, n_shards=4)

        reader = spark.readStream.schema("doc_id long, text string")
        for i, rows in enumerate(batches):
            (src / f"b{i}.json").write_text(
                "\n".join(json.dumps({"doc_id": d, "text": t})
                          for d, t in rows)
            )
            q = (
                reader.json(str(src))
                .writeStream.foreachBatch(on_batch)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        # (a) same-order batch loop replay
        results_loop: dict[int, list] = {}
        for i, rows in enumerate(batches):
            docs = spark.createDataFrame(rows, "doc_id long, text string")
            if i == 0:
                from webhookdb_spark.operators.dedup import span_novelty

                results_loop[i] = sorted(
                    map(tuple, span_novelty(docs, k=4).collect())
                )
                write_span_store(docs, loop_store, k=4, n_shards=4)
            else:
                nov = batch_span_novelty(docs, spark, loop_store)
                results_loop[i] = sorted(map(tuple, nov.collect()))
                append_span_store(docs, loop_store)
        assert results_stream == results_loop
        # batch 3 re-sends batch-1 text: its windows must be all-dup
        dup_doc = [r for r in results_stream[2] if r[0] == 4][0]
        assert dup_doc[3] == 0  # novelty_ppm
        fresh_doc = [r for r in results_stream[2] if r[0] == 5][0]
        assert fresh_doc[3] == 1000000

        # (b) final store == one-shot over the full corpus
        compact_span_store(spark, stream_store)
        allrows = [r for b in batches for r in b]
        oneshot = str(root / "oneshot")
        write_span_store(
            spark.createDataFrame(allrows, "doc_id long, text string"),
            oneshot, k=4, n_shards=4,
        )
        _, grown = _span_store_frames(spark, stream_store)
        _, once = _span_store_frames(spark, oneshot)
        canon = lambda df: sorted(  # noqa: E731
            (r.h, r.n) for r in df.groupBy("h").agg(
                F.sum("n").alias("n")).collect()
        )
        assert canon(grown) == canon(once)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)
