"""Integration-sequence defaulter (column.rb:277-280, base.rb:689-699)
and uuid7 — the stateful/generated defaulters."""

from __future__ import annotations

import datetime as dt
import json
import re

from webhookdb_spark.operators.upsert import IntegrationSequence, upsert_envelopes
from webhookdb_spark.spec import Col, ReplicatorSpec, defaulter_uuid7
from webhookdb_spark.storage import Warehouse
from webhookdb_spark.types import ColumnType

SPEC = ReplicatorSpec(
    name="seqd_v1",
    table="seqd_v1",
    remote_key=Col("my_id", ColumnType.TEXT, data_key="id"),
    denorm_cols=(
        Col("at", ColumnType.TIMESTAMP),
        # converter_int_or_sequence_from_regex composition
        # (column.rb:132-152): take the int from the payload when
        # present, else draw from the integration sequence.
        Col("counter", ColumnType.BIGINT, data_key="num", optional=True,
            defaulter="sequence"),
    ),
    timestamp_col="at",
    update_where=lambda s, t: t("at") < s("at"),
    n_buckets=4,
)


def _env(spark, rows):
    return spark.createDataFrame(
        [(json.dumps(r), dt.datetime(2026, 1, 1)) for r in rows],
        "body string, received_at timestamp",
    )


def test_sequence_unique_monotonic_across_batches(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "seqd_v1")
    upsert_envelopes(
        t,
        _env(spark, [{"id": f"a{i}", "at": "2024-01-01T00:00:00Z"} for i in range(5)]),
        SPEC,
    )
    first = {r.my_id: r.counter for r in t.read().collect()}
    assert len(set(first.values())) == 5  # unique
    assert all(v >= 1 for v in first.values())

    upsert_envelopes(
        t,
        _env(spark, [{"id": f"b{i}", "at": "2024-01-01T00:00:00Z"} for i in range(5)]),
        SPEC,
    )
    rows = {r.my_id: r.counter for r in t.read().collect()}
    batch2 = {v for k, v in rows.items() if k.startswith("b")}
    assert len(set(rows.values())) == 10  # globally unique
    assert min(batch2) > max(first.values())  # monotonic across batches


def test_sequence_respects_payload_value(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "seqd_v1")
    upsert_envelopes(
        t,
        _env(
            spark,
            [
                {"id": "x", "at": "2024-01-01T00:00:00Z", "num": 777},
                {"id": "y", "at": "2024-01-01T00:00:00Z"},
            ],
        ),
        SPEC,
    )
    rows = {r.my_id: r.counter for r in t.read().collect()}
    assert rows["x"] == 777  # payload value wins (regex-or-sequence parity)
    assert rows["y"] != 777 and rows["y"] >= 1


def test_int_or_sequence_from_regex_round_trip(spark, tmp_warehouse):
    """fake.rb:368-380 parity: the URL-embedded id wins when present,
    the integration sequence supplies it otherwise."""
    from webhookdb_spark.functions.converters import (
        converter_int_or_sequence_from_regex,
    )
    from webhookdb_spark.replicators.fake import FAKE_INT_OR_SEQ_V1

    conv = converter_int_or_sequence_from_regex(r"/resources/(\d+)")
    assert conv.needs_sequence and not conv.backfillable

    t = Warehouse(spark, str(tmp_warehouse)).table("org", "fake_int_or_seq_v1")
    upsert_envelopes(
        t,
        _env(
            spark,
            [
                {"my_id": "a", "at": "2024-01-01T00:00:00Z",
                 "url": "https://api.example.com/resources/4242"},
                {"my_id": "b", "at": "2024-01-01T00:00:00Z",
                 "url": "https://api.example.com/resources/"},  # no id yet
                {"my_id": "c", "at": "2024-01-01T00:00:00Z"},   # no url at all
            ],
        ),
        FAKE_INT_OR_SEQ_V1,
    )
    rows = {r.my_id: r.int_or_seq for r in t.read().collect()}
    assert rows["a"] == 4242
    assert rows["b"] != rows["c"] and rows["b"] >= 1 and rows["c"] >= 1
    assert 4242 not in (rows["b"], rows["c"])


def test_sequence_watermark_persists(tmp_warehouse):
    s = IntegrationSequence(tmp_warehouse)
    assert s.watermark() == 0
    assert s._reserve(41) == 0  # range starts at the old watermark
    assert IntegrationSequence(tmp_warehouse).watermark() == 41


def test_sequence_concurrent_reserves_disjoint(tmp_warehouse):
    """r13 code review: two concurrent fills must draw DISJOINT ranges
    — the reservation is an O_EXCL-locked atomic RMW, so a thread pool
    hammering it yields every value exactly once."""
    from concurrent.futures import ThreadPoolExecutor

    s = IntegrationSequence(tmp_warehouse / "conc")
    with ThreadPoolExecutor(max_workers=8) as ex:
        starts = list(ex.map(lambda n: s._reserve(n), [7] * 40))
    ranges = sorted((st, st + 7) for st in starts)
    assert len(set(st for st, _ in ranges)) == 40  # all distinct
    for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
        assert a1 == b0  # contiguous, no overlap, no gap
    assert s.watermark() == 280


def test_sequence_fresh_foreign_lock_not_evicted(tmp_warehouse):
    """r13 ADVICE (medium): the old blind stale-unlink let a waiter
    evict a FRESH lock that replaced a stale one mid-check. The steal
    is now rename-and-verify: a fresh foreign lock must survive a
    blocked waiter's full timeout, and the waiter must raise instead
    of entering the critical section."""
    import pytest

    from webhookdb_spark.storage import ConcurrentWriteError

    s = IntegrationSequence(tmp_warehouse / "fresh")
    s.file.parent.mkdir(parents=True, exist_ok=True)
    lock = s.file.parent / (s.file.name + ".lock")
    lock.write_bytes(b"someone-else.fresh-token")  # fresh mtime = now
    s.lock_timeout = 0.4
    with pytest.raises(ConcurrentWriteError):
        s._reserve(5)
    assert lock.read_bytes() == b"someone-else.fresh-token"
    assert s.watermark() == 0  # no reservation happened


def test_sequence_stale_lock_stolen_and_reservation_proceeds(tmp_warehouse):
    """Crashed-holder recovery still works: a lock whose mtime is past
    stale_after is stolen (rename-and-verify) and the reservation
    completes."""
    import os
    import time

    s = IntegrationSequence(tmp_warehouse / "stale")
    s.file.parent.mkdir(parents=True, exist_ok=True)
    lock = s.file.parent / (s.file.name + ".lock")
    lock.write_bytes(b"crashed-holder.token")
    old = time.time() - 60.0
    os.utime(lock, (old, old))
    assert s._reserve(9) == 0
    assert s.watermark() == 9
    assert not lock.exists()  # released cleanly after the steal


UUID7_RE = re.compile(
    r"^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
)


def test_uuid7_format_and_time_ordering(spark):
    df = spark.range(50).select(defaulter_uuid7().alias("u"))
    vals = [r.u for r in df.collect()]
    assert all(UUID7_RE.match(v) for v in vals), vals[:3]
    assert len(set(vals)) == 50
    # time prefix is the same batch-millisecond or later vs a past stamp
    assert all(v >= "017" for v in vals)


def test_fill_retries_once_on_stolen_reservation(spark, tmp_warehouse, monkeypatch):
    """r14 ADVICE: _reserve aborts a stolen-lock reservation with
    'caller retries', but fill() (its only caller) never retried, so a
    transient steal failed the whole fill. fill() now absorbs exactly
    one steal (the abort commits nothing, so an immediate retry is
    safe) and a persistent steal still propagates."""
    import pytest

    from webhookdb_spark.operators.upsert import IntegrationSequence
    from webhookdb_spark.storage import ConcurrentWriteError

    s = IntegrationSequence(tmp_warehouse / "retry_seq")
    real = s._reserve
    calls = {"n": 0}

    def flaky(n):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConcurrentWriteError("stolen during reservation")
        return real(n)

    monkeypatch.setattr(s, "_reserve", flaky)
    df = spark.createDataFrame(
        [(1, None), (2, None)], "id long, counter long"
    )
    out = s.fill(df, "counter")
    assert sorted(r["counter"] for r in out.collect()) == [1, 2]
    assert calls["n"] == 2  # one steal absorbed, one success
    assert s.watermark() == 2  # advanced exactly once

    def always_stolen(n):
        raise ConcurrentWriteError("stolen during reservation")

    monkeypatch.setattr(s, "_reserve", always_stolen)
    with pytest.raises(ConcurrentWriteError):
        s.fill(spark.createDataFrame([(3, None)], "id long, counter long"),
               "counter")
