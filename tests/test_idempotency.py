"""Keyed idempotency gate (reference: lib/webhookdb/idempotency.rb),
semantics pinned vector-for-vector against the reference's own spec
(spec/webhookdb/idempotency_spec.rb)."""

from __future__ import annotations

import datetime as dt
import json
import threading

from webhookdb_spark.operators.idempotency import NOOP, Idempotency

H = dt.timedelta(hours=1)


class Clock:
    def __init__(self):
        self.t = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

    def travel(self, delta):
        self.t += delta

    def __call__(self):
        return self.t


def test_every_reinvokes_only_after_interval(tmp_path):
    # idempotency_spec.rb:7-20: 3×(call, +1h, call, +13h) under
    # every(12h) runs exactly 3 times
    clock = Clock()
    idem = Idempotency(tmp_path, now=clock)
    count = 0

    def inc():
        nonlocal count
        count += 1

    for _ in range(3):
        idem.every(12 * H).under_key("some-key", inc)
        clock.travel(1 * H)
        idem.every(12 * H).under_key("some-key", inc)
        clock.travel(13 * H)
    assert count == 3


def test_once_ever_only_first_time(tmp_path):
    idem = Idempotency(tmp_path)
    count = 0

    def inc():
        nonlocal count
        count += 1

    for _ in range(3):
        idem.once_ever().under_key("some-key", inc)
    assert count == 1


def test_returns_result_or_noop(tmp_path):
    # idempotency_spec.rb:35-38
    idem = Idempotency(tmp_path)
    assert idem.once_ever().under_key("some-key", lambda: 5) == 5
    assert idem.once_ever().under_key("some-key", lambda: 5) is NOOP


def test_stored_semantics(tmp_path):
    # idempotency_spec.rb:57-68: stored on a key never stored → None;
    # stored results JSON-round-trip and replay without running the block
    idem = Idempotency(tmp_path)
    assert idem.once_ever().under_key("unstored", lambda: 5) == 5
    assert idem.once_ever().under_key("unstored", lambda: 5) is NOOP
    assert idem.once_ever().stored().under_key("unstored", lambda: 5) is None

    def boom():
        raise RuntimeError("not hit")

    assert idem.once_ever().stored().under_key("stored-int", lambda: 5) == 5
    assert idem.once_ever().stored().under_key("stored-int", boom) == 5

    got = idem.once_ever().stored().under_key("stored-hash", lambda: {"x": 1})
    assert got == {"x": 1}
    assert idem.once_ever().stored().under_key("stored-hash", boom) == {"x": 1}


def test_in_memory_gate(tmp_path):
    # idempotency_spec.rb:81-109: same cadence/storage semantics, no
    # files written
    clock = Clock()
    idem = Idempotency(tmp_path, now=clock)
    count = 0

    def inc():
        nonlocal count
        count += 1

    for _ in range(3):
        idem.every(12 * H).in_memory().under_key("some-key", inc)
        clock.travel(1 * H)
        idem.every(12 * H).in_memory().under_key("some-key", inc)
        clock.travel(13 * H)
    assert count == 3
    assert list(tmp_path.iterdir()) == []  # nothing persisted

    def boom():
        raise RuntimeError("not hit")

    b = idem.once_ever()
    assert b.in_memory().under_key("unstored", lambda: 5) == 5
    assert idem.once_ever().in_memory().under_key("unstored", lambda: 5) is NOOP
    assert (idem.once_ever().in_memory().stored()
            .under_key("unstored", lambda: 5)) is None
    assert (idem.once_ever().in_memory().stored()
            .under_key("stored-int", lambda: 5)) == 5
    assert idem.once_ever().in_memory().stored().under_key("stored-int", boom) == 5


def test_separate_connection_chain_is_accepted(tmp_path):
    # API parity: using_seperate_connection (sic) chains through
    idem = Idempotency(tmp_path)
    b = idem.once_ever().using_seperate_connection().transaction_ok()
    assert b.under_key("x", lambda: 5) == 5
    assert b.under_key("x", lambda: 5) is NOOP


def test_block_raising_does_not_mark_run(tmp_path):
    # the reference's row update happens after the yield; an exception
    # leaves last_run NULL so the next call runs the block
    idem = Idempotency(tmp_path)

    def boom():
        raise RuntimeError("x")

    try:
        idem.once_ever().under_key("k", boom)
    except RuntimeError:
        pass
    assert idem.once_ever().under_key("k", lambda: 7) == 7


def test_cross_process_persistence_and_lock(tmp_path):
    # the file gate is shared across Idempotency instances (processes);
    # the per-key lock serializes concurrent callers so exactly one runs
    a, b = Idempotency(tmp_path), Idempotency(tmp_path)
    assert a.once_ever().under_key("shared", lambda: 1) == 1
    assert b.once_ever().under_key("shared", lambda: 1) is NOOP

    ran = []
    barrier = threading.Barrier(4)

    def attempt():
        barrier.wait()
        r = Idempotency(tmp_path).once_ever().under_key(
            "race", lambda: ran.append(1) or "ok")
        return r

    threads = [threading.Thread(target=attempt) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(ran) == 1


def test_state_file_shape(tmp_path):
    # crash-consistency: state commits via write-temp-then-rename, and
    # a non-stored update preserves a previously stored result
    idem = Idempotency(tmp_path)
    idem.every(dt.timedelta(0)).stored().under_key("k", lambda: [1, 2])
    idem.every(dt.timedelta(0)).under_key("k", lambda: "ran-again")
    assert idem.once_ever().stored().under_key("k", lambda: 9) == [1, 2]
    files = list(tmp_path.rglob("state.json"))
    assert len(files) == 1
    doc = json.loads(files[0].read_text())
    assert doc["key"] == "k" and doc["stored_result"] == [1, 2]


def test_empty_userinfo_absent():
    # ADVICE r11: http.rb:110 gates on userinfo.present? — a bare '@'
    # (or none at all) must not grow an empty Basic Auth header, while
    # ':' userinfo (present but empty creds) must
    from webhookdb_spark.sinks.sync_target import extract_url_auth

    assert extract_url_auth("https://@a.b") == ("https://@a.b", None)
    cleaned, auth = extract_url_auth("https://:@a.b")
    assert cleaned == "https://a.b"
    assert auth == {"username": "", "password": ""}


def test_long_callback_survives_staleness(tmp_path):
    # ADVICE r11: a callback running past the lock's stale_after must
    # NOT have its lock stolen (the heartbeat keeps a live holder
    # fresh), so a concurrent caller blocks and then observes last_run
    # instead of re-running the side effect.
    import time

    ran = []
    first_done = threading.Event()

    def slow():
        time.sleep(1.2)  # > stale_after below
        ran.append("slow")
        return "slow"

    def holder():
        idem = Idempotency(tmp_path, lock_stale_after=0.4)
        idem.once_ever().under_key("k", slow)
        first_done.set()

    t = threading.Thread(target=holder)
    t.start()
    time.sleep(0.3)  # let the holder acquire and enter the callback
    idem2 = Idempotency(tmp_path, lock_stale_after=0.4)
    got = idem2.once_ever().under_key("k", lambda: ran.append("second") or "second")
    t.join()
    assert first_done.is_set()
    assert ran == ["slow"]  # exactly one run; the waiter got NOOP
    assert got is NOOP


def test_stolen_lock_refuses_to_record(tmp_path):
    # A holder whose lock WAS stolen (simulated: replace the lock file
    # under it) must raise instead of recording a run that raced.
    import pytest

    from webhookdb_spark.storage import ConcurrentWriteError

    # small lock params so the retry below can break the thief's
    # orphaned lock quickly
    idem = Idempotency(tmp_path, lock_timeout=10, lock_stale_after=0.5)

    def steal_then_return():
        lock = next(tmp_path.rglob("_manifest.lock"))
        lock.write_bytes(b"thief-token")
        return "ran"

    with pytest.raises(ConcurrentWriteError, match="stolen"):
        idem.once_ever().under_key("k", steal_then_return)
    # the run was NOT recorded: a later caller runs the callback
    assert idem.once_ever().under_key("k", lambda: "retry") == "retry"
