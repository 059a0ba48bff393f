"""Manifest-lock steal semantics (storage._ManifestLock).

The lock serializes the manifest compare-and-swap (reference analog:
Postgres row locks around the org-DB DDL/upsert path,
lib/webhookdb/organization.rb:125-164). These tests pin the
identity-verified steal protocol: a stale lock is broken, but a FRESH
lock acquired between the stealer's staleness stat and its rename is
detected by content token and restored, never destroyed.

Pure-filesystem tests — no SparkSession needed.
"""

import os
import time
import types
from pathlib import Path

import pytest

from webhookdb_spark.storage import ConcurrentWriteError, _ManifestLock


def _backdate(p: Path, seconds: float = 3600.0) -> None:
    old = time.time() - seconds
    os.utime(p, (old, old))


def test_acquire_writes_unique_token(tmp_path):
    lk = _ManifestLock(tmp_path, timeout=0.5)
    with lk:
        assert lk.lock_path.read_bytes() == lk.token
        assert lk.holds()
    assert not lk.lock_path.exists()  # released


def test_stale_lock_is_stolen(tmp_path):
    # A crashed holder's lock: old mtime, content never changes.
    lock = tmp_path / "_manifest.lock"
    lock.write_bytes(b"1234.deadbeef")
    _backdate(lock)
    lk = _ManifestLock(tmp_path, timeout=2.0, stale_after=60.0)
    with lk:
        # steal succeeded: the lock file now carries OUR token
        assert lock.read_bytes() == lk.token
    assert not lock.exists()


def test_release_never_unlinks_foreign_lock(tmp_path):
    lk = _ManifestLock(tmp_path, timeout=0.5)
    lk.__enter__()
    # Simulate a steal: another writer replaced the lock content.
    lk.lock_path.write_bytes(b"9999.thief")
    assert not lk.holds()
    lk.__exit__(None, None, None)
    # The thief's lock must survive our release.
    assert lk.lock_path.read_bytes() == b"9999.thief"
    lk.lock_path.unlink()


def test_fresh_acquirer_race_restores_lock(tmp_path, monkeypatch):
    """The ADVICE race: holder releases and a NEW writer acquires
    between the stealer's staleness stat and its rename. The stealer
    must detect the content mismatch, restore the fresh lock, and lose.
    """
    lock = tmp_path / "_manifest.lock"
    lock.write_bytes(b"2.fresh-owner")  # the new writer's live lock

    real_stat = Path.stat
    real_read = Path.read_bytes
    state = {"stats": 0, "reads": 0}

    def fake_stat(self, **kw):
        st = real_stat(self, **kw)
        if self.name == "_manifest.lock" and state["stats"] < 2:
            # First loop iteration: BOTH stats of the stat→read→stat
            # incarnation check see the OLD (crashed-looking) lock as
            # stale and self-consistent — the race must slip past the
            # measurement and be caught at rename-verify time.
            state["stats"] += 1
            return types.SimpleNamespace(
                st_mtime=st.st_mtime - 3600, st_ino=st.st_ino
            )
        return st

    def fake_read(self):
        if self.name == "_manifest.lock" and state["reads"] == 0:
            state["reads"] = 1
            # ...and observed the old holder's content; by the time the
            # rename lands, the file actually holds the fresh lock.
            return b"1.crashed-holder"
        return real_read(self)

    monkeypatch.setattr(Path, "stat", fake_stat)
    monkeypatch.setattr(Path, "read_bytes", fake_read)

    lk = _ManifestLock(tmp_path, timeout=0.3, stale_after=60.0)
    with pytest.raises(ConcurrentWriteError):
        lk.__enter__()
    # The fresh writer's lock was restored, not destroyed, and no
    # stray .steal.* files remain.
    assert lock.read_bytes() == b"2.fresh-owner"
    assert list(tmp_path.glob("_manifest.steal.*")) == []


def test_stat_read_toctou_detected_by_incarnation_check(
    tmp_path, monkeypatch
):
    """The r9 ADVICE TOCTOU: the stale holder releases and a FRESH
    writer acquires between the stealer's stat and its read, so age
    describes the abandoned lock while observed captures the fresh
    token — the rename-time content check would then "verify" and
    destroy the active lock. The second stat must detect the changed
    incarnation (ino/mtime) and abort the measurement: the fresh lock
    survives untouched and the stealer loses by timeout."""
    lock = tmp_path / "_manifest.lock"
    lock.write_bytes(b"2.fresh-owner")

    real_stat = Path.stat
    state = {"stats": 0}

    def fake_stat(self, **kw):
        st = real_stat(self, **kw)
        if self.name == "_manifest.lock" and state["stats"] == 0:
            # stat #1 catches the OLD lock file (stale, other inode);
            # read and stat #2 then see the fresh writer's lock.
            state["stats"] = 1
            return types.SimpleNamespace(
                st_mtime=st.st_mtime - 3600, st_ino=st.st_ino + 1
            )
        return st

    monkeypatch.setattr(Path, "stat", fake_stat)

    lk = _ManifestLock(tmp_path, timeout=0.3, stale_after=60.0)
    with pytest.raises(ConcurrentWriteError):
        lk.__enter__()
    assert lock.read_bytes() == b"2.fresh-owner"
    assert list(tmp_path.glob("_manifest.steal.*")) == []


def _stress_worker(args):
    """Module-level for multiprocessing pickling."""
    import time as _t

    table_dir, iters, idx = args
    from webhookdb_spark.storage import ConcurrentWriteError, _ManifestLock

    counter = Path(table_dir) / "counter.txt"
    wins = 0
    for i in range(iters):
        lk = _ManifestLock(Path(table_dir), timeout=30.0, stale_after=0.2)
        try:
            with lk:
                v = int(counter.read_text())
                # dwell past stale_after sometimes so OTHER writers
                # steal an ACTIVE lock — the protocol must make the
                # victim lose safely (holds() false), never corrupt.
                # (stale_after=0.2 keeps the benign holds()->write gap
                # far below the steal threshold on a loaded host.)
                if (idx + i) % 5 == 0:
                    _t.sleep(0.3)
                if lk.holds():
                    # Atomic publish (tmp + rename): a stealer whose
                    # read lands mid-write must see old-or-new, never
                    # a truncated file — write_text's truncate-then-
                    # write window crashed a reader with int('') once
                    # under a 3x-oversubscribed host. The REAL
                    # protocol publishes by rename too (staging dir +
                    # manifest CAS), so this models it faithfully; the
                    # final==sum(wins) interleaving pin is unchanged.
                    tmp = counter.with_suffix(f".tmp{idx}")
                    tmp.write_text(str(v + 1))
                    tmp.replace(counter)
                    wins += 1
        except ConcurrentWriteError:
            pass
    return wins


def test_steal_storm_mutual_exclusion(tmp_path):
    """6 processes x 30 iterations with stale_after far below the
    dwell time, so active-lock steals happen constantly: the counter's
    read-modify-write must never interleave — final counter equals
    exactly the number of increments writers performed while still
    holding their token."""
    import multiprocessing as mp

    (tmp_path / "counter.txt").write_text("0")
    n_procs, iters = 6, 30
    with mp.get_context("spawn").Pool(n_procs) as pool:
        wins = pool.map(
            _stress_worker,
            [(str(tmp_path), iters, i) for i in range(n_procs)],
        )
    final = int((tmp_path / "counter.txt").read_text())
    assert final == sum(wins), (final, wins)
    assert sum(wins) > 0


def test_release_is_atomic_against_steal_swap(tmp_path):
    """r13 code review: release uses rename-and-verify, so even when a
    stealer swaps in ITS fresh lock between our last holds() check and
    the unlink, the foreign lock is restored, not destroyed. (The old
    holds()-then-unlink had exactly that TOCTOU.) Simulated by
    replacing the lock content post-acquire: the release must put the
    foreign lock back via the link-restore path."""
    lk = _ManifestLock(tmp_path, timeout=0.5)
    lk.__enter__()
    lk.lock_path.unlink()
    # stealer's fresh O_EXCL lock
    lk.lock_path.write_bytes(b"4242.stealer")
    lk.__exit__(None, None, None)
    assert lk.lock_path.read_bytes() == b"4242.stealer"
    # and no stray .rel.* residue
    assert not list(tmp_path.glob("_manifest.rel.*"))
    lk.lock_path.unlink()
