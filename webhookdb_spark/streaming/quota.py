"""Per-org intake quota as a stateful-streaming operator, with two
backends: ``transformWithStateInPandas`` (the arbitrary-state
successor API — typed state handles, per-state TTL, timers) and an
``applyInPandasWithState`` fallback with identical output, used where
the successor API's protobuf dependency is unavailable.

Reference semantics: the engine already bounds intake with a per-org
semaphore and per-trigger caps (`streaming/ingest.py:36-196`); this
operator adds the CUMULATIVE quota — "org X may land at most N
envelopes per retention window" — with the counter living in the
state store (RocksDB at scale; one int64 per org, TTL-expired so idle
orgs cost nothing). Rows over quota are not dropped silently: every
batch emits (org, batch_n, total_n, throttled_n) so the caller can
route the overflow to a dead-letter table, matching the engine's
log-then-decide posture.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

_OUT_SCHEMA = "org string, batch_n long, total_n long, throttled_n long"


class _QuotaProcessor(StatefulProcessor):
    def __init__(self, quota: int, state_ttl_ms: int | None):
        self._quota = int(quota)
        self._ttl = state_ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState("count", "n long", self._ttl)

    def handleInputRows(self, key, rows, timerValues) -> "Iterator[pd.DataFrame]":
        import pandas as pd

        batch_n = sum(len(pdf) for pdf in rows)
        prev = self._count.get()
        prior = int(prev[0]) if prev is not None else 0
        total = prior + batch_n
        # rows past the quota boundary in THIS batch are the throttled
        # overflow; prior batches' overflow was already reported
        throttled = max(0, total - max(self._quota, prior))
        self._count.update((total,))
        yield pd.DataFrame(
            {
                "org": [key[0]],
                "batch_n": [batch_n],
                "total_n": [total],
                "throttled_n": [throttled],
            }
        )

    def close(self) -> None:
        pass


def _quota_fn(quota: int, state_ttl_ms: int | None):
    """The same counter logic as :class:`_QuotaProcessor`, shaped for
    ``applyInPandasWithState``: GroupState instead of a ValueState
    handle, TTL via ProcessingTimeTimeout (a timed-out invocation
    arrives with no rows and clears the idle org's counter)."""

    def fn(key, pdfs, state) -> "Iterator[pd.DataFrame]":
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        batch_n = sum(len(pdf) for pdf in pdfs)
        prior = int(state.get[0]) if state.exists else 0
        total = prior + batch_n
        throttled = max(0, total - max(quota, prior))
        state.update((total,))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(int(state_ttl_ms))
        yield pd.DataFrame(
            {
                "org": [key[0]],
                "batch_n": [batch_n],
                "total_n": [total],
                "throttled_n": [throttled],
            }
        )

    return fn


def _have_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:  # pragma: no cover - environment-specific
        return False


def org_quota_stream(
    envelopes: DataFrame,
    quota: int,
    org_col: str = "org",
    state_ttl_ms: int | None = None,
    impl: str = "auto",
) -> DataFrame:
    """One (org, batch_n, total_n, throttled_n) row per org per
    micro-batch, with the cumulative counter in the state store.
    ``state_ttl_ms`` expires idle orgs' counters (quota windows);
    None keeps them for the stream's lifetime.

    Two interchangeable stateful backends, same output and state
    shape:

    - ``transformWithStateInPandas`` (``impl="tws"``): typed ValueState
      + native TTL. Its Python worker speaks protobuf to the JVM state
      server, so it needs ``google.protobuf`` on the workers.
    - ``applyInPandasWithState`` (``impl="apws"``): GroupState tuple +
      ProcessingTimeTimeout standing in for TTL. No protobuf
      dependency — runs anywhere the older API does.

    ``impl="auto"`` picks tws when protobuf is importable, else apws —
    so the operator is runnable in protobuf-less sandboxes and still
    uses the successor API on full clusters."""
    if impl not in ("auto", "tws", "apws"):
        raise ValueError(f"org_quota_stream impl {impl!r}")
    grouped = envelopes.select(F.col(org_col).alias("org")).groupBy("org")
    if impl == "tws" or (impl == "auto" and _have_protobuf()):
        if not _have_protobuf():
            raise ImportError(
                "transformWithStateInPandas requires google.protobuf in "
                "the Python workers; not available in this environment — "
                "use impl='apws' (or 'auto')"
            )
        return grouped.transformWithStateInPandas(
            _QuotaProcessor(quota, state_ttl_ms),
            outputStructType=_OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return grouped.applyInPandasWithState(
        _quota_fn(quota, state_ttl_ms),
        outputStructType=_OUT_SCHEMA,
        stateStructType="n long",
        outputMode="append",
        timeoutConf=timeout,
    )
