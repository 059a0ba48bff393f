"""Windowed / stateful streaming operators (SURVEY §2.9).

The reference needs no event-time windows — its only "aggregations"
are sync-stats summaries (sync_target.rb:334-390) and per-feed counts
(icalendar_calendar_v1.rb:203-218) — but the rebuilt engine exposes the
native Structured Streaming surface for them:

- ``windowed_event_counts``: tumbling/sliding event-time windows with a
  watermark bounding state for late data;
- ``sessionized_counts``: session windows keyed by gap;
- ``changed_rows_stream``: a CUSTOM stateful operator
  (``applyInPandasWithState``) reproducing the reference's
  "skip unchanged rows" guard (`data !~ excluded.data`,
  base.rb:861-879) ACROSS micro-batches: per-key state holds the last
  payload hash and only new/changed payloads pass. This is the
  streaming dedup that saves the downstream MERGE from touching
  unchanged keys at all.

All three work identically on batch DataFrames (window/session_window
are plain expressions there), which is how the value tests pin them.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 day",
    group_col: str | None = "event_type",
) -> DataFrame:
    """Event-time windowed counts with a watermark.

    On a stream the watermark bounds state (late rows beyond it are
    dropped); on a batch frame it is a no-op and the same plan computes
    exact historical windows. Sliding windows multiply state by
    window/slide — keep the ratio small at 100 TB/day rates.
    """
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide or window)
    keys = [win.alias("win")] + ([F.col(group_col)] if group_col else [])
    return (
        events.groupBy(*keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *([group_col] if group_col else []),
            "n_events",
        )
    )


def sessionized_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key_col: str = "user_id",
    watermark: str = "1 day",
) -> DataFrame:
    """Session windows: activity bursts per key separated by ``gap``."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(win.alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


_CHANGED_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("change", T.StringType()),  # insert | update
    ]
)
_STATE_SCHEMA = T.StructType([T.StructField("last_hash", T.StringType())])


def _changed_rows_fn(
    key: Any, pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import hashlib

    import pandas as pd

    last = state.get[0] if state.exists else None
    # applyInPandasWithState gives no intra-group ordering guarantee after
    # the groupBy shuffle, so materialize the batch and impose event order
    # (received_at, stable) before hashing — otherwise the retained state
    # hash can belong to a stale version and the true latest update would
    # later be suppressed as "unchanged".
    batch = pd.concat(list(pdfs), ignore_index=True)
    if "received_at" in batch.columns:
        batch = batch.sort_values("received_at", kind="stable")
    out_key, out_body, out_change = [], [], []
    for body in batch["body"]:
        h = hashlib.md5(body.encode()).hexdigest()
        if h == last:
            continue  # unchanged payload → no downstream work
        out_key.append(key[0])
        out_body.append(body)
        out_change.append("insert" if last is None else "update")
        last = h
    if last is not None:
        state.update((last,))
    if out_key:
        yield pd.DataFrame({"key": out_key, "body": out_body, "change": out_change})


def changed_rows_stream(envelopes: DataFrame, key_col: str = "opaque_id") -> DataFrame:
    """Custom stateful operator: pass only payloads whose hash differs
    from the key's last-seen hash, across micro-batches.

    State is one 32-char hash per key — at 10⁹ keys that is tens of GB
    spread across the cluster's state store, the intended shape for
    ``applyInPandasWithState``. NoTimeout: replicated keys live forever,
    like their table rows.
    """
    cols = [F.col(key_col).alias("key"), F.col("body")]
    if "received_at" in envelopes.columns:
        cols.append(F.col("received_at"))
    return (
        envelopes.select(*cols)
        .groupBy("key")
        .applyInPandasWithState(
            _changed_rows_fn,
            outputStructType=_CHANGED_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_deliveries_stream(
    envelopes: DataFrame,
    id_col: str = "opaque_id",
    ts_col: str = "received_at",
    watermark: str = "1 hour",
) -> DataFrame:
    """At-least-once delivery -> effectively-once processing: drop
    re-delivered envelopes (same ``id_col``) BEFORE they reach shaping
    and the MERGE, with state bounded by the watermark.

    The reference absorbs webhook retries by making the upsert
    idempotent (base.rb `_upsert_webhook`); that stays true here, but
    at 100 TB/day re-running shape + MERGE for every provider retry is
    real wasted work. ``dropDuplicatesWithinWatermark`` keeps one state
    row per id only until the watermark passes it — a retry storm costs
    state proportional to the retry horizon, not the stream's history
    (plain ``dropDuplicates`` on a stream grows state forever).

    On a batch frame the same call degrades to exact global dedup,
    which is how the value tests pin the semantics.
    """
    if envelopes.isStreaming:
        return envelopes.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [id_col]
        )
    return envelopes.dropDuplicates([id_col])


def attribution_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    window_seconds: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream attribution join: every (purchase, click) pair on
    the same user where the click precedes the purchase by at most
    ``window_seconds`` — the streaming sibling of the batch
    as-of/interval joins (operators/joins.py), built on Spark's
    watermarked stream-stream inner join.

    Both sides carry the SAME watermark and the join condition bounds
    the event-time gap, which is what lets the state store evict: a
    buffered click older than (watermark + window) can never match a
    future purchase and is dropped; without the time bound the click
    state would grow forever. At 100 TB events/day this state bound —
    not the join algorithm — is the thing that keeps the job alive.
    Output columns: user_id, purchase_id, purchase_ts, click_id,
    click_ts."""
    c = (
        clicks.select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        ).withWatermark("click_ts", watermark)
    )
    p = (
        purchases.select(
            F.col("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        ).withWatermark("purchase_ts", watermark)
    )
    return p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {window_seconds} SECONDS")
        ),
        "inner",
    ).select("user_id", "purchase_id", "purchase_ts", "click_id", "click_ts")


def silence_alerts_stream(
    events: DataFrame,
    silence_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming silence detection — the monitoring primitive behind
    "did this integration stop sending?" (the batch counterpart is
    operators/analytics.py:activity_gaps; the reference's users watch
    for this by polling their replicated tables). Emits one alert row
    (key, last_seen, silence_seconds) when the EVENT-TIME watermark
    passes a key's last event + ``silence_seconds`` — i.e. the stream
    itself proves the silence, no wall-clock polling — then clears the
    key's state (re-arming on its next event).

    State per key is one timestamp + one armed timeout; keys are
    hash-distributed by the groupBy, so state and timer volume scale
    with ACTIVE keys, never event volume. EventTimeTimeout (not
    processing time) keeps alerts deterministic under replay: a
    restarted stream re-derives the same alerts from the same data.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            (last_us,) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "last_seen": [pd.Timestamp(last_us, unit="us")],
                    "silence_seconds": [silence_seconds],
                }
            )
            return
        mx = None
        for pdf in pdfs:
            m = pdf["_ts"].max()
            mx = m if mx is None else max(mx, m)
        last_us = int(pd.Timestamp(mx).value // 1_000)
        if state.exists:
            (prior,) = state.get
            last_us = max(last_us, int(prior))
        state.update((last_us,))
        # fire when the watermark passes last_seen + silence
        state.setTimeoutTimestamp(
            last_us // 1_000 + silence_seconds * 1_000
        )
        return
        yield  # pragma: no cover - generator shape

    from pyspark.sql import types as _T

    # derive the key's output type from the input schema (a hardcoded
    # type would silently mismatch string/int keys downstream)
    key_type = events.schema[key_col].dataType
    out_schema = _T.StructType(
        [
            _T.StructField("key", key_type),
            _T.StructField("last_seen", _T.TimestampType()),
            _T.StructField("silence_seconds", _T.LongType()),
        ]
    )
    src = events.select(
        F.col(key_col).alias("key"), F.col(ts_col).cast("timestamp").alias("_ts")
    ).withWatermark("_ts", watermark)
    return src.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="last_us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
