"""Logged-webhook replay (reference: lib/webhookdb/logged_webhook.rb:22-31,
lib/webhookdb/api/replay.rb).

Archived webhook envelopes are re-driven through the normal ingest
path. The reference caps one replay call at a 4-hour interval over the
last 7 days (logged_webhook.rb:22-26); replays are safe because the
keyed conditional MERGE is idempotent — re-upserting an old envelope
either no-ops (update_where false) or converges to the same row.

Spark shape: the audit table is date-partitioned parquet, so the time
predicate prunes to the touched partitions before the scan.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

MAX_INTERVAL = timedelta(hours=4)  # logged_webhook.rb:23
MAX_AGE = timedelta(days=7)  # logged_webhook.rb:25


class ReplayWindowError(ValueError):
    pass


def replay_webhooks(
    pipeline,
    from_ts: datetime,
    to_ts: datetime,
    now: datetime | None = None,
    secrets: dict[str, tuple[str, str]] | None = None,
    now_ts: int | None = None,
) -> int:
    """Re-process archived envelopes in [from_ts, to_ts) through
    ``pipeline`` (an IngestPipeline with an audit table). Returns the
    number of envelopes replayed.

    The reference's replay re-POSTs each logged webhook through the
    full endpoint, so verification always re-runs there
    (logged_webhook.rb:27-31). Pass ``secrets`` (as for
    ``IngestPipeline.intake_batch``) for that parity — archived
    deliveries re-verify against the CURRENT secret configuration, so
    a delivery 401'd by a misconfigured secret lands once the config
    is fixed. ``secrets`` scopes RE-verification, not the replay:
    rows for integrations outside the map follow the no-secrets
    verdict rule below instead of being rejected as unknown — the
    reference replay is org-wide and each logged webhook re-verifies
    against its own integration's config. Without ``secrets``, rows
    the intake archived as rejected stay excluded (never merge
    unverified data); rows from pre-verdict archives replay as
    before.

    ``now_ts`` (epoch seconds) pins re-verification's clock for
    timestamp-windowed schemes (Stripe ±300 s, Increase): archived
    deliveries are by definition older than their signature window, so
    replaying them against the wall clock would reject every one —
    pass the original intake time (or any instant inside the window)
    to re-verify the signatures as the endpoint originally did. When
    ``secrets`` is given and ``now_ts`` is not, the clock is pinned to
    the replay instant so the count and the merge see one verdict."""
    if now is None:
        # match the caller's window: a tz-aware from_ts against a naive
        # default clock raises on subtraction
        now = (datetime.now(timezone.utc) if from_ts.tzinfo
               else datetime.utcnow())
    if to_ts <= from_ts:
        raise ReplayWindowError("empty interval")
    if to_ts - from_ts > MAX_INTERVAL:
        raise ReplayWindowError(f"interval exceeds {MAX_INTERVAL}")
    if now - from_ts > MAX_AGE:
        raise ReplayWindowError(f"cannot replay webhooks older than {MAX_AGE}")
    if not pipeline.audit_table_path:
        raise ValueError("pipeline has no audit table")
    spark = pipeline.warehouse.spark
    df = (
        # mergeSchema: the archive can mix plain process_batch appends
        # (no _reject_reason) with intake_batch's verdict-stamped ones;
        # default inference takes ONE file's schema and could silently
        # hide the verdict column — and with it the rejected-row guard
        spark.read.option("mergeSchema", "true")
        .parquet(pipeline.audit_table_path)
        # _day prunes partitions; received_at refines within them
        .where(
            (F.col("_day") >= F.lit(from_ts.date().isoformat()).cast("date"))
            & (F.col("_day") <= F.lit(to_ts.date().isoformat()).cast("date"))
            & (F.col("received_at") >= F.lit(from_ts))
            & (F.col("received_at") < F.lit(to_ts))
        )
        # _batch is the audit write's idempotence key (one dir per
        # foreachBatch id; -1 for direct appends) — plumbing, not
        # envelope data, so it must not flow into re-processing
        .drop("_day", "_batch")
    )
    if secrets is not None:
        import time

        from webhookdb_spark.functions.verification import (
            accepted,
            verify_envelopes,
        )
        from webhookdb_spark.sources.envelopes import (
            _with_canonical_headers,
        )

        # Pin the verification clock for the whole replay (mirrors
        # intake_batch): the frame is evaluated twice (count() then
        # process_batch), so a per-batch wall clock could count a
        # timestamp-window boundary envelope (Stripe ±300 s, Increase)
        # yet not merge it, or vice versa.
        if now_ts is None:
            now_ts = int(time.time())
        # The reference replay is org-wide and each logged webhook
        # re-verifies against ITS OWN integration's config
        # (api/replay.rb) — so `secrets` scopes RE-verification, not
        # the replay. Rows for integrations outside the map keep the
        # no-secrets verdict rule instead of being 401'd as unknown.
        known = F.col("integration_opaque_id").isin(list(secrets))
        in_scope = df.where(known)
        rest = df.where(~known)
        if "_reject_reason" in df.columns:
            in_scope = in_scope.drop("_reject_reason")
            # verdict-stamped archive: without re-verification only
            # the intake-accepted rows may merge
            rest = rest.where(
                F.col("_reject_reason").isNull()).drop("_reject_reason")
        # canonicalize like intake_batch: archives written by direct
        # process_batch calls may carry raw-cased header keys, and the
        # verifiers look up lowercase
        df = accepted(verify_envelopes(
            _with_canonical_headers(in_scope), secrets, now_ts=now_ts,
        )).unionByName(rest)
    elif "_reject_reason" in df.columns:
        # verdict-stamped archive (intake_batch): without re-verification
        # only the intake-accepted rows may merge
        df = df.where(F.col("_reject_reason").isNull()).drop("_reject_reason")
    n = df.count()
    if n:
        # marked so process_batch won't re-append them to the archive
        # (RETRY_HEADER parity, logged_webhook.rb:44-45)
        pipeline.process_batch(df.withColumn("_replay", F.lit(True)))
    return n
