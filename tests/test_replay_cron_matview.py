"""Replay limits, cron-scheduled backfills, and the matview analog."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from webhookdb_spark.operators.replay import ReplayWindowError, replay_webhooks
from webhookdb_spark.plans.query_surface import MaterializedViews, QueryNotAllowed
from webhookdb_spark.replicators.fake import FAKE_V1
from webhookdb_spark.sources.cron import BackfillScheduler, ScheduledBackfill, cron_matches
from webhookdb_spark.storage import Warehouse
from webhookdb_spark.streaming.ingest import IngestPipeline, IntegrationRuntime


def test_cron_matching():
    t = dt.datetime(2024, 5, 6, 14, 30)  # a Monday
    assert cron_matches("*/1 * * * *", t)
    assert cron_matches("30 14 * * *", t)
    assert cron_matches("*/15 * * * *", t)
    assert not cron_matches("31 14 * * *", t)
    assert cron_matches("30 14 6 5 *", t)
    assert cron_matches("* * * * 1", t)  # Monday = 1
    assert not cron_matches("* * * * 0", t)
    with pytest.raises(ValueError):
        cron_matches("* * * *", t)


def test_scheduler_fires_once_per_minute():
    fired = []
    s = BackfillScheduler()
    s.add(ScheduledBackfill("twilio_sms_v1", "*/1 * * * *", lambda: fired.append("t")))
    s.add(ScheduledBackfill("github_issue_v1", "0 * * * *", lambda: fired.append("g")))
    now = dt.datetime(2024, 5, 6, 9, 0)
    assert s.tick(now) == ["twilio_sms_v1", "github_issue_v1"]
    assert s.tick(now) == []  # same minute → no refire
    assert s.tick(now + dt.timedelta(minutes=1)) == ["twilio_sms_v1"]
    assert fired == ["t", "g", "t"]


def _envelopes(spark, rows):
    return spark.createDataFrame(
        rows, "integration_opaque_id string, body string, received_at timestamp"
    )


def test_replay_reprocesses_archive_idempotently(spark, tmp_warehouse):
    wh = Warehouse(spark, str(tmp_warehouse / "wh"))
    pipe = IngestPipeline(
        warehouse=wh, audit_table_path=str(tmp_warehouse / "audit")
    )
    pipe.register(IntegrationRuntime(opaque_id="op1", org="org", spec=FAKE_V1))
    t0 = dt.datetime(2026, 8, 13, 10, 0)
    pipe.process_batch(
        _envelopes(
            spark,
            [("op1", json.dumps({"my_id": "m1", "at": "2024-01-01T00:00:00Z"}), t0)],
        )
    )
    table = wh.table("org", "fake_v1")
    assert table.read().count() == 1

    # replay the archived hour — idempotent merge, still one row
    n = replay_webhooks(pipe, t0 - dt.timedelta(minutes=5), t0 + dt.timedelta(minutes=5), now=t0)
    assert n == 1
    assert table.read().count() == 1

    # interval/age limits (logged_webhook.rb:22-26)
    with pytest.raises(ReplayWindowError):
        replay_webhooks(pipe, t0, t0 + dt.timedelta(hours=5), now=t0)
    with pytest.raises(ReplayWindowError):
        replay_webhooks(pipe, t0 - dt.timedelta(days=8), t0 - dt.timedelta(days=8, hours=-1), now=t0)


def test_materialized_view_snapshot_and_refresh(spark, tmp_warehouse):
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").createOrReplaceTempView(
        "mv_src"
    )
    mv = MaterializedViews(spark, str(tmp_warehouse / "mv"))
    mv.create("mv_counts", "SELECT v, count(*) AS n FROM mv_src GROUP BY v")
    assert spark.sql("SELECT count(*) n FROM mv_counts").collect()[0].n == 2

    # matview is a SNAPSHOT: source changes don't show until refresh
    spark.createDataFrame([(1, "a"), (2, "a")], "id long, v string").createOrReplaceTempView(
        "mv_src"
    )
    assert spark.sql("SELECT count(*) n FROM mv_counts").collect()[0].n == 2
    mv.refresh("mv_counts")
    rows = {r.v: r.n for r in spark.sql("SELECT * FROM mv_counts").collect()}
    assert rows == {"a": 2}

    with pytest.raises(QueryNotAllowed):
        mv.create("bad", "DROP TABLE mv_src")
