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


def test_readonly_validator_blocks_sandbox_escapes(spark):
    """Adversarial read-only validation (SURVEY §7 hard part: Spark has
    no engine-level read-only role, so the validator IS the privilege
    boundary): JVM reflection, path-backed tables, Hive script
    transform, CTE-smuggled DML, comment-hidden DML, and statement
    stacking must all be rejected; benign lookalikes must pass."""
    import pytest

    from webhookdb_spark.plans.query_surface import (
        QueryNotAllowed,
        validate_readonly,
    )

    blocked = [
        "SELECT java_method('java.lang.System', 'getProperty', 'user.dir')",
        "SELECT reflect('java.lang.System', 'exit', 0)",
        "SELECT * FROM parquet.`/etc/hostname`",
        "SELECT * FROM text . `/etc/passwd`",
        "SELECT TRANSFORM(a) USING 'cat' FROM t",
        "WITH x AS (SELECT 1) INSERT INTO t SELECT * FROM x",
        "SELECT 1; DROP TABLE t",
        "SELECT 1 /* hidden */; DELETE FROM t",
        "EXPLAIN INSERT INTO t VALUES (1)",
    ]
    for sql in blocked:
        with pytest.raises(QueryNotAllowed):
            validate_readonly(sql)
    allowed = [
        "SELECT 'insert into t' AS s",          # keywords inside literals
        "SELECT a FROM t JOIN u USING (k)",     # join USING is fine
        "SELECT transform(xs, x -> x + 1) FROM t",  # the HOF, not Hive
        "-- note\nSELECT 1",
        "WITH x AS (SELECT 1 AS a) SELECT * FROM x;",
    ]
    for sql in allowed:
        validate_readonly(sql)


def test_readonly_blocks_any_datasource_path_table(spark):
    """The regex denylist only names common formats; `format`.`/path``
    works for ANY registered datasource (libsvm, xml, jdbc, ...), so the
    structural guard — runSQLOnFiles disabled during analysis — must
    stop the rest: resolution fails instead of reading the filesystem,
    and the session conf is restored afterward (including on error)."""
    import pytest

    from webhookdb_spark.plans.query_surface import run_readonly_sql

    for sql in (
        "SELECT * FROM libsvm.`/etc/passwd`",
        "SELECT * FROM xml.`/etc/passwd`",
        "TABLE binaryFile.`/etc`",
    ):
        with pytest.raises(Exception) as ei:
            run_readonly_sql(spark, sql)
        # failure mode is unresolved table, never a successful file read
        assert "QueryNotAllowed" in ei.typename or "Analysis" in ei.typename or \
            "TABLE_OR_VIEW_NOT_FOUND" in str(ei.value), str(ei.value)[:200]
        assert spark.conf.get("spark.sql.runSQLOnFiles") == "true"
    # legit catalog tables still resolve under the guard
    spark.range(3).createOrReplaceTempView("ro_guard_ok")
    res = run_readonly_sql(spark, "SELECT count(*) AS n FROM ro_guard_ok")
    assert res.rows == [(3,)]
    assert spark.conf.get("spark.sql.runSQLOnFiles") == "true"


def test_retrieval_reachable_from_readonly_sql_surface(spark):
    """Retrieval ops compose with the read-only SQL surface: register a
    documents view, expose a ranked search as a view, query it through
    run_readonly_sql with the row cap, and confirm the validator still
    rejects mutations against it."""
    import pytest

    from webhookdb_spark.plans.query_surface import (
        QueryNotAllowed, create_retrieval_view, run_readonly_sql,
    )

    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .createOrReplaceTempView("docs_rv")
    create_retrieval_view(
        spark, "docs_search", "docs_rv", terms=("spark", "merge"), k=10
    )
    res = run_readonly_sql(
        spark,
        "SELECT doc_id, score, rank FROM docs_search WHERE rank <= 5"
        " ORDER BY rank",
        max_rows=3,
    )
    assert res.max_rows_reached and len(res.rows) == 3
    assert [r[2] for r in res.rows] == [1, 2, 3]

    create_retrieval_view(
        spark, "docs_all", "docs_rv", terms=("spark", "merge"),
        mode="all_terms",
    )
    both = run_readonly_sql(
        spark, "SELECT count(*) AS n FROM docs_all WHERE n_terms_matched = 2"
    )
    assert both.rows[0][0] > 0

    with pytest.raises(QueryNotAllowed):
        run_readonly_sql(spark, "DROP VIEW docs_search")
    with pytest.raises(QueryNotAllowed):
        create_retrieval_view(spark, "bad;name", "docs_rv", terms=("x",))


def test_plan_cost_guardrail_blocks_cartesian(spark):
    """The multi-tenant liveness guard: predicate-less table pairings
    are rejected at PLAN time (CartesianProduct or a Cross-typed
    broadcast pairing); keyed joins, non-equi joins with predicates,
    and ordinary selects pass."""
    import pytest as _pt

    from webhookdb_spark.plans.query_surface import (
        QueryTooExpensive,
        validate_plan_cost,
    )

    a = spark.range(100000).selectExpr("id AS a_id", "id % 7 AS a_k")
    b = spark.range(100000).selectExpr("id AS b_id", "id % 7 AS b_k")
    a.createOrReplaceTempView("guard_a")
    b.createOrReplaceTempView("guard_b")

    with _pt.raises(QueryTooExpensive):
        validate_plan_cost(spark, "SELECT * FROM guard_a, guard_b")
    with _pt.raises(QueryTooExpensive):
        validate_plan_cost(
            spark, "SELECT * FROM guard_a CROSS JOIN guard_b"
        )
    # fine: keyed join, plain select, non-equi join WITH a predicate
    validate_plan_cost(
        spark, "SELECT * FROM guard_a JOIN guard_b ON a_k = b_k"
    )
    validate_plan_cost(spark, "SELECT count(*) FROM guard_a")
    validate_plan_cost(
        spark,
        "SELECT * FROM guard_a JOIN guard_b ON a_id < b_k",
    )
    # predicate-less OUTER pairings are full products too (ON true
    # folds away, leaving a condition-less LeftOuter BNLJ)
    with _pt.raises(QueryTooExpensive):
        validate_plan_cost(
            spark, "SELECT * FROM guard_a LEFT JOIN guard_b ON true"
        )
    # escape hatch for admin surfaces
    validate_plan_cost(
        spark, "SELECT * FROM guard_a, guard_b", allow_cartesian=True
    )


def test_saved_view_spec_golden(spark):
    """spec/webhookdb/saved_view_spec.rb:16-95 — create_or_replace
    creates, replaces under the same name, quotes names with spaces,
    and refuses invalid identifiers and non-read-only SQL; destroy
    drops when present, noops when absent, and refuses an invalid
    name."""
    import pytest

    from webhookdb_spark.plans.query_surface import (
        QueryNotAllowed,
        create_saved_view,
        drop_saved_view,
    )
    from webhookdb_spark.types import InvalidIdentifier

    create_saved_view(spark, "testview", "SELECT 1 AS x")
    assert spark.sql("SELECT * FROM testview").collect()[0].x == 1
    create_saved_view(spark, "testview2", "SELECT 1 AS y")
    assert spark.sql("SELECT * FROM testview2").collect()[0].y == 1

    # replaces a view with the same name
    create_saved_view(spark, "testview", "SELECT 2 AS x")
    assert spark.sql("SELECT * FROM testview").collect()[0].x == 2

    # escapes/quotes the name
    create_saved_view(spark, "x y", "SELECT 1 AS z")
    assert spark.sql('SELECT * FROM `x y`').collect()[0].z == 1

    with pytest.raises(InvalidIdentifier):
        create_saved_view(spark, "hi-there", "SELECT 1")
    with pytest.raises(QueryNotAllowed):
        create_saved_view(spark, "testview3", "CREATE TABLE xyz(pk STRING)")

    # destroy: drops, then the relation is gone
    drop_saved_view(spark, "testview")
    with pytest.raises(Exception, match="TABLE_OR_VIEW_NOT_FOUND|cannot be found"):
        spark.sql("SELECT * FROM testview").collect()
    # noops if the view does not exist
    drop_saved_view(spark, "never_existed")
    # errors if the view name is not a valid identifier
    with pytest.raises(InvalidIdentifier):
        drop_saved_view(spark, "hello-there")
    drop_saved_view(spark, "testview2")
    drop_saved_view(spark, "x y")


def test_stale_row_deleter_spec_scenarios(spark, tmp_warehouse):
    """base_stale_row_deleter_spec.rb:19-41 with the FakeStaleRow
    parameters (stale_at=5d, lookback=5d, condition
    textcol='cancelled'): `run` deletes only cancelled rows inside
    [now-10d, now-5d) — recent, not-cancelled, and beyond-lookback
    rows all survive; `run_initial` (nil age cutoff) widens the
    window back to epoch and deletes every cancelled stale row."""
    import datetime as dt
    import json

    from pyspark.sql import functions as F

    from webhookdb_spark.operators.retention import delete_stale_rows
    from webhookdb_spark.operators.upsert import upsert_envelopes
    from webhookdb_spark.replicators.fake import FAKE_V1
    from webhookdb_spark.spec import Col, ReplicatorSpec
    from webhookdb_spark.storage import Warehouse
    from webhookdb_spark.types import ColumnType

    spec = ReplicatorSpec(
        name="fake_stale_row_v1",
        table="fake_stale_row_v1",
        remote_key=Col("my_id", ColumnType.TEXT),
        denorm_cols=(
            Col("at", ColumnType.TIMESTAMP, index=True),
            Col("textcol", ColumnType.TEXT, optional=True),
        ),
        timestamp_col="at",
        update_where=lambda s, t: t("at") < s("at"),
        n_buckets=4,
    )
    now = dt.datetime(2020, 10, 30)
    days = lambda n: (now - dt.timedelta(days=n)).isoformat()  # noqa: E731

    def env(rows):
        return spark.createDataFrame(
            [(json.dumps(r), now) for r in rows],
            "body string, received_at timestamp",
        )

    def make_table(name):
        t = Warehouse(spark, str(tmp_warehouse)).table(name, spec.table)
        upsert_envelopes(t, env([
            {"my_id": "recent", "at": days(3), "textcol": "cancelled"},
            {"my_id": "stale", "at": days(7), "textcol": "cancelled"},
            {"my_id": "stale_not_cancelled", "at": days(7),
             "textcol": "confirmed"},
            {"my_id": "too_old", "at": days(12), "textcol": "cancelled"},
        ]), spec)
        return t

    t = make_table("org_run")
    n = delete_stale_rows(
        t, "at",
        stale_cutoff=days(5), lookback_cutoff=days(10),
        condition=F.col("textcol") == "cancelled",
    )
    assert n == 1
    assert sorted(r.my_id for r in t.read().collect()) == [
        "recent", "stale_not_cancelled", "too_old",
    ]

    # run_initial: nil age cutoff — lookback from epoch
    t2 = make_table("org_initial")
    n2 = delete_stale_rows(
        t2, "at",
        stale_cutoff=days(5), lookback_cutoff="1970-01-01T00:00:00",
        condition=F.col("textcol") == "cancelled",
    )
    assert n2 == 2
    assert sorted(r.my_id for r in t2.read().collect()) == [
        "recent", "stale_not_cancelled",
    ]


def test_standard_scheduled_backfills_table():
    """jobs/scheduled_backfills.rb:12-86 — the reference's installed
    schedule, row for row (config-driven expressions at their shipped
    defaults), and its firing behavior on the scheduler: twilio and
    signalwire fire every minute, convertkit_broadcast only at minute
    10, the intercom backstop only at 04:46, and every expression
    parses."""
    import datetime as dt

    from webhookdb_spark.sources.cron import (
        STANDARD_SCHEDULED_BACKFILLS,
        BackfillScheduler,
        cron_matches,
        install_standard_backfills,
    )

    rows = {s.service: s for s in STANDARD_SCHEDULED_BACKFILLS}
    assert len(rows) == 12
    assert rows["twilio_sms_v1"].cron == "*/1 * * * *"
    assert rows["twilio_sms_v1"].recursive and rows["twilio_sms_v1"].incremental
    assert rows["convertkit_broadcast_v1"].cron == "10 * * * *"
    assert not rows["convertkit_broadcast_v1"].incremental
    assert rows["intercom_marketplace_root_v1"].cron == "46 4 * * *"
    assert rows["email_octopus_list_v1"].cron == "0 */4 * * *"
    assert rows["github_repository_event_v1"].splay_seconds == 30
    assert rows["transistor_show_v1"].cron == "0 0 */1 * *"
    for s in STANDARD_SCHEDULED_BACKFILLS:  # all expressions parse
        cron_matches(s.cron, dt.datetime(2026, 1, 1))

    sched = BackfillScheduler()
    fired: list[str] = []
    install_standard_backfills(
        sched, lambda sp: (lambda svc=sp.service: fired.append(svc)))
    out = sched.tick(dt.datetime(2026, 1, 1, 3, 7))
    assert sorted(out) == ["signalwire_message_v1", "twilio_sms_v1"]
    out = sched.tick(dt.datetime(2026, 1, 1, 3, 10))
    assert "convertkit_broadcast_v1" in out and "twilio_sms_v1" in out
    out = sched.tick(dt.datetime(2026, 1, 1, 4, 46))
    assert "intercom_marketplace_root_v1" in out
    out = sched.tick(dt.datetime(2026, 1, 2, 4, 46))
    assert "intercom_marketplace_root_v1" in out  # daily backstop
    assert fired  # actions actually ran
