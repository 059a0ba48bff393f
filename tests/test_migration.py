"""Org DB migration (database_migration.rb parity), table rename, and
the jsonb-concat-on-update merge option."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from webhookdb_spark.operators.upsert import upsert_envelopes
from webhookdb_spark.sinks.migration import (
    MigrationAlreadyFinished,
    migrate_organization,
    rename_table,
)
from webhookdb_spark.spec import Col, ReplicatorSpec
from webhookdb_spark.storage import Warehouse
from webhookdb_spark.types import ColumnType


def _spec(name):
    return ReplicatorSpec(
        name=name, table=name,
        remote_key=Col("my_id", ColumnType.TEXT, data_key="id"),
        denorm_cols=(Col("at", ColumnType.TIMESTAMP),),
        timestamp_col="at",
        update_where=lambda s, t: t("at") < s("at"),
        n_buckets=4,
    )


def _env(spark, rows):
    return spark.createDataFrame(
        [(json.dumps(r), dt.datetime(2026, 1, 1)) for r in rows],
        "body string, received_at timestamp",
    )


def test_migration_copies_and_resumes(spark, tmp_warehouse):
    src = Warehouse(spark, str(tmp_warehouse / "src"))
    dst = Warehouse(spark, str(tmp_warehouse / "dst"))
    a, b, c = _spec("a_v1"), _spec("b_v1"), _spec("c_v1")
    for spec, n in [(a, 3), (c, 2)]:  # b never synced — must be skipped
        upsert_envelopes(
            src.table("org", spec.table),
            _env(spark, [{"id": f"{spec.name}-{i}", "at": "2024-01-01T00:00:00Z"}
                         for i in range(n)]),
            spec,
        )
    state = tmp_warehouse / "mig.json"

    # first run dies after table a
    with pytest.raises(RuntimeError, match="injected"):
        migrate_organization(src, dst, "org", [a, b, c], state, fail_after="a_v1")
    assert dst.table("org", "a_v1").read().count() == 3
    assert not dst.table("org", "c_v1").exists()

    # resume: a is skipped (cursor), b skipped (no source), c copied
    copied = migrate_organization(src, dst, "org", [a, b, c], state)
    assert copied == {"c_v1": 2}
    assert dst.table("org", "c_v1").read().count() == 2

    # finished migrations refuse to run again
    with pytest.raises(MigrationAlreadyFinished):
        migrate_organization(src, dst, "org", [a, b, c], state)


def test_rename_table(spark, tmp_warehouse):
    wh = Warehouse(spark, str(tmp_warehouse))
    spec = _spec("old_v1")
    upsert_envelopes(
        wh.table("org", "old_v1"),
        _env(spark, [{"id": "r1", "at": "2024-01-01T00:00:00Z"}]),
        spec,
    )
    rename_table(wh, "org", "old_v1", "new_v1")
    assert not wh.table("org", "old_v1").exists()
    assert wh.table("org", "new_v1").read().count() == 1
    with pytest.raises(FileNotFoundError):
        rename_table(wh, "org", "old_v1", "whatever")


def test_merge_data_on_update(spark, tmp_warehouse):
    spec = ReplicatorSpec(
        name="m_v1", table="m_v1",
        remote_key=Col("my_id", ColumnType.TEXT, data_key="id"),
        denorm_cols=(Col("at", ColumnType.TIMESTAMP),),
        timestamp_col="at",
        update_where=lambda s, t: t("at") < s("at"),
        merge_data_on_update=True,
        n_buckets=4,
    )
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "m_v1")
    upsert_envelopes(
        t,
        _env(spark, [{"id": "k", "at": "2024-01-01T00:00:00Z",
                      "nested": {"keep": 1}, "old": "x"}]),
        spec,
    )
    upsert_envelopes(
        t,
        _env(spark, [{"id": "k", "at": "2024-02-01T00:00:00Z", "new": "y"}]),
        spec,
    )
    data = json.loads(t.read().collect()[0].data)
    # jsonb || semantics: union of keys, incoming wins, nested preserved
    assert data["nested"] == {"keep": 1}
    assert data["old"] == "x"
    assert data["new"] == "y"
    assert data["at"] == "2024-02-01T00:00:00Z"
