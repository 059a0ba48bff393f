"""Additive schema evolution: new spec columns are backfilled from the
stored raw payload (base.rb:557-643 parity)."""

from __future__ import annotations

import datetime as dt
import json
from decimal import Decimal

from pyspark.sql import functions as F

from webhookdb_spark.functions.converters import CONV_TO_I, CONV_UNIX_TS
from webhookdb_spark.operators.evolution import evolve_table, missing_columns
from webhookdb_spark.operators.upsert import upsert_envelopes
from webhookdb_spark.spec import Col, ReplicatorSpec
from webhookdb_spark.storage import Warehouse
from webhookdb_spark.types import ColumnType

V1 = ReplicatorSpec(
    name="widget_v1",
    table="widget_v1",
    remote_key=Col("my_id", ColumnType.TEXT, data_key="id"),
    denorm_cols=(Col("at", ColumnType.TIMESTAMP),),
    timestamp_col="at",
    update_where=lambda s, t: t("at") < s("at"),
    n_buckets=4,
)

# V2 adds: a plain dig, a nested dig, a converter column, and an
# explicit backfill_expr override — each must re-derive from `data`.
V2 = ReplicatorSpec(
    name="widget_v1",
    table="widget_v1",
    remote_key=Col("my_id", ColumnType.TEXT, data_key="id"),
    denorm_cols=(
        Col("at", ColumnType.TIMESTAMP),
        Col("color", ColumnType.TEXT),
        Col("owner_email", ColumnType.TEXT, data_key=["owner", "email"], optional=True),
        Col("quoted_n", ColumnType.BIGINT, data_key="n", converter=CONV_TO_I),
        Col("epoch", ColumnType.TIMESTAMP, data_key="ts", converter=CONV_UNIX_TS),
        Col(
            "upper_color",
            ColumnType.TEXT,
            backfill_expr=lambda data: F.upper(F.get_json_object(data, "$.color")),
        ),
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


def test_evolve_backfills_from_data(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "widget_v1")
    upsert_envelopes(
        t,
        _env(
            spark,
            [
                {"id": "a", "at": "2024-01-01T00:00:00Z", "color": "teal",
                 "owner": {"email": "a@x.co"}, "n": '"42"', "ts": 1700000000.5},
                {"id": "b", "at": "2024-01-02T00:00:00Z", "color": "mauve"},
            ],
        ),
        V1,
    )
    assert {f.name for f in t.schema().fields} == {"my_id", "at", "data"}
    assert [c.name for c in missing_columns(t, V2)] == [
        "color", "owner_email", "quoted_n", "epoch", "upper_color"
    ]

    added = evolve_table(t, V2)
    assert added == ["color", "owner_email", "quoted_n", "epoch", "upper_color"]
    # data column stays last
    assert t.schema().fields[-1].name == "data"

    rows = {r.my_id: r for r in t.read().collect()}
    a = rows["a"]
    assert a.color == "teal"
    assert a.owner_email == "a@x.co"
    assert a.quoted_n == 42
    assert a.epoch == dt.datetime(2023, 11, 14, 22, 13, 20, 500000)
    assert a.upper_color == "TEAL"
    b = rows["b"]
    assert b.owner_email is None and b.quoted_n is None and b.upper_color == "MAUVE"

    # idempotent: second evolve is a no-op
    assert evolve_table(t, V2) == []

    # evolved table keeps upserting under the new spec — new rows fill
    # the new columns at ingest, old guard still applies
    res = upsert_envelopes(
        t,
        _env(spark, [{"id": "a", "at": "2023-12-01T00:00:00Z", "color": "stale"}]),
        V2,
    )
    assert res.updated == 0  # stale timestamp rejected
    res = upsert_envelopes(
        t,
        _env(spark, [{"id": "c", "at": "2024-02-01T00:00:00Z", "color": "lime",
                      "n": "7", "ts": 1700000001}]),
        V2,
    )
    assert res.inserted == 1
    c = {r.my_id: r for r in t.read().collect()}["c"]
    assert c.color == "lime" and c.quoted_n == 7
