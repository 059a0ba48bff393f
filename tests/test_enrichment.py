"""Enrichment hook: per-resource fetch, from_enrichment columns, stored
enrichment body (base.rb:338-342, 849-859 parity)."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from webhookdb_spark.operators.upsert import upsert_envelopes
from webhookdb_spark.spec import Col, ReplicatorSpec
from webhookdb_spark.storage import Warehouse
from webhookdb_spark.types import ColumnType


def _make_spec():
    # the fetcher is defined inline so cloudpickle ships it by VALUE to
    # executors (a module-level test function would be pickled by
    # reference and fail to import worker-side)
    def fetch(resource: dict) -> dict | None:
        if resource.get("skip_enrich"):
            return None
        return {"score": len(resource.get("name", "")) * 10, "extra": {"ok": True}}

    return ReplicatorSpec(
        name="enriched_v1",
        table="enriched_v1",
        remote_key=Col("my_id", ColumnType.TEXT, data_key="id"),
        denorm_cols=(
            Col("at", ColumnType.TIMESTAMP),
            Col("name", ColumnType.TEXT),
            Col("score", ColumnType.INTEGER, from_enrichment=True, optional=True),
        ),
        timestamp_col="at",
        update_where=lambda s, t: t("at") < s("at"),
        enrichment_fetcher=fetch,
        store_enrichment_body=True,
        n_buckets=4,
    )


SPEC = _make_spec()


def _env(spark, rows):
    return spark.createDataFrame(
        [(json.dumps(r), dt.datetime(2026, 1, 1)) for r in rows],
        "body string, received_at timestamp",
    )


def test_enrichment_columns_and_body(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "enriched_v1")
    upsert_envelopes(
        t,
        _env(
            spark,
            [
                {"id": "a", "at": "2024-01-01T00:00:00Z", "name": "abcd"},
                {"id": "b", "at": "2024-01-01T00:00:00Z", "name": "xy",
                 "skip_enrich": True},
            ],
        ),
        SPEC,
    )
    rows = {r.my_id: r for r in t.read().collect()}
    assert rows["a"].score == 40  # len("abcd") * 10, dug from enrichment
    assert json.loads(rows["a"].enrichment) == {"score": 40, "extra": {"ok": True}}
    assert rows["b"].score is None and rows["b"].enrichment is None
    # enrichment column sits between denorm cols and data
    names = [f.name for f in t.schema().fields]
    assert names[-2:] == ["enrichment", "data"]


def test_from_enrichment_without_fetcher_raises(spark):
    bad = ReplicatorSpec(
        name="bad_v1", table="bad_v1",
        remote_key=Col("my_id", ColumnType.TEXT, data_key="id"),
        denorm_cols=(Col("score", ColumnType.INTEGER, from_enrichment=True),),
    )
    with pytest.raises(ValueError, match="from_enrichment"):
        bad.shape(_env(spark, [{"id": "x"}]))
