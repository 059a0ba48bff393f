"""The reference's FakeExhaustiveConverter conformance
(column_spec.rb:875-975 over fake.rb:268-399): every converter in the
library wired into one replicator and driven with the spec's exact
body, asserting the spec's exact expected row — once through the
insert path, once through schema evolution (the reference's
``ensure_all_columns`` backfill)."""

from __future__ import annotations

import datetime as dt
import json
from decimal import Decimal

from webhookdb_spark.operators.evolution import evolve_table
from webhookdb_spark.operators.upsert import upsert_envelopes
from webhookdb_spark.replicators.fake import (
    FAKE_EXHAUSTIVE_CONVERTER_V1,
    _exhaustive_cols,
)
from webhookdb_spark.spec import Col, ReplicatorSpec
from webhookdb_spark.storage import Warehouse
from webhookdb_spark.types import ColumnType

# column_spec.rb:888-906 — the exhaustive body, verbatim
BODY = {
    "my_id": 1,
    "at": "2012-01-01T12:00:00Z",
    "comma_sep": "a, b,c",
    "latlng": "41.5 120.3",
    "date": "2013-01-01",
    "datetime": "2013-01-01T12:00:00-01:00",
    "strptime": "01012013 120000Z",
    "strptime_date": "31200012",
    "parsed_int": "5",
    "unix_ts": 6000,
    "obj_array": [{"id": 10, "name": "ten"}, {"id": 11, "name": "eleven"}],
    "subtext": "hello there, hello",
    "to_utc_date": "2013-01-01T23:00:00-05:00",
    "map_lookup": "a",
    "map_lookup_array": ["a", "b"],
    "regex_conv": "https://webhookdb.com/resources/123",
    "int_or_seq_has": "https://webhookdb.com/resources/500",
    "int_or_seq_has_not": "",
}


def _env(spark, bodies):
    return spark.createDataFrame(
        [(json.dumps(b), dt.datetime(2026, 1, 1)) for b in bodies],
        "body string, received_at timestamp",
    )


def _assert_common(row):
    # column_spec.rb:908-937 expectations, minus the evolution-only set
    assert row.comma_sep == ["a", "b", "c"]
    assert row.date == dt.date(2013, 1, 1)
    assert row.datetime == dt.datetime(2013, 1, 1, 13, 0)
    assert float(row.geo_lat) == 41.5
    assert float(row.geo_lng) == 120.3
    assert row.int_array == [10, 11]
    assert row.text_array == ["ten", "eleven"]
    assert row.parsed_int == 5
    assert row.regex_extract == "123"
    assert row.regex_conv == 123
    assert row.strptime == dt.datetime(2013, 1, 1, 12, 0)
    assert row.strptime_date == dt.date(2000, 12, 31)
    assert row.subtext == "goodbye there, hello"
    assert row.to_utc_date == dt.date(2013, 1, 2)
    assert row.unix_ts == dt.datetime(1970, 1, 1, 1, 40)


def test_exhaustive_converter_insert_golden(spark, tmp_warehouse):
    """column_spec.rb:908-938 'can extract values from Ruby' — the
    insert path: every converter column lands the spec's expected
    value, the int_or_seq pair uses the regex hit (500) and the
    sequence draw (1), and the backfill_expr columns use the PAYLOAD
    value at insert time."""
    t = Warehouse(spark, str(tmp_warehouse)).table(
        "org", "fake_exhaustive_converter_v1")
    res = upsert_envelopes(t, _env(spark, [BODY]),
                           FAKE_EXHAUSTIVE_CONVERTER_V1)
    assert res.inserted == 1
    row = t.read().collect()[0]
    _assert_common(row)
    assert row.int_or_seq_has == 500
    assert row.int_or_seq_has_not == 1  # first draw from the sequence
    assert row.map_lookup == "A"
    assert row.map_lookup_array == ["A", "B"]
    assert row.using_backfill_expr == "1"
    assert row.using_null_backfill_expr == "1"
    assert row.using_backfill_statement == "1"


def test_exhaustive_converter_schema_evolution_golden(spark, tmp_warehouse):
    """column_spec.rb:940-975 'can build and execute SQL statements to
    fill columns' — the evolution path: upsert under the super-cols
    spec (pk/my_id/at/data only), widen to the full converter set
    minus the non-re-derivable columns (sequence draws, map lookups —
    the reference's exclude_unimplemented_sql_update_cols), and every
    value re-derives from the stored payload; the backfill_expr
    columns use their EXPRESSIONS ('hi there', NULL, my_id doubled)."""
    lean = ReplicatorSpec(
        name="fake_exhaustive_converter_v1",
        table="fake_exhaustive_converter_v1",
        remote_key=Col("my_id", ColumnType.TEXT),
        denorm_cols=(Col("at", ColumnType.TIMESTAMP, index=True),),
        timestamp_col="at",
        update_where=lambda s, t: t("at") < s("at"),
        n_buckets=4,
    )
    full = ReplicatorSpec(
        name="fake_exhaustive_converter_v1",
        table="fake_exhaustive_converter_v1",
        remote_key=Col("my_id", ColumnType.TEXT),
        denorm_cols=_exhaustive_cols(include_unimplemented_sql=False),
        timestamp_col="at",
        update_where=lambda s, t: t("at") < s("at"),
        n_buckets=4,
    )
    t = Warehouse(spark, str(tmp_warehouse)).table("org2", lean.table)
    res = upsert_envelopes(t, _env(spark, [BODY]), lean)
    assert res.inserted == 1
    base_cols = set(t.read().columns)
    assert {"my_id", "at", "data"} <= base_cols
    assert "comma_sep" not in base_cols

    added = evolve_table(t, full)
    assert "comma_sep" in added and "using_backfill_statement" in added
    row = t.read().collect()[0]
    _assert_common(row)
    assert row.using_backfill_expr == "hi there"
    assert row.using_null_backfill_expr is None
    assert row.using_backfill_statement == "11"
