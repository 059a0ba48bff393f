"""The test replicator (reference: lib/webhookdb/replicator/fake.rb:1-471).

The reference's Fake replicator declares: remote key ``my_id``, a single
denormalized timestamp column ``at``, and the conditional update
``at < excluded.at`` — the canonical "prevent overwriting new data with
old" guard exercised by the shared conformance suite
(shared_examples_for_replicators.rb:263-326).
"""

from __future__ import annotations

from webhookdb_spark.functions.converters import converter_int_or_sequence_from_regex
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType

FAKE_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="fake_v1",
        table="fake_v1",
        remote_key=Col("my_id", ColumnType.TEXT),
        denorm_cols=(Col("at", ColumnType.TIMESTAMP, index=True),),
        timestamp_col="at",
        update_where=lambda s, t: t("at") < s("at"),
        n_buckets=8,
    )
)

# The reference's fake replicator grows int_or_seq columns unless
# exclude_unimplemented_sql_update_cols is set (fake.rb:368-380); the
# lean FAKE_V1 above is the excluded form, this variant the full one.
FAKE_INT_OR_SEQ_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="fake_int_or_seq_v1",
        table="fake_int_or_seq_v1",
        remote_key=Col("my_id", ColumnType.TEXT),
        denorm_cols=(
            Col("at", ColumnType.TIMESTAMP, index=True),
            Col(
                "int_or_seq",
                ColumnType.BIGINT,
                data_key="url",
                optional=True,
                converter=converter_int_or_sequence_from_regex(r"/resources/(\d+)"),
            ),
        ),
        timestamp_col="at",
        update_where=lambda s, t: t("at") < s("at"),
        n_buckets=8,
    )
)


def _exhaustive_cols(include_unimplemented_sql: bool = True):
    """The FakeExhaustiveConverter column set (fake.rb:268-399):
    every converter in the library wired into one replicator, the
    reference's own end-to-end converter conformance fixture
    (column_spec.rb:875-975). ``include_unimplemented_sql=False``
    mirrors ``exclude_unimplemented_sql_update_cols`` — it drops the
    columns whose values cannot be re-derived in a backfill
    (sequence draws, map lookups the reference marks
    NOT_IMPLEMENTED), which is the set the schema-evolution golden
    runs with."""
    from pyspark.sql import functions as F

    from webhookdb_spark.functions.converters import (
        CONV_COMMA_SEP,
        CONV_PARSE_DATE,
        CONV_PARSE_TIME,
        CONV_TO_I,
        CONV_TO_UTC_DATE,
        CONV_UNIX_TS,
        converter_array_element,
        converter_array_pluck,
        converter_from_regex,
        converter_gsub,
        converter_map_lookup,
        converter_map_lookup_array,
        converter_strptime,
    )

    C = ColumnType
    cols = [
        Col("at", C.TIMESTAMP, index=True),
        Col("comma_sep", C.TEXT_ARRAY, optional=True,
            converter=CONV_COMMA_SEP),
        Col("geo_lat", C.DECIMAL, data_key="latlng", optional=True,
            converter=converter_array_element(index=0, sep=" ")),
        Col("geo_lng", C.DECIMAL, data_key="latlng", optional=True,
            converter=converter_array_element(index=1, sep=" ")),
        Col("date", C.DATE, optional=True, converter=CONV_PARSE_DATE),
        Col("datetime", C.TIMESTAMP, optional=True,
            converter=CONV_PARSE_TIME),
        Col("parsed_int", C.BIGINT, optional=True, converter=CONV_TO_I),
        Col("unix_ts", C.TIMESTAMP, optional=True, converter=CONV_UNIX_TS),
        Col("strptime", C.TIMESTAMP, optional=True,
            converter=converter_strptime("%d%m%Y %H%M%S%Z")),
        Col("strptime_date", C.DATE, optional=True,
            converter=converter_strptime("%d%Y%m", dbtype="date")),
        Col("int_array", C.BIGINT_ARRAY, data_key="obj_array",
            optional=True, converter=converter_array_pluck("id")),
        Col("text_array", C.TEXT_ARRAY, data_key="obj_array",
            optional=True, converter=converter_array_pluck("name", dbtype="string")),
        Col("subtext", C.TEXT, optional=True,
            converter=converter_gsub("^hello", "goodbye")),
        Col("regex_extract", C.TEXT, data_key="regex_conv", optional=True,
            converter=converter_from_regex(r"/resources/(\d+)")),
        Col("regex_conv", C.BIGINT, optional=True,
            converter=converter_from_regex(r"/resources/(\d+)", dbtype="bigint")),
        Col("to_utc_date", C.DATE, optional=True,
            converter=CONV_TO_UTC_DATE),
        # backfill_expr columns (fake.rb:352-368): at insert time they
        # extract my_id from the payload; a schema-evolution backfill
        # uses the expression instead (the third one is the
        # backfill_statement analog — my_id doubled).
        Col("using_backfill_expr", C.TEXT, data_key="my_id",
            optional=True, backfill_expr=lambda data: F.lit("hi there")),
        Col("using_null_backfill_expr", C.TEXT, data_key="my_id",
            optional=True,
            backfill_expr=lambda data: F.lit(None).cast("string")),
        Col("using_backfill_statement", C.TEXT, data_key="my_id",
            optional=True,
            backfill_expr=lambda data: F.concat(
                F.get_json_object(data, "$.my_id"),
                F.get_json_object(data, "$.my_id"),
            )),
    ]
    if include_unimplemented_sql:
        cols += [
            Col("int_or_seq_has", C.BIGINT, optional=True,
                converter=converter_int_or_sequence_from_regex(
                    r"/resources/(\d+)")),
            Col("int_or_seq_has_not", C.BIGINT, optional=True,
                converter=converter_int_or_sequence_from_regex(
                    r"/resources/(\d+)")),
            Col("map_lookup", C.TEXT, optional=True,
                converter=converter_map_lookup({"a": "A", "b": "B"})),
            Col("map_lookup_array", C.TEXT_ARRAY, optional=True,
                converter=converter_map_lookup_array(
                    {"a": "A", "b": "B"}, value_type="string")),
        ]
    return tuple(cols)


FAKE_EXHAUSTIVE_CONVERTER_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="fake_exhaustive_converter_v1",
        table="fake_exhaustive_converter_v1",
        remote_key=Col("my_id", ColumnType.TEXT),
        denorm_cols=_exhaustive_cols(),
        timestamp_col="at",
        update_where=lambda s, t: t("at") < s("at"),
        n_buckets=4,
    )
)
