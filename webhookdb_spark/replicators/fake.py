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
