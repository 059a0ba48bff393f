"""The test replicator (reference: lib/webhookdb/replicator/fake.rb:1-471).

The reference's Fake replicator declares: remote key ``my_id``, a single
denormalized timestamp column ``at``, and the conditional update
``at < excluded.at`` — the canonical "prevent overwriting new data with
old" guard exercised by the shared conformance suite
(shared_examples_for_replicators.rb:263-326).
"""

from __future__ import annotations

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
