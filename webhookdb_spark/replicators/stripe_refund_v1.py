"""Stripe refund replicator
(reference: lib/webhookdb/replicator/stripe_refund_v1.rb:23-45,
stripe_v1_mixin.rb).

Refund payloads have no ``updated`` field; the reference orders updates
by the event envelope's ``created`` (tsat — stripe_v1_mixin "updated
from event"), falling back to the resource's ``created``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from webhookdb_spark.functions.converters import CONV_UNIX_TS
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType


def _resource_and_event(body: Column) -> tuple[Column, Column | None]:
    is_event = F.get_json_object(body, "$.object") == F.lit("event")
    resource = F.when(is_event, F.get_json_object(body, "$.data.object")).otherwise(body)
    event = F.when(is_event, body)
    return resource, event


STRIPE_REFUND_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="stripe_refund_v1",
        table="stripe_refund_v1",
        remote_key=Col("stripe_id", ColumnType.TEXT, data_key="id"),
        denorm_cols=(
            Col("amount", ColumnType.INTEGER, index=True),
            Col("balance_transaction", ColumnType.TEXT, optional=True),
            Col("charge", ColumnType.TEXT, index=True, optional=True),
            Col("created", ColumnType.TIMESTAMP, converter=CONV_UNIX_TS),
            Col("payment_intent", ColumnType.TEXT, optional=True),
            Col("receipt_number", ColumnType.TEXT, optional=True),
            Col("source_transfer_reversal", ColumnType.TEXT, optional=True),
            Col("status", ColumnType.TEXT),
            Col("transfer_reversal", ColumnType.TEXT, optional=True),
            # "updated" comes from the event envelope when present
            # (stripe_v1_mixin's updated-from-event), else the resource
            # created time.
            Col(
                "updated",
                ColumnType.TIMESTAMP,
                data_key="created",
                event_key="created",
                converter=CONV_UNIX_TS,
                index=True,
            ),
        ),
        timestamp_col="updated",
        update_where=lambda s, t: t("updated") < s("updated"),
        resource_and_event=_resource_and_event,
    )
)
