"""Stripe charge replicator (reference: lib/webhookdb/replicator/stripe_charge_v1.rb:23-60,
stripe_v1_mixin.rb).

Payload is either a bare charge resource or a Stripe event envelope
``{"type": "charge.updated", "data": {"object": {...}}}``; the mixin
unwraps ``data.object`` when an ``object == "event"`` wrapper is present.
Conditional update: ``updated < excluded.updated``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from webhookdb_spark.functions.converters import CONV_UNIX_TS
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType


def _resource_and_event(body: Column) -> tuple[Column, Column | None]:
    # Event envelope detection (stripe_v1_mixin.rb): when body.object ==
    # "event", the resource is at data.object and the envelope itself is
    # the event.
    is_event = F.get_json_object(body, "$.object") == F.lit("event")
    resource = F.when(is_event, F.get_json_object(body, "$.data.object")).otherwise(body)
    event = F.when(is_event, body)
    return resource, event


STRIPE_CHARGE_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="stripe_charge_v1",
        table="stripe_charge_v1",
        remote_key=Col("stripe_id", ColumnType.TEXT, data_key="id"),
        denorm_cols=(
            Col("amount", ColumnType.INTEGER),
            Col("balance_transaction", ColumnType.TEXT, optional=True),
            Col(
                "billing_email",
                ColumnType.TEXT,
                data_key=["billing_details", "email"],
                optional=True,
            ),
            Col("created", ColumnType.TIMESTAMP, converter=CONV_UNIX_TS),
            Col("customer", ColumnType.TEXT, optional=True),
            Col("invoice", ColumnType.TEXT, optional=True),
            Col(
                "payment_type",
                ColumnType.TEXT,
                data_key=["payment_method_details", "type"],
                optional=True,
            ),
            Col("receipt_email", ColumnType.TEXT, optional=True),
            Col("status", ColumnType.TEXT, index=True),
            # stripe_charge_v1.rb:48-55: `updated` reads the resource's
            # `created`, preferring the EVENT envelope's `created` when a
            # webhook event wraps the charge — that is what makes the
            # staleness guard meaningful for bare-resource payloads.
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
