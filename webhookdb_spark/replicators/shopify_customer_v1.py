"""Shopify customer replicator (reference:
lib/webhookdb/replicator/shopify_customer_v1.rb:24-45).

Same mixin behavior as shopify_order_v1: remote key ``id``, ISO
timestamps, conditional update ``updated_at < excluded.updated_at``.
"""

from __future__ import annotations

from webhookdb_spark.functions.converters import CONV_PARSE_TIME
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType

T, TS = ColumnType.TEXT, ColumnType.TIMESTAMP

SHOPIFY_CUSTOMER_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="shopify_customer_v1",
        table="shopify_customer_v1",
        remote_key=Col("shopify_id", T, data_key="id"),
        denorm_cols=(
            Col("created_at", TS, index=True, converter=CONV_PARSE_TIME),
            Col("email", T, index=True, optional=True),
            Col("first_name", T, optional=True),
            Col("last_name", T, optional=True),
            Col("last_order_id", T, optional=True),
            Col("last_order_name", T, optional=True),
            Col("phone", T, index=True, optional=True),
            Col("state", T, optional=True),
            Col("updated_at", TS, index=True, converter=CONV_PARSE_TIME),
        ),
        timestamp_col="updated_at",
        update_where=lambda s, t: t("updated_at") < s("updated_at"),
    )
)
