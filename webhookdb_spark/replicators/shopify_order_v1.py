"""Shopify order replicator (reference:
lib/webhookdb/replicator/shopify_order_v1.rb:23-56,
shopify_v1_mixin.rb:31-34 HMAC verification — see
functions/verification.verify_shopify).

Remote key ``id``; conditional on ``updated_at``; nested customer id
dig. Link-header cursor pagination (shopify_v1_mixin.rb backfill) is
the Backfiller's concern.
"""

from __future__ import annotations

from webhookdb_spark.functions.converters import CONV_PARSE_TIME
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType

SHOPIFY_ORDER_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="shopify_order_v1",
        table="shopify_order_v1",
        remote_key=Col("shopify_id", ColumnType.TEXT, data_key="id"),
        denorm_cols=(
            Col("app_id", ColumnType.TEXT, optional=True),
            Col("cancelled_at", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME,
                optional=True, index=True),
            Col("cart_token", ColumnType.TEXT, optional=True),
            Col("checkout_token", ColumnType.TEXT, optional=True),
            Col("closed_at", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME,
                optional=True, index=True),
            Col("created_at", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME, index=True),
            Col("customer_id", ColumnType.TEXT, data_key=["customer", "id"],
                optional=True, index=True),
            Col("email", ColumnType.TEXT, optional=True, index=True),
            Col("name", ColumnType.TEXT, optional=True),
            Col("order_number", ColumnType.INTEGER, index=True),
            Col("phone", ColumnType.TEXT, optional=True, index=True),
            Col("token", ColumnType.TEXT, optional=True),
            Col("updated_at", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME, index=True),
            Col("user_id", ColumnType.TEXT, optional=True, index=True),
        ),
        timestamp_col="updated_at",
        update_where=lambda s, t: t("updated_at") < s("updated_at"),
    )
)
