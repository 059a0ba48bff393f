"""Stripe replicator family (reference: lib/webhookdb/replicator/
stripe_v1_mixin.rb plus the per-resource files cited on each spec).

Every Stripe replicator shares the mixin shape: payloads are either a
bare resource or an event envelope ``{"object": "event", "data":
{"object": {...}}}``; the remote key is ``id``; staleness ordering uses
an ``updated`` column derived from the resource's ``created`` (the
event envelope's ``created`` wins when present) with conditional update
``updated < excluded.updated``. ``stripe_spec`` is that mixin as a
factory; per-resource modules below only declare their denormalized
columns, exactly like the reference's ``_denormalized_columns``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from webhookdb_spark.functions.converters import CONV_UNIX_TS
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType


def stripe_resource_and_event(body: Column) -> tuple[Column, Column | None]:
    # stripe_v1_mixin.rb: when body.object == "event" the resource is at
    # data.object and the envelope itself is the event.
    is_event = F.get_json_object(body, "$.object") == F.lit("event")
    resource = F.when(is_event, F.get_json_object(body, "$.data.object")).otherwise(body)
    event = F.when(is_event, body)
    return resource, event


def stripe_spec(
    name: str,
    denorm_cols: tuple[Col, ...],
    updated_data_key: str = "created",
) -> ReplicatorSpec:
    """One Stripe replicator. ``updated_data_key`` covers resources with
    no ``created`` field (stripe_invoice_item_v1.rb uses ``date``)."""
    return register(
        ReplicatorSpec(
            supports_backfill=True,
            name=name,
            table=name,
            remote_key=Col("stripe_id", ColumnType.TEXT, data_key="id"),
            denorm_cols=(
                *denorm_cols,
                Col(
                    "updated",
                    ColumnType.TIMESTAMP,
                    data_key=updated_data_key,
                    event_key="created",
                    converter=CONV_UNIX_TS,
                    index=True,
                ),
            ),
            timestamp_col="updated",
            update_where=lambda s, t: t("updated") < s("updated"),
            resource_and_event=stripe_resource_and_event,
        )
    )


_TSAT = {"converter": CONV_UNIX_TS, "index": True, "optional": True}


def _c(name, ctype, **kw) -> Col:
    return Col(name, ctype, **kw)


T, I, D = ColumnType.TEXT, ColumnType.INTEGER, ColumnType.DECIMAL
TS = ColumnType.TIMESTAMP

# stripe_coupon_v1.rb:24-45
STRIPE_COUPON_V1 = stripe_spec(
    "stripe_coupon_v1",
    (
        _c("amount_off", T, optional=True),
        _c("created", TS, event_key="created", **_TSAT),
        _c("duration", T, optional=True),
        _c("max_redemptions", I, optional=True),
        _c("name", T, optional=True),
        _c("percent_off", D, optional=True),
        _c("times_redeemed", D, optional=True),
    ),
)

# stripe_customer_v1.rb:24-41
STRIPE_CUSTOMER_V1 = stripe_spec(
    "stripe_customer_v1",
    (
        _c("balance", I, index=True, optional=True),
        _c("created", TS, event_key="created", **_TSAT),
        _c("email", T, index=True, optional=True),
        _c("name", T, optional=True),
        _c("phone", T, index=True, optional=True),
    ),
)

# stripe_dispute_v1.rb:24-62
STRIPE_DISPUTE_V1 = stripe_spec(
    "stripe_dispute_v1",
    (
        _c("amount", I, optional=True),
        _c("charge", T, optional=True),
        _c("cancellation_policy", T, data_key=["evidence", "cancellation_policy"],
           optional=True),
        _c("created", TS, **_TSAT),
        _c("due_by", TS, data_key=["evidence_details", "due_by"],
           converter=CONV_UNIX_TS, optional=True),
        _c("is_charge_refundable", T, optional=True),
        _c("receipt", T, data_key=["evidence", "receipt"], optional=True),
        _c("refund_policy", T, data_key=["evidence", "refund_policy"], optional=True),
        _c("service_date", TS, data_key=["evidence", "service_date"],
           converter=CONV_UNIX_TS, optional=True),
        _c("status", T, optional=True),
    ),
)

# stripe_invoice_item_v1.rb:24-70 — `updated` falls back to `date`
STRIPE_INVOICE_ITEM_V1 = stripe_spec(
    "stripe_invoice_item_v1",
    (
        _c("amount", I, index=True, optional=True),
        _c("customer", T, index=True, optional=True),
        _c("date", TS, **_TSAT),
        _c("description", T, optional=True),
        _c("invoice", T, index=True, optional=True),
        _c("period_end", TS, data_key=["period", "end"], **_TSAT),
        _c("period_start", TS, data_key=["period", "start"], **_TSAT),
        _c("price", T, index=True, data_key=["price", "id"], optional=True),
        _c("product", T, index=True, data_key=["price", "product"], optional=True),
        _c("quantity", I, optional=True),
        _c("subscription", T, index=True, optional=True),
        _c("subscription_item", T, index=True, optional=True),
        _c("unit_amount", I, optional=True),
    ),
    updated_data_key="date",
)

# stripe_invoice_v1.rb:25-100
STRIPE_INVOICE_V1 = stripe_spec(
    "stripe_invoice_v1",
    (
        _c("amount_due", I, optional=True),
        _c("amount_paid", I, optional=True),
        _c("amount_remaining", I, optional=True),
        _c("charge", T, index=True, optional=True),
        _c("created", TS, **_TSAT),
        _c("customer", T, index=True, optional=True),
        _c("customer_address", T, optional=True),
        _c("customer_email", T, index=True, optional=True),
        _c("customer_name", T, optional=True),
        _c("customer_phone", T, index=True, optional=True),
        _c("customer_shipping", T, optional=True),
        _c("number", T, index=True, optional=True),
        _c("period_start", TS, **_TSAT),
        _c("period_end", TS, **_TSAT),
        _c("statement_descriptor", T, optional=True),
        _c("status", T, optional=True),
        # The reference digs status_transitions.<same long name> — an
        # upstream quirk preserved verbatim (stripe_invoice_v1.rb:56-87).
        _c("status_transitions_finalized_at", TS,
           data_key=["status_transitions", "status_transitions_finalized_at"], **_TSAT),
        _c("status_transitions_marked_uncollectible_at", TS,
           data_key=["status_transitions", "status_transitions_marked_uncollectible_at"],
           **_TSAT),
        _c("status_transitions_marked_paid_at", TS,
           data_key=["status_transitions", "status_transitions_marked_paid_at"], **_TSAT),
        _c("status_transitions_voided_at", TS,
           data_key=["status_transitions", "status_transitions_voided_at"], **_TSAT),
        _c("subtotal", I, index=True, optional=True),
        _c("tax", I, index=True, optional=True),
        _c("total", I, index=True, optional=True),
    ),
)

# stripe_payout_v1.rb:24-52
STRIPE_PAYOUT_V1 = stripe_spec(
    "stripe_payout_v1",
    (
        _c("amount", I, index=True, optional=True),
        _c("arrival_date", TS, **_TSAT),
        _c("balance_transaction", T, index=True, optional=True),
        _c("created", TS, **_TSAT),
        _c("destination", T, index=True, optional=True),
        _c("failure_balance_transaction", T, index=True, optional=True),
        _c("original_payout", T, index=True, optional=True),
        _c("reversed_by", T, index=True, optional=True),
        _c("statement_descriptor", T, optional=True),
        _c("status", T, optional=True),
    ),
)

# stripe_price_v1.rb:24-42
STRIPE_PRICE_V1 = stripe_spec(
    "stripe_price_v1",
    (
        _c("created", TS, **_TSAT),
        _c("interval", T, data_key=["recurring", "interval"], optional=True),
        _c("product", T, optional=True),
        _c("type", T, optional=True),
        _c("unit_amount", T, optional=True),
    ),
)

# stripe_product_v1.rb:24-42
STRIPE_PRODUCT_V1 = stripe_spec(
    "stripe_product_v1",
    (
        _c("created", TS, **_TSAT),
        _c("name", T, optional=True),
        _c("package_dimensions", T, optional=True),
        _c("statement_descriptor", T, optional=True),
        _c("unit_label", T, optional=True),
    ),
)

# stripe_subscription_v1.rb:24-64
STRIPE_SUBSCRIPTION_V1 = stripe_spec(
    "stripe_subscription_v1",
    (
        _c("billing_cycle_anchor", TS, **_TSAT),
        _c("cancel_at", TS, **_TSAT),
        _c("canceled_at", TS, **_TSAT),
        _c("created", TS, **_TSAT),
        _c("current_period_end", TS, **_TSAT),
        _c("current_period_start", TS, **_TSAT),
        _c("customer", T, index=True, optional=True),
        _c("default_payment_method", T, optional=True),
        _c("default_source", T, optional=True),
        _c("discount", T, index=True, optional=True),
        # reference declares ended_at WITHOUT :tsat (a raw timestamp cast)
        _c("ended_at", TS, index=True, optional=True),
        _c("latest_invoice", T, index=True, optional=True),
        _c("schedule", T, index=True, optional=True),
        _c("start_date", TS, **_TSAT),
        _c("status", T, optional=True),
        _c("trial_end", TS, converter=CONV_UNIX_TS, optional=True),
        _c("trial_start", TS, converter=CONV_UNIX_TS, optional=True),
    ),
)

# stripe_subscription_item_v1.rb:24-42
STRIPE_SUBSCRIPTION_ITEM_V1 = stripe_spec(
    "stripe_subscription_item_v1",
    (
        _c("created", TS, **_TSAT),
        _c("price", T, index=True, data_key=["price", "id"], optional=True),
        _c("product", T, index=True, data_key=["price", "product"], optional=True),
        _c("quantity", I, optional=True),
        _c("subscription", T, index=True, optional=True),
    ),
)


def stripe_page_fetcher(http_get, base_url: str, backfill_key: str):
    """The Stripe-family backfill pager (stripe_v1_mixin.rb:93-109):
    GET ``base_url + pagination_token`` with HTTP Basic auth of
    ``backfill_key:`` (empty password); while the response says
    ``has_more``, the next token is ``?starting_after=<last item id>``.

    ``http_get(url, basic_user) -> response body str`` keeps the
    transport injectable (drivers plug requests/urllib; tests replay
    the reference's golden page transcripts verbatim). Returns a
    ``PageFetcher`` for :class:`webhookdb_spark.sources.backfill.Backfiller`.
    """
    import json as _json

    def fetch(token, _last):
        url = base_url + (token or "")
        data = _json.loads(http_get(url, backfill_key))
        next_param = None
        if data.get("has_more"):
            next_param = "?starting_after=" + data["data"][-1]["id"]
        return data["data"], next_param

    return fetch
