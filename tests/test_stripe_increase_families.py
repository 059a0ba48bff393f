"""Stripe family factory + remaining Increase replicators.

Covers: the shared stripe mixin shape (event-envelope unwrap, updated
from created, staleness guard), invoice_item's `date`-based updated,
increase_event_v1 storing envelopes directly, increase_limit_v1's
row_created_at :now defaulter, and the increase_app_v1 event router.
"""

from __future__ import annotations

import datetime as dt
import json

from webhookdb_spark.operators.upsert import upsert_envelopes
from webhookdb_spark.replicators.increase import (
    INCREASE_EVENT_V1,
    INCREASE_LIMIT_V1,
    route_increase_events,
)
from webhookdb_spark.replicators.stripe import (
    STRIPE_CUSTOMER_V1,
    STRIPE_INVOICE_ITEM_V1,
    STRIPE_INVOICE_V1,
)
from webhookdb_spark.storage import Warehouse


def _env(spark, rows):
    return spark.createDataFrame(
        [(json.dumps(r), dt.datetime(2026, 1, 1)) for r in rows],
        "body string, received_at timestamp",
    )


def test_stripe_customer_event_unwrap_and_guard(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "stripe_customer_v1")
    cust = {"id": "cus_1", "balance": 0, "created": 1700000000,
            "email": "a@b.c", "name": "A", "phone": "+1"}
    upsert_envelopes(t, _env(spark, [cust]), STRIPE_CUSTOMER_V1)
    row = t.read().collect()[0]
    assert row.stripe_id == "cus_1"
    # updated falls back to resource.created for bare resources
    assert row.updated == dt.datetime(2023, 11, 14, 22, 13, 20)

    # newer wrapped event overwrites; stale one does not
    newer = {"object": "event", "created": 1800000000,
             "data": {"object": dict(cust, email="new@b.c")}}
    upsert_envelopes(t, _env(spark, [newer]), STRIPE_CUSTOMER_V1)
    assert t.read().collect()[0].email == "new@b.c"
    stale = {"object": "event", "created": 1600000000,
             "data": {"object": dict(cust, email="old@b.c")}}
    res = upsert_envelopes(t, _env(spark, [stale]), STRIPE_CUSTOMER_V1)
    assert res.updated == 0
    assert t.read().collect()[0].email == "new@b.c"


def test_stripe_invoice_item_updated_from_date(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "stripe_invoice_item_v1")
    item = {"id": "ii_1", "amount": 500, "customer": "cus_1", "date": 1700000000,
            "invoice": "in_1", "quantity": 2,
            "period": {"start": 1700000000, "end": 1702592000},
            "price": {"id": "price_1", "product": "prod_1"}}
    upsert_envelopes(t, _env(spark, [item]), STRIPE_INVOICE_ITEM_V1)
    row = t.read().collect()[0]
    assert row.updated == dt.datetime(2023, 11, 14, 22, 13, 20)
    assert row.price == "price_1" and row.product == "prod_1"
    assert row.period_end == dt.datetime(2023, 12, 14, 22, 13, 20)


def test_stripe_invoice_nested_status_transitions(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "stripe_invoice_v1")
    inv = {"id": "in_1", "amount_due": 100, "created": 1700000000,
           "customer": "cus_1", "status": "paid", "total": 100,
           "status_transitions": {"status_transitions_marked_paid_at": 1700000500}}
    upsert_envelopes(t, _env(spark, [inv]), STRIPE_INVOICE_V1)
    row = t.read().collect()[0]
    assert row.status_transitions_marked_paid_at == dt.datetime(2023, 11, 14, 22, 21, 40)
    assert row.status_transitions_voided_at is None


def test_increase_event_stores_envelope(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "increase_event_v1")
    ev = {"id": "ev_1", "type": "event", "category": "transaction.created",
          "associated_object_id": "txn_1", "associated_object_type": "transaction",
          "created_at": "2026-01-05T00:00:00Z"}
    upsert_envelopes(t, _env(spark, [ev]), INCREASE_EVENT_V1)
    row = t.read().collect()[0]
    assert row.increase_id == "ev_1"
    assert row.associated_object_id == "txn_1"
    assert row.created_at == dt.datetime(2026, 1, 5)


def test_increase_limit_row_created_at_defaulter(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "increase_limit_v1")
    lim = {"id": "limit_1", "type": "limit", "metric": "volume", "value": 100,
           "model_id": "acct_1", "model_type": "account", "status": "active",
           "updated_at": "2026-01-05T00:00:00Z"}
    upsert_envelopes(t, _env(spark, [lim]), INCREASE_LIMIT_V1)
    row = t.read().collect()[0]
    # no created_at in payload → :now defaulter stamps first-seen time
    assert row.row_created_at is not None
    assert row.row_updated_at == dt.datetime(2026, 1, 5)


def test_route_increase_events(spark):
    evs = [
        {"id": "ev_1", "type": "event", "associated_object_type": "transaction",
         "associated_object_id": "txn_1", "created_at": "2026-01-01T00:00:00Z"},
        {"id": "ev_2", "type": "event", "associated_object_type": "limit",
         "associated_object_id": "limit_1", "created_at": "2026-01-01T00:00:00Z"},
        {"id": "not_event", "type": "transaction"},
    ]
    routed = route_increase_events(_env(spark, evs))
    assert routed["increase_transaction_v1"].count() == 1
    assert routed["increase_limit_v1"].count() == 1
    assert routed["increase_ach_transfer_v1"].count() == 0
    # the event table keeps every envelope
    assert routed["increase_event_v1"].count() == 2
