"""twilio_sms / shopify_order / intercom_contact replicator semantics."""

from __future__ import annotations

import datetime as dt
import json

from webhookdb_spark.operators.upsert import upsert_envelopes
from webhookdb_spark.replicators.intercom_contact_v1 import INTERCOM_CONTACT_V1
from webhookdb_spark.replicators.shopify_order_v1 import SHOPIFY_ORDER_V1
from webhookdb_spark.replicators.twilio_sms_v1 import TWILIO_SMS_V1
from webhookdb_spark.storage import Warehouse


def _env(spark, rows):
    return spark.createDataFrame(
        [(json.dumps(r), dt.datetime(2026, 1, 1)) for r in rows],
        "body string, received_at timestamp",
    )


def test_twilio_rfc2822_dates_and_guard(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "twilio_sms_v1")
    msg = {
        "sid": "SM123", "direction": "outbound-api", "from": "+15551230000",
        "to": "+15551239999", "status": "sent",
        "date_created": "Mon, 16 Aug 2010 03:45:01 +0000",
        "date_sent": "Mon, 16 Aug 2010 03:45:03 +0000",
        "date_updated": "Mon, 16 Aug 2010 03:45:03 +0000",
    }
    res = upsert_envelopes(t, _env(spark, [msg]), TWILIO_SMS_V1)
    assert res.inserted == 1
    row = t.read().collect()[0]
    assert row.twilio_id == "SM123"
    assert row.date_sent == dt.datetime(2010, 8, 16, 3, 45, 3)
    assert row["from"] == "+15551230000"

    stale = dict(msg, status="queued", date_updated="Mon, 16 Aug 2010 03:44:00 +0000")
    res = upsert_envelopes(t, _env(spark, [stale]), TWILIO_SMS_V1)
    assert res.updated == 0
    assert t.read().collect()[0].status == "sent"


def test_shopify_nested_customer_and_iso_dates(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "shopify_order_v1")
    order = {
        "id": 450789469, "app_id": "580111", "email": "bob@example.com",
        "name": "#1001", "order_number": 1001, "token": "tok",
        "created_at": "2008-01-10T11:00:00-05:00",
        "updated_at": "2008-01-10T11:00:00-05:00",
        "customer": {"id": 207119551, "email": "bob@example.com"},
    }
    upsert_envelopes(t, _env(spark, [order]), SHOPIFY_ORDER_V1)
    row = t.read().collect()[0]
    assert row.shopify_id == "450789469"
    assert row.customer_id == "207119551"
    assert row.order_number == 1001
    # -05:00 normalized to UTC session time
    assert row.created_at == dt.datetime(2008, 1, 10, 16, 0, 0)


def test_intercom_delete_preserves_fields_and_marks_data(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "intercom_contact_v1")
    full = {
        "id": "c1", "external_id": "u-9", "email": "ann@x.co",
        "created_at": 1571672154, "updated_at": 1571672154,
        "location": {"city": "Lisbon", "country": "PT"},
    }
    upsert_envelopes(t, _env(spark, [full]), INTERCOM_CONTACT_V1)
    row = t.read().collect()[0]
    assert row.email == "ann@x.co"
    assert row.created_at == dt.datetime.utcfromtimestamp(1571672154)

    # delete webhook carries only a skeleton
    delete_evt = {
        "topic": "contact.deleted",
        "data": {"item": {"id": "c1", "external_id": "u-9"}},
    }
    res = upsert_envelopes(t, _env(spark, [delete_evt]), INTERCOM_CONTACT_V1)
    assert res.updated == 1
    row = t.read().collect()[0]
    assert row.deleted_at is not None
    assert row.email == "ann@x.co"  # skip_nil: skeleton doesn't clobber
    data = json.loads(row.data)
    assert data["location"] == {"city": "Lisbon", "country": "PT"}  # merge kept nesting
    assert "deleted_at" in data


def test_intercom_subscribe_unwraps_contact(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "intercom_contact_v1")
    evt = {
        "topic": "contact.subscribed",
        "data": {"item": {"contact": {"id": "c2", "email": "s@x.co",
                                      "updated_at": 1600000000}}},
    }
    res = upsert_envelopes(t, _env(spark, [evt]), INTERCOM_CONTACT_V1)
    assert res.inserted == 1
    row = t.read().collect()[0]
    assert row.intercom_id == "c2" and row.email == "s@x.co"


def test_intercom_iso_string_timestamps(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "intercom_contact_v1")
    body = {"id": "c3", "updated_at": "2023-05-01T10:00:00Z"}
    upsert_envelopes(t, _env(spark, [body]), INTERCOM_CONTACT_V1)
    assert t.read().collect()[0].updated_at == dt.datetime(2023, 5, 1, 10, 0)


def test_marketplace_roots_registered_and_auth_only(spark):
    import pytest

    import webhookdb_spark.replicators  # noqa: F401 - registers all specs
    from webhookdb_spark.spec import all_registered, registered

    reg = all_registered()
    # full reference registry parity: 65 concrete replicators
    # (ls lib/webhookdb/replicator/*.rb minus mixins/support = 65)
    assert len(reg) >= 67  # 64 data-table specs + 3 auth-only roots
    for name, deps in {
        "front_marketplace_root_v1": ("front_conversation_v1", "front_message_v1"),
        "intercom_marketplace_root_v1": ("intercom_contact_v1",
                                         "intercom_conversation_v1"),
        "increase_app_v1": ("increase_event_v1",),
    }.items():
        spec = registered(name)
        assert spec.auth_only and spec.denorm_cols == ()
        assert spec.creates_dependents == deps
        # every declared dependent must itself be a registered spec
        for d in deps:
            assert d in reg
        env = spark.createDataFrame([("{}",)], "body string")
        with pytest.raises(NotImplementedError, match="auth purposes"):
            spec.shape(env)
