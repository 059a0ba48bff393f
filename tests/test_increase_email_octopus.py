"""Increase mixin + Email Octopus event replicator semantics.

Covers the three DSL extensions they drove: enrichment that REPLACES the
resource (increase_v1_mixin.rb:33-58), array webhook bodies
(email_octopus_event_v1.rb:55-80), and computed-compound-key defaulters
(BUILD_EVENT_MD5, :23-34).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json

from webhookdb_spark.operators.upsert import upsert_envelopes
from webhookdb_spark.replicators.email_octopus_event_v1 import EMAIL_OCTOPUS_EVENT_V1
from webhookdb_spark.replicators.increase import increase_spec
from webhookdb_spark.spec import Col
from webhookdb_spark.storage import Warehouse
from webhookdb_spark.types import ColumnType


def _env(spark, bodies):
    return spark.createDataFrame(
        [(json.dumps(b), dt.datetime(2026, 1, 1)) for b in bodies],
        "body string, received_at timestamp",
    )


def _acct_spec(fetches):
    def fetch(obj_id):
        fetches.append(obj_id)
        return {
            "id": obj_id,
            "type": "account",
            "name": "fetched-account",
            "status": "open",
            "created_at": "2024-01-01T00:00:00Z",
        }

    return increase_spec(
        "increase_account_v1",
        "account",
        (
            Col("name", ColumnType.TEXT, optional=True),
            Col("status", ColumnType.TEXT, optional=True),
        ),
        fetch_resource=fetch,
    )


def test_increase_event_envelope_fetches_and_replaces(spark, tmp_warehouse):
    fetches: list[str] = []
    spec = _acct_spec(fetches)
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "increase_account_v1")
    event = {
        "id": "event_abc",
        "type": "event",
        "associated_object_type": "account",
        "associated_object_id": "account_123",
        "created_at": "2024-02-02T10:00:00Z",
    }
    res = upsert_envelopes(t, _env(spark, [event]), spec)
    assert res.inserted == 1
    row = t.read().collect()[0]
    # the fetched resource replaced the event envelope (the fetch ran
    # executor-side: its payload is only reachable through the fetcher)…
    assert row.increase_id == "account_123"
    assert row.name == "fetched-account"
    # …and updated_at was stamped from the EVENT's created_at
    assert row.updated_at == dt.datetime(2024, 2, 2, 10, 0, 0)
    assert json.loads(row.data)["name"] == "fetched-account"


def test_increase_direct_resource_no_fetch(spark, tmp_warehouse):
    fetches: list[str] = []
    spec = _acct_spec(fetches)
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "increase_account_v1")
    resource = {
        "id": "account_9",
        "type": "account",
        "name": "direct",
        "status": "open",
        "created_at": "2024-01-01T00:00:00Z",
        "updated_at": "2024-03-01T00:00:00Z",
    }
    res = upsert_envelopes(t, _env(spark, [resource]), spec)
    assert res.inserted == 1
    # no fetch for a direct resource: the stored row is the payload
    # as-sent, not the fetcher's canned "fetched-account"
    assert t.read().collect()[0].name == "direct"
    # stale event (earlier updated_at) must not overwrite
    stale_event = {
        "id": "event_old",
        "type": "event",
        "associated_object_type": "account",
        "associated_object_id": "account_9",
        "created_at": "2024-02-01T00:00:00Z",
    }
    res = upsert_envelopes(t, _env(spark, [stale_event]), spec)
    assert res.updated == 0
    assert t.read().collect()[0].name == "direct"


def _eo_md5(occurred, etype, contact, campaign=None):
    m = hashlib.md5()
    m.update(occurred.encode())
    m.update(etype.encode())
    m.update(contact.encode())
    m.update((campaign or "missing").encode())
    return m.hexdigest()


def test_email_octopus_array_body_and_md5_key(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "email_octopus_event_v1")
    # one webhook POST: array of flat webhook-shaped events, one element
    # missing occurred_at (skipped, :57-59)
    body = [
        {
            "contact_id": "c1",
            "contact_email_address": "a@x.com",
            "type": "contact.created",
            "occurred_at": "2024-05-01T00:00:00Z",
        },
        {
            "contact_id": "c2",
            "contact_email_address": "b@x.com",
            "type": "bounced",
            "campaign_id": "camp9",
            "occurred_at": "2024-05-02T00:00:00Z",
        },
        {"contact_id": "c3", "type": "opened"},  # no occurred_at → skipped
    ]
    res = upsert_envelopes(t, _env(spark, [body]), EMAIL_OCTOPUS_EVENT_V1)
    assert res.inserted == 2
    rows = {r.email_octopus_contact_id: r for r in t.read().collect()}
    assert set(rows) == {"c1", "c2"}
    assert rows["c2"].event_type == "bounced"
    assert rows["c2"].email_octopus_campaign_id == "camp9"
    # compound md5 key matches the reference's BUILD_EVENT_MD5 exactly
    assert rows["c2"].unique_id == _eo_md5(
        "2024-05-02T00:00:00Z", "bounced", "c2", "camp9"
    )
    assert rows["c1"].unique_id == _eo_md5("2024-05-01T00:00:00Z", "contact.created", "c1")

    # API-resource shape (nested contact) hashes to the same key → no dup,
    # and rows are immutable (update_where false)
    api_shape = {
        "contact": {"id": "c1", "email_address": "a+changed@x.com"},
        "event_type": "contact.created",
        "occurred_at": "2024-05-01T00:00:00Z",
    }
    res = upsert_envelopes(t, _env(spark, [api_shape]), EMAIL_OCTOPUS_EVENT_V1)
    assert res.inserted == 0 and res.updated == 0
    assert t.read().count() == 2
    assert {
        r.contact_email_address for r in t.read().collect()
    } == {"a@x.com", "b@x.com"}  # immutable: no overwrite


def test_github_pull_and_stripe_refund_register(spark, tmp_warehouse):
    from webhookdb_spark.replicators.github_pull_v1 import GITHUB_PULL_V1
    from webhookdb_spark.replicators.stripe_refund_v1 import STRIPE_REFUND_V1

    t = Warehouse(spark, str(tmp_warehouse)).table("org", "github_pull_v1")
    pr = {
        "id": 101, "number": 7, "state": "open", "node_id": "PR_1",
        "user": {"id": 42}, "assignees": [{"id": 1}, {"id": 2}],
        "labels": [{"id": 9}], "created_at": "2024-01-01T00:00:00Z",
        "updated_at": "2024-01-02T00:00:00Z", "merged_at": None,
    }
    assert upsert_envelopes(t, _env(spark, [pr]), GITHUB_PULL_V1).inserted == 1
    row = t.read().collect()[0]
    assert row.assignee_ids == [1, 2] and row.merged_at is None

    t2 = Warehouse(spark, str(tmp_warehouse)).table("org", "stripe_refund_v1")
    refund = {"id": "re_1", "amount": 500, "charge": "ch_7",
              "created": 1700000000, "status": "succeeded"}
    event = {"object": "event", "created": 1700009999,
             "data": {"object": dict(refund, status="failed")}}
    assert upsert_envelopes(t2, _env(spark, [refund]), STRIPE_REFUND_V1).inserted == 1
    res = upsert_envelopes(t2, _env(spark, [event]), STRIPE_REFUND_V1)
    assert res.updated == 1  # event's created (newer) wins as `updated`
    row = t2.read().collect()[0]
    assert row.status == "failed"
    assert row.updated == dt.datetime(2023, 11, 15, 0, 59, 59)
