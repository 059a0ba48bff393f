"""ConvertKit / Sponsy / Email Octopus family semantics."""

from __future__ import annotations

import datetime as dt
import json

from webhookdb_spark.operators.upsert import upsert_envelopes
from webhookdb_spark.replicators.convertkit import (
    CONVERTKIT_SUBSCRIBER_V1,
    convertkit_tag_v1,
)
from webhookdb_spark.replicators.email_octopus import (
    EMAIL_OCTOPUS_CONTACT_V1,
    EMAIL_OCTOPUS_LIST_V1,
)
from webhookdb_spark.replicators.sponsy import SPONSY_PUBLICATION_V1, SPONSY_SLOT_V1
from webhookdb_spark.storage import Warehouse


def _env(spark, rows):
    return spark.createDataFrame(
        [(json.dumps(r), dt.datetime(2026, 1, 1)) for r in rows],
        "body string, received_at timestamp",
    )


def test_convertkit_subscriber_canceled_at_lifecycle(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "convertkit_subscriber_v1")
    active = {"id": 123, "created_at": "2021-01-01T00:00:00Z",
              "email_address": "a@b.c", "first_name": "A", "state": "active",
              "fields": {"last_name": "B"}}
    upsert_envelopes(t, _env(spark, [active]), CONVERTKIT_SUBSCRIBER_V1)
    row = t.read().collect()[0]
    assert row.convertkit_id == 123
    assert row.canceled_at is None
    assert row.last_name == "B"

    # unsubscribes (webhook wraps under "subscriber") → canceled_at stamped
    gone = {"subscriber": dict(active, state="cancelled")}
    upsert_envelopes(t, _env(spark, [gone]), CONVERTKIT_SUBSCRIBER_V1)
    row = t.read().collect()[0]
    assert row.state == "cancelled"
    first_canceled = row.canceled_at
    assert first_canceled is not None

    # identical body → data-diff guard blocks the update entirely
    res = upsert_envelopes(t, _env(spark, [gone]), CONVERTKIT_SUBSCRIBER_V1)
    assert res.updated == 0

    # still inactive with different data → canceled_at keeps first value
    gone2 = {"subscriber": dict(active, state="cancelled", first_name="A2")}
    upsert_envelopes(t, _env(spark, [gone2]), CONVERTKIT_SUBSCRIBER_V1)
    row = t.read().collect()[0]
    assert row.first_name == "A2"
    assert row.canceled_at == first_canceled

    # re-activation clears canceled_at unconditionally
    back = dict(active, first_name="A3")
    upsert_envelopes(t, _env(spark, [back]), CONVERTKIT_SUBSCRIBER_V1)
    row = t.read().collect()[0]
    assert row.state == "active" and row.canceled_at is None


def test_convertkit_tag_enrichment(spark, tmp_warehouse):
    spec = convertkit_tag_v1(
        fetch_subscriptions=lambda r: {"total_subscriptions": 42}
    )
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "convertkit_tag_v1")
    tag = {"id": 9, "name": "vip", "created_at": "2021-01-01T00:00:00Z"}
    upsert_envelopes(t, _env(spark, [tag]), spec)
    row = t.read().collect()[0]
    assert row.total_subscriptions == 42
    assert json.loads(row.enrichment)["total_subscriptions"] == 42


def test_sponsy_day_mappings_and_updated_fallback(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "sponsy_publication_v1")
    pub = {"id": "p1", "name": "News", "slug": "news", "type": "newsletter",
           "days": ["MONDAY", "WEDNESDAY", 6],
           "createdAt": "2021-05-01T00:00:00Z"}
    upsert_envelopes(t, _env(spark, [pub]), SPONSY_PUBLICATION_V1)
    row = t.read().collect()[0]
    # Monday-zero: MONDAY→0, WEDNESDAY→2, 6 passes through
    assert row.days == [0, 2, 6]
    # Sunday-zero: MONDAY→1, WEDNESDAY→3, 6→0
    assert row.days_normalized == [1, 3, 0]
    assert row.day_names == ["MONDAY", "WEDNESDAY", "SUNDAY"]
    # updatedAt missing → falls back to createdAt
    assert row.updated_at == dt.datetime(2021, 5, 1)


def test_sponsy_slot_nested_ids(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "sponsy_slot_v1")
    slot = {"id": "s1", "publication_id": "p1", "date": "2021-06-01",
            "notes": "n", "customer": {"id": "c1"}, "placement": {"id": "pl1"},
            "status": {"id": "st1"}, "createdAt": "2021-05-01T00:00:00Z",
            "updatedAt": "2021-05-02T00:00:00Z"}
    upsert_envelopes(t, _env(spark, [slot]), SPONSY_SLOT_V1)
    row = t.read().collect()[0]
    assert row.customer_id == "c1" and row.placement_id == "pl1"
    assert row.date == dt.date(2021, 6, 1)
    assert row.updated_at == dt.datetime(2021, 5, 2)


def test_email_octopus_list_counts(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "email_octopus_list_v1")
    lst = {"id": "l1", "name": "Main", "created_at": "2021-01-01T00:00:00Z",
           "counts": {"pending": 1, "subscribed": 10, "unsubscribed": 2}}
    upsert_envelopes(t, _env(spark, [lst]), EMAIL_OCTOPUS_LIST_V1)
    row = t.read().collect()[0]
    assert row.subscribed == 10 and row.pending == 1
    assert row.row_updated_at is not None
    # identical payload → data-diff no-op
    res = upsert_envelopes(t, _env(spark, [lst]), EMAIL_OCTOPUS_LIST_V1)
    assert res.updated == 0


def test_email_octopus_contact_webhook_and_api_shapes(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "email_octopus_contact_v1")
    # webhook relay: array of events, one missing occurred_at (dropped)
    events = [
        {"type": "contact.created", "contact_id": "c1", "list_id": "l1",
         "contact_email_address": "a@b.c", "contact_status": "SUBSCRIBED",
         "occurred_at": "2021-02-01T00:00:00Z"},
        {"type": "contact.deleted", "contact_id": "c2", "list_id": "l1",
         "contact_email_address": "d@e.f", "contact_status": "UNSUBSCRIBED"},
    ]
    upsert_envelopes(t, _env(spark, [events]), EMAIL_OCTOPUS_CONTACT_V1)
    rows = t.read().collect()
    assert len(rows) == 1
    row = rows[0]
    assert row.compound_identity == "c1-l1"
    assert row.email_octopus_id == "c1"
    assert row.email_address == "a@b.c"
    assert row.created_at == dt.datetime(2021, 2, 1)
    assert row.row_updated_at == dt.datetime(2021, 2, 1)

    # API resource shape for the same contact: created_at skip_nil keeps
    # the stored value even though the API body lacks it
    api = {"id": "c1", "list_id": "l1", "email_address": "new@b.c",
           "status": "UNSUBSCRIBED"}
    upsert_envelopes(t, _env(spark, [api]), EMAIL_OCTOPUS_CONTACT_V1)
    row = t.read().collect()[0]
    assert row.email_address == "new@b.c"
    assert row.created_at == dt.datetime(2021, 2, 1)


def test_sponsy_status_publication_id_stamped_before_upsert(spark, tmp_warehouse):
    """sponsy_status_v1_spec.rb:202-221 'specialized backfill behavior':
    the per-publication child backfiller requests
    /v1/publications/{pub}/status with the mixin's exact query shape and
    stamps publication_id into each body before upsert — the payload
    itself carries no publication id, so the stored column proves the
    prepare_body hook ran. Body is the spec's make_body(['2022-09-02'])
    shape (random hex pinned for determinism)."""
    import json as _json

    from webhookdb_spark.replicators.sponsy import (
        SPONSY_STATUS_V1,
        publication_child_backfillers,
    )
    from webhookdb_spark.storage import Warehouse

    page = {
        "data": [{
            "id": "2022-09-02-9f3a11aa",
            "createdAt": "2022-09-02T22:07:36.241Z",
            "updatedAt": "2022-09-02T19:27:34.962Z",
            "name": "Sent", "slug": "sent", "color": "#2A0481", "order": 3,
        }],
        "cursor": {"afterCursor": None},
    }
    calls = []

    def http_get(url, query):
        calls.append((url, dict(query)))
        return _json.dumps(page)

    wh = Warehouse(spark, str(tmp_warehouse / "wh"))
    from webhookdb_spark.replicators.sponsy import (
        SPONSY_PLACEMENT_V1,
        SPONSY_SLOT_V1,
    )

    # slots/placements run the identical block with their own tail
    # (sponsy_slot_v1_spec.rb:255-279, sponsy_placement_v1_spec.rb:202-221)
    for spec, tail in ((SPONSY_STATUS_V1, "status"),
                       (SPONSY_SLOT_V1, "slots"),
                       (SPONSY_PLACEMENT_V1, "placements")):
        calls.clear()
        bfs = publication_child_backfillers(
            spark, wh, "org1", spec, tail, http_get, ["pubid1"])
        assert [bf.backfill() for bf in bfs] == [1]
        assert calls == [(
            f"https://api.getsponsy.com/v1/publications/pubid1/{tail}",
            {"limit": "100", "afterCursor": None,
             "orderBy": "updatedAt", "orderDirection": "DESC"},
        )]
        rows = wh.table("org1", spec.table).read().collect()
        assert len(rows) == 1
        assert rows[0]["sponsy_id"].startswith("2022-09-02-")
        assert rows[0]["publication_id"] == "pubid1"
        # the stamp rides into the stored body too (prepare_body
        # mutates the body, not just a column)
        assert _json.loads(rows[0]["data"])["publication_id"] == "pubid1"
    assert rows[0]["name"] == "Sent"
