"""GitHub remainder / Transistor / Postmark / Front / Intercom-conversation
/ misc replicator semantics."""

from __future__ import annotations

import datetime as dt
import json

from webhookdb_spark.operators.upsert import upsert_envelopes
from webhookdb_spark.replicators.front_intercom import (
    FRONT_MESSAGE_V1,
    FRONT_SIGNALWIRE_MESSAGE_CHANNEL_APP_V1,
    INTERCOM_CONVERSATION_V1,
)
from webhookdb_spark.replicators.github import GITHUB_ISSUE_COMMENT_V1
from webhookdb_spark.replicators.misc import JOTFORM_WEBHOOK_V1, URL_RECORDER_V1
from webhookdb_spark.replicators.postmark import POSTMARK_OUTBOUND_MESSAGE_EVENT_V1
from webhookdb_spark.replicators.transistor import (
    TRANSISTOR_SHOW_V1,
    split_description,
)
from webhookdb_spark.storage import Warehouse


def _env(spark, rows):
    return spark.createDataFrame(
        [(json.dumps(r), dt.datetime(2026, 1, 1)) for r in rows],
        "body string, received_at timestamp",
    )


def test_github_issue_comment_regex_issue_id_and_unwrap(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "github_issue_comment_v1")
    comment = {"id": 42, "node_id": "n42",
               "issue_url": "https://api.github.com/repos/o/r/issues/777",
               "created_at": "2024-01-01T00:00:00Z",
               "updated_at": "2024-01-02T00:00:00Z", "user": {"id": 9}}
    # webhook delivery wraps under "comment"
    upsert_envelopes(t, _env(spark, [{"action": "created", "comment": comment}]),
                     GITHUB_ISSUE_COMMENT_V1)
    row = t.read().collect()[0]
    assert row.github_id == 42 and row.issue_id == 777 and row.user_id == 9


def test_transistor_description_split():
    # api_format 1: separate fields pass through
    assert split_description("s", "d") == (1, "s", "d")
    # api_format 2: first line of first div is the summary, leading brs
    # dropped from the remainder
    fmt, summ, desc = split_description(
        None, "<div>First line<br><br>Rest of it<br>more</div>")
    assert fmt == 2
    assert summ == "First line"
    assert desc == "<div>Rest of it<br>more</div>"
    # no block element → whole html becomes the summary
    fmt, summ, desc = split_description(None, "plain text")
    assert fmt == 2 and summ == "plain text" and desc is None


def test_transistor_show_jsonapi_digs(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "transistor_show_v1")
    show = {"id": "sh1", "type": "show",
            "attributes": {"author": "A", "title": "T",
                           "created_at": "2021-01-01T00:00:00Z",
                           "updated_at": "2021-01-02T00:00:00Z",
                           "website": "https://x"}}
    upsert_envelopes(t, _env(spark, [show]), TRANSISTOR_SHOW_V1)
    row = t.read().collect()[0]
    assert row.transistor_id == "sh1" and row.author == "A"
    assert row.updated_at == dt.datetime(2021, 1, 2)


def test_postmark_outbound_md5_key_and_immutability(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table(
        "org", "postmark_outbound_message_event_v1")
    ev = {"MessageID": "m1", "RecordType": "Delivery",
          "DeliveredAt": "2021-01-01T00:00:00Z", "Recipient": "a@b.c"}
    upsert_envelopes(t, _env(spark, [ev]), POSTMARK_OUTBOUND_MESSAGE_EVENT_V1)
    row = t.read().collect()[0]
    assert row.event_id is not None and len(row.event_id) == 32
    # timestamp looked up from DeliveredAt (no ReceivedAt)
    assert row.timestamp == dt.datetime(2021, 1, 1)
    # immutable: identical event does not update
    res = upsert_envelopes(t, _env(spark, [dict(ev, Tag="x")]),
                           POSTMARK_OUTBOUND_MESSAGE_EVENT_V1)
    assert res.updated == 0


def test_front_message_unwraps_payload_target(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "front_message_v1")
    body = {"payload": {"conversation": {"id": "cnv_1"},
                        "target": {"data": {"id": "msg_1", "type": "email",
                                            "created_at": 1609459200.12}}}}
    upsert_envelopes(t, _env(spark, [body]), FRONT_MESSAGE_V1)
    row = t.read().collect()[0]
    assert row.front_id == "msg_1"
    assert row.front_conversation_id == "cnv_1"  # from the event wrapper
    assert row.created_at.year == 2021


def test_front_signalwire_bridge_half_filled_guard(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table(
        "org", "front_signalwire_message_channel_app_v1")
    half = {"external_id": "x1", "signalwire_sid": "sw1", "direction": "inbound",
            "body": "hi", "sender": "+1", "recipient": "+2"}
    upsert_envelopes(t, _env(spark, [half]), FRONT_SIGNALWIRE_MESSAGE_CHANNEL_APP_V1)
    # second side arrives: update allowed while a side is missing;
    # skip_nil keeps the already-present signalwire_sid
    other = {"external_id": "x1", "front_message_id": "fm1", "direction": "inbound",
             "body": "hi", "sender": "+1", "recipient": "+2"}
    upsert_envelopes(t, _env(spark, [other]), FRONT_SIGNALWIRE_MESSAGE_CHANNEL_APP_V1)
    row = t.read().collect()[0]
    assert row.signalwire_sid == "sw1" and row.front_message_id == "fm1"
    # both sides present → further updates blocked
    res = upsert_envelopes(t, _env(spark, [dict(half, body="new")]),
                           FRONT_SIGNALWIRE_MESSAGE_CHANNEL_APP_V1)
    assert res.updated == 0


def test_intercom_conversation_event_shapes(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "intercom_conversation_v1")
    notif = {"type": "notification_event", "topic": "conversation.updated",
             "data": {"item": {"id": "c1", "title": "T", "state": "open",
                               "created_at": 1609459200,
                               "updated_at": 1609459300}}}
    upsert_envelopes(t, _env(spark, [notif]), INTERCOM_CONVERSATION_V1)
    row = t.read().collect()[0]
    assert row.intercom_id == "c1" and row.state == "open"
    assert row.created_at == dt.datetime(2021, 1, 1, 0, 0, 0)

    # contact.attached events are skipped entirely
    attach = {"type": "notification_event", "topic": "conversation.contact.attached",
              "data": {"item": {"id": "ignored"}}}
    res = upsert_envelopes(t, _env(spark, [attach]), INTERCOM_CONVERSATION_V1)
    assert res.inserted == 0 and res.updated == 0

    # deleted events key on conversation_id and stamp deleted_at
    deleted = {"type": "notification_event", "topic": "conversation.deleted",
               "data": {"item": {"conversation_id": "c1"}}}
    upsert_envelopes(t, _env(spark, [deleted]), INTERCOM_CONVERSATION_V1)
    row = t.read().collect()[0]
    assert row.deleted_at is not None


def test_jotform_millis_timestamps(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "jotform_webhook_v1")
    sub = {"formID": "f1", "submissionID": "s1",
           "rawRequest": {"event_id": "e1", "submitDate": "1609459200500",
                          "buildDate": "1609459100000",
                          "q3_name": "a"},
           "questions": {"stale": "x"}}
    upsert_envelopes(t, _env(spark, [sub]), JOTFORM_WEBHOOK_V1)
    row = t.read().collect()[0]
    # 1609459200500 ms → 1609459200 s (integer division)
    assert row.submit_date == dt.datetime(2021, 1, 1, 0, 0, 0)
    # questions is ALWAYS rebuilt from rawRequest (jotform_webhook_v1.rb:
    # 62-73) — a stale pre-decoded `questions` key must not survive
    assert json.loads(row.questions) == {"name": "a"}


def test_jotform_validated_field_defaults_empty(spark, tmp_warehouse):
    """jotform_webhook_v1.rb:60 — validatedNewRequiredFieldIDs is
    Oj.load(fetch(key, "{}")): absent → {}, string → parsed object."""
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "jotform_webhook_v1")
    sub = {"formID": "f1", "submissionID": "s1",
           "rawRequest": {"event_id": "e1", "submitDate": "1609459200500",
                          "buildDate": "1609459100000"}}
    upsert_envelopes(t, _env(spark, [sub]), JOTFORM_WEBHOOK_V1)
    data = json.loads(t.read().collect()[0].data)
    assert data["validatedNewRequiredFieldIDs"] == {}


def test_plivo_to_i_coercion_and_duplicate_fields(spark, tmp_warehouse):
    """plivo_sms_inbound_v1.rb:52-61 — the INTEGER_KEYS coerce with
    Ruby to_i semantics unconditionally (decimal "0.00300" → 0,
    "12abc" → 12, "+7" → 7, "x" → 0), and a repeated form field
    last-wins like URI.decode_www_form(...).to_h instead of tripping
    Spark's DUPLICATED_MAP_KEY."""
    import datetime as _dt

    from webhookdb_spark.replicators.misc import PLIVO_SMS_INBOUND_V1

    body = ("MessageUUID=u1&From=15551234567&To=15557654321"
            "&TotalRate=0.00300&TotalAmount=12abc&Units=%2B7"
            "&Status=queued&Status=delivered")
    env = spark.createDataFrame(
        [(body, _dt.datetime(2026, 1, 1))],
        "body string, received_at timestamp",
    )
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "plivo_sms_inbound_v1")
    res = upsert_envelopes(t, env, PLIVO_SMS_INBOUND_V1)
    assert res.inserted == 1
    data = json.loads(t.read().collect()[0].data)
    assert data["TotalRate"] == 0       # "0.00300".to_i
    assert data["TotalAmount"] == 12    # "12abc".to_i
    assert data["Units"] == 7           # "+7".to_i (sign dropped in JSON)
    assert data["Status"] == "delivered"  # duplicate field last-wins


def test_plivo_to_i_nonnumeric_zero(spark, tmp_warehouse):
    import datetime as _dt

    from webhookdb_spark.replicators.misc import PLIVO_SMS_INBOUND_V1

    body = ("MessageUUID=u2&From=1&To=2&Units=n%2Fa&TotalRate=-3xyz"
            "&TotalAmount=007")
    env = spark.createDataFrame(
        [(body, _dt.datetime(2026, 1, 1))],
        "body string, received_at timestamp",
    )
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "plivo_sms_inbound_v1")
    upsert_envelopes(t, env, PLIVO_SMS_INBOUND_V1)
    data = json.loads(t.read().collect()[0].data)
    assert data["Units"] == 0           # "n/a".to_i
    assert data["TotalRate"] == -3      # "-3xyz".to_i
    assert data["TotalAmount"] == 7     # "007".to_i — no leading-zero JSON


def test_plivo_to_i_zero_prefixes(spark, tmp_warehouse):
    """The all-zeros / signed-zero / zero-prefixed-garbage class must
    coerce to exactly 0 (never '-0' or '000', which is invalid JSON)."""
    import datetime as _dt

    from webhookdb_spark.replicators.misc import PLIVO_SMS_INBOUND_V1

    body = ("MessageUUID=u3&From=1&To=2"
            "&Units=0&TotalRate=-0&TotalAmount=%2B000x")
    env = spark.createDataFrame(
        [(body, _dt.datetime(2026, 1, 1))],
        "body string, received_at timestamp",
    )
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "plivo_sms_inbound_v1")
    upsert_envelopes(t, env, PLIVO_SMS_INBOUND_V1)
    data = json.loads(t.read().collect()[0].data)
    assert data["Units"] == 0
    assert data["TotalRate"] == 0       # "-0".to_i — stored as 0, not -0
    assert data["TotalAmount"] == 0     # "+000x".to_i


def test_url_recorder_sequence_key(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "url_recorder_v1")
    reqs = [{"request_method": "GET", "path": "/a", "full_url": "http://x/a",
             "user_agent": "ua", "ip": "1.2.3.4"},
            {"request_method": "POST", "path": "/b", "full_url": "http://x/b",
             "user_agent": "ua", "ip": "1.2.3.4"}]
    upsert_envelopes(t, _env(spark, reqs), URL_RECORDER_V1)
    rows = t.read().collect()
    assert len(rows) == 2
    ids = {r.unique_id for r in rows}
    assert len(ids) == 2 and all(i is not None for i in ids)
