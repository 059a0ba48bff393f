"""Postmark inbound-message / outbound-message-event replicators
(reference: lib/webhookdb/replicator/postmark_inbound_message_v1.rb,
postmark_outbound_message_event_v1.rb).

Both are immutable event streams: conditional update is constant false
(rows are never rewritten once inserted). Outbound events carry no id,
so the key is ``md5(MessageID || RecordType || <first present
timestamp>)`` where the timestamp is looked up in ReceivedAt →
DeliveredAt → BouncedAt → ChangedAt order (BUILD_EVENT_MD5 /
LOOKUP_TIMESTAMP, postmark_outbound_message_event_v1.rb:20-38).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from webhookdb_spark.functions.converters import CONV_PARSE_TIME
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType

T, TS = ColumnType.TEXT, ColumnType.TIMESTAMP

# postmark_inbound_message_v1.rb:20-33
POSTMARK_INBOUND_MESSAGE_V1 = register(
    ReplicatorSpec(
        name="postmark_inbound_message_v1",
        table="postmark_inbound_message_v1",
        # webhook-only; custom message (postmark_inbound_message_v1.rb:88-93)
        supports_backfill=False,
        backfill_not_supported=(
            "We don't yet support backfilling Postmark Inbound Messages.\n"
            "File an issue at https://github.com/webhookdb/webhookdb or "
            "email hello@webhookdb.com to let us know if this is something "
            "you want!\n\nRun `webhookdb integration reset "
            "postmark_inbound_message_v1` to go through webhook setup."
        ),
        remote_key=Col("message_id", T, data_key="MessageID"),
        denorm_cols=(
            Col("from_email", T, index=True, data_key=["FromFull", "Email"],
                optional=True),
            Col("to_email", T, index=True, data_key=["ToFull", 0, "Email"],
                optional=True),
            Col("subject", T, index=True, data_key="Subject", optional=True),
            Col("timestamp", TS, index=True, data_key="Date",
                converter=CONV_PARSE_TIME),
            Col("tag", T, index=True, data_key="Tag", optional=True),
        ),
        timestamp_col="timestamp",
        update_where=lambda s, t: F.lit(False),
    )
)

_TS_KEYS = ("ReceivedAt", "DeliveredAt", "BouncedAt", "ChangedAt")


def _lookup_timestamp(body: Column) -> Column:
    # LOOKUP_TIMESTAMP: first present timestamp key in declared order
    return F.coalesce(*[F.get_json_object(body, f"$.{k}") for k in _TS_KEYS])


def _event_md5(body: Column) -> Column:
    # BUILD_EVENT_MD5: md5 over MessageID + RecordType + that timestamp;
    # NULL parts → NULL key → row skipped
    return F.md5(
        F.concat(
            F.get_json_object(body, "$.MessageID"),
            F.get_json_object(body, "$.RecordType"),
            _lookup_timestamp(body),
        )
    )


# postmark_outbound_message_event_v1.rb:40-61
POSTMARK_OUTBOUND_MESSAGE_EVENT_V1 = register(
    ReplicatorSpec(
        name="postmark_outbound_message_event_v1",
        table="postmark_outbound_message_event_v1",
        # webhook-only; custom message
        # (postmark_outbound_message_event_v1.rb:100-106)
        supports_backfill=False,
        backfill_not_supported=(
            "We don't yet support backfilling Postmark Outbound Message "
            "Events.\n\nFile an issue at "
            "https://github.com/webhookdb/webhookdb or email "
            "hello@webhookdb.com to let us know if this is something you "
            "want!\n\nRun `webhookdb integration reset "
            "postmark_outbound_message_event_v1` to go through webhook "
            "setup."
        ),
        remote_key=Col("event_id", ColumnType.UUID, optional=True,
                       defaulter=_event_md5),
        denorm_cols=(
            Col("message_id", T, index=True, data_key="MessageID"),
            Col("timestamp", TS, index=True, optional=True,
                defaulter=_lookup_timestamp),
            Col("record_type", T, index=True, optional=True, data_key="RecordType"),
            Col("tag", T, index=True, optional=True, data_key="Tag"),
            Col("recipient", T, index=True, optional=True, data_key="Recipient"),
            Col("changed_at", TS, index=True, optional=True, data_key="ChangedAt",
                converter=CONV_PARSE_TIME),
            Col("delivered_at", TS, index=True, optional=True,
                data_key="DeliveredAt", converter=CONV_PARSE_TIME),
            Col("received_at", TS, index=True, optional=True,
                data_key="ReceivedAt", converter=CONV_PARSE_TIME),
            Col("bounced_at", TS, index=True, optional=True, data_key="BouncedAt",
                converter=CONV_PARSE_TIME),
        ),
        timestamp_col="timestamp",
        update_where=lambda s, t: F.lit(False),
    )
)
