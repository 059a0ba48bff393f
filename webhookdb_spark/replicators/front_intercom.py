"""Front conversation/message (+SignalWire channel bridge), Intercom
conversation, and SignalWire media replicators.

References: lib/webhookdb/replicator/front_conversation_v1.rb,
front_message_v1.rb, front_signalwire_message_channel_app_v1.rb,
intercom_conversation_v1.rb (+intercom_v1_mixin.rb),
signalwire_media_v1.rb. front_marketplace_root_v1.rb is an auth-only
stub with no table (its ``_upsert_webhook`` raises) and has no spec
here.

Front webhooks wrap the resource inside ``payload`` (the event):
conversations at ``payload.conversation``, messages at
``payload.target.data``; the conditional update is the data-diff guard.

Intercom notification envelopes (``type == "notification_event"``)
carry the resource at ``data.item``. Deleted-conversation events ship
only ``conversation_id`` — the key falls back to it and
``updated_at``/``deleted_at`` are stamped now; contact attach/detach
events are skipped entirely (intercom_conversation_v1.rb:33-47).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from webhookdb_spark.functions.converters import (
    CONV_PARSE_TIME,
    CONV_QUESTIONABLE_TS,
    CONV_UNIX_TS,
)
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType

T, B, TS = ColumnType.TEXT, ColumnType.BOOLEAN, ColumnType.TIMESTAMP

_DATA_DIFF = lambda s, t: t("data") != s("data")  # noqa: E731


def _front_unwrap(path: str):
    def fn(body: Column) -> tuple[Column, Column | None]:
        return F.get_json_object(body, path), F.get_json_object(body, "$.payload")

    return fn


# front_conversation_v1.rb:20-36
FRONT_CONVERSATION_V1 = register(
    ReplicatorSpec(
        name="front_conversation_v1",
        supports_backfill=False,  # webhook-only (no supports_backfill in its descriptor)
        table="front_conversation_v1",
        remote_key=Col("front_id", T, data_key="id"),
        denorm_cols=(
            Col("subject", T, optional=True),
            Col("status", T, optional=True),
            Col("created_at", TS, converter=CONV_UNIX_TS),
        ),
        timestamp_col="created_at",
        update_where=_DATA_DIFF,
        resource_and_event=_front_unwrap("$.payload.conversation"),
    )
)

# front_message_v1.rb:20-36
FRONT_MESSAGE_V1 = register(
    ReplicatorSpec(
        name="front_message_v1",
        supports_backfill=False,  # webhook-only (no supports_backfill in its descriptor)
        table="front_message_v1",
        remote_key=Col("front_id", T, data_key="id"),
        denorm_cols=(
            Col("type", T, optional=True),
            Col("front_conversation_id", T, event_key=["conversation", "id"],
                optional=True),
            Col("created_at", TS, converter=CONV_UNIX_TS),
        ),
        timestamp_col="created_at",
        update_where=_DATA_DIFF,
        resource_and_event=_front_unwrap("$.payload.target.data"),
    )
)

# front_signalwire_message_channel_app_v1.rb:78-102 — the two-way
# SMS<->Front bridge table. Rows begin half-filled (only one side's id)
# and may be updated ONLY while a side is still missing.
FRONT_SIGNALWIRE_MESSAGE_CHANNEL_APP_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="front_signalwire_message_channel_app_v1",
        table="front_signalwire_message_channel_app_v1",
        remote_key=Col("external_id", T),
        denorm_cols=(
            Col("signalwire_sid", T, optional=True, index=True, skip_nil=True),
            Col("front_message_id", T, optional=True, index=True, skip_nil=True),
            Col("external_conversation_id", T, optional=True, index=True),
            Col("row_updated_at", TS, defaulter="now", optional=True, index=True),
            Col("direction", T, optional=True),
            Col("body", T, optional=True),
            Col("sender", T, optional=True),
            Col("recipient", T, optional=True),
        ),
        timestamp_col="row_updated_at",
        update_where=lambda s, t: t("signalwire_sid").isNull()
        | t("front_message_id").isNull(),
    )
)


def _intercom_conversation_unwrap(body: Column) -> tuple[Column, Column | None]:
    is_notif = F.get_json_object(body, "$.type") == F.lit("notification_event")
    topic = F.get_json_object(body, "$.topic")
    skip = is_notif & topic.isin("conversation.contact.attached",
                                 "conversation.contact.detached")
    resource = F.when(
        is_notif & ~skip, F.get_json_object(body, "$.data.item")
    ).otherwise(F.when(~is_notif, body))
    return resource, F.when(is_notif, body)


def _j(body: Column, path: str) -> Column:
    return F.get_json_object(body, path)


# intercom_conversation_v1.rb:20-47
INTERCOM_CONVERSATION_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="intercom_conversation_v1",
        table="intercom_conversation_v1",
        # deleted events carry conversation_id only
        remote_key=Col("intercom_id", T, data_key="id", optional=True,
                       defaulter=lambda b: _j(b, "$.conversation_id")),
        denorm_cols=(
            Col("title", T, optional=True),
            Col("state", T, optional=True),
            Col("open", B, optional=True),
            Col("read", B, optional=True),
            Col("created_at", TS, converter=CONV_QUESTIONABLE_TS, optional=True,
                index=True),
            Col("updated_at", TS, converter=CONV_QUESTIONABLE_TS, optional=True,
                index=True,
                defaulter=lambda b: F.when(
                    _j(b, "$.conversation_id").isNotNull(), F.current_timestamp()
                )),
            Col("deleted_at", TS, optional=True, index=True,
                defaulter=lambda b: F.when(
                    _j(b, "$.conversation_id").isNotNull(), F.current_timestamp()
                )),
        ),
        timestamp_col="updated_at",
        update_where=lambda s, t: t("updated_at") < s("updated_at"),
        resource_and_event=_intercom_conversation_unwrap,
    )
)

# signalwire_media_v1.rb:20-48 — MMS media metadata rows.
SIGNALWIRE_MEDIA_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="signalwire_media_v1",
        table="signalwire_media_v1",
        remote_key=Col("signalwire_id", T, data_key="sid"),
        denorm_cols=(
            Col("date_created", TS, index=True, converter=CONV_PARSE_TIME),
            Col("date_updated", TS, index=True, converter=CONV_PARSE_TIME),
            Col("account_sid", T, optional=True),
            Col("parent_sid", T, index=True, optional=True),
            Col("content_type", T, optional=True),
            Col("uri", T, optional=True),
        ),
        timestamp_col="date_updated",
        update_where=lambda s, t: t("date_updated") < s("date_updated"),
    )
)
