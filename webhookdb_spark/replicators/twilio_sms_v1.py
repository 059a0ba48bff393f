"""Twilio SMS replicator (reference:
lib/webhookdb/replicator/twilio_sms_v1.rb:40-118).

Backfill-only (polled every minute, jobs/scheduled_backfills.rb twilio
entry); remote key ``sid``; conditional on ``date_updated``. The
reference pages the Messages API DESC by send date and stops paging
when a page's messages are older than the incremental cursor
(twilio_sms_v1.rb:81-106) — that early-stop lives in the Backfiller's
pagination loop here, not the spec.
"""

from __future__ import annotations

from webhookdb_spark.functions.converters import CONV_PARSE_TIME
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType

TWILIO_SMS_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="twilio_sms_v1",
        table="twilio_sms_v1",
        remote_key=Col("twilio_id", ColumnType.TEXT, data_key="sid"),
        denorm_cols=(
            Col("date_created", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME, index=True),
            Col("date_sent", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME, index=True),
            Col("date_updated", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME, index=True),
            Col("direction", ColumnType.TEXT),
            Col("from", ColumnType.TEXT, data_key="from", index=True),
            Col("status", ColumnType.TEXT),
            Col("to", ColumnType.TEXT, index=True),
        ),
        timestamp_col="date_updated",
        update_where=lambda s, t: t("date_updated") < s("date_updated"),
    )
)
