"""Signalwire-message, Plivo, Jotform, URL-recorder, and
WebhookDB-customer replicators (reference files cited per spec).

Grouped here because each is a single small spec with no family mixin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from webhookdb_spark.functions.converters import CONV_PARSE_TIME, Converter
from webhookdb_spark.spec import SEQUENCE_DEFAULTER, Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType

T, BI, TS = ColumnType.TEXT, ColumnType.BIGINT, ColumnType.TIMESTAMP
OBJ = ColumnType.OBJECT

# signalwire_message_v1.rb:24-56 — same LaML shape as twilio_sms but
# with ISO dates and sid key.
SIGNALWIRE_MESSAGE_V1 = register(
    ReplicatorSpec(
        name="signalwire_message_v1",
        table="signalwire_message_v1",
        remote_key=Col("signalwire_id", T, data_key="sid"),
        denorm_cols=(
            Col("date_created", TS, index=True, converter=CONV_PARSE_TIME),
            Col("date_sent", TS, index=True, converter=CONV_PARSE_TIME,
                optional=True),
            Col("date_updated", TS, index=True, converter=CONV_PARSE_TIME),
            Col("direction", T, optional=True),
            Col("from", T, index=True, optional=True),
            Col("status", T, optional=True),
            Col("to", T, index=True, optional=True),
        ),
        timestamp_col="date_updated",
        update_where=lambda s, t: t("date_updated") < s("date_updated"),
    )
)

# plivo_sms_inbound_v1.rb:20-36 — immutable inbound SMS events.
PLIVO_SMS_INBOUND_V1 = register(
    ReplicatorSpec(
        name="plivo_sms_inbound_v1",
        table="plivo_sms_inbound_v1",
        remote_key=Col("plivo_message_uuid", T, data_key="MessageUUID"),
        denorm_cols=(
            Col("row_inserted_at", TS, defaulter="now", optional=True, index=True),
            Col("from_number", T, data_key="From", index=True),
            Col("to_number", T, data_key="To", index=True),
        ),
        timestamp_col="row_inserted_at",
        update_where=lambda s, t: F.lit(False),
    )
)


def _epoch_millis(c: Column) -> Column:
    # jotform tsparse (jotform_webhook_v1.rb): Time.at(s.to_i / 1000) —
    # integer division truncates to whole seconds
    return F.timestamp_seconds(F.floor(c.try_cast("long") / F.lit(1000)))


_JOTFORM_TS = Converter(name="jotform_millis", spark=_epoch_millis, sql=None)

# jotform_webhook_v1.rb — form submission webhooks. The reference also
# parses multipart/form-data request bodies into JSON
# (_resource_and_event); that is the HTTP intake layer's job here —
# envelopes arrive with JSON bodies.
JOTFORM_WEBHOOK_V1 = register(
    ReplicatorSpec(
        name="jotform_webhook_v1",
        table="jotform_webhook_v1",
        remote_key=Col("event_id", T, data_key=["rawRequest", "event_id"]),
        denorm_cols=(
            Col("form_id", T, data_key="formID", index=True),
            Col("submission_id", T, data_key="submissionID", index=True),
            Col("submit_date", TS, data_key=["rawRequest", "submitDate"],
                converter=_JOTFORM_TS, index=True),
            Col("build_date", TS, data_key=["rawRequest", "buildDate"],
                converter=_JOTFORM_TS, index=True),
            Col("inserted_at", TS, optional=True, defaulter="now", index=True),
            Col("questions", OBJ, optional=True),
        ),
        timestamp_col="submit_date",
        update_where=lambda s, t: t("submit_date") < s("submit_date"),
    )
)

# url_recorder_v1.rb — records arbitrary HTTP requests; every column
# comes from the request envelope, which the intake layer materializes
# as a JSON body with these fields. unique_id draws from the
# integration sequence (requires_sequence?).
URL_RECORDER_V1 = register(
    ReplicatorSpec(
        name="url_recorder_v1",
        table="url_recorder_v1",
        remote_key=Col("unique_id", BI, optional=True,
                       defaulter=SEQUENCE_DEFAULTER),
        denorm_cols=(
            Col("inserted_at", TS, index=True, defaulter="now", optional=True),
            Col("request_method", T, optional=True),
            Col("path", T, optional=True),
            Col("full_url", T, optional=True),
            Col("user_agent", T, optional=True),
            Col("ip", T, optional=True),
            Col("content_type", T, optional=True),
            Col("parsed_query", OBJ, optional=True),
            Col("parsed_body", OBJ, optional=True),
            Col("raw_body", T, optional=True),
        ),
        timestamp_col="inserted_at",
        update_where=lambda s, t: t("inserted_at") < s("inserted_at"),
    )
)

# webhookdb_customer_v1.rb — the app's own customer stream.
WEBHOOKDB_CUSTOMER_V1 = register(
    ReplicatorSpec(
        name="webhookdb_customer_v1",
        table="webhookdb_customer_v1",
        remote_key=Col("webhookdb_id", T, data_key="id"),
        denorm_cols=(
            Col("created_at", TS, index=True, converter=CONV_PARSE_TIME),
            Col("email", T, index=True, optional=True),
            # defaulter_from_resource_field(:created_at)
            Col("updated_at", TS, index=True, converter=CONV_PARSE_TIME,
                optional=True,
                defaulter=lambda b: F.get_json_object(b, "$.created_at")),
        ),
        timestamp_col="updated_at",
        update_where=lambda s, t: t("updated_at") < s("updated_at"),
    )
)
