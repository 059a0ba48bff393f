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
        supports_backfill=True,
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

def _plivo_unwrap(body: Column) -> tuple[Column, Column | None]:
    """plivo_sms_inbound_v1.rb:45-50: Plivo POSTs form-urlencoded
    bodies — ``URI.decode_www_form(body).to_h`` — so the resource is
    the decoded key/value map. Fully native: split on '&', split each
    pair on its FIRST '=' (decode_www_form keeps later '='s in the
    value; a pair with no '=' maps to ""), url_decode both sides, and
    keep the LAST occurrence of a repeated field (.to_h last-wins) —
    built with filter+map_from_entries rather than str_to_map so a
    legal duplicate form field never trips Spark's default
    mapKeyDedupPolicy=EXCEPTION. Already-JSON bodies (pre-decoding
    intakes, existing callers) pass through."""
    kvs = F.filter(F.split(body, F.lit("&")), lambda s: s != F.lit(""))
    eq = lambda s: F.instr(s, "=")  # noqa: E731
    key = lambda s: F.when(  # noqa: E731
        eq(s) > 0, F.substring(s, F.lit(1), eq(s) - 1)
    ).otherwise(s)
    val = lambda s: F.when(  # noqa: E731
        eq(s) > 0, F.substring(s, eq(s) + 1, F.length(s))
    ).otherwise(F.lit(""))
    # last-wins: drop any pair whose key reappears LATER in the array
    deduped = F.filter(
        kvs,
        lambda s, i: ~F.exists(
            F.slice(kvs, i + F.lit(2), F.size(kvs)),
            lambda t: key(t) == key(s),
        ),
    )
    decoded = F.map_from_entries(
        F.transform(
            deduped,
            lambda s: F.struct(
                F.url_decode(key(s)).alias("key"),
                F.url_decode(val(s)).alias("value"),
            ),
        )
    )
    is_json = F.startswith(F.ltrim(body), F.lit("{"))
    return F.when(is_json, body).otherwise(F.to_json(decoded)), None


def _plivo_data_hook(df):
    # _resource_to_data (plivo_sms_inbound_v1.rb:52-61): the INTEGER_KEYS
    # store with Ruby `to_i` semantics applied UNCONDITIONALLY when the
    # key is present: optional leading whitespace + adjacent sign +
    # leading digits parse (the rest of the value drops), anything else
    # — including decimal strings like "0.00300" — coerces to 0. Three
    # chained regexp passes over the flat map's JSON (all JVM-side):
    # plus-signed (sign dropped, "+12" -> 12), minus/plain prefix, then
    # any remaining string value for those keys -> 0. (`to_i`'s
    # underscore-digit-separator quirk "1_0" -> 10 is not reproduced.)
    keys = "(TotalAmount|TotalRate|Units)"
    ws = r"(?: |\\[tnrfv])*"          # literal or JSON-escaped whitespace
    rest = r'(?:[^"\\]|\\.)*'         # remainder of the JSON string value
    d = F.col("data")
    # zero prefixes first ("0", "+000", "-0", "0x"): to_i → 0, and the
    # later passes must never emit JSON with a leading zero or bare sign
    d = F.regexp_replace(
        d, F.lit(rf'"{keys}":\s*"{ws}[-+]?0+(?!\d){rest}"'), F.lit('"$1":0'))
    d = F.regexp_replace(
        d, F.lit(rf'"{keys}":\s*"{ws}\+0*(\d+){rest}"'), F.lit('"$1":$2'))
    d = F.regexp_replace(
        d, F.lit(rf'"{keys}":\s*"{ws}(-?)0*(\d+){rest}"'), F.lit('"$1":$2$3'))
    d = F.regexp_replace(
        d, F.lit(rf'"{keys}":\s*"{rest}"'), F.lit('"$1":0'))
    return df.withColumn("data", d)


# plivo_sms_inbound_v1.rb:20-36 — immutable inbound SMS events.
PLIVO_SMS_INBOUND_V1 = register(
    ReplicatorSpec(
        name="plivo_sms_inbound_v1",
        supports_backfill=False,  # webhook-only (no supports_backfill in its descriptor)
        table="plivo_sms_inbound_v1",
        remote_key=Col("plivo_message_uuid", T, data_key="MessageUUID"),
        denorm_cols=(
            Col("row_inserted_at", TS, defaulter="now", optional=True, index=True),
            Col("from_number", T, data_key="From", index=True),
            Col("to_number", T, data_key="To", index=True),
        ),
        timestamp_col="row_inserted_at",
        update_where=lambda s, t: F.lit(False),
        resource_and_event=_plivo_unwrap,
        prepare_hook=_plivo_data_hook,
    )
)


def _epoch_millis(c: Column) -> Column:
    # jotform tsparse (jotform_webhook_v1.rb): Time.at(s.to_i / 1000) —
    # integer division truncates to whole seconds
    return F.timestamp_seconds(F.floor(c.try_cast("long") / F.lit(1000)))


_JOTFORM_TS = Converter(name="jotform_millis", spark=_epoch_millis, sql=None)


def _jotform_prepare_udf():
    """Arrow-batched kernel mirroring the reference jotform pipeline
    (jotform_webhook_v1.rb:44-79): a multipart/form-data POST body
    parses into its form fields (Rack::Multipart.parse_multipart for
    the text-field case Jotform sends), the ``rawRequest`` and
    ``validatedNewRequiredFieldIDs`` fields — JSON encoded as strings
    inside the form — parse into objects so the remote-key/timestamp
    digs work, and the ``questions`` map derives from the ``q<d>_``
    answer keys plus the ``temp_upload`` file-answer indirection.
    Already-JSON bodies (intake layers that pre-decode, existing
    callers) pass through the same preparation.

    A UDF because the work is dynamic-key JSON restructuring (answer
    keys differ per form) that native functions cannot express without
    lossy map<string,string> round-trips; volume is webhook-intake
    scale, Arrow-batched like the jsonb-merge kernel.
    """
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    qkey = _re.compile(r"^q\d+_")

    def parse_multipart(body: str) -> dict:
        boundary = body.split("\r\n", 1)[0]
        fields: dict = {}
        for part in body.split(boundary):
            if "\r\n\r\n" not in part:
                continue
            head, _, value = part.partition("\r\n\r\n")
            m = _re.search(r'name="([^"]*)"', head)
            if m is None:
                continue
            fields[m.group(1)] = value[:-2] if value.endswith("\r\n") else value
        return fields

    def prepare(bodies):
        import json as _json

        out = []
        for body in bodies:
            if body is None:
                out.append(None)
                continue
            try:
                if body.startswith("--") and "form-data" in body[:4096]:
                    d = parse_multipart(body)
                else:
                    d = _json.loads(body)
                if not isinstance(d, dict):
                    out.append(body)
                    continue
                raw = d.get("rawRequest")
                if isinstance(raw, str):
                    raw = _json.loads(raw)
                    d["rawRequest"] = raw
                # jotform_webhook_v1.rb:60 — validatedNewRequiredFieldIDs
                # is ALWAYS set: Oj.load(resource.fetch(key, "{}")), so an
                # absent field defaults to {} and a string field parses.
                vn = d.get("validatedNewRequiredFieldIDs")
                if vn is None:
                    d["validatedNewRequiredFieldIDs"] = {}
                elif isinstance(vn, str):
                    try:
                        d["validatedNewRequiredFieldIDs"] = _json.loads(vn)
                    except ValueError:
                        pass
                if isinstance(raw, dict):
                    # jotform_webhook_v1.rb:62-73 — questions is ALWAYS
                    # rebuilt from rawRequest (a pre-decoded body carrying
                    # a stale `questions` key must not survive).
                    qs = {
                        qkey.sub("", k): v
                        for k, v in raw.items() if qkey.match(k)
                    }
                    tu = raw.get("temp_upload")
                    if isinstance(tu, dict):
                        for k in tu:
                            pure = qkey.sub("", k)
                            if pure in raw:
                                qs[pure] = raw[pure]
                    d["questions"] = qs
                out.append(_json.dumps(d, separators=(",", ":")))
            except (ValueError, TypeError):
                out.append(body)
        return pd.Series(out, dtype="object")

    return pandas_udf(prepare, "string")


def _jotform_unwrap(body: Column) -> tuple[Column, Column | None]:
    return _jotform_prepare_udf()(body), None


def _jotform_data_hook(df):
    # _resource_to_data (jotform_webhook_v1.rb:80-84): the derived
    # questions map lives in its column, not in the stored payload.
    from webhookdb_spark.functions.converters import json_drop_keys_udf

    return df.withColumn("data", json_drop_keys_udf("questions")(F.col("data")))


# jotform_webhook_v1.rb — form submission webhooks: multipart bodies
# parse into form fields, rawRequest into an object, question answers
# into the questions map (see _jotform_prepare_udf).
JOTFORM_WEBHOOK_V1 = register(
    ReplicatorSpec(
        name="jotform_webhook_v1",
        supports_backfill=False,  # webhook-only (no supports_backfill in its descriptor)
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
        resource_and_event=_jotform_unwrap,
        prepare_hook=_jotform_data_hook,
    )
)

# url_recorder_v1.rb — records arbitrary HTTP requests; every column
# comes from the request envelope, which the intake layer materializes
# as a JSON body with these fields. unique_id draws from the
# integration sequence (requires_sequence?).
URL_RECORDER_V1 = register(
    ReplicatorSpec(
        name="url_recorder_v1",
        supports_backfill=False,  # webhook-only (no supports_backfill in its descriptor)
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
        supports_backfill=False,  # webhook-only (no supports_backfill in its descriptor)
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
