"""Email Octopus event replicator (reference:
lib/webhookdb/replicator/email_octopus_event_v1.rb).

Distinct behaviors reproduced:

- **Computed compound remote key** (BUILD_EVENT_MD5, :23-34): events have
  no id, so the key is ``md5(occurred_at || event_type || contact.id ||
  coalesce(campaign_id, 'missing'))``. Expressed as a callable defaulter
  compiling to a native Column (md5 over concat) — NULL inputs propagate,
  so array elements missing ``occurred_at``/``contact.id`` produce a NULL
  key and are skipped, matching the reference's select filter (:57-59)
  and nil ``_resource_and_event`` (:97-100).
- **Array webhook bodies** (:55-80): one POST carries many events;
  ``explode_body_array`` fans them out. Webhook-shaped elements (flat
  ``contact_id``/``contact_email_address``/``type``) are normalized to
  the API resource shape in ``prepare_hook`` — the _prepare_for_insert
  analog — instead of a per-row body rewrite.
- **Immutable rows** (:102-107): occurred_at participates in the key, so
  updates are meaningless — ``update_where`` is constant false.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webhookdb_spark.functions.converters import CONV_PARSE_TIME
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType


def _j(body: Column, path: str) -> Column:
    return F.get_json_object(body, path)


def _field(resource: Column, api_path: str, webhook_path: str) -> Column:
    """API-resource shape first, flat webhook shape as fallback
    (email_octopus_event_v1.rb:60-75's body rewrite as a coalesce)."""
    return F.coalesce(_j(resource, api_path), _j(resource, webhook_path))


def _event_md5(resource: Column) -> Column:
    # BUILD_EVENT_MD5 (:23-34): md5 over concatenated raw strings; NULL
    # in any required part → NULL key → row skipped.
    return F.md5(
        F.concat(
            _j(resource, "$.occurred_at"),
            _field(resource, "$.event_type", "$.type"),
            _field(resource, "$.contact.id", "$.contact_id"),
            F.coalesce(_j(resource, "$.campaign_id"), F.lit("missing")),
        )
    )


def _normalize_shapes(df: DataFrame) -> DataFrame:
    """Fill columns from the flat webhook shape when the API-shape dig
    came back NULL (`data` holds the raw element either way)."""
    r = F.col("data")
    return (
        df.withColumn(
            "email_octopus_contact_id",
            F.coalesce(F.col("email_octopus_contact_id"), _j(r, "$.contact_id")),
        )
        .withColumn(
            "contact_email_address",
            F.coalesce(
                F.col("contact_email_address"), _j(r, "$.contact_email_address")
            ),
        )
        .withColumn("event_type", F.coalesce(F.col("event_type"), _j(r, "$.type")))
    )


EMAIL_OCTOPUS_EVENT_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="email_octopus_event_v1",
        table="email_octopus_event_v1",
        remote_key=Col(
            "unique_id", ColumnType.TEXT, optional=True, defaulter=_event_md5
        ),
        denorm_cols=(
            Col("email_octopus_contact_id", ColumnType.TEXT,
                data_key=["contact", "id"], optional=True),
            Col("contact_email_address", ColumnType.TEXT,
                data_key=["contact", "email_address"], optional=True),
            Col("email_octopus_campaign_id", ColumnType.TEXT,
                data_key="campaign_id", optional=True),
            Col("event_type", ColumnType.TEXT, optional=True),
            Col("occurred_at", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME,
                index=True, optional=True),
        ),
        timestamp_col="occurred_at",
        # occurred_at is part of the key: rows are immutable (:102-107)
        update_where=lambda s, t: F.lit(False),
        explode_body_array=True,
        prepare_hook=_normalize_shapes,
    )
)
