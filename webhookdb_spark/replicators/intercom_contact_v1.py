"""Intercom contact replicator (reference:
lib/webhookdb/replicator/intercom_contact_v1.rb:22-83,
intercom_v1_mixin.rb:5-18).

Distinctive semantics:

- timestamps arrive as unix seconds OR ISO strings depending on API
  version (``QUESTIONABLE_TIMESTAMP``, SQL-unbackfillable);
- webhook topics rewrite the resource: ``contact.deleted`` /
  ``contact.archived`` stamp deleted_at/archived_at (and updated_at)
  at processing time; ``contact.subscribed``/``unsubscribed`` unwrap
  the nested ``contact``;
- delete/archive payloads carry only a skeleton, so every denormalized
  column is skip_nil (a missing field must not clobber the stored
  value — the reference achieves the same with a partial
  ``_upsert_update_expr``, intercom_contact_v1.rb:65-82) and ``data``
  merges jsonb-style so the tombstone marker joins the stored payload
  instead of replacing it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from webhookdb_spark.functions.converters import CONV_QUESTIONABLE_TS, json_merge_udf
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType


def _resource_and_event(body: Column) -> tuple[Column, Column | None]:
    topic = F.get_json_object(body, "$.topic")
    is_event = topic.isNotNull()
    raw = F.when(is_event, F.get_json_object(body, "$.data.item")).otherwise(body)
    now_s = F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssXXX")
    # stamp updated_at + the tombstone column into the resource JSON via
    # the faithful shallow merge (nested values preserved verbatim)
    def stamped(field: str) -> Column:
        stamp = F.to_json(F.struct(now_s.alias("updated_at"), now_s.alias(field)))
        return json_merge_udf()(raw, stamp)

    resource = (
        F.when(topic == "contact.deleted", stamped("deleted_at"))
        .when(topic == "contact.archived", stamped("archived_at"))
        .when(
            topic.isin("contact.subscribed", "contact.unsubscribed"),
            F.get_json_object(raw, "$.contact"),
        )
        .otherwise(raw)
    )
    return resource, F.when(is_event, body)


INTERCOM_CONTACT_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="intercom_contact_v1",
        table="intercom_contact_v1",
        remote_key=Col("intercom_id", ColumnType.TEXT, data_key="id"),
        denorm_cols=(
            Col("external_id", ColumnType.TEXT, optional=True, skip_nil=True, index=True),
            Col("email", ColumnType.TEXT, optional=True, skip_nil=True, index=True),
            Col("created_at", ColumnType.TIMESTAMP, converter=CONV_QUESTIONABLE_TS,
                optional=True, skip_nil=True, index=True),
            Col("updated_at", ColumnType.TIMESTAMP, converter=CONV_QUESTIONABLE_TS,
                optional=True, index=True),
            Col("deleted_at", ColumnType.TIMESTAMP, converter=CONV_QUESTIONABLE_TS,
                optional=True, skip_nil=True),
            Col("archived_at", ColumnType.TIMESTAMP, converter=CONV_QUESTIONABLE_TS,
                optional=True, skip_nil=True),
        ),
        timestamp_col="updated_at",
        update_where=lambda s, t: t("updated_at") < s("updated_at"),
        resource_and_event=_resource_and_event,
        merge_data_on_update=True,
    )
)
