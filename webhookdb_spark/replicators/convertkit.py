"""ConvertKit replicator family (reference: lib/webhookdb/replicator/
convertkit_v1_mixin.rb, convertkit_broadcast_v1.rb,
convertkit_subscriber_v1.rb, convertkit_tag_v1.rb).

Shared mixin shape: remote key ``convertkit_id`` (BIGINT ``id``), no
per-resource timestamp to order by — the conditional update is a
DATA-DIFF guard ``data !~ excluded.data`` (e.g.
convertkit_tag_v1.rb:62-64). Our ``data`` column is canonical JSON
(sorted keys, like jsonb), so plain string inequality reproduces the
jsonb semantics.

Broadcast and tag stats (open rate, total_subscriptions, …) are not in
the webhook payload; the reference fetches them per-resource
(``_fetch_enrichment``) and digs columns ``from_enrichment``. The
fetcher is injected per deployment; tests inject fakes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from webhookdb_spark.functions.converters import CONV_PARSE_TIME
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType

T, I, D, B = ColumnType.TEXT, ColumnType.INTEGER, ColumnType.DECIMAL, ColumnType.BOOLEAN
TS = ColumnType.TIMESTAMP

_KEY = Col("convertkit_id", ColumnType.BIGINT, data_key="id")
_DATA_DIFF = lambda s, t: t("data") != s("data")  # noqa: E731


def convertkit_broadcast_v1(
    fetch_stats: Callable[[dict], dict | None] | None = None,
) -> ReplicatorSpec:
    """convertkit_broadcast_v1.rb:24-60; stats enrichment from
    /v3/broadcasts/:id/stats."""
    enrich = (lambda r: fetch_stats(r)) if fetch_stats else (lambda r: None)
    return ReplicatorSpec(
        supports_backfill=True,
        name="convertkit_broadcast_v1",
        table="convertkit_broadcast_v1",
        remote_key=_KEY,
        denorm_cols=(
            Col("click_rate", D, from_enrichment=True, optional=True),
            Col("created_at", TS, converter=CONV_PARSE_TIME, index=True),
            Col("open_rate", D, from_enrichment=True, optional=True),
            Col("progress", D, from_enrichment=True, optional=True),
            Col("recipients", I, from_enrichment=True, optional=True),
            Col("show_total_clicks", B, from_enrichment=True, optional=True),
            Col("status", T, from_enrichment=True, optional=True),
            Col("subject", T, optional=True),
            Col("total_clicks", I, from_enrichment=True, optional=True),
            Col("unsubscribes", I, from_enrichment=True, optional=True),
        ),
        timestamp_col="created_at",
        update_where=_DATA_DIFF,
        enrichment_fetcher=enrich,
    )


def _subscriber_resource_and_event(body: Column) -> tuple[Column, Column | None]:
    # convertkit_subscriber_v1.rb:140-144: webhook wraps the subscriber
    # under "subscriber"; backfill items are bare.
    sub = F.get_json_object(body, "$.subscriber")
    return F.coalesce(sub, body), F.when(sub.isNotNull(), body)


def _canceled_at_defaulter(body: Column) -> Column:
    # CONV_FIND_CANCELED_AT (convertkit_v1_mixin.rb:46-56): subscribers
    # carry no cancelation time; stamp now() while the state is not
    # active, NULL when active.
    state = F.coalesce(
        F.get_json_object(body, "$.subscriber.state"),
        F.get_json_object(body, "$.state"),
    )
    return F.when(state != F.lit("active"), F.current_timestamp())


CONVERTKIT_SUBSCRIBER_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="convertkit_subscriber_v1",
        table="convertkit_subscriber_v1",
        remote_key=_KEY,
        denorm_cols=(
            Col("canceled_at", TS, optional=True, index=True,
                defaulter=_canceled_at_defaulter),
            Col("created_at", TS, data_key="created_at",
                converter=CONV_PARSE_TIME, index=True),
            Col("email_address", T, index=True, optional=True),
            Col("first_name", T, optional=True),
            Col("last_name", T, data_key=["fields", "last_name"], optional=True),
            Col("state", T, optional=True),
        ),
        timestamp_col="created_at",
        update_where=_DATA_DIFF,
        resource_and_event=_subscriber_resource_and_event,
        # convertkit_subscriber_v1.rb:150-158 _upsert_update_expr: an
        # active subscriber clears canceled_at unconditionally; an
        # inactive one keeps the first cancelation time seen.
        custom_update_exprs={
            "canceled_at": lambda s, t: F.when(
                s("state") == F.lit("active"), s("canceled_at")
            ).otherwise(F.coalesce(t("canceled_at"), s("canceled_at"))),
        },
    )
)


def convertkit_tag_v1(
    fetch_subscriptions: Callable[[dict], dict | None] | None = None,
) -> ReplicatorSpec:
    """convertkit_tag_v1.rb:24-57; total_subscriptions enrichment from
    /v3/tags/:id/subscriptions, body kept (store_enrichment_body)."""
    enrich = (lambda r: fetch_subscriptions(r)) if fetch_subscriptions else (lambda r: None)
    return ReplicatorSpec(
        supports_backfill=True,
        name="convertkit_tag_v1",
        table="convertkit_tag_v1",
        remote_key=_KEY,
        denorm_cols=(
            Col("created_at", TS, data_key="created_at",
                converter=CONV_PARSE_TIME, index=True),
            Col("name", T, index=True, optional=True),
            Col("total_subscriptions", I, from_enrichment=True, optional=True),
        ),
        timestamp_col="created_at",
        update_where=_DATA_DIFF,
        enrichment_fetcher=enrich,
        store_enrichment_body=True,
    )


CONVERTKIT_BROADCAST_V1 = register(convertkit_broadcast_v1())
CONVERTKIT_TAG_V1 = register(convertkit_tag_v1())
