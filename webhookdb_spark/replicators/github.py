"""GitHub issue-comment / release / repository-event replicators
(reference: lib/webhookdb/replicator/github_repo_v1_mixin.rb,
github_issue_comment_v1.rb, github_release_v1.rb,
github_repository_event_v1.rb).

Mixin shape (github_repo_v1_mixin.rb:44-57): webhook deliveries wrap
the resource under a type key ("comment", "release", …) with the
envelope as the event; backfill items are bare resources. Conditional
update is ``<ts> < excluded.<ts>`` on the per-replicator timestamp
column; release/repository-event have no API update time and use a
``row_updated_at`` :now defaulter instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from webhookdb_spark.functions.converters import (
    CONV_PARSE_TIME,
    converter_from_regex,
)
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType

T, BI, TS = ColumnType.TEXT, ColumnType.BIGINT, ColumnType.TIMESTAMP


def github_resource_and_event(webhook_key: str):
    """github_repo_v1_mixin.rb:44-52: unwrap body[webhook_key] when a
    webhook delivery wraps the resource; bare bodies pass through."""

    def fn(body: Column) -> tuple[Column, Column | None]:
        wrapped = F.get_json_object(body, f"$.{webhook_key}")
        return F.coalesce(wrapped, body), F.when(wrapped.isNotNull(), body)

    return fn


# github_issue_comment_v1.rb:11-34
GITHUB_ISSUE_COMMENT_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="github_issue_comment_v1",
        table="github_issue_comment_v1",
        remote_key=Col("github_id", BI, data_key="id"),
        denorm_cols=(
            # issue id parsed off the issue_url tail
            Col("issue_id", BI, index=True, data_key="issue_url",
                converter=converter_from_regex(r"/issues/(\d+)$", dbtype="bigint")),
            Col("created_at", TS, index=True, converter=CONV_PARSE_TIME),
            Col("updated_at", TS, index=True, converter=CONV_PARSE_TIME),
            Col("user_id", BI, index=True, data_key=["user", "id"], optional=True),
            Col("node_id", T, index=True, optional=True),
        ),
        timestamp_col="updated_at",
        update_where=lambda s, t: t("updated_at") < s("updated_at"),
        resource_and_event=github_resource_and_event("comment"),
    )
)

# github_release_v1.rb:11-28
GITHUB_RELEASE_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="github_release_v1",
        table="github_release_v1",
        remote_key=Col("github_id", BI, data_key="id"),
        denorm_cols=(
            Col("created_at", TS, index=True, converter=CONV_PARSE_TIME),
            Col("published_at", TS, index=True, converter=CONV_PARSE_TIME,
                optional=True),
            Col("row_updated_at", TS, defaulter="now", optional=True, index=True),
            Col("node_id", T, index=True, optional=True),
            Col("tag_name", T, index=True, optional=True),
            Col("author_id", BI, index=True, data_key=["author", "id"],
                optional=True),
        ),
        timestamp_col="row_updated_at",
        update_where=lambda s, t: t("row_updated_at") < s("row_updated_at"),
        resource_and_event=github_resource_and_event("release"),
    )
)

# github_repository_event_v1.rb:11-24 — backfill-only events API
GITHUB_REPOSITORY_EVENT_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="github_repository_event_v1",
        table="github_repository_event_v1",
        remote_key=Col("github_id", T, data_key="id"),
        denorm_cols=(
            Col("type", T, index=True, optional=True),
            Col("created_at", TS, index=True, converter=CONV_PARSE_TIME),
            Col("row_updated_at", TS, defaulter="now", optional=True, index=True),
            Col("actor_id", BI, index=True, data_key=["actor", "id"], optional=True),
        ),
        timestamp_col="row_updated_at",
        update_where=lambda s, t: t("row_updated_at") < s("row_updated_at"),
    )
)
