"""GitHub pull request replicator
(reference: lib/webhookdb/replicator/github_pull_v1.rb:38-83).

Same envelope/mixin behavior as github_issue_v1; adds merged_at /
merged_by_id.
"""

from __future__ import annotations

from webhookdb_spark.functions.converters import CONV_PARSE_TIME, converter_array_pluck
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType

GITHUB_PULL_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="github_pull_v1",
        table="github_pull_v1",
        remote_key=Col("github_id", ColumnType.BIGINT, data_key="id"),
        denorm_cols=(
            Col("number", ColumnType.INTEGER, index=True),
            Col("created_at", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME),
            Col("updated_at", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME, index=True),
            Col("closed_at", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME, optional=True),
            Col("merged_at", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME, optional=True),
            Col("state", ColumnType.TEXT, index=True),
            Col("user_id", ColumnType.BIGINT, data_key=["user", "id"], optional=True),
            Col(
                "merged_by_id",
                ColumnType.BIGINT,
                data_key=["merged_by", "id"],
                optional=True,
            ),
            Col(
                "assignee_ids",
                ColumnType.BIGINT_ARRAY,
                data_key="assignees",
                optional=True,
                converter=converter_array_pluck("id", dbtype="bigint"),
            ),
            Col(
                "milestone_number",
                ColumnType.INTEGER,
                data_key=["milestone", "number"],
                optional=True,
            ),
            Col(
                "label_ids",
                ColumnType.BIGINT_ARRAY,
                data_key="labels",
                optional=True,
                converter=converter_array_pluck("id", dbtype="bigint"),
            ),
            Col("node_id", ColumnType.TEXT),
        ),
        timestamp_col="updated_at",
        update_where=lambda s, t: t("updated_at") < s("updated_at"),
    )
)
