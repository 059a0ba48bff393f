"""GitHub issue replicator (reference: lib/webhookdb/replicator/github_issue_v1.rb:38-83).

Exercises nested data keys and ``converter_array_pluck`` (assignee/label
id arrays, github_issue_v1.rb:56-75).
"""

from __future__ import annotations

from webhookdb_spark.functions.converters import CONV_PARSE_TIME, converter_array_pluck
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType

GITHUB_ISSUE_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="github_issue_v1",
        table="github_issue_v1",
        remote_key=Col("github_id", ColumnType.BIGINT, data_key="id"),
        denorm_cols=(
            Col("node_id", ColumnType.TEXT),
            Col("number", ColumnType.INTEGER, index=True),
            Col("state", ColumnType.TEXT, index=True),
            Col("user_id", ColumnType.BIGINT, data_key=["user", "id"], optional=True),
            Col(
                "closed_by_id",
                ColumnType.BIGINT,
                data_key=["closed_by", "id"],
                optional=True,
            ),
            Col(
                "assignee_ids",
                ColumnType.BIGINT_ARRAY,
                data_key="assignees",
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
                converter=converter_array_pluck("id", dbtype="bigint"),
            ),
            Col("created_at", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME),
            Col("closed_at", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME, optional=True),
            Col("updated_at", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME, index=True),
        ),
        timestamp_col="updated_at",
        update_where=lambda s, t: t("updated_at") < s("updated_at"),
    )
)
