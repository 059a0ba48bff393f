"""Transistor episode stats (reference:
lib/webhookdb/replicator/transistor_episode_stats_v1.rb:25-66,107-135).

Exercises the value-diff update guard (``downloads != excluded.downloads``
— not a timestamp comparison) and the DD-MM-YYYY date converter.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from webhookdb_spark.functions.converters import CONV_PARSE_DMY_DASH
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType


def _compound(body):
    # compound key "{episode_id}-{date}" (transistor_episode_stats_v1.rb:34-40)
    return body, None


TRANSISTOR_EPISODE_STATS_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="transistor_episode_stats_v1",
        table="transistor_episode_stats_v1",
        remote_key=Col("compound_id", ColumnType.TEXT),
        denorm_cols=(
            Col("episode_id", ColumnType.TEXT, index=True),
            Col("date", ColumnType.DATE, converter=CONV_PARSE_DMY_DASH, index=True),
            Col("downloads", ColumnType.INTEGER),
            Col("row_updated_at", ColumnType.TIMESTAMP, defaulter="now"),
        ),
        timestamp_col="row_updated_at",
        # Value-diff guard: only write when downloads actually changed.
        update_where=lambda s, t: t("downloads") != s("downloads"),
        prepare_hook=lambda df: df.withColumn(
            "compound_id",
            F.coalesce(
                F.col("compound_id"),
                F.concat_ws("-", F.col("episode_id"), F.col("date").cast("string")),
            ),
        ),
    )
)
