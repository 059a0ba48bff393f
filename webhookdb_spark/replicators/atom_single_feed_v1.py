"""Atom feed replicator (reference:
lib/webhookdb/replicator/atom_single_feed_v1.rb:21-57).

Columns: entry_id (remote key, data_key "id"), row_created_at
(:now defaulter, first write wins via coalesce-on-update,
atom_single_feed_v1.rb:53-58), updated/published timestamps, title,
and geo lat/lng split out of the ``georss:point`` text with
``converter_array_element`` (index 0/1, space separator, DECIMAL —
atom_single_feed_v1.rb:25-26). Conditional update: ``updated <
excluded.updated``.
"""

from __future__ import annotations

from webhookdb_spark.functions.converters import (
    CONV_PARSE_TIME,
    converter_array_element,
)
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType

CONV_GEO_LAT = converter_array_element(index=0, sep=" ")
CONV_GEO_LNG = converter_array_element(index=1, sep=" ")

ATOM_SINGLE_FEED_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="atom_single_feed_v1",
        table="atom_single_feed_v1",
        remote_key=Col("entry_id", ColumnType.TEXT, data_key="id"),
        denorm_cols=(
            Col(
                "row_created_at",
                ColumnType.TIMESTAMP,
                optional=True,
                defaulter="now",
                index=True,
            ),
            Col("updated", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME, index=True),
            Col("title", ColumnType.TEXT),
            Col(
                "published",
                ColumnType.TIMESTAMP,
                converter=CONV_PARSE_TIME,
                optional=True,
                index=True,
            ),
            Col(
                "geo_lat",
                ColumnType.DECIMAL,
                data_key="georss:point",
                optional=True,
                converter=CONV_GEO_LAT,
            ),
            Col(
                "geo_lng",
                ColumnType.DECIMAL,
                data_key="georss:point",
                optional=True,
                converter=CONV_GEO_LNG,
            ),
        ),
        timestamp_col="updated",
        update_where=lambda s, t: t("updated") < s("updated"),
        # initial insert's row_created_at survives updates
        coalesce_on_update=("row_created_at",),
    )
)
