"""Sponsy replicator family (reference: lib/webhookdb/replicator/
sponsy_v1_mixin.rb plus sponsy_{customer,placement,publication,slot,
status}_v1.rb).

Backfill-only integrations (no webhooks): pages come from the Sponsy
API ordered by ``updatedAt DESC``, and every child resource is fetched
per publication (the PublicationChildBackfiller stamps
``publication_id`` into each body, sponsy_v1_mixin.rb:139-152 — our
backfill framework does the same via ``prepare_body``). Shared shape:
remote key ``sponsy_id`` (``id``), camelCase ``createdAt``/``updatedAt``
timestamps where ``updated_at`` falls back to ``created_at``
(defaulter_from_resource_field), conditional update
``updated_at < excluded.updated_at``.

sponsy_publication_v1's three day columns are the reference's
map-lookup showcase: the payload's ``days`` array (day names or
Monday-zero numbers) is stored in Monday-zero, Sunday-zero
("normalized"), and day-name forms.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from webhookdb_spark.functions.converters import converter_map_lookup_array
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType

T, I = ColumnType.TEXT, ColumnType.INTEGER
TS, D = ColumnType.TIMESTAMP, ColumnType.DATE

_KEY = Col("sponsy_id", T, data_key="id")

# column.rb:234-242
DAYS_OF_WEEK = (
    "SUNDAY", "MONDAY", "TUESDAY", "WEDNESDAY", "THURSDAY", "FRIDAY", "SATURDAY",
)
_MONDAY_ZERO = tuple(DAYS_OF_WEEK[1:] + DAYS_OF_WEEK[:1])  # MONDAY..SUNDAY


def _ts_cols() -> tuple[Col, ...]:
    # sponsy_v1_mixin.rb:16-25 _ts_columns
    return (
        Col("created_at", TS, data_key="createdAt", index=True),
        # defaulter_from_resource_field(:created_at): a missing
        # updatedAt falls back to createdAt
        Col(
            "updated_at",
            TS,
            data_key="updatedAt",
            defaulter=lambda body: F.get_json_object(body, "$.createdAt"),
            index=True,
        ),
    )


def _sponsy_spec(name: str, denorm_cols: tuple[Col, ...]) -> ReplicatorSpec:
    return register(
        ReplicatorSpec(
            supports_backfill=True,
            name=name,
            table=name,
            remote_key=_KEY,
            denorm_cols=(*denorm_cols, *_ts_cols()),
            timestamp_col="updated_at",
            update_where=lambda s, t: t("updated_at") < s("updated_at"),
        )
    )


# sponsy_customer_v1.rb:23-31
SPONSY_CUSTOMER_V1 = _sponsy_spec(
    "sponsy_customer_v1",
    (
        Col("name", T, optional=True),
        Col("logo", T, optional=True),
        Col("notes", T, optional=True),
        Col("portal_text", T, data_key="portalText", optional=True),
        Col("portal_id", T, data_key="portalId", index=True, optional=True),
    ),
)

# sponsy_placement_v1.rb:23-31 — publication_id is stamped into each
# body by the per-publication child backfiller.
SPONSY_PLACEMENT_V1 = _sponsy_spec(
    "sponsy_placement_v1",
    (
        Col("publication_id", T, index=True),
        Col("name", T, optional=True),
        Col("slug", T, optional=True),
        Col("color", T, optional=True),
        Col("order", I, optional=True),
    ),
)

# sponsy_publication_v1.rb:23-70
SPONSY_PUBLICATION_V1 = _sponsy_spec(
    "sponsy_publication_v1",
    (
        Col("name", T, optional=True),
        Col("slug", T, optional=True),
        Col("type", T, optional=True),
        Col("deleted_at", TS, optional=True),
        # days: 'MONDAY'→0 … 'SUNDAY'→6; numbers pass through
        Col("days", ColumnType.INTEGER_ARRAY, optional=True,
            converter=converter_map_lookup_array(
                {d: i for i, d in enumerate(_MONDAY_ZERO)})),
        # days_normalized: 'SUNDAY'→0 … 'SATURDAY'→6; Monday-zero number
        # n → (n+1) % 7
        Col("days_normalized", ColumnType.INTEGER_ARRAY, data_key="days",
            optional=True,
            converter=converter_map_lookup_array(
                {**{d: i for i, d in enumerate(DAYS_OF_WEEK)},
                 **{n: (n + 1) % 7 for n in range(7)}})),
        # day_names: Monday-zero number → name
        Col("day_names", ColumnType.TEXT_ARRAY, data_key="days", optional=True,
            converter=converter_map_lookup_array(
                dict(enumerate(_MONDAY_ZERO)), value_type="string")),
    ),
)

# sponsy_slot_v1.rb:23-40
SPONSY_SLOT_V1 = _sponsy_spec(
    "sponsy_slot_v1",
    (
        Col("publication_id", T, index=True),
        Col("date", D, index=True, optional=True),
        Col("notes", T, optional=True),
        Col("customer_id", T, data_key=["customer", "id"], optional=True, index=True),
        Col("placement_id", T, data_key=["placement", "id"], optional=True, index=True),
        Col("status_id", T, data_key=["status", "id"], optional=True, index=True),
    ),
)

# sponsy_status_v1.rb:23-31
SPONSY_STATUS_V1 = _sponsy_spec(
    "sponsy_status_v1",
    (
        Col("publication_id", T, index=True),
        Col("name", T, optional=True),
        Col("slug", T, optional=True),
        Col("color", T, optional=True),
        Col("order", I, optional=True),
    ),
)


SPONSY_API_URL = "https://api.getsponsy.com/v1/publications"


def publication_child_backfillers(
    spark,
    warehouse,
    org: str,
    spec: ReplicatorSpec,
    tail: str,
    http_get,
    publication_ids: list[str],
    **backfiller_kwargs,
):
    """PublicationChildBackfiller analog (sponsy_v1_mixin.rb:134-170):
    every child resource (status/slot/placement) is fetched PER
    PUBLICATION from ``/v1/publications/{pub}/{tail}``, and the
    publication's id is stamped into each body before upsert
    (prepare_body, :150-153) — the payload itself does not carry it,
    which is why the specs assert the stamped column.

    ``publication_ids`` come from the dependency's table (the
    reference reads them with ``_publication_backfillers``,
    sponsy_v1_mixin.rb:111-131). The reference runs these children
    SEQUENTIALLY (sponsy sets no ``_parallel_backfill``); fanning the
    list through ``parallel_backfill`` also works — same-table merge
    races resolve via the manifest-CAS retry in ``Backfiller._flush``
    — but keeps the reference's rate-limit posture only when
    sequential."""
    from webhookdb_spark.sources.backfill import Backfiller
    from webhookdb_spark.sources.pagers import sponsy_page_fetcher

    return [
        Backfiller(
            spark=spark,
            warehouse=warehouse,
            org=org,
            spec=spec,
            fetch_page=sponsy_page_fetcher(
                http_get, SPONSY_API_URL, f"/{pub}/{tail}"),
            prepare_item=lambda body, pub=pub: {
                **body, "publication_id": pub},
            opaque_id=f"{spec.name}-{pub}",
            **backfiller_kwargs,
        )
        for pub in publication_ids
    ]
