"""Increase replicator family (reference:
lib/webhookdb/replicator/increase_v1_mixin.rb, increase_account_v1.rb,
increase_transaction_v1.rb, increase_ach_transfer_v1.rb,
increase_account_transfer_v1.rb).

The Increase API posts *event envelopes* (``type: "event"`` with an
``associated_object_id``); the mixin fetches the real resource and swaps
it in for the envelope (increase_v1_mixin.rb:33-58), stamping
``updated_at`` from the event's ``created_at`` so staleness ordering
stays meaningful. Backfill pages stamp ``updated_at = fetched_at``
(:82-103). Conditional update: ``updated_at < excluded.updated_at``.

Spark shape: the fetch-and-swap is the spec DSL's
``enrichment_fetcher`` + ``enrichment_replaces_resource`` — an
Arrow-batched executor-side hook, exactly where a rate-limited API call
belongs. The fetcher is injected per deployment; tests inject fakes.
"""

from __future__ import annotations

from collections.abc import Callable

from webhookdb_spark.functions.converters import CONV_PARSE_TIME
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType

FetchResource = Callable[[str], dict]  # associated_object_id -> resource


def increase_spec(
    name: str,
    object_type: str,
    denorm_cols: tuple[Col, ...],
    fetch_resource: FetchResource | None = None,
) -> ReplicatorSpec:
    """Build one Increase replicator (the IncreaseV1Mixin analog)."""

    def enrich(resource: dict) -> dict | None:
        # Event envelope for our object type → fetch the resource and
        # stamp updated_at from the event (increase_v1_mixin.rb:33-52).
        if resource.get("type") != "event":
            return None
        if resource.get("associated_object_type") != object_type:
            return None
        if fetch_resource is None:
            raise RuntimeError(
                f"{name}: received an Increase event envelope but no"
                " fetch_resource was injected"
            )
        fetched = dict(fetch_resource(resource["associated_object_id"]))
        fetched["updated_at"] = resource.get("created_at")
        return fetched

    return register(
        ReplicatorSpec(
            name=name,
            table=name,
            remote_key=Col("increase_id", ColumnType.TEXT, data_key="id"),
            denorm_cols=(
                *denorm_cols,
                Col("created_at", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME,
                    index=True, optional=True),
                Col("updated_at", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME,
                    index=True, optional=True),
            ),
            timestamp_col="updated_at",
            update_where=lambda s, t: t("updated_at") < s("updated_at"),
            enrichment_fetcher=enrich,
            enrichment_replaces_resource=True,
        )
    )


def _cols(*specs: tuple) -> tuple[Col, ...]:
    return tuple(Col(*s[:2], **(s[2] if len(s) > 2 else {})) for s in specs)


INCREASE_ACCOUNT_V1 = increase_spec(
    "increase_account_v1",
    "account",
    _cols(
        ("balance", ColumnType.INTEGER, {"optional": True}),
        ("currency", ColumnType.TEXT, {"optional": True}),
        ("entity_id", ColumnType.TEXT, {"optional": True}),
        ("interest_accrued", ColumnType.DECIMAL, {"optional": True}),
        ("name", ColumnType.TEXT, {"optional": True}),
        ("status", ColumnType.TEXT, {"optional": True}),
        ("bank", ColumnType.TEXT, {"optional": True}),
    ),
)

INCREASE_TRANSACTION_V1 = increase_spec(
    "increase_transaction_v1",
    "transaction",
    _cols(
        ("account_id", ColumnType.TEXT, {"index": True}),
        ("amount", ColumnType.INTEGER, {"index": True}),
        ("currency", ColumnType.TEXT, {"optional": True}),
        ("description", ColumnType.TEXT, {"optional": True}),
        ("route_id", ColumnType.TEXT, {"optional": True, "index": True}),
        ("route_type", ColumnType.TEXT, {"optional": True}),
    ),
)

INCREASE_ACH_TRANSFER_V1 = increase_spec(
    "increase_ach_transfer_v1",
    "ach_transfer",
    _cols(
        ("account_id", ColumnType.TEXT, {"index": True}),
        ("account_number", ColumnType.TEXT, {"optional": True}),
        ("amount", ColumnType.INTEGER, {"index": True}),
        ("routing_number", ColumnType.TEXT, {"optional": True}),
        ("status", ColumnType.TEXT, {"optional": True}),
        ("statement_descriptor", ColumnType.TEXT, {"optional": True}),
        ("transaction_id", ColumnType.TEXT, {"optional": True, "index": True}),
    ),
)

INCREASE_ACCOUNT_TRANSFER_V1 = increase_spec(
    "increase_account_transfer_v1",
    "account_transfer",
    _cols(
        ("amount", ColumnType.INTEGER, {"index": True}),
        ("account_id", ColumnType.TEXT, {"index": True}),
        ("canceled_at", ColumnType.TIMESTAMP,
         {"data_key": ["cancellation", "canceled_at"], "optional": True,
          "converter": CONV_PARSE_TIME}),
        ("destination_account_id", ColumnType.TEXT, {"index": True, "optional": True}),
        ("destination_transaction_id", ColumnType.TEXT, {"index": True, "optional": True}),
        ("status", ColumnType.TEXT, {"optional": True}),
        ("transaction_id", ColumnType.TEXT, {"index": True, "optional": True}),
    ),
)
