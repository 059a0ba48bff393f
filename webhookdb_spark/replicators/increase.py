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
    timestamp_col: str = "updated_at",
    include_mixin_timestamps: bool = True,
) -> ReplicatorSpec:
    """Build one Increase replicator (the IncreaseV1Mixin analog).

    ``timestamp_col`` mirrors ``_timestamp_column_name`` overrides
    (increase_event_v1.rb:39 uses created_at, increase_limit_v1.rb:50
    row_updated_at); ``include_mixin_timestamps`` turns off the default
    created_at/updated_at pair for replicators that declare their own.
    """

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

    if include_mixin_timestamps:
        denorm_cols = (
            *denorm_cols,
            Col("created_at", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME,
                index=True, optional=True),
            Col("updated_at", ColumnType.TIMESTAMP, converter=CONV_PARSE_TIME,
                index=True, optional=True),
        )
    return register(
        ReplicatorSpec(
            supports_backfill=True,
            name=name,
            table=name,
            remote_key=Col("increase_id", ColumnType.TEXT, data_key="id"),
            denorm_cols=denorm_cols,
            timestamp_col=timestamp_col,
            update_where=lambda s, t: t(timestamp_col) < s(timestamp_col),
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

# increase_account_number_v1.rb:24-36
INCREASE_ACCOUNT_NUMBER_V1 = increase_spec(
    "increase_account_number_v1",
    "account_number",
    _cols(
        ("account_id", ColumnType.TEXT, {"index": True}),
        ("account_number", ColumnType.TEXT, {"index": True}),
        ("name", ColumnType.TEXT, {"optional": True}),
        ("routing_number", ColumnType.TEXT, {"index": True}),
        ("status", ColumnType.TEXT, {"optional": True}),
    ),
)

# increase_check_transfer_v1.rb:24-56
INCREASE_CHECK_TRANSFER_V1 = increase_spec(
    "increase_check_transfer_v1",
    "check_transfer",
    _cols(
        ("account_id", ColumnType.TEXT, {"index": True}),
        ("amount", ColumnType.INTEGER, {"index": True}),
        ("account_number", ColumnType.TEXT, {"index": True, "optional": True}),
        ("routing_number", ColumnType.TEXT, {"index": True, "optional": True}),
        ("check_number", ColumnType.TEXT, {"index": True, "optional": True}),
        ("recipient_name", ColumnType.TEXT,
         {"data_key": ["physical_check", "recipient_name"], "optional": True}),
        ("status", ColumnType.TEXT, {"optional": True}),
        ("canceled_at", ColumnType.TIMESTAMP,
         {"data_key": ["cancellation", "canceled_at"], "optional": True,
          "index": True, "converter": CONV_PARSE_TIME}),
        ("deposited_at", ColumnType.TIMESTAMP,
         {"data_key": ["deposit", "deposited_at"], "optional": True,
          "index": True, "converter": CONV_PARSE_TIME}),
        ("mailed_at", ColumnType.TIMESTAMP,
         {"data_key": ["mailing", "mailed_at"], "optional": True,
          "index": True, "converter": CONV_PARSE_TIME}),
        ("submitted_at", ColumnType.TIMESTAMP,
         {"data_key": ["submission", "submitted_at"], "optional": True,
          "index": True, "converter": CONV_PARSE_TIME}),
    ),
)

# increase_wire_transfer_v1.rb:24-36
INCREASE_WIRE_TRANSFER_V1 = increase_spec(
    "increase_wire_transfer_v1",
    "wire_transfer",
    _cols(
        ("account_number", ColumnType.TEXT, {"index": True, "optional": True}),
        ("account_id", ColumnType.TEXT, {"index": True}),
        ("amount", ColumnType.INTEGER, {"index": True}),
        ("approved_at", ColumnType.TIMESTAMP,
         {"data_key": ["approval", "approved_at"], "optional": True,
          "converter": CONV_PARSE_TIME}),
        ("routing_number", ColumnType.TEXT, {"index": True, "optional": True}),
        ("status", ColumnType.TEXT, {"optional": True}),
        ("transaction_id", ColumnType.TEXT, {"index": True, "optional": True}),
    ),
)

# increase_event_v1.rb:24-40 — the event envelope IS the stored resource
# (object_type == "event" means the mixin's enrichment fetch never
# triggers); rows are ordered by created_at.
INCREASE_EVENT_V1 = increase_spec(
    "increase_event_v1",
    "event",
    _cols(
        ("associated_object_id", ColumnType.TEXT, {"index": True}),
        ("associated_object_type", ColumnType.TEXT, {"optional": True}),
        ("category", ColumnType.TEXT, {"index": True, "optional": True}),
        ("created_at", ColumnType.TIMESTAMP,
         {"index": True, "converter": CONV_PARSE_TIME}),
    ),
    timestamp_col="created_at",
    include_mixin_timestamps=False,
)

# increase_limit_v1.rb:24-51 — row_created_at keeps first-seen time via
# the :now defaulter; ordering is by row_updated_at.
INCREASE_LIMIT_V1 = increase_spec(
    "increase_limit_v1",
    "limit",
    _cols(
        ("interval", ColumnType.TEXT, {"optional": True}),
        ("metric", ColumnType.TEXT, {"optional": True}),
        ("model_id", ColumnType.TEXT, {"index": True}),
        ("model_type", ColumnType.TEXT, {"optional": True}),
        ("row_created_at", ColumnType.TIMESTAMP,
         {"data_key": "created_at", "defaulter": "now", "optional": True,
          "index": True, "converter": CONV_PARSE_TIME}),
        ("row_updated_at", ColumnType.TIMESTAMP,
         {"data_key": "updated_at", "index": True, "converter": CONV_PARSE_TIME}),
        ("status", ColumnType.TEXT, {"optional": True}),
        ("value", ColumnType.INTEGER, {"optional": True}),
    ),
    timestamp_col="row_updated_at",
    include_mixin_timestamps=False,
)


def route_increase_events(envelopes, body_col: str = "body"):
    """The increase_app_v1 dispatcher (increase_app_v1.rb:31-44): the
    OAuth app root stores nothing; it fans each ``type == "event"``
    webhook out to the dependent replicator whose object type matches
    ``associated_object_type``.

    Spark-first shape: ONE narrow filter per dependent over the same
    envelope DataFrame — Catalyst collapses each into a pushed-down
    scan predicate, so routing N object types costs N cheap filtered
    reads of one cached batch, not a per-row Python dispatch loop.
    Returns ``{spec_name: filtered_envelopes}``.
    """
    from pyspark.sql import functions as F

    obj_type = F.get_json_object(F.col(body_col), "$.associated_object_type")
    is_event = F.get_json_object(F.col(body_col), "$.type") == F.lit("event")
    routes = {
        "increase_account_v1": "account",
        "increase_account_number_v1": "account_number",
        "increase_account_transfer_v1": "account_transfer",
        "increase_ach_transfer_v1": "ach_transfer",
        "increase_check_transfer_v1": "check_transfer",
        "increase_limit_v1": "limit",
        "increase_transaction_v1": "transaction",
        "increase_wire_transfer_v1": "wire_transfer",
    }
    out = {
        name: envelopes.filter(is_event & (obj_type == F.lit(t)))
        for name, t in routes.items()
    }
    # increase_event_v1 receives EVERY event envelope (it stores them).
    out["increase_event_v1"] = envelopes.filter(is_event)
    return out
