"""Marketplace/auth root integrations — the three no-table stubs that
complete the reference's 65-replicator registry.

References: lib/webhookdb/replicator/front_marketplace_root_v1.rb,
intercom_marketplace_root_v1.rb, increase_app_v1.rb. Each declares an
``ignore_id`` remote key and zero denormalized columns, raises on
upsert ("a stub integration only for auth purposes"), and exists so an
installer can hang real dependents off it (build_dependents:
front_marketplace_root_v1.rb:34-47, intercom_marketplace_root_v1.rb:44-58,
increase_app_v1 dependents at increase_app_v1.rb:33-41).

increase_app_v1 additionally dispatches incoming event payloads to its
dependent replicators — that behavior lives in
``webhookdb_spark.replicators.increase.route_increase_events``; the
spec here is the registry entry carrying its identity and dependents.
"""

from __future__ import annotations

from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType

# front_marketplace_root_v1.rb:21-47
FRONT_MARKETPLACE_ROOT_V1 = register(
    ReplicatorSpec(
        name="front_marketplace_root_v1",
        supports_backfill=False,  # webhook-only (no supports_backfill in its descriptor)
        table="front_marketplace_root_v1",
        remote_key=Col("ignore_id", ColumnType.INTEGER),
        denorm_cols=(),
        auth_only=True,
        creates_dependents=("front_conversation_v1", "front_message_v1"),
    )
)

# intercom_marketplace_root_v1.rb:20-58
INTERCOM_MARKETPLACE_ROOT_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="intercom_marketplace_root_v1",
        table="intercom_marketplace_root_v1",
        remote_key=Col("ignore_id", ColumnType.INTEGER),
        denorm_cols=(),
        auth_only=True,
        creates_dependents=("intercom_contact_v1", "intercom_conversation_v1"),
    )
)

# increase_app_v1.rb:23-41 (dispatch: increase.route_increase_events)
INCREASE_APP_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="increase_app_v1",
        table="increase_app_v1",
        remote_key=Col("ignore_id", ColumnType.INTEGER),
        denorm_cols=(),
        auth_only=True,
        creates_dependents=("increase_event_v1",),
    )
)
