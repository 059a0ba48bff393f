"""Concrete replicator specs (reference: lib/webhookdb/replicator/*.rb).

Importing this package registers all bundled specs.
"""

from webhookdb_spark.replicators import (  # noqa: F401
    fake,
    github_issue_v1,
    icalendar_calendar_v1,
    icalendar_event_v1,
    stripe_charge_v1,
    transistor_episode_stats_v1,
)
