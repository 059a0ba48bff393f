"""Concrete replicator specs (reference: lib/webhookdb/replicator/*.rb).

Importing this package registers all bundled specs.
"""

from webhookdb_spark.replicators import (  # noqa: F401
    atom_single_feed_v1,
    aws_pricing_v1,
    convertkit,
    email_octopus,
    email_octopus_event_v1,
    fake,
    front_intercom,
    github,
    github_issue_v1,
    github_pull_v1,
    icalendar_calendar_v1,
    icalendar_event_v1,
    increase,
    intercom_contact_v1,
    marketplace_roots,
    misc,
    postmark,
    shopify_customer_v1,
    shopify_order_v1,
    sponsy,
    stripe,
    stripe_charge_v1,
    stripe_refund_v1,
    transistor,
    transistor_episode_stats_v1,
    twilio_sms_v1,
)
