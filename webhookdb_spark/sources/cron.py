"""Scheduled backfills (reference:
lib/webhookdb/jobs/scheduled_backfills.rb:10-86).

Each service installs a cron spec that periodically enqueues backfills
(e.g. twilio_sms_v1 every minute, github_* hourly). Here that is a
five-field cron matcher plus a driver-side scheduler: ``tick(now)``
runs every due job at most once per matching minute. The scheduler is
single-driver state — the reference needs cron-singleton advisory
locks (jobs/icalendar_enqueue_syncs.rb:42-53) only because it runs many
worker processes; one Spark driver needs none.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import Callable


def _field_matches(spec: str, value: int, lo: int, hi: int) -> bool:
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part in ("*", ""):
            start, end = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            start, end = int(a), int(b)
        else:
            start = end = int(part)
        if start <= value <= end and (value - start) % step == 0:
            return True
    return False


def cron_matches(expr: str, at: datetime) -> bool:
    """Standard five-field cron (minute hour dom month dow); dow 0=Sun."""
    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"invalid cron expression: {expr!r}")
    minute, hour, dom, month, dow = fields
    return (
        _field_matches(minute, at.minute, 0, 59)
        and _field_matches(hour, at.hour, 0, 23)
        and _field_matches(dom, at.day, 1, 31)
        and _field_matches(month, at.month, 1, 12)
        and _field_matches(dow, (at.weekday() + 1) % 7, 0, 6)
    )


@dataclass
class ScheduledBackfill:
    """One service's recurring poll (ScheduledBackfills::Spec parity:
    service name, cron expression, incremental flag)."""

    service: str
    cron: str
    action: Callable[[], object]
    incremental: bool = True


@dataclass
class BackfillScheduler:
    jobs: list[ScheduledBackfill] = field(default_factory=list)
    _last_fired: dict[str, str] = field(default_factory=dict)

    def add(self, job: ScheduledBackfill) -> None:
        self.jobs.append(job)

    def tick(self, now: datetime) -> list[str]:
        """Run every job whose cron matches ``now``'s minute, at most
        once per minute per job. Returns the services fired."""
        stamp = now.strftime("%Y-%m-%dT%H:%M")
        fired = []
        for job in self.jobs:
            if self._last_fired.get(job.service) == stamp:
                continue
            if cron_matches(job.cron, now):
                job.action()
                self._last_fired[job.service] = stamp
                fired.append(job.service)
        return fired


@dataclass(frozen=True)
class StandardBackfillSpec:
    """One row of the reference's installed schedule
    (jobs/scheduled_backfills.rb:12-86): job class name, service,
    five-field cron, enqueue splay seconds, incremental and recursive
    bits. Config-driven expressions carry their shipped defaults
    (email_octopus.rb:13, github.rb:10, sponsy.rb:9,
    transistor.rb:9-10)."""

    klass: str
    service: str
    cron: str
    splay_seconds: int
    incremental: bool
    recursive: bool


#: jobs/scheduled_backfills.rb:33-84, verbatim.
STANDARD_SCHEDULED_BACKFILLS: tuple[StandardBackfillSpec, ...] = (
    StandardBackfillSpec("ConvertkitBroadcastBackfill",
                         "convertkit_broadcast_v1", "10 * * * *", 120,
                         False, False),
    StandardBackfillSpec("ConvertkitSubscriberBackfill",
                         "convertkit_subscriber_v1", "20 * * * *", 120,
                         True, False),
    StandardBackfillSpec("ConvertkitTagBackfill",
                         "convertkit_tag_v1", "30 * * * *", 120,
                         False, False),
    StandardBackfillSpec("EmailOctopusScheduledBackfill",
                         "email_octopus_list_v1", "0 */4 * * *", 120,
                         False, True),
    StandardBackfillSpec("GithubRepoActivityScheduledBackfill",
                         "github_repository_event_v1", "*/5 * * * *", 30,
                         False, False),
    StandardBackfillSpec("IntercomScheduledBackfill",
                         "intercom_marketplace_root_v1", "46 4 * * *", 0,
                         True, True),
    StandardBackfillSpec("AtomSingleFeedPoller",
                         "atom_single_feed_v1", "11 * * * *", 10,
                         True, False),
    StandardBackfillSpec("SponsyScheduledBackfill",
                         "sponsy_publication_v1", "*/30 */4 * * *", 30,
                         True, True),
    StandardBackfillSpec("TransistorEpisodeBackfill",
                         "transistor_episode_v1", "30 * * * *", 120,
                         True, True),
    StandardBackfillSpec("TransistorShowBackfill",
                         "transistor_show_v1", "0 0 */1 * *", 120,
                         True, False),
    StandardBackfillSpec("TwilioSmsBackfill",
                         "twilio_sms_v1", "*/1 * * * *", 0, True, True),
    StandardBackfillSpec("SignalwireMessageBackfill",
                         "signalwire_message_v1", "*/1 * * * *", 0,
                         True, True),
)


def install_standard_backfills(
    scheduler: "BackfillScheduler",
    action_for: Callable[[StandardBackfillSpec], Callable[[], object]],
) -> None:
    """Install the reference's full schedule table on a scheduler;
    ``action_for`` builds each job's enqueue callback (the analog of
    BackfillJob.create_recursive/create, scheduled_backfills.rb:20-29,
    selected by the spec's recursive bit)."""
    for sp in STANDARD_SCHEDULED_BACKFILLS:
        scheduler.add(ScheduledBackfill(
            service=sp.service, cron=sp.cron,
            action=action_for(sp), incremental=sp.incremental,
        ))
