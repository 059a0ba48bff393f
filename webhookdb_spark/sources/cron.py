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
