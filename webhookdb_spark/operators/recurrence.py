"""Recurring-event projection (RRULE expansion + RECURRENCE-ID overrides).

Semantics from the reference's feed processor
(lib/webhookdb/replicator/icalendar_calendar_v1.rb:420-643):

- RRULE events expand to one row per occurrence: ``UID := "{uid}-{seq}"``,
  ``recurring_event_id := uid``, ``recurring_event_sequence := seq``.
- Projection window: floor 2000-01-01 (occurrences before it are skipped
  but still consume sequence numbers), horizon now+5y (the first
  occurrence past the horizon IS emitted, then enumeration stops), DoS
  cutoff horizon+210d bounds pathological rules
  (icalendar_calendar_v1.rb:17,560-576; lib/webhookdb/icalendar.rb:17-18).
- RDATE adds occurrence times; EXDATE removes them.
- Ambiguous rules are sanitized before parsing: WEEKLY+BYMONTHDAY drops
  BYMONTHDAY; MONTHLY+BYYEARDAY+BYMONTHDAY drops BYYEARDAY
  (icalendar_calendar_v1.rb:621-643).
- DTSTART year < 1000 or end<start ⇒ treat as non-recurring.
- RECURRENCE-ID override events *steal* the projected occurrence's UID
  and sequence, with LAST-MODIFIED bumped 1s past the original so the
  override wins the upsert; an override matching no occurrence appends
  to the sequence (Apple's out-of-RRULE-bounds exclusions)
  (icalendar_calendar_v1.rb:471-517).
- Per-UID max sequence is tracked so rows with a higher sequence from a
  previous (longer) projection can be deleted
  (icalendar_calendar_v1.rb:445-450 delete_condition).

Expansion uses ``dateutil.rrule`` (public) with wall-clock-preserving
tz-aware arithmetic, matching ice_cube's behavior across DST.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from datetime import date, datetime, time, timedelta, timezone

from dateutil import rrule as du_rrule

from webhookdb_spark.functions.timezones import parse_time_with_tzid

RECURRENCE_PROJECTION_DAYS = 5 * 365  # icalendar_calendar_v1.rb:17 (5 years)
DOS_CUTOFF_EXTRA_DAYS = 210  # icalendar_calendar_v1.rb:560-576
OLDEST_RECURRING_EVENT = datetime(2000, 1, 1, tzinfo=timezone.utc)  # icalendar.rb:17-18


# -- ICS date/datetime entries (icalendar_event_v1.rb:36-110) --------------

def value_is_date_str(v: str) -> bool:
    return len(v) == 8


def entry_to_date(entry: dict) -> date:
    return datetime.strptime(entry["v"], "%Y%m%d").date()


def entry_to_datetime(entry: dict) -> tuple[datetime, bool]:
    """ICS datetime entry → (aware datetime, tz_known)."""
    value = entry["v"]
    if value.endswith("Z"):
        return (
            datetime.strptime(value, "%Y%m%dT%H%M%SZ").replace(tzinfo=timezone.utc),
            True,
        )
    if entry.get("TZID"):
        return parse_time_with_tzid(value, entry["TZID"])
    return (
        datetime.strptime(value, "%Y%m%dT%H%M%S").replace(tzinfo=timezone.utc),
        False,
    )


def entry_to_date_or_datetime(entry: dict) -> tuple[date | datetime, bool]:
    if value_is_date_str(entry["v"]):
        return entry_to_date(entry), True
    return entry_to_datetime(entry)


# -- rule sanitization (icalendar_calendar_v1.rb:621-643) -------------------

def sanitize_ical_rrule(ical: str) -> str:
    out = None
    if "FREQ=WEEKLY" in ical and "BYMONTHDAY=" in ical:
        out = re.sub(r"BYMONTHDAY=[\d,]+", "", ical)
    elif "FREQ=MONTHLY" in ical and "BYYEARDAY=" in ical and "BYMONTHDAY=" in ical:
        out = re.sub(r"BYYEARDAY=[\d,]+", "", ical)
    if out is not None:
        out = out.strip(";")
        out = re.sub(r";;+", ";", out)
        return out
    return ical


def _normalize_until(ical: str, dtstart_is_datetime: bool) -> str:
    """Feeds put DATE-valued or naive UNTILs on datetime rules; coerce to
    the UTC form dateutil requires for aware dtstarts."""

    def fix(m: re.Match) -> str:
        v = m.group(1)
        if not dtstart_is_datetime:
            return f"UNTIL={v[:8]}" if "T" in v else m.group(0)
        if len(v) == 8:  # date-only: include the whole day
            return f"UNTIL={v}T235959Z"
        if not v.endswith("Z"):
            return f"UNTIL={v}Z"
        return m.group(0)

    return re.sub(r"UNTIL=([\dTZ]+)", fix, ical)


def _as_wallclock_list(entries: list[dict] | None, is_date: bool) -> list:
    """Expand comma-separated RDATE/EXDATE entries to parsed values
    (icalendar_calendar_v1.rb:645-653 _time_array)."""
    out = []
    for e in entries or []:
        for v in str(e.get("v", "")).split(","):
            if not v:
                continue
            sub = dict(e, v=v)
            parsed, _known = entry_to_date_or_datetime(sub)
            if isinstance(parsed, datetime):
                parsed = parsed.astimezone(timezone.utc)
            out.append(parsed)
    return out


class ProjectionError(Exception):
    pass


def expand_rrule(
    h: dict, now: datetime
) -> tuple[list[tuple[int, date | datetime, object]], bool]:
    """Enumerate (sequence, start, tzinfo_or_None) occurrences for a
    VEVENT hash with an RRULE. Returns (occurrences, truncated_by_dos).

    Start values are dates for date-valued DTSTART, else aware local
    datetimes (wall-clock preserved across DST like ice_cube).
    """
    start_entry = h["DTSTART"]
    is_date = value_is_date_str(start_entry["v"])
    start, _known = entry_to_date_or_datetime(start_entry)

    ical = sanitize_ical_rrule(h["RRULE"]["v"])
    ical = _normalize_until(ical, dtstart_is_datetime=not is_date)

    if is_date:
        dtstart = datetime.combine(start, time())
        floor = OLDEST_RECURRING_EVENT.replace(tzinfo=None)
        horizon = now.replace(tzinfo=None) + timedelta(days=RECURRENCE_PROJECTION_DAYS)
    else:
        dtstart = start
        floor = OLDEST_RECURRING_EVENT
        horizon = now.astimezone(timezone.utc) + timedelta(
            days=RECURRENCE_PROJECTION_DAYS
        )
    dos_cutoff = horizon + timedelta(days=DOS_CUTOFF_EXTRA_DAYS)

    try:
        rule = du_rrule.rrulestr(ical, dtstart=dtstart)
    except Exception as e:  # unparseable rule → treat as non-recurring
        raise ProjectionError(str(e)) from e

    rdates = _as_wallclock_list(h.get("RDATE"), is_date)
    exdates = _as_wallclock_list(h.get("EXDATE"), is_date)
    if is_date:
        ex_keys = {d if isinstance(d, date) and not isinstance(d, datetime) else d.date()
                   for d in exdates}
    else:
        ex_keys = {d.astimezone(timezone.utc) for d in exdates
                   if isinstance(d, datetime)}

    def key(dt: datetime):
        if is_date:
            return dt.date()
        return dt.astimezone(timezone.utc)

    occs: list[datetime] = []
    seen = set()
    try:
        for occ in rule:
            if key(occ) in seen:
                continue
            if occ > dos_cutoff:
                break
            occs.append(occ)
            seen.add(key(occ))
            if len(occs) > 100_000:  # absolute backstop
                break
    except (ValueError, OverflowError) as e:
        raise ProjectionError(str(e)) from e

    for rd in rdates:
        if is_date:
            rddt = datetime.combine(rd, time()) if not isinstance(rd, datetime) else rd
        else:
            rddt = rd if isinstance(rd, datetime) else datetime.combine(
                rd, time(), tzinfo=timezone.utc
            )
        if key(rddt) not in seen:
            occs.append(rddt)
            seen.add(key(rddt))
    # EXDATEs never enter the enumeration (ice_cube merges extimes into
    # the schedule), so they do NOT consume sequence numbers...
    occs = [o for o in occs if key(o) not in ex_keys]
    occs.sort(key=key)

    tzinfo_ = None if is_date else dtstart.tzinfo
    out: list[tuple[int, date | datetime, object]] = []
    truncated = False
    for idx, occ in enumerate(occs):
        # ...while below-floor occurrences are skipped AFTER indexing
        # (each_with_index + next), so they DO consume sequence numbers.
        if is_date:
            if datetime.combine(occ.date(), time()) < floor:
                continue
            out.append((idx, occ.date(), None))
            if occ > horizon:
                truncated = True
                break
        else:
            if occ.astimezone(timezone.utc) < floor:
                continue
            out.append((idx, occ, tzinfo_))
            if occ.astimezone(timezone.utc) > horizon.astimezone(timezone.utc):
                truncated = True
                break
    return out, truncated


# -- occurrence → ICS entry (icalendar_calendar_v1.rb:606-619) -------------

def ical_entry_from_occurrence(
    occ: date | datetime, source_entry: dict, is_date: bool
) -> dict:
    if is_date:
        return {"v": occ.strftime("%Y%m%d")}
    assert isinstance(occ, datetime)
    if occ.tzinfo is not None and occ.utcoffset() == timedelta(0) and not source_entry.get("TZID"):
        return {"v": occ.strftime("%Y%m%dT%H%M%S") + "Z"}
    tzid = source_entry.get("TZID")
    if tzid:
        return {"v": occ.strftime("%Y%m%dT%H%M%S"), "TZID": tzid}
    value = source_entry["v"]
    if value.endswith("Z"):
        return {"v": occ.astimezone(timezone.utc).strftime("%Y%m%dT%H%M%S") + "Z"}
    if re.match(r"^\d{8}T\d{6}$", value):
        # naked local time assumed UTC (ical_assuming_utc warn path)
        return {"v": occ.strftime("%Y%m%dT%H%M%S") + "Z"}
    return {"v": occ.strftime("%Y%m%dT%H%M%S") + "Z"}


class FeedProjector:
    """Per-feed projection state machine (UID steal / sequence tracking).

    One instance per (calendar, feed sync) — exactly the state scope the
    reference confines to one feed pass (icalendar_calendar_v1.rb:426-436),
    which is why distributed expansion partitions by feed.
    """

    def __init__(self, now: datetime):
        self.now = now
        self.expanded_by_uid: dict[str, list[dict]] = {}
        self.max_sequence_by_uid: dict[str, int] = {}

    def delete_conditions(self) -> dict[str, int]:
        """uid → max sequence; rows with a higher sequence are doomed
        (delete_condition, icalendar_calendar_v1.rb:445-450)."""
        return dict(self.max_sequence_by_uid)

    def project(self, h: dict) -> Iterator[dict]:
        uid = h["UID"]["v"]

        if "RECURRENCE-ID" in h:
            yield from self._project_override(h, uid)
            return
        if "RRULE" not in h:
            yield h
            return

        start_entry = h["DTSTART"]
        is_date = value_is_date_str(start_entry["v"])
        start, _ = entry_to_date_or_datetime(start_entry)
        start_year = start.year
        if start_year < 1000:  # misconfiguration guard
            yield h
            return
        end_entry = h.get("DTEND")
        if end_entry is not None:
            end, _ = entry_to_date_or_datetime(end_entry)
            if type(end) is type(start) and end < start:
                yield h
                return

        try:
            occurrences, _ = expand_rrule(h, self.now)
        except ProjectionError:
            yield h
            return

        duration = None
        if end_entry is not None:
            end_val, _ = entry_to_date_or_datetime(end_entry)
            try:
                duration = end_val - start
            except TypeError:
                duration = None

        final_seq = -1
        for seq, occ_start, _tz in occurrences:
            e = dict(h)
            e["recurring_event_id"] = uid
            e["recurring_event_sequence"] = seq
            e["UID"] = {"v": f"{uid}-{seq}"}
            e["DTSTART"] = ical_entry_from_occurrence(occ_start, start_entry, is_date)
            if end_entry is not None and duration is not None:
                if not is_date and end_entry.get("VALUE") == "DATE":
                    pass  # DTSTART time + DTEND date: nonsense, skip end
                else:
                    e["DTEND"] = ical_entry_from_occurrence(
                        occ_start + duration, end_entry, is_date
                    )
            track = dict(
                uid=e["UID"]["v"],
                recurring_event_sequence=seq,
                start=occ_start,
                last_modified=h.get("LAST-MODIFIED"),
            )
            self.expanded_by_uid.setdefault(uid, []).append(track)
            final_seq = seq
            yield e
        self.max_sequence_by_uid[uid] = final_seq

    def _project_override(self, h: dict, uid: str) -> Iterator[dict]:
        rec_entry = h["RECURRENCE-ID"]
        target, _ = entry_to_date_or_datetime(rec_entry)
        candidates = self.expanded_by_uid.get(uid)
        if candidates is None:
            # no recurring series seen: standalone event
            yield h
            return
        h = dict(h)
        h["recurring_event_id"] = uid

        def matches(c: dict) -> bool:
            cs = c["start"]
            if isinstance(target, datetime) and isinstance(cs, datetime):
                return cs.astimezone(timezone.utc) == target.astimezone(timezone.utc)
            return cs == target

        match = next((c for c in candidates if matches(c)), None)
        if match is None:
            # out-of-bounds exclusion (Apple): append to the sequence
            new_seq = self.max_sequence_by_uid.get(uid, -1) + 1
            self.max_sequence_by_uid[uid] = new_seq
            h["UID"] = {"v": f"{uid}-{new_seq}"}
            h["recurring_event_sequence"] = new_seq
            yield h
            return
        h["UID"] = {"v": match["uid"]}
        h["recurring_event_sequence"] = match["recurring_event_sequence"]
        # bump LAST-MODIFIED 1s past the original so the override wins
        lm = match.get("last_modified")
        if lm is not None and lm.get("v"):
            try:
                orig, _ = entry_to_datetime(lm)
                bumped = orig + timedelta(seconds=1)
                h["LAST-MODIFIED"] = {
                    "v": bumped.astimezone(timezone.utc).strftime("%Y%m%dT%H%M%S") + "Z"
                }
            except (ValueError, KeyError):
                pass
        yield h
