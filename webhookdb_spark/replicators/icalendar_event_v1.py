"""iCalendar event replicator
(reference: lib/webhookdb/replicator/icalendar_event_v1.rb).

Rows arrive as *projected* VEVENT resources (see
replicators/icalendar_calendar_v1.py): the feed projector has already
expanded recurrences, resolved overrides, and injected
``calendar_external_id``/``recurring_event_*``. This module converts a
projected resource into the replicated row shape:

- ``compound_identity = "{calendar_external_id}-{uid}"`` (CONV_REMOTE_KEY,
  icalendar_event_v1.rb:26-32)
- DTSTART/DTEND → ``start_at``/``end_at`` (timestamps, UTC) or
  ``start_date``/``end_date`` (date-valued entries), with
  ``missing_timezone`` flagging TZ-less local times
  (icalendar_event_v1.rb:36-110)
- implicit DTEND: DURATION else +1 day (dates) / = start (times)
  (icalendar_event_v1.rb:173-206)
- update guard: ``data != excluded.data`` (jsonb diff; LAST-MODIFIED is
  unreliable — icalendar_event_v1.rb:227-234); our ``data`` is
  canonical JSON so string equality == jsonb equality
- hash-partitioned variant keyed on
  ``str2inthash(calendar_external_id)``
  (icalendar_event_v1_partitioned.rb)

Because the ICS datetime conversion needs the TZ database, rows are
shaped in Python during projection (the reference's converters are
Ruby-side with ``sql: NOT_IMPLEMENTED`` too — this is the sanctioned
non-SQL path) and then flow through the standard envelope → spec →
MERGE pipeline with plain JSON extraction.
"""

from __future__ import annotations

import re
from datetime import date, datetime, time, timedelta, timezone

import dataclasses

from pyspark.sql import functions as F

from webhookdb_spark.functions.converters import (
    _str2inthash_spark,
    canonical_json_py,
)
from webhookdb_spark.operators.recurrence import (
    entry_to_date_or_datetime,
    value_is_date_str,
)
from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType

_DUR_RE = re.compile(
    r"^(?P<sign>[+-])?P(?:(?P<weeks>\d+)W)?(?:(?P<days>\d+)D)?"
    r"(?:T(?:(?P<hours>\d+)H)?(?:(?P<minutes>\d+)M)?(?:(?P<seconds>\d+)S)?)?$"
)


def parse_iso8601_duration(s: str) -> timedelta:
    """RFC 5545 §3.3.6 DURATION (ISO-8601 subset)."""
    m = _DUR_RE.match(s.strip())
    if not m:
        raise ValueError(f"bad duration {s!r}")
    sign = -1 if m.group("sign") == "-" else 1
    td = timedelta(
        weeks=int(m.group("weeks") or 0),
        days=int(m.group("days") or 0),
        hours=int(m.group("hours") or 0),
        minutes=int(m.group("minutes") or 0),
        seconds=int(m.group("seconds") or 0),
    )
    return sign * td


def _iso(dt: datetime) -> str:
    return dt.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def projected_resource_to_row(
    resource: dict, calendar_external_id: str, now: datetime
) -> dict:
    """Projected VEVENT hash → replicated-row dict (pre-serialization).

    The returned dict is the upsert resource; ``data`` holds the VEVENT
    hash minus the injected bookkeeping fields
    (icalendar_event_v1.rb:160-166 _resource_to_data).
    """
    uid = resource["UID"]["v"]
    row: dict = {
        "compound_identity": f"{calendar_external_id}-{uid}",
        "calendar_external_id": calendar_external_id,
        "uid": uid,
        "row_updated_at": _iso(now),
        "status": (resource.get("STATUS") or {}).get("v"),
        "classification": (resource.get("CLASS") or {}).get("v"),
        "priority": _to_int((resource.get("PRIORITY") or {}).get("v")),
        "recurring_event_id": resource.get("recurring_event_id"),
        "recurring_event_sequence": resource.get("recurring_event_sequence"),
    }

    # categories: each entry's value comma-split and trimmed
    # (CONV_COMMA_SEP_ARRAY, icalendar_event_v1.rb:100-110)
    cats: list[str] = []
    for e in resource.get("CATEGORIES") or []:
        cats.extend(x.strip() for x in str(e.get("v", "")).split(",") if x.strip())
    row["categories"] = cats or None

    geo = (resource.get("GEO") or {}).get("v")
    if geo:
        parts = str(geo).strip('"').split(";")
        row["geo_lat"] = _to_float(parts[0]) if parts and parts[0] else None
        row["geo_lng"] = _to_float(parts[1]) if len(parts) > 1 and parts[1] else None

    for src, col in (("LAST-MODIFIED", "last_modified_at"), ("CREATED", "created_at")):
        e = resource.get(src)
        if e and e.get("v") and not value_is_date_str(e["v"]):
            try:
                dt, _ = entry_to_date_or_datetime(e)
                row[col] = _iso(dt)
            except ValueError:
                pass
    row.setdefault("last_modified_at", _iso(now))  # defaulter :now

    start_entry = resource.get("DTSTART")
    end_entry = resource.get("DTEND")
    missing_tz = False
    if start_entry and start_entry.get("v"):
        try:
            sv, known = entry_to_date_or_datetime(start_entry)
        except ValueError:
            sv, known = None, True
        if isinstance(sv, datetime):
            row["start_at"] = _iso(sv)
            missing_tz = not known
        elif isinstance(sv, date):
            row["start_date"] = sv.isoformat()
    row["missing_timezone"] = missing_tz
    if end_entry and end_entry.get("v"):
        try:
            ev, _ = entry_to_date_or_datetime(end_entry)
        except ValueError:
            ev = None
        if isinstance(ev, datetime):
            row["end_at"] = _iso(ev)
        elif isinstance(ev, date):
            row["end_date"] = ev.isoformat()

    # implicit DTEND (icalendar_event_v1.rb:173-206)
    dur_entry = resource.get("DURATION")
    if row.get("start_at") and not row.get("end_at"):
        if dur_entry and dur_entry.get("v"):
            try:
                dur = parse_iso8601_duration(dur_entry["v"])
                sdt = datetime.strptime(row["start_at"], "%Y-%m-%dT%H:%M:%SZ")
                row["end_at"] = _iso(
                    (sdt.replace(tzinfo=timezone.utc) + dur)
                )
            except ValueError:
                row["end_at"] = row["start_at"]
        else:
            row["end_at"] = row["start_at"]
    elif row.get("start_date") and not row.get("end_date"):
        sd = date.fromisoformat(row["start_date"])
        if dur_entry and dur_entry.get("v"):
            try:
                dur = parse_iso8601_duration(dur_entry["v"])
                row["end_date"] = (
                    datetime.combine(sd, time()) + dur
                ).date().isoformat()
            except ValueError:
                row["end_date"] = (sd + timedelta(days=1)).isoformat()
        else:
            row["end_date"] = (sd + timedelta(days=1)).isoformat()

    data = {
        k: v
        for k, v in resource.items()
        if k not in ("recurring_event_id", "recurring_event_sequence")
    }
    row["data"] = canonical_json_py(data)
    return {k: v for k, v in row.items() if v is not None or k == "missing_timezone"}


def _to_int(v) -> int | None:
    try:
        return int(str(v).strip('"')) if v is not None else None
    except ValueError:
        return None


def _to_float(v) -> float | None:
    try:
        return float(str(v).strip('"')) if v is not None else None
    except ValueError:
        return None


ICALENDAR_EVENT_V1 = register(
    ReplicatorSpec(
        name="icalendar_event_v1",
        table="icalendar_event_v1",
        # webhook-only; custom message (icalendar_event_v1.rb:376-382)
        supports_backfill=False,
        documentation_url="https://docs.webhookdb.com/guides/icalendar/",
        backfill_not_supported=(
            "iCalendar Event does not support backfilling.\n"
            "See https://docs.webhookdb.com/guides/icalendar/ for "
            "instructions on setting up your integration.\n\n"
            "You can POST 'SYNC' messages to WebhookDB to force-sync a "
            "user's feed,\nthough keep in mind calendar providers only "
            "refresh feeds periodically."
        ),
        remote_key=Col("compound_identity", ColumnType.TEXT),
        denorm_cols=(
            Col("calendar_external_id", ColumnType.TEXT, index=True),
            Col("uid", ColumnType.TEXT, index=True),
            Col("row_updated_at", ColumnType.TIMESTAMP, index=True, defaulter="now"),
            Col("last_modified_at", ColumnType.TIMESTAMP, index=True, optional=True,
                defaulter="now"),
            Col("created_at", ColumnType.TIMESTAMP, optional=True),
            Col("start_at", ColumnType.TIMESTAMP, index=True, optional=True),
            Col("missing_timezone", ColumnType.BOOLEAN, defaulter="tofalse"),
            Col("end_at", ColumnType.TIMESTAMP, index=True, optional=True),
            Col("start_date", ColumnType.DATE, index=True, optional=True),
            Col("end_date", ColumnType.DATE, index=True, optional=True),
            Col("status", ColumnType.TEXT, optional=True),
            Col("categories", ColumnType.TEXT_ARRAY, optional=True),
            Col("priority", ColumnType.INTEGER, optional=True),
            Col("geo_lat", ColumnType.DECIMAL, optional=True),
            Col("geo_lng", ColumnType.DECIMAL, optional=True),
            Col("classification", ColumnType.TEXT, optional=True),
            Col("recurring_event_id", ColumnType.TEXT, optional=True, index=True),
            Col("recurring_event_sequence", ColumnType.INTEGER, optional=True),
        ),
        timestamp_col="last_modified_at",
        # rows arrive pre-shaped with their raw payload under `data`
        data_key="data",
        # data-diff guard: only write when the payload actually changed
        # (icalendar_event_v1.rb:227-234). `data` is canonical JSON.
        update_where=lambda s, t: s("data") != t("data"),
        # partition routing on the calendar, so one calendar's sync
        # touches one bucket (icalendar_event_v1_partitioned.rb)
        partition_key_source="calendar_external_id",
        n_buckets=16,
    )
)


# icalendar_event_v1_partitioned.rb: same columns plus an explicit
# `calendar_external_hash` partition column (str2inthash of the calendar
# id, partitionable_mixin.rb:74-90). Our storage hash-buckets every
# table already, so the parent spec routes identically; this variant
# exists for reference parity and materializes the hash as a column.
ICALENDAR_EVENT_V1_PARTITIONED = register(
    dataclasses.replace(
        ICALENDAR_EVENT_V1,
        name="icalendar_event_v1_partitioned",
        table="icalendar_event_v1_partitioned",
        denorm_cols=(
            *ICALENDAR_EVENT_V1.denorm_cols,
            Col("calendar_external_hash", ColumnType.INTEGER, optional=True,
                defaulter=lambda b: _str2inthash_spark(
                    F.get_json_object(b, "$.calendar_external_id"))),
        ),
        partition_column="calendar_external_hash",
    )
)
