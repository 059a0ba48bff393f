"""iCalendar stack conformance: ICS parsing, TZID resolution, RRULE
projection (incl. overrides/exclusions), and the full feed sync with
cancellation sweep + sequence-shrink deletes.

Scenario coverage mirrors the reference specs
(spec/webhookdb/replicator/icalendar_*_spec.rb and the shared examples'
"marks missing rows deleted"): fixtures here are hand-written to hit the
same edge cases (folded lines, dates vs datetimes, TZID forms, DURATION,
EXDATE, RECURRENCE-ID steal, out-of-bounds override).
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta, timezone

from webhookdb_spark.functions.timezones import resolve_tzid
from webhookdb_spark.operators.recurrence import FeedProjector
from webhookdb_spark.replicators.icalendar_calendar_v1 import (
    build_fetch_context,
    feed_changed,
    project_feed,
    sync_feed,
    sync_feeds_distributed,
)
from webhookdb_spark.replicators.icalendar_event_v1 import parse_iso8601_duration
from webhookdb_spark.sources.ics import each_feed_event, parse_content_line, vevent_to_hash
from webhookdb_spark.storage import Warehouse

NOW = datetime(2024, 6, 1, tzinfo=timezone.utc)


def ics(*events: str) -> str:
    body = "\n".join(events)
    return f"BEGIN:VCALENDAR\nVERSION:2.0\n{body}\nEND:VCALENDAR\n"


def vevent(*lines: str) -> str:
    return "BEGIN:VEVENT\n" + "\n".join(lines) + "\nEND:VEVENT"


# -- parsing ---------------------------------------------------------------

def test_parse_content_line_params():
    name, value, params = parse_content_line(
        'DTSTART;TZID=America/New_York;X-FOO="q;uo":20240101T120000'
    )
    assert name == "DTSTART"
    assert value == "20240101T120000"
    assert params == {"TZID": "America/New_York", "X-FOO": "q;uo"}


def test_folded_lines_and_escapes():
    h = vevent_to_hash(
        [
            "BEGIN:VEVENT",
            "UID:u1",
            "SUMMARY:line one",
            " continued line",
            "DESCRIPTION:a\\nb\\tc",
            "END:VEVENT",
        ]
    )
    assert h["SUMMARY"]["v"] == "line onecontinued line"
    assert h["DESCRIPTION"]["v"] == "a\nb\tc"


def test_nested_component_skipped_and_array_keys():
    h = vevent_to_hash(
        [
            "BEGIN:VEVENT",
            "UID:u1",
            "BEGIN:VALARM",
            "TRIGGER:-PT15M",
            "END:VALARM",
            "CATEGORIES:a,b",
            "CATEGORIES:c",
            "END:VEVENT",
        ]
    )
    assert "TRIGGER" not in h
    assert [e["v"] for e in h["CATEGORIES"]] == ["a,b", "c"]


def test_events_without_uid_or_dtstart_dropped():
    feed = ics(
        vevent("UID:good", "DTSTART:20240101"),
        vevent("UID:no-start", "SUMMARY:x"),
        vevent("DTSTART:20240101", "SUMMARY:no-uid"),
    )
    assert [h["UID"]["v"] for h in each_feed_event(feed)] == ["good"]


# -- timezones -------------------------------------------------------------

def test_tzid_resolution_forms():
    assert resolve_tzid("America/New_York") is not None
    assert resolve_tzid("America-Los_Angeles") is not None  # dash form
    assert resolve_tzid("Pacific Standard Time") is not None  # windows
    assert resolve_tzid("GMT-0700") is not None  # offset
    assert resolve_tzid("(UTC-05:00) Eastern Time (US & Canada)") is not None
    assert resolve_tzid("tzone://Microsoft/Utc") is not None
    assert resolve_tzid("utter nonsense zone") is None


def test_duration_parse():
    assert parse_iso8601_duration("PT1H30M") == timedelta(hours=1, minutes=30)
    assert parse_iso8601_duration("P2D") == timedelta(days=2)
    assert parse_iso8601_duration("P1W") == timedelta(weeks=1)


# -- projection ------------------------------------------------------------

def project(feed_text: str, now=NOW):
    rows, seqs = project_feed("cal1", feed_text, now)
    return rows, seqs


def test_non_recurring_passthrough():
    rows, seqs = project(ics(vevent("UID:u1", "DTSTART:20240610T100000Z",
                                    "DTEND:20240610T110000Z", "SUMMARY:hello")))
    assert len(rows) == 1
    r = rows[0]
    assert r["compound_identity"] == "cal1-u1"
    assert r["start_at"] == "2024-06-10T10:00:00Z"
    assert r["end_at"] == "2024-06-10T11:00:00Z"
    assert r["missing_timezone"] is False
    assert seqs == {}


def test_naked_time_flags_missing_timezone():
    rows, _ = project(ics(vevent("UID:u1", "DTSTART:20240610T100000")))
    assert rows[0]["missing_timezone"] is True
    assert rows[0]["start_at"] == "2024-06-10T10:00:00Z"
    # implicit end for times: = start (icalendar_event_v1.rb:199-206)
    assert rows[0]["end_at"] == rows[0]["start_at"]


def test_date_event_implicit_end_next_day():
    rows, _ = project(ics(vevent("UID:u1", "DTSTART:20240610")))
    assert rows[0]["start_date"] == "2024-06-10"
    assert rows[0]["end_date"] == "2024-06-11"


def test_tzid_event_converts_to_utc():
    rows, _ = project(
        ics(vevent("UID:u1", "DTSTART;TZID=America/New_York:20240110T090000"))
    )
    assert rows[0]["start_at"] == "2024-01-10T14:00:00Z"  # EST = UTC-5
    assert rows[0]["missing_timezone"] is False


def test_rrule_count_expansion_sequences_and_uids():
    rows, seqs = project(
        ics(vevent("UID:u1", "DTSTART:20240601T100000Z", "DTEND:20240601T110000Z",
                   "RRULE:FREQ=DAILY;COUNT=5"))
    )
    assert len(rows) == 5
    assert [r["uid"] for r in rows] == [f"u1-{i}" for i in range(5)]
    assert [r["recurring_event_sequence"] for r in rows] == list(range(5))
    assert rows[2]["start_at"] == "2024-06-03T10:00:00Z"
    assert rows[2]["end_at"] == "2024-06-03T11:00:00Z"
    assert all(r["recurring_event_id"] == "u1" for r in rows)
    assert seqs == {"u1": 4}


def test_rrule_exdate_removed_without_consuming_sequence():
    rows, _ = project(
        ics(vevent("UID:u1", "DTSTART:20240601T100000Z",
                   "RRULE:FREQ=DAILY;COUNT=4", "EXDATE:20240602T100000Z"))
    )
    # ice_cube removes extimes from enumeration: sequences stay dense
    assert [r["start_at"] for r in rows] == [
        "2024-06-01T10:00:00Z", "2024-06-03T10:00:00Z", "2024-06-04T10:00:00Z",
    ]
    assert [r["recurring_event_sequence"] for r in rows] == [0, 1, 2]


def test_rrule_five_year_horizon_emits_first_past():
    rows, _ = project(
        ics(vevent("UID:u1", "DTSTART:20240601T100000Z", "RRULE:FREQ=YEARLY"))
    )
    # horizon = now+5y (2029-06-01); the first occurrence past it is
    # still emitted, then enumeration stops
    years = [r["start_at"][:4] for r in rows]
    assert years == ["2024", "2025", "2026", "2027", "2028", "2029"]


def test_rrule_weekly_bymonthday_sanitized():
    rows, _ = project(
        ics(vevent("UID:u1", "DTSTART:20240601T100000Z",
                   "RRULE:FREQ=WEEKLY;COUNT=3;BYMONTHDAY=4"))
    )
    # BYMONTHDAY dropped → plain weekly
    assert [r["start_at"][:10] for r in rows] == ["2024-06-01", "2024-06-08", "2024-06-15"]


def test_recurrence_override_steals_identity():
    feed = ics(
        vevent("UID:u1", "DTSTART:20240601T100000Z",
               "LAST-MODIFIED:20240101T000000Z", "RRULE:FREQ=DAILY;COUNT=3",
               "SUMMARY:series"),
        vevent("UID:u1", "RECURRENCE-ID:20240602T100000Z",
               "DTSTART:20240602T150000Z", "LAST-MODIFIED:20240101T000000Z",
               "SUMMARY:moved"),
    )
    rows, _ = project(feed)
    assert len(rows) == 4
    override = rows[3]
    # stole the projected occurrence's UID + sequence
    assert override["uid"] == "u1-1"
    assert override["recurring_event_sequence"] == 1
    assert override["start_at"] == "2024-06-02T15:00:00Z"
    # LAST-MODIFIED bumped 1s past the original so it wins the upsert
    assert override["last_modified_at"] == "2024-01-01T00:00:01Z"


def test_out_of_bounds_override_appends_sequence():
    feed = ics(
        vevent("UID:u1", "DTSTART:20240601T100000Z",
               "RRULE:FREQ=DAILY;COUNT=2;UNTIL=20240602T000000Z"),
        vevent("UID:u1", "RECURRENCE-ID:20240901T100000Z",
               "DTSTART:20240901T100000Z", "SUMMARY:outside"),
    )
    rows, seqs = project(feed)
    outside = rows[-1]
    assert outside["recurring_event_sequence"] == len(rows) - 1
    assert outside["recurring_event_id"] == "u1"
    assert seqs["u1"] == outside["recurring_event_sequence"]


def test_geo_categories_priority_extraction():
    rows, _ = project(
        ics(vevent("UID:u1", "DTSTART:20240610", "GEO:45.5;-122.6",
                   "CATEGORIES:Work,Home", "CATEGORIES:Other", "PRIORITY:3",
                   "STATUS:CONFIRMED", "CLASS:PUBLIC"))
    )
    r = rows[0]
    assert r["geo_lat"] == 45.5 and r["geo_lng"] == -122.6
    assert r["categories"] == ["Work", "Home", "Other"]
    assert r["priority"] == 3 and r["status"] == "CONFIRMED"
    assert r["classification"] == "PUBLIC"


def test_feed_changed_conditional_fetch():
    text = ics(vevent("UID:u1", "DTSTART:20240610"))
    ctx = build_fetch_context(text)
    assert feed_changed(None, text) is True
    assert feed_changed(ctx, text) is False
    assert feed_changed(ctx, text + " ") is True


# -- end-to-end feed sync ---------------------------------------------------

def test_sync_feed_upsert_cancel_and_shrink(spark, tmp_warehouse):
    wh = Warehouse(spark, tmp_warehouse / "wh")
    feed1 = ics(
        vevent("UID:solo", "DTSTART:20240610T100000Z", "SUMMARY:one"),
        vevent("UID:ser", "DTSTART:20240601T100000Z", "RRULE:FREQ=DAILY;COUNT=4"),
    )
    res = sync_feed(spark, wh, "org1", "cal1", feed1, NOW)
    assert res.inserted == 5  # 1 solo + 4 occurrences
    table = wh.table("org1", "icalendar_event_v1")
    assert table.read().count() == 5

    # second sync: solo gone (→ CANCELLED), series shrunk to 2 (→ extra
    # rows deleted), one occurrence modified
    feed2 = ics(
        vevent("UID:ser", "DTSTART:20240601T100000Z", "RRULE:FREQ=DAILY;COUNT=2"),
    )
    sync_feed(spark, wh, "org1", "cal1", feed2, NOW + timedelta(days=1))
    rows = {r["uid"]: r for r in table.read().collect()}
    assert rows["solo"]["status"] == "CANCELLED"
    assert "ser-2" not in rows and "ser-3" not in rows  # shrink delete
    assert {"ser-0", "ser-1"} <= set(rows)
    # idempotent re-sync: data unchanged → no writes
    res3 = sync_feed(spark, wh, "org1", "cal1", feed2, NOW + timedelta(days=2))
    assert res3.updated == 0 and res3.inserted == 0


def test_sync_feeds_distributed(spark, tmp_warehouse):
    wh = Warehouse(spark, tmp_warehouse / "wh2")
    feeds = spark.createDataFrame(
        [
            ("calA", ics(vevent("UID:a1", "DTSTART:20240610T100000Z"))),
            ("calB", ics(vevent("UID:b1", "DTSTART:20240601T100000Z",
                                "RRULE:FREQ=DAILY;COUNT=3"))),
        ],
        "calendar_external_id string, ics_text string",
    )
    res = sync_feeds_distributed(spark, wh, "org1", feeds, NOW)
    assert res.inserted == 4
    table = wh.table("org1", "icalendar_event_v1")
    got = {r["compound_identity"] for r in table.read().collect()}
    assert got == {"calA-a1", "calB-b1-0", "calB-b1-1", "calB-b1-2"}


def test_sweep_rewrites_only_touched_buckets(spark, tmp_warehouse):
    """Bucket pruning in the cancellation sweep: a one-calendar sync
    against a multi-calendar table must rewrite ONLY the bucket owning
    that calendar (partitionable_mixin.rb:49-54 routing), leaving every
    other bucket's data directory untouched."""
    from webhookdb_spark.functions.converters import str2inthash_py

    wh = Warehouse(spark, tmp_warehouse / "wh3")
    table = wh.table("org1", "icalendar_event_v1")
    # seed many calendars so several buckets are populated
    cal_ids = [f"cal{i}" for i in range(8)]
    feeds = spark.createDataFrame(
        [(c, ics(vevent(f"UID:{c}-ev", "DTSTART:20240610T100000Z"))) for c in cal_ids],
        "calendar_external_id string, ics_text string",
    )
    sync_feeds_distributed(spark, wh, "org1", feeds, NOW)
    before = dict(table.manifest.buckets)
    n_buckets = table.manifest.n_buckets
    target = cal_ids[0]
    target_bucket = str(str2inthash_py(target) % n_buckets)

    # re-sync ONE calendar with a changed feed (event removed → sweep)
    sync_feed(spark, wh, "org1", target, ics(
        vevent(f"UID:{target}-other", "DTSTART:20240611T100000Z")
    ), NOW + timedelta(days=1))
    after = dict(table.manifest.buckets)
    changed = {b for b in after if after[b] != before.get(b)}
    assert changed == {target_bucket}, (changed, target_bucket)
    # and the sweep actually ran: the removed event is CANCELLED
    rows = {r["uid"]: r for r in table.read().collect()}
    assert rows[f"{target}-ev"]["status"] == "CANCELLED"
    assert rows["cal1-ev"]["status"] != "CANCELLED"


def test_marker_literal_in_payload_not_misrouted(spark, tmp_warehouse):
    """An event whose SUMMARY contains the literal ``__marker__`` must
    ingest as a normal event — marker rows are routed by the _seq == -1
    sentinel, never by body content."""
    wh = Warehouse(spark, tmp_warehouse / "wh4")
    feeds = spark.createDataFrame(
        [("calM", ics(vevent("UID:m1", "DTSTART:20240610T100000Z",
                             "SUMMARY:contains __marker__ literal")))],
        "calendar_external_id string, ics_text string",
    )
    res = sync_feeds_distributed(spark, wh, "org1", feeds, NOW)
    assert res.inserted == 1
    rows = wh.table("org1", "icalendar_event_v1").read().collect()
    assert len(rows) == 1
    assert "contains __marker__ literal" in rows[0]["data"]
    assert rows[0]["compound_identity"] == "calM-m1"


def test_delete_calendar_cascade(spark, tmp_warehouse):
    """DELETE webhook: calendar row + its events vanish; other
    calendars untouched (icalendar_calendar_v1.rb:119-153)."""
    from webhookdb_spark.replicators.icalendar_calendar_v1 import (
        delete_calendar_cascade,
        sync_feed,
    )
    from webhookdb_spark.storage import Warehouse

    ics = """BEGIN:VCALENDAR
BEGIN:VEVENT
UID:ev-1
DTSTART:20240101T100000Z
DTEND:20240101T110000Z
SUMMARY:One
END:VEVENT
END:VCALENDAR
"""
    wh = Warehouse(spark, str(tmp_warehouse))
    for cal_id in ("cal-a", "cal-b"):
        sync_feed(spark, wh, "org", cal_id, ics)
    ev = wh.table("org", "icalendar_event_v1")
    assert ev.read().count() == 2

    deleted = delete_calendar_cascade(wh, "org", "cal-a")
    assert deleted["icalendar_event_v1"] == 1
    rows = ev.read().collect()
    assert len(rows) == 1 and rows[0].calendar_external_id == "cal-b"
    cal = wh.table("org", "icalendar_calendar_v1")
    if deleted.get("icalendar_calendar_v1"):
        assert all(r.external_id != "cal-a" for r in cal.read().collect())


def test_timezone_spec_golden_vectors():
    """spec/webhookdb/timezone_spec.rb:20-181 — every parse_time_with_tzid
    vector the reference pins, replayed with ICS-compact values: IANA /
    dashed / country-prefixed names, Windows zones (case, whitespace,
    trailing digits), bare and named offsets, special-case links and
    abbreviations, standard/daylight composites, canonical-casing
    retries, Etc/GMT sign inversion, trailing-year strips, and the
    nonsense classes that must fall back to UTC with tz_known=False."""
    from webhookdb_spark.functions.timezones import parse_time_with_tzid

    TS, SUMMER = "20000101T120000", "20000701T120000"
    # (value, tzid, expected_utc_offset, expected_tz_known)
    V = [
    (TS, "America/New_York", "-05:00", True),
    (TS, "America-New_York", "-05:00", True),
    (TS, "SA Western Standard Time", "-04:00", True),
    (TS, " SA Western Standard Time\t", "-04:00", True),
    (TS, "sa western standard time", "-04:00", True),
    (TS, "SA Western Standard Time 1", "-04:00", True),
    (TS, " SA Western Standard Time\t  20  ", "-04:00", True),
    (TS, "sa western standard time 2", "-04:00", True),
    (TS, "GMT-0500", "-05:00", True),
    (TS, "GMT-06:00", "-06:00", True),
    (TS, "UTC-0500", "-05:00", True),
    (TS, "UTC+0500", "+05:00", True),
    (TS, "UTC-05", "-05:00", True),
    (TS, "(UTC-07:00) Arizona", "-07:00", True),
    (TS, "(UTC+05:30) Chennai, Kolkata, Mumbai, New Delhi", "+05:30", True),
    (TS, "(UTC+00:00) Dublin, Edinburgh, Lisbon, London", "+00:00", True),
    (TS, "EST", "-05:00", True),
    (TS, "EDT", "-04:00", True),
    (TS, "Yukon Standard Time", "-08:00", True),
    (TS, "(UTC) Coordinated Universal Time", "+00:00", True),
    (TS, "Eastern Standard Time", "-05:00", True),
    (TS, "Eastern Standard Time 1", "-05:00", True),
    (SUMMER, "Eastern Standard Time", "-04:00", True),
    (TS, "Eastern Time", "-05:00", True),
    (TS, "Pacific Time (US & Canada), Tijuana", "-08:00", True),
    (TS, "GMT -0800 (Standard) / GMT -0700 (Daylight)", "-08:00", True),
    (SUMMER, "GMT -0800 (Standard) / GMT -0700 (Daylight)", "-07:00", True),
    (TS, "America/Blanc-Sablon", "-04:00", True),
    (TS, "America/Blanc-sablon", "-04:00", True),
    (TS, "America/blanc-SABLON", "-04:00", True),
    (TS, "Etc/GMT", "+00:00", True),
    (TS, "Etc/Universal", "+00:00", True),
    (TS, "Etc/GMT-2", "+02:00", True),
    (TS, "Etc/GMT-0", "+00:00", True),
    (TS, "Etc/GMT+1", "-01:00", True),
    (TS, "Etc/GMT+11", "-11:00", True),
    (TS, "c3566dec-0958-48d5-8c80-57fb6274ccb2", "+00:00", False),
    (TS, "Customized Time Zone 1", "+00:00", False),
    (TS, "Customized Time Zone", "+00:00", False),
    (TS, "1", "+00:00", False),
    (TS, "tzone://Microsoft/Utc", "+00:00", True),
    (TS, "tzone://Microsoft/Custom", "+00:00", False),
    (TS, "/America/Los_Angeles", "-08:00", True),
    (TS, "Eastern Standard Time2025", "-05:00", True),
    (TS, "America/New_York2025", "-05:00", True),
    (TS, "GMT", "+00:00", True),
    (TS, "UTC", "+00:00", True),
    (TS, "Singapore Standard Time", "+08:00", True),
    (SUMMER, "Central Daylight Time", "-05:00", True),
    (TS, "AUS Eastern Standard Time", "+11:00", True),
    (SUMMER, "AUS Eastern Standard Time", "+10:00", True),
    (TS, "GMT Standard Time", "+00:00", True),
    (TS, "Greenwich Standard Time", "+00:00", True),
    (TS, "US Eastern Standard Time", "-05:00", True),
    (TS, "US America/New_York", "-05:00", True),
    (TS, "AUS America/New_York", "-05:00", True),
    (TS, "invalid-tz", "+00:00", False),
    (TS, "", "+00:00", False),
]
    for value, tzid, off, known in V:
        t, k = parse_time_with_tzid(value, tzid)
        assert t.strftime("%z") == off.replace(":", ""), (tzid, t)
        assert k == known, (tzid, k)


def test_rows_needing_sync_and_noop_gate(spark):
    """icalendar_calendar_v1.rb:135-138 + 175-188: the periodic-sync
    selection (never-synced OR older than the 6h period,
    icalendar.rb:23) and the sync job's re-check gate that makes the
    enqueue job's duplicates noop."""
    import datetime as dt

    from webhookdb_spark.replicators.icalendar_calendar_v1 import (
        rows_needing_sync,
        should_sync,
    )

    now = dt.datetime(2026, 1, 1, 12, 0)
    df = spark.createDataFrame(
        [("never", None),
         ("stale", now - dt.timedelta(hours=7)),
         ("fresh", now - dt.timedelta(hours=5))],
        "external_id string, last_synced_at timestamp",
    )
    due = sorted(r.external_id for r in rows_needing_sync(df, now).collect())
    assert due == ["never", "stale"]

    assert should_sync(None, now)
    assert should_sync(now - dt.timedelta(hours=7), now)
    assert not should_sync(now - dt.timedelta(hours=5), now)
    assert should_sync(now - dt.timedelta(hours=5), now, force=True)
