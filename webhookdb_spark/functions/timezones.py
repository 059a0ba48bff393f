"""TZID resolution for calendar feeds.

TZIDs in the wild are not IANA names: Windows/Outlook zone names,
dashed variants (``America-Los_Angeles``), country-prefixed names,
bare offsets (``GMT-0700``), and nonsense. Resolution order mirrors the
reference (lib/webhookdb/timezone.rb:120-175 parse_time_with_tzid):

1. strip ``/`` and ``tzone://`` prefixes; try IANA (also with a leading
   country prefix removed)
2. Windows zone names (common subset of the public CLDR mapping)
3. special-case links (HT_* forms, verbose "Eastern Standard Time"
   style names, "GMT -0500 (Standard) / …" composites)
4. special-case abbreviation offsets (EST/EDT/…)
5. ``(GMT±HH:MM)``-style embedded offsets
6. dash→slash retry, canonical-casing retry, trailing-digit-stripped
   Windows retry

Unresolvable → UTC with ``tz_known=False`` (the missing_timezone flag).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone, tzinfo
from zoneinfo import ZoneInfo, available_timezones

_EASTERN, _CENTRAL = "America/New_York", "America/Chicago"
_MOUNTAIN, _PACIFIC = "America/Denver", "America/Los_Angeles"

# Common Windows → IANA zones (public CLDR windowsZones subset; extend
# as feeds surface more).
WINDOWS_ZONES: dict[str, str] = {
    "UTC": "Etc/UTC",
    "GMT STANDARD TIME": "Europe/London",
    "GREENWICH STANDARD TIME": "Atlantic/Reykjavik",
    "W. EUROPE STANDARD TIME": "Europe/Berlin",
    "CENTRAL EUROPE STANDARD TIME": "Europe/Budapest",
    "CENTRAL EUROPEAN STANDARD TIME": "Europe/Warsaw",
    "ROMANCE STANDARD TIME": "Europe/Paris",
    "E. EUROPE STANDARD TIME": "Europe/Chisinau",
    "FLE STANDARD TIME": "Europe/Kiev",
    "GTB STANDARD TIME": "Europe/Bucharest",
    "RUSSIAN STANDARD TIME": "Europe/Moscow",
    "TURKEY STANDARD TIME": "Europe/Istanbul",
    "ISRAEL STANDARD TIME": "Asia/Jerusalem",
    "ARABIAN STANDARD TIME": "Asia/Dubai",
    "ARAB STANDARD TIME": "Asia/Riyadh",
    "INDIA STANDARD TIME": "Asia/Calcutta",
    "CHINA STANDARD TIME": "Asia/Shanghai",
    "TOKYO STANDARD TIME": "Asia/Tokyo",
    "KOREA STANDARD TIME": "Asia/Seoul",
    "SINGAPORE STANDARD TIME": "Asia/Singapore",
    "AUS EASTERN STANDARD TIME": "Australia/Sydney",
    "AUS CENTRAL STANDARD TIME": "Australia/Darwin",
    "W. AUSTRALIA STANDARD TIME": "Australia/Perth",
    "NEW ZEALAND STANDARD TIME": "Pacific/Auckland",
    "HAWAIIAN STANDARD TIME": "Pacific/Honolulu",
    "ALASKAN STANDARD TIME": "America/Anchorage",
    "PACIFIC STANDARD TIME": _PACIFIC,
    "MOUNTAIN STANDARD TIME": _MOUNTAIN,
    "US MOUNTAIN STANDARD TIME": "America/Phoenix",
    "CENTRAL STANDARD TIME": _CENTRAL,
    "EASTERN STANDARD TIME": _EASTERN,
    "US EASTERN STANDARD TIME": "America/Indiana/Indianapolis",
    "ATLANTIC STANDARD TIME": "America/Halifax",
    "SA PACIFIC STANDARD TIME": "America/Bogota",
    "SA WESTERN STANDARD TIME": "America/La_Paz",
    "E. SOUTH AMERICA STANDARD TIME": "America/Sao_Paulo",
    "ARGENTINA STANDARD TIME": "America/Buenos_Aires",
    "CENTRAL AMERICA STANDARD TIME": "America/Guatemala",
    "MEXICO STANDARD TIME": "America/Mexico_City",
    "CENTRAL STANDARD TIME (MEXICO)": "America/Mexico_City",
    "PACIFIC STANDARD TIME (MEXICO)": "America/Tijuana",
    "SOUTH AFRICA STANDARD TIME": "Africa/Johannesburg",
    "EGYPT STANDARD TIME": "Africa/Cairo",
    "MOROCCO STANDARD TIME": "Africa/Casablanca",
    "W. CENTRAL AFRICA STANDARD TIME": "Africa/Lagos",
    "E. AFRICA STANDARD TIME": "Africa/Nairobi",
}

SPECIAL_CASE_LINKS: dict[str, str] = {
    "HT_ESTL": _EASTERN, "HT_CSTL": _CENTRAL, "HT_MSTL": _MOUNTAIN, "HT_PSTL": _PACIFIC,
    "HT_EST": _EASTERN, "HT_CST": _CENTRAL, "HT_MST": _MOUNTAIN, "HT_PST": _PACIFIC,
    "Yukon Standard Time": "America/Whitehorse",
    # 'standard'/'daylight' are used sloppily; map to the region zone so
    # DST resolves by date rather than trusting the label.
    "Eastern Standard Time": _EASTERN, "Eastern Daylight Time": _EASTERN,
    "Eastern Time": _EASTERN,
    "Central Standard Time": _CENTRAL, "Central Daylight Time": _CENTRAL,
    "Central Time": _CENTRAL,
    "Mountain Standard Time": _MOUNTAIN, "Mountain Daylight Time": _MOUNTAIN,
    "Mountain Time": _MOUNTAIN,
    "Pacific Standard Time": _PACIFIC, "Pacific Daylight Time": _PACIFIC,
    "Pacific Time": _PACIFIC,
    "Pacific Time (US & Canada), Tijuana": "America/Tijuana",
    "GMT -0500 (Standard) / GMT -0400 (Daylight)": _EASTERN,
    "GMT -0600 (Standard) / GMT -0500 (Daylight)": _CENTRAL,
    "GMT -0700 (Standard) / GMT -0600 (Daylight)": _MOUNTAIN,
    "GMT -0800 (Standard) / GMT -0700 (Daylight)": _PACIFIC,
}

SPECIAL_CASE_OFFSETS: dict[str, str] = {
    "EDT": "-04", "EST": "-05", "CDT": "-05", "CST": "-06",
    "MDT": "-06", "MST": "-07", "PDT": "-07", "PST": "-08",
    "Microsoft/Utc": "+00", "(UTC) Coordinated Universal Time": "+00",
}

_GMT_OFFSET_RE = re.compile(r"^\(?(GMT|UTC)([+-]\d\d?:?\d?\d?)")

_CANONICAL: dict[str, str] | None = None


def _canonical_mapping() -> dict[str, str]:
    global _CANONICAL
    if _CANONICAL is None:
        _CANONICAL = {z.replace("-", "_").upper(): z for z in available_timezones()}
    return _CANONICAL


def _zone(name: str) -> tzinfo | None:
    try:
        return ZoneInfo(name)
    except Exception:
        return None


def _offset_tz(spec: str) -> tzinfo | None:
    m = re.match(r"^([+-])(\d\d?):?(\d\d)?$", spec)
    if not m:
        return None
    sign = 1 if m.group(1) == "+" else -1
    hours, minutes = int(m.group(2)), int(m.group(3) or 0)
    return timezone(sign * timedelta(hours=hours, minutes=minutes))


def resolve_tzid(tzid: str) -> tzinfo | None:
    """TZID string → tzinfo, or None if unresolvable."""
    tzid = tzid.strip().removeprefix("/").removeprefix("tzone://")
    z = _zone(tzid) or _zone(re.sub(r"^[A-Z]+ ", "", tzid))
    if z:
        return z
    win = WINDOWS_ZONES.get(tzid.upper())
    if win:
        return _zone(win)
    link = SPECIAL_CASE_LINKS.get(tzid) or SPECIAL_CASE_LINKS.get(
        re.sub(r"[\d\s]+$", "", tzid)
    )
    if link:
        return resolve_tzid(link)
    off = SPECIAL_CASE_OFFSETS.get(tzid)
    if off:
        return _offset_tz(off)
    m = _GMT_OFFSET_RE.match(tzid)
    if m:
        return _offset_tz(m.group(2))
    z = _zone(tzid.replace("-", "/"))
    if z:
        return z
    canonical = _canonical_mapping().get(tzid.replace("-", "_").upper())
    if canonical:
        return _zone(canonical)
    win = WINDOWS_ZONES.get(re.sub(r"\s*\d+$", "", tzid.upper()))
    if win:
        return _zone(win)
    if re.search(r"[A-Za-z]{2}\d\d\d\d$", tzid):
        # malformed TZID lines glue a year on ('America/New_York2025',
        # 'Eastern Standard Time2025') — timezone.rb:177-180
        return resolve_tzid(tzid[:-4])
    return None


def parse_time_with_tzid(value: str, tzid: str) -> tuple[datetime, bool]:
    """ICS local time + TZID → (aware datetime, tz_known)."""
    naive = datetime.strptime(value, "%Y%m%dT%H%M%S")
    tz = resolve_tzid(tzid)
    if tz is None:
        return naive.replace(tzinfo=timezone.utc), False
    return naive.replace(tzinfo=tz), True
