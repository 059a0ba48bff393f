"""iCalendar (RFC 5545) feed parsing.

Semantics mirror the reference's streaming parser
(lib/webhookdb/replicator/icalendar_event_v1.rb:236-343 vevent_to_hash /
_parse_line; icalendar_calendar_v1.rb:655-698 each_feed_event):

- continuation lines (leading whitespace) are unfolded onto the prior line
- a VEVENT becomes ``{PROP: {"v": value, PARAM: pvalue, ...}, ...}``;
  properties that MAY repeat (RFC 5545 §3.6.1) accumulate into lists
- nested components (VALARM etc.) are skipped (depth > 1)
- ``\\n``/``\\t``/``\\r\\n`` escapes are decoded; invalid encodings are
  scrub-replaced
- events without DTSTART+UID are dropped (and reported)

This is per-feed imperative parsing — the one place Python-side code is
the right tool (the reference's is Ruby-side too). It runs distributed
via ``mapInPandas`` over a DataFrame of feeds (see
replicators/icalendar_calendar_v1.py), so 10k feeds parse in parallel
across the cluster rather than 14 h single-threaded
(lib/webhookdb/icalendar.rb:20-23 sizing comment).
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

# RFC 5545 §3.1 content-line grammar.
_NAME = r"[-a-zA-Z0-9]+"
_QSTR = r'"[^"]*"'
_PTEXT = r'[^";:,]*'
_PVALUE = rf"(?:{_QSTR}|{_PTEXT})"
_PARAM = rf"({_NAME})=({_PVALUE}(?:,{_PVALUE})*)"
_LINE_RE = re.compile(rf"(?P<name>{_NAME})(?P<params>(?:;{_PARAM})*):(?P<value>.*)")
_PARAM_RE = re.compile(_PARAM)
_PVALUE_RE = re.compile(_PVALUE)

# Properties that may occur more than once (RFC 5545 §3.6.1).
ARRAY_KEYS = frozenset(
    [
        "ATTACH", "ATTENDEE", "CATEGORIES", "COMMENT", "CONTACT", "EXDATE",
        "RSTATUS", "RELATED", "RESOURCES", "RDATE", "X-PROP", "IANA-PROP",
    ]
)


def unfold_lines(lines: list[str]) -> list[str]:
    """Join folded continuation lines (leading whitespace) onto their
    predecessor."""
    out: list[str] = []
    for line in lines:
        if out and line[:1] in (" ", "\t"):
            out[-1] += line.lstrip()
        else:
            out.append(line)
    return out


def parse_content_line(line: str) -> tuple[str, str | None, dict[str, str]]:
    """``NAME;PARAM=V:value`` → (name, value, params); unparseable lines
    return (line, None, {})."""
    m = _LINE_RE.match(line)
    if m is None:
        return line, None, {}
    params: dict[str, str] = {}
    for pm in _PARAM_RE.finditer(m.group("params") or ""):
        pname = pm.group(1)
        for vv in _PVALUE_RE.findall(pm.group(2)):
            if vv:
                params[pname] = vv.strip('"')
    return m.group("name"), m.group("value"), params


def _decode_value(value: str) -> str:
    value = value.replace("\\r\\n", "\r\n").replace("\\n", "\n").replace("\\t", "\t")
    # scrub invalid sequences so the hash is JSON-serializable
    return value.encode("utf-8", errors="replace").decode("utf-8", errors="replace")


def vevent_to_hash(vevent_lines: list[str]) -> dict:
    """VEVENT lines → property hash (see module docstring)."""
    result: dict = {}
    nest_depth = 0
    for line in unfold_lines(vevent_lines):
        if line.startswith("BEGIN"):
            nest_depth += 1
            continue
        if line.startswith("END"):
            nest_depth -= 1
            continue
        if nest_depth > 1:
            continue
        line = line.strip()
        if not line:
            continue
        name, value, params = parse_content_line(line)
        entry = {"v": _decode_value(value) if value is not None else None}
        entry.update(params)
        if name in ARRAY_KEYS:
            result.setdefault(name, []).append(entry)
        else:
            result[name] = entry
    return result


def each_feed_event(text: str) -> Iterator[dict]:
    """Yield the VEVENT hash for each valid event in an ICS feed.

    Events missing DTSTART or UID are skipped (the reference logs their
    UIDs; callers can count them via :func:`feed_stats`).
    """
    in_vevent = False
    block: list[str] = []
    for raw in text.splitlines():
        line = raw.rstrip()
        if line == "BEGIN:VEVENT":
            in_vevent = True
            block = [line]
        elif line == "END:VEVENT":
            in_vevent = False
            block.append(line)
            h = vevent_to_hash(block)
            block = []
            if "DTSTART" in h and "UID" in h:
                yield h
        elif in_vevent:
            block.append(line)


def feed_hash(text: str) -> str:
    """MD5 of the feed body — the conditional-fetch skip key
    (icalendar_calendar_v1.rb:703-739 feed_changed?)."""
    return hashlib.md5(text.encode("utf-8", errors="replace")).hexdigest()
