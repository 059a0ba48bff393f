"""Isomorphic converter library.

The reference declares every scalar converter twice — a Ruby proc and a
SQL expression (``IsomorphicProc``, lib/webhookdb/replicator/column.rb:9-13) —
so values can be derived at ingest time *and* re-derived in-database when
backfilling a new column. The Spark-native equivalent of that split is:

- ``spark``: a builder returning a native :class:`pyspark.sql.Column`
  expression (JVM-side, whole-stage-codegen friendly — never a Python UDF
  in the hot path), used both at ingest and for schema-evolution backfill.
- ``sql``: the equivalent ANSI/DuckDB SQL expression string. A converter
  with ``sql=None`` is not SQL-backfillable, matching the reference's
  ``NOT_IMPLEMENTED`` marker (column.rb:441-447).

Semantics ported from lib/webhookdb/replicator/column.rb:16-264 (cited
per-converter below). Cross-language parity for ``CONV_STR2HASH`` is
pinned by the reference's test vectors
(spec/data/str2hashconv_spec.json, 2103 cases — see tests).
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

SparkBuilder = Callable[[Column], Column]
SqlBuilder = Callable[[str], str]


@dataclass(frozen=True)
class Converter:
    """A dual-implementation scalar converter (Column expr + SQL expr)."""

    name: str
    spark: SparkBuilder
    sql: SqlBuilder | None = None
    # The scalar expression leaves NULL where the integration sequence
    # must supply the value; the upsert path fills those NULLs from
    # IntegrationSequence (the reference's requires_sequence contract,
    # column.rb:132-152 + base.rb:689-699).
    needs_sequence: bool = False

    @property
    def backfillable(self) -> bool:
        """Whether the column can be re-derived purely in SQL.

        Mirrors the reference's NOT_IMPLEMENTED handling
        (column.rb:441-447): the Spark engine can always backfill via the
        ``spark`` builder, but the bit is kept for API parity/reporting.
        """
        return self.sql is not None


# ---------------------------------------------------------------------------
# Static converters (column.rb:16-90)
# ---------------------------------------------------------------------------

# column.rb:16-28 — fractional unix seconds → timestamp; bad input → NULL.
CONV_UNIX_TS = Converter(
    name="unix_ts",
    spark=lambda c: F.timestamp_seconds(c.try_cast("double")),
    sql=lambda c: f"to_timestamp(TRY_CAST({c} AS DOUBLE))",
)

# column.rb:30-33 — strip surrounding double quotes, parse integer.
CONV_TO_I = Converter(
    name="to_i",
    spark=lambda c: F.regexp_replace(c.cast("string"), '^"|"$', "").try_cast("long"),
    sql=lambda c: f"TRY_CAST(regexp_replace(CAST({c} AS VARCHAR), '^\"|\"$', '', 'g') AS BIGINT)",
)

# column.rb:35-42 — timestamptz → date in UTC (session TZ is UTC).
CONV_TO_UTC_DATE = Converter(
    name="to_utc_date",
    spark=lambda c: F.to_date(c.try_cast("timestamp")),
    sql=lambda c: f"CAST({c} AS DATE)",
)

# Ruby Time.zone_offset's named-zone table (ruby/lib/time.rb ZoneOffset),
# the zones Time.parse resolves without a numeric offset. The reference's
# own fixtures exercise PST (atom_single_feed_v1_spec.rb:16 pins
# 'Fri, 9 Jun 2023 17:40:38 PST' → 2023-06-10 01:40:38Z) and a trailing
# '(UTC)' comment (postmark_inbound_message_v1_spec.rb:137 pins
# 'Wed, 05 Jul 2023 22:27:31 +0000 (UTC)' → 2023-07-05T22:27:31Z).
# Military single letters are omitted: no reference surface emits them
# and a bare trailing letter is more likely data than a zone.
_RFC2822_ZONES = {
    "UTC": "+0000", "UT": "+0000", "GMT": "+0000", "Z": "+0000",
    "EST": "-0500", "EDT": "-0400", "CST": "-0600", "CDT": "-0500",
    "MST": "-0700", "MDT": "-0600", "PST": "-0800", "PDT": "-0700",
}


def _rfc2822_normalize(c: Column) -> Column:
    """Reduce the RFC-2822 variants Ruby ``Time.parse`` accepts to the one
    shape ``d MMM yyyy HH:mm:ss ±HHMM`` Java's formatter can take: strip
    the weekday prefix (Spark rejects 'EEE' on input) and any trailing
    parenthesized comment, fold a colon offset (``-04:00``) to ``-0400``,
    and substitute named zones from the Ruby table above. Pure
    regexp/map Column ops — stays inside whole-stage codegen."""
    x = F.regexp_replace(c, r"^[A-Za-z]{3},\s*", "")
    x = F.regexp_replace(x, r"\s*\([A-Za-z]+\)\s*$", "")
    x = F.regexp_replace(x, r"([+-]\d{2}):(\d{2})\s*$", "$1$2")
    named = F.create_map(
        *[F.lit(s) for kv in _RFC2822_ZONES.items() for s in kv]
    )
    off = named[F.upper(F.regexp_extract(x, r"\s([A-Za-z]{1,3})\s*$", 1))]
    return F.when(
        off.isNotNull(),
        F.concat(F.regexp_replace(x, r"\s[A-Za-z]{1,3}\s*$", " "), off),
    ).otherwise(x)


# column.rb:44-47 — permissive time parse; unparseable → NULL.
CONV_PARSE_TIME = Converter(
    name="parse_time",
    # Ruby Time.parse is permissive: ISO-8601 AND RFC-2822
    # ("Mon, 16 Aug 2010 03:45:01 +0000", Twilio's format) both parse,
    # including single-digit days, colon offsets, '(UTC)' comments, and
    # named zones — golden-pinned against the reference's own postmark
    # and atom fixtures in tests/test_golden_payloads.py.
    spark=lambda c: F.coalesce(
        F.try_to_timestamp(c),
        F.try_to_timestamp(
            _rfc2822_normalize(c), F.lit("d MMM yyyy HH:mm:ss Z")
        ),
        F.try_to_timestamp(_rfc2822_normalize(c), F.lit("d MMM yyyy HH:mm Z")),
    ),
    # The reference's SQL (backfill) side is a plain cast
    # (column.rb:46: Sequel.cast(i, :timestamptz)); mirror that shape.
    sql=lambda c: f"TRY_CAST({c} AS TIMESTAMP)",
)

# column.rb:50-53 — permissive date parse.
CONV_PARSE_DATE = Converter(
    name="parse_date",
    spark=lambda c: F.try_to_timestamp(c).cast("date"),
    sql=lambda c: f"TRY_CAST({c} AS DATE)",
)

# column.rb:55-67 — comma-separated string → trimmed text[].
CONV_COMMA_SEP = Converter(
    name="comma_sep",
    spark=lambda c: F.when(
        c.isNotNull(), F.transform(F.split(c, ","), lambda x: F.trim(x))
    ),
    sql=lambda c: f"list_transform(string_split({c}, ','), x -> trim(x, ' '))",
)

# transistor_episode_stats_v1.rb:25-33 — 'DD-MM-YYYY' → date.
CONV_PARSE_DMY_DASH = Converter(
    name="parse_dmy_dash",
    spark=lambda c: F.to_date(c, "dd-MM-yyyy"),
    sql=lambda c: f"strptime({c}, '%d-%m-%Y')::DATE",
)


# ---------------------------------------------------------------------------
# str2inthash — the partition-key hash (column.rb:69-90,
# partitionable_mixin.rb:74-90). Pinned by spec/data/str2hashconv_spec.json:
#   (int(md5(coalesce(s,''))[0:9], 16) & 0xFFFFFFFF) - 2**31  → int32
# Note the NINE hex chars (`[..8]` is inclusive in Ruby).
# ---------------------------------------------------------------------------

def str2inthash_py(s: str | None) -> int:
    """Driver-side reference implementation (for routing predicates)."""
    digest = hashlib.md5((s or "").encode("utf-8")).hexdigest()
    return (int(digest[:9], 16) & 0xFFFFFFFF) - 2**31


def _str2inthash_spark(c: Column) -> Column:
    unsigned = F.conv(F.substring(F.md5(F.coalesce(c, F.lit(""))), 1, 9), 16, 10).cast(
        "long"
    )
    return ((unsigned.bitwiseAND(F.lit(0xFFFFFFFF))) - F.lit(2**31)).cast("int")


CONV_STR2HASH = Converter(
    name="str2inthash",
    spark=_str2inthash_spark,
    sql=lambda c: (
        "CAST((CAST(CAST(('0x' || substr(md5(coalesce(CAST({c} AS VARCHAR), '')), 1, 9)) AS UBIGINT) AS BIGINT) "
        "& 4294967295) - 2147483648 AS INTEGER)"
    ).format(c=c),
)


# ---------------------------------------------------------------------------
# Converter factories (column.rb:95-264)
# ---------------------------------------------------------------------------

def converter_from_regex(
    pattern: str, *, dbtype: str = "string", group: int = 1
) -> Converter:
    """First capture group of ``pattern``; empty match → NULL; optional cast.

    column.rb:95-130.
    """

    def spark(c: Column) -> Column:
        out = F.nullif(F.regexp_extract(c, pattern, group), F.lit(""))
        return out if dbtype == "string" else out.try_cast(dbtype)

    def sql(c: str) -> str:
        out = f"nullif(regexp_extract({c}, '{pattern}', {group}), '')"
        return out if dbtype == "string" else f"TRY_CAST({out} AS {dbtype.upper()})"

    return Converter(name=f"from_regex({pattern!r})", spark=spark, sql=sql)


def converter_int_or_sequence_from_regex(
    pattern: str, *, dbtype: str = "bigint", group: int = 1
) -> Converter:
    """Extract an integer with ``pattern``; when nothing matches, draw
    the next value from the integration sequence (column.rb:132-152;
    exercised by fake.rb:368-380).

    Used where an API sends the ID only in a request URL, and the URL
    carries no ID on first delivery. The scalar expression is the regex
    extraction; the sequence branch is a DataFrame-level fill in the
    upsert path (``needs_sequence``), because it requires persisted
    per-integration state no scalar expression can carry. ``sql`` is
    None, matching the reference's NOT_IMPLEMENTED — the column is not
    SQL-backfillable (sequence values are not re-derivable).
    """
    base = converter_from_regex(pattern, dbtype=dbtype, group=group)
    return Converter(
        name=f"int_or_sequence_from_regex({pattern!r})",
        spark=base.spark,
        sql=None,
        needs_sequence=True,
    )


_STRPTIME_TO_JAVA = [
    ("%Y", "yyyy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%z", "XX"),
    ("%Z", "zz"),
]


def _strptime_java(fmt: str) -> str:
    for a, b in _STRPTIME_TO_JAVA:
        fmt = fmt.replace(a, b)
    return fmt


def converter_strptime(fmt: str, *, dbtype: str = "timestamp") -> Converter:
    """Parse with a strptime-style format; optionally cast to date.

    column.rb:154-174. ``fmt`` uses strptime directives; translated to a
    Java DateTimeFormatter pattern for Spark and kept as-is for DuckDB.
    """
    jfmt = _strptime_java(fmt)

    def spark(c: Column) -> Column:
        ts = F.to_timestamp(c, jfmt)
        return ts.cast("date") if dbtype == "date" else ts

    def sql(c: str) -> str:
        out = f"strptime({c}, '{fmt}')"
        return f"CAST({out} AS DATE)" if dbtype == "date" else f"CAST({out} AS TIMESTAMP)"

    return Converter(name=f"strptime({fmt!r})", spark=spark, sql=sql)


def converter_gsub(pattern: str, replacement: str) -> Converter:
    """Global regex replace. column.rb:176-186 (e.g. ^webcal → https)."""
    return Converter(
        name=f"gsub({pattern!r})",
        spark=lambda c: F.regexp_replace(c, pattern, replacement),
        sql=lambda c: f"regexp_replace({c}, '{pattern}', '{replacement}', 'g')",
    )


def converter_array_element(
    *, index: int, sep: str, dbtype: str = "decimal(38,18)"
) -> Converter:
    """Split a string, pick element ``index``, '' → NULL, cast.

    column.rb:188-215 — used for GEO "lat;lng" (icalendar_event_v1.rb:98-99)
    and georss "lat lng" (atom_single_feed_v1.rb:25-26). Strips surrounding
    double quotes before splitting, as the reference does.
    """
    sep_re = re.escape(sep)

    def spark(c: Column) -> Column:
        parts = F.split(F.regexp_replace(c, '^"|"$', ""), sep_re)
        return F.nullif(F.try_element_at(parts, F.lit(index + 1)), F.lit("")).try_cast(dbtype)

    def sql(c: str) -> str:
        parts = f"string_split(regexp_replace({c}, '^\"|\"$', '', 'g'), '{sep}')"
        return f"TRY_CAST(nullif({parts}[{index + 1}], '') AS {dbtype.upper()})"

    return Converter(name=f"array_element[{index}]", spark=spark, sql=sql)


def converter_array_pluck(key: str, *, dbtype: str = "bigint") -> Converter:
    """``[{k: v, ...}, ...]`` JSON → ``[v, ...]``.

    column.rb:217-232 (jsonb_to_recordset + array_agg); used by
    github_issue_v1.rb:56-75 for assignee/label ids.
    """
    schema = f"array<struct<{key}:{dbtype}>>"

    def spark(c: Column) -> Column:
        return F.transform(F.from_json(c, schema), lambda x: x[key])

    def sql(c: str) -> str:
        return (
            f"list_transform(CAST({c} AS JSON)::STRUCT(\"{key}\" {dbtype.upper()})[], "
            f"x -> x.\"{key}\")"
        )

    return Converter(name=f"array_pluck({key!r})", spark=spark, sql=sql)


def converter_map_lookup(mapping: dict, *, default_passthrough: bool = True) -> Converter:
    """Map values through a lookup table, passing through on miss.

    column.rb:244-264 — the reference marks the SQL side NOT_IMPLEMENTED,
    so this converter is not SQL-backfillable (``sql=None``).
    """
    frozen = tuple(mapping.items())

    def spark(c: Column) -> Column:
        # literals built lazily — specs declare converters at import
        # time, before any SparkContext exists (same pattern as
        # converter_map_lookup_array below)
        lookup = F.create_map(
            *[F.lit(x) for kv in frozen for x in kv]
        )
        hit = F.element_at(lookup, c)
        return F.coalesce(hit, c) if default_passthrough else hit

    return Converter(name="map_lookup", spark=spark, sql=None)


def converter_map_lookup_array(
    mapping: dict, *, value_type: str = "int", default_passthrough: bool = True
) -> Converter:
    """Array form of map_lookup (column.rb:244-264 with ``array: true``):
    each element of a JSON array is looked up; misses pass through.

    Keys are matched as strings (JSON scalars arrive as text), so an
    int-keyed map like sponsy_publication_v1.rb's day-number→name table
    works on numeric payloads too.
    """
    frozen = tuple(mapping.items())

    def spark(c: Column) -> Column:
        # build literals lazily — specs are declared at import time,
        # before any SparkContext exists
        pairs: list[Column] = []
        for k, v in frozen:
            pairs.append(F.lit(str(k)))
            pairs.append(F.lit(v))
        lookup = F.create_map(*pairs)
        elems = F.from_json(c, "array<string>")
        return F.transform(
            elems,
            (lambda x: F.coalesce(F.element_at(lookup, x), x.try_cast(value_type)))
            if default_passthrough
            else (lambda x: F.element_at(lookup, x)),
        )

    return Converter(name="map_lookup_array", spark=spark, sql=None)


# ---------------------------------------------------------------------------
# JSON canonicalization / NUL handling (base.rb:793-811; SURVEY §7 JSONB
# equality). jsonb is key-order-insensitive and cannot store NUL; we
# store `data` as canonical JSON text (sorted keys, NULs stripped) so
# string equality == jsonb equality.
# ---------------------------------------------------------------------------

_ENCODED_NUL_RE = re.compile(r"(?<!\\)((?:\\\\)*)\\u0000")


def strip_encoded_nuls(json_text: str) -> str:
    """Remove encoded ``\\u0000`` sequences, preserving escaped ones.

    base.rb:793-811: jsonb cannot contain NULs; the encoder strips encoded
    NULs (an even number of preceding backslashes ⇒ the \\u0000 is a real
    escape sequence and is dropped) but leaves escaped ones (odd number of
    preceding backslashes ⇒ the text "\\u0000" literal survives).
    """
    return _ENCODED_NUL_RE.sub(r"\1", json_text)


def canonical_json_py(obj) -> str:
    """Driver/UDF-side canonical JSON: sorted keys, compact separators."""
    import json

    return strip_encoded_nuls(
        json.dumps(obj, sort_keys=True, separators=(",", ":"), ensure_ascii=False, default=str)
    )


# intercom_v1_mixin.rb:7-18 — payloads carry unix seconds in some API
# versions and ISO strings in others; handle both. SQL side is
# NOT_IMPLEMENTED in the reference (backfillable=False parity).
CONV_QUESTIONABLE_TS = Converter(
    name="questionable_ts",
    spark=lambda c: F.when(
        c.cast("string").rlike(r"^\d+(\.\d+)?$"),
        F.timestamp_seconds(c.try_cast("double")),
    ).otherwise(F.to_timestamp(c)),
    sql=None,
)


def json_drop_keys_udf(*keys: str):
    """Pandas UDF factory: remove top-level keys from a JSON-object
    string, nested values preserved verbatim (the `-` jsonb operator /
    the reference's _resource_to_data key-stripping). NULLs and
    non-objects pass through. A UDF for the same reason as
    :func:`json_merge_udf` — native map<string,string> round-trips
    cannot preserve nested values."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    drop = set(keys)

    def strip(col):
        import json as _json

        out = []
        for x in col:
            if x is None:
                out.append(None)
                continue
            try:
                d = _json.loads(x)
                if not isinstance(d, dict):
                    out.append(x)
                    continue
                out.append(_json.dumps(
                    {k: v for k, v in d.items() if k not in drop},
                    separators=(",", ":"),
                ))
            except (ValueError, TypeError):
                out.append(x)
        return pd.Series(out, dtype="object")

    return pandas_udf(strip, "string")


def json_merge_udf():
    """Pandas UDF: shallow merge of two JSON-object strings, right keys
    winning; NULL on either side passes the other through. Matches
    Postgres jsonb ``||`` (base.rb:948-949) — a UDF because a faithful
    merge must preserve nested values verbatim, which native
    map<string,string> round-trips cannot."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def merge(a, b):
        import json as _json

        out = []
        for x, y in zip(a, b):
            if x is None or y is None:
                out.append(y if x is None else x)
                continue
            try:
                merged = {**_json.loads(x), **_json.loads(y)}
                out.append(_json.dumps(merged, separators=(",", ":")))
            except (ValueError, TypeError):
                out.append(y)
        return pd.Series(out, dtype="object")

    return pandas_udf(merge, "string")
