"""Bulk JSONL corpus ingestion with quarantine routing.

The corpus-scale analog of the reference's per-request envelope
validation (lib/webhookdb/api/helpers.rb:218-231 rejects malformed
webhook bodies at the door; a 100 TB bulk load must do the same per
LINE without failing the job): every input line is classified as
``valid`` or ``quarantined`` with a deterministic machine-readable
reason, so the pipeline lands clean rows and ships the reject stream
to a side table instead of either crashing (FAILFAST) or silently
nulling fields (naive PERMISSIVE).

Classification order (first failure wins, so reasons are stable):

1. ``malformed_json`` — the line does not parse. Detected via Spark's
   ``columnNameOfCorruptRecord`` channel (the struct itself is NOT
   null under PERMISSIVE parsing — every field is).
2. ``missing_field:<f>`` — a required field is absent or JSON null
   (indistinguishable in both engines, deliberately: a null required
   field is as unusable as a missing one), in declaration order.
3. ``bad_type:<f>`` — the field is present but its value does not
   ``try_cast`` to the declared type, in declaration order.

All fields parse as STRINGS first (JSON scalars coerce to their
literal text in both Spark's Jackson parser and DuckDB's
``json_extract_string``) and types are enforced by ``try_cast`` — one
uniform rule instead of two parser-specific coercion tables. Engine
seam note: the two JSON parsers disagree on exotic near-JSON (NaN,
unquoted keys); the contract here covers RFC-8259 JSON and the
corruption classes above, which both engines classify identically.

Scale shape: one narrow map over the line stream — no shuffle, no
UDF; the caller splits valid/quarantine with two filters off the same
scan (or one pass to a partitioned-by-status sink).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


# Engines disagree on TRY_CAST(<string> AS <integer>) for non-integral
# strings: DuckDB truncates '0.' to 0 where Spark yields NULL (found by
# the cross-engine hypothesis pin). Both twins therefore gate integer
# casts on the SAME integral-string shape — strings outside it are
# bad_type on both engines by construction.
_INT_TYPES = {"bigint", "long", "int", "integer", "smallint", "tinyint"}
_INT_RE = r"^\s*[+-]?\d+\s*$"


def _typed(col: Column, typ: str) -> Column:
    if typ.lower() in _INT_TYPES:
        return F.when(col.rlike(_INT_RE), col.try_cast(typ))
    return col.try_cast(typ)


def _sql_typed(ex: str, typ: str) -> str:
    if typ.lower() in _INT_TYPES:
        ex = f"(CASE WHEN regexp_matches({ex}, '{_INT_RE}') THEN {ex} END)"
    return f"TRY_CAST({ex} AS {typ})"


def parse_jsonl_with_quarantine(
    lines: DataFrame,
    fields: list[tuple[str, str]],
    required: tuple[str, ...] = (),
    line_col: str = "line",
) -> DataFrame:
    """Classify and parse JSONL ``lines``.

    ``fields`` is the ordered contract: (name, target_type) pairs;
    every field is extracted as a string and ``try_cast`` to its
    target. ``required`` names fields whose absence (or JSON null)
    quarantines the line. Returns the input columns (minus
    ``line_col``) plus one ``<name>_val`` column per field, ``status``
    ('valid' | 'quarantined') and ``reason`` (NULL when valid).
    """
    schema = ", ".join(
        [f"{name} string" for name, _ in fields] + [f"{CORRUPT_COL} string"]
    )
    parsed = F.from_json(
        F.col(line_col), schema,
        {"columnNameOfCorruptRecord": CORRUPT_COL},
    )
    b = lines.withColumn("_j", parsed)
    reason: Column = F.when(
        F.col(f"_j.{CORRUPT_COL}").isNotNull(), F.lit("malformed_json")
    )
    for name in required:
        reason = reason.when(
            F.col(f"_j.{name}").isNull(), F.lit(f"missing_field:{name}")
        )
    for name, typ in fields:
        if typ.lower() == "string":
            continue
        reason = reason.when(
            F.col(f"_j.{name}").isNotNull()
            & _typed(F.col(f"_j.{name}"), typ).isNull(),
            F.lit(f"bad_type:{name}"),
        )
    vals = [
        _typed(F.col(f"_j.{name}"), typ).alias(f"{name}_val")
        for name, typ in fields
    ]
    keep = [c for c in lines.columns if c != line_col]
    return b.select(
        *keep,
        *vals,
        F.when(reason.isNull(), F.lit("valid"))
        .otherwise(F.lit("quarantined"))
        .alias("status"),
        reason.alias("reason"),
    )


def sql_parse_jsonl_with_quarantine(
    lines_cte: str,
    fields: list[tuple[str, str]],
    required: tuple[str, ...] = (),
    keep: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of :func:`parse_jsonl_with_quarantine`:
    ``json_valid`` stands in for the corrupt-record channel,
    ``json_extract_string`` for the string-first extraction, the same
    ``TRY_CAST`` ladder for types. ``lines_cte`` must yield columns
    ``line`` plus ``keep``."""
    # Guarded extraction: DuckDB's json functions ERROR on malformed
    # input (they have no PERMISSIVE mode), and a SELECT list is not
    # short-circuited by the CASE in another column — so every extract
    # hides behind json_valid. (The reason CASE's later arms are safe
    # unguarded only because its first arm catches malformed lines.)
    ex = {
        name: f"(CASE WHEN json_valid(line)"
        f" THEN json_extract_string(line, '$.{name}') END)"
        for name, _ in fields
    }
    arms = ["WHEN NOT json_valid(line) THEN 'malformed_json'"]
    arms += [
        f"WHEN {ex[name]} IS NULL THEN 'missing_field:{name}'"
        for name in required
    ]
    arms += [
        f"WHEN {ex[name]} IS NOT NULL AND {_sql_typed(ex[name], typ)} IS NULL"
        f" THEN 'bad_type:{name}'"
        for name, typ in fields
        if typ.lower() != "string"
    ]
    reason = "CASE " + " ".join(arms) + " END"
    vals = ", ".join(
        f"{_sql_typed(ex[name], typ)} AS {name}_val" for name, typ in fields
    )
    keep_sql = "".join(f"{c}, " for c in keep)
    return f"""
    SELECT {keep_sql}{vals},
           CASE WHEN ({reason}) IS NULL THEN 'valid'
                ELSE 'quarantined' END AS status,
           {reason} AS reason
    FROM ({lines_cte})
    """


def json_key_profile(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """(key, value_class, n): the schema-drift audit over a raw JSONL
    feed — for every top-level key, how many parseable lines carry it
    and as what normalized value class ('int', 'float', 'bool',
    'null', 'array', 'object', 'string').

    Classes describe the NORMALIZED text (both engines stringify
    scalars identically: numbers to their literal text, strings
    unquoted, null to SQL NULL, containers to JSON text) — so a JSON
    string "123" and a number 123 profile identically as 'int'. That
    is deliberate: the question a pipeline asks of a drifting feed is
    "can this field still be read as an int", not "what did the
    producer's serializer quote this week". Malformed lines are
    excluded (they are :func:`parse_jsonl_with_quarantine`'s job).

    Scale shape: one narrow map (parse to map<string,string> +
    explode) and ONE partial-agg-friendly groupBy on (key, class) —
    output is schema-sized, never corpus-sized.
    """
    kv = lines.select(
        F.explode(F.from_json(F.col(line_col), "map<string,string>")).alias("k", "v")
    )
    cls = (
        F.when(F.col("v").isNull(), "null")
        .when(F.col("v").rlike("^-?[0-9]+$"), "int")
        .when(F.col("v").rlike("^-?[0-9]+\\.[0-9]+$"), "float")
        .when(F.col("v").isin("true", "false"), "bool")
        .when(F.col("v").startswith("["), "array")
        .when(F.col("v").startswith("{"), "object")
        .otherwise("string")
    )
    return (
        kv.select(F.col("k").alias("key"), cls.alias("value_class"))
        .groupBy("key", "value_class")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def sql_json_key_profile(lines_cte: str) -> str:
    """DuckDB twin of :func:`json_key_profile` (json_keys +
    json_extract_string normalize exactly like Spark's
    map<string,string> parse; malformed lines excluded by
    json_valid — the twin of from_json's null-map drop)."""
    return f"""
    WITH kv AS (
      SELECT t.k AS key,
             json_extract_string(line, '$.' || t.k) AS v
      -- json_valid must gate BEFORE the lateral unnest: DuckDB
      -- evaluates the table function during the scan, ahead of any
      -- WHERE on the joined row, and json_keys ERRORS on malformed
      FROM (SELECT line FROM ({lines_cte}) WHERE json_valid(line)) L,
           unnest(json_keys(line)) AS t(k)
    )
    SELECT key,
           CASE WHEN v IS NULL THEN 'null'
                WHEN regexp_full_match(v, '-?[0-9]+') THEN 'int'
                WHEN regexp_full_match(v, '-?[0-9]+\\.[0-9]+') THEN 'float'
                WHEN v IN ('true', 'false') THEN 'bool'
                WHEN v LIKE '[%' THEN 'array'
                WHEN v LIKE '{{%' THEN 'object'
                ELSE 'string' END AS value_class,
           count(*) AS n
    FROM kv
    GROUP BY key, value_class
    """
