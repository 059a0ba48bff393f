"""Column type system.

Mirrors the reference's ColumnTypes → Postgres/Snowflake mapping
(reference: lib/webhookdb/db_adapter/column_types.rb:4-36,
lib/webhookdb/db_adapter/pg.rb:234-251) onto Spark SQL types.
"""

from __future__ import annotations

import re
from enum import Enum

from pyspark.sql import types as T


class ColumnType(Enum):
    BIGINT = "bigint"
    BIGINT_ARRAY = "bigint_array"
    BOOLEAN = "boolean"
    DATE = "date"
    DECIMAL = "decimal"
    DOUBLE = "double"
    FLOAT = "float"
    INTEGER = "integer"
    INTEGER_ARRAY = "integer_array"
    OBJECT = "object"  # jsonb in the reference → canonical JSON string
    TEXT = "text"
    TEXT_ARRAY = "text_array"
    TIMESTAMP = "timestamp"
    UUID = "uuid"


# Unbounded `numeric` needs a concrete precision in Spark; 38,18 keeps
# both large magnitudes and the reference's decimal test values exact.
DECIMAL_PRECISION = (38, 18)

_SPARK_TYPES: dict[ColumnType, T.DataType] = {
    ColumnType.BIGINT: T.LongType(),
    ColumnType.BIGINT_ARRAY: T.ArrayType(T.LongType()),
    ColumnType.BOOLEAN: T.BooleanType(),
    ColumnType.DATE: T.DateType(),
    ColumnType.DECIMAL: T.DecimalType(*DECIMAL_PRECISION),
    ColumnType.DOUBLE: T.DoubleType(),
    ColumnType.FLOAT: T.FloatType(),
    ColumnType.INTEGER: T.IntegerType(),
    ColumnType.INTEGER_ARRAY: T.ArrayType(T.IntegerType()),
    ColumnType.OBJECT: T.StringType(),
    ColumnType.TEXT: T.StringType(),
    ColumnType.TEXT_ARRAY: T.ArrayType(T.StringType()),
    ColumnType.TIMESTAMP: T.TimestampType(),
    ColumnType.UUID: T.StringType(),
}


def spark_type(ct: ColumnType) -> T.DataType:
    return _SPARK_TYPES[ct]


# Identifier rules (reference: lib/webhookdb/db_adapter.rb:10-21,203-213):
# start with a letter, then letters/digits/underscores/spaces, ≤63 bytes.
_IDENT_RE = re.compile(r"^[a-zA-Z][a-zA-Z\d_ ]*$")
MAX_IDENTIFIER_BYTES = 63


class InvalidIdentifier(ValueError):
    pass


def validate_identifier(name: str, kind: str = "identifier") -> str:
    if not _IDENT_RE.match(name):
        raise InvalidIdentifier(
            f"{kind} {name!r} must start with a letter and contain only "
            "letters, digits, underscores, and spaces"
        )
    if len(name.encode("utf-8")) > MAX_IDENTIFIER_BYTES:
        raise InvalidIdentifier(f"{kind} {name!r} exceeds {MAX_IDENTIFIER_BYTES} bytes")
    return name
