"""Spec-driven additive schema evolution (reference:
lib/webhookdb/replicator/base.rb:557-643).

The reference's rule: schema changes are ADDITIVE ONLY — new declared
columns are detected by set-difference against the live table
(base.rb:589-598), added with ``ALTER TABLE``, then backfilled from the
stored raw ``data`` payload in 1M-row chunked UPDATEs
(base.rb:600-631, 664-687) using each column's ``to_sql_expr``
(column.rb:421-455) or an explicit ``backfill_expr`` override
(base.rb:600-615).

Spark shape: the chunking machinery disappears — snapshot isolation
means one declarative rewrite of the affected files replaces the
chunked-UPDATE dance — but the semantics are identical: every new
column's value is re-derived from ``data`` through the SAME
dig → convert → cast → defaulter pipeline that shapes fresh ingest, so
a backfilled row is indistinguishable from a freshly-ingested one.
At 100 TB the rewrite is bucket-parallel (each hash bucket rewrites
independently, no shuffle: derivation expressions are narrow).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from webhookdb_spark.spec import ReplicatorSpec
from webhookdb_spark.storage import ManagedTable
from webhookdb_spark.types import spark_type


def missing_columns(table: ManagedTable, spec: ReplicatorSpec):
    """Declared-but-absent columns (base.rb:589-598 set difference)."""
    existing = {f.name for f in table.schema().fields}
    return [c for c in spec.all_cols if c.name not in existing]


def evolve_table(table: ManagedTable, spec: ReplicatorSpec) -> list[str]:
    """Add every column ``spec`` declares that ``table`` lacks,
    re-deriving values from the stored ``data`` payload. Returns the
    added column names (empty = schema already current).

    Renames/retypes are deliberately unsupported, matching the
    reference's additive-only policy (base.rb:557-561).
    """
    missing = missing_columns(table, spec)
    if not missing:
        return []
    data = F.col("data")
    backfill = {
        c.name: (
            c.backfill_expr(data) if c.backfill_expr is not None
            else c.extraction_expr(data)
        )
        for c in missing
    }
    fields = [T.StructField(c.name, spark_type(c.type)) for c in missing]
    table.add_columns(fields, backfill)
    return [c.name for c in missing]
