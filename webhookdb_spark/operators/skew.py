"""Skew-handling joins (SURVEY §4 / the 100 TB checklist).

Spark's AQE skew-join (enabled in session.py) splits oversized
*partitions*, which covers most skew. What it cannot fix is a single
hot KEY too large for any one task — e.g. one organization producing
half the webhook volume joined against its integration metadata. The
classic remedy is salting:

- the BIG side gets a per-row salt in [0, salt) (deterministic hash,
  see :func:`salted_join`); the SMALL side is exploded ``salt`` times,
  once per salt value;
- the join key becomes (key, salt), spreading the hot key over
  ``salt`` tasks;
- the small side grows ``salt``×, which is fine because it was small —
  and if it's broadcastable, prefer ``F.broadcast`` and skip salting
  entirely (a broadcast join has no shuffle to skew).

``salted_join`` is deterministic-output (same rows, any salt) and
covers inner/left joins — the shapes the engine's dependency lookups
use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
    row_key_cols: list[str] | None = None,
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on column ``on`` with the hot-key salt
    trick. Output columns = big's columns + small's non-key columns
    (same as a plain ``join(on=...)``).

    The salt is DETERMINISTIC — ``pmod(hash(row_key_cols), salt)``
    (default: every big-side column) rather than ``rand()`` — so task
    retries and A/B reruns produce byte-identical partitioning.
    Output is identical either way (the small side carries every salt
    value); determinism is free. Pass ``row_key_cols`` naming a
    unique/near-unique column when big rows can be fully duplicated —
    identical rows share a salt, which only matters if one value
    dominates."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = row_key_cols or big.columns
    b = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in keys]), F.lit(salt)).cast("int")
    )
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = b.join(s, on=[on, "_salt"], how=how).drop("_salt")
    return out
