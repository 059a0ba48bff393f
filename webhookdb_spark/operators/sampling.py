"""Deterministic sampling operators for training-data pipelines.

A corpus mix is usually specified as quotas per stratum ("200k docs per
language", "cap each source at 1%"), and the sample must be REPRODUCIBLE
across runs and engines — rand()-based sampling is neither. The operators
here order rows inside each stratum by the md5 of their id (a fixed,
uniform, engine-portable permutation — the same md5-prefix discipline as
functions/converters.str2inthash) and take the first N / first fraction.

100 TB shape: the per-stratum pick compiles to a window whose
``row_number <= N`` predicate Spark turns into a WindowGroupLimit —
each map task keeps only its local top-N per stratum BEFORE the
shuffle, so the exchange carries ~N * n_partitions rows per stratum,
not the stratum. A giant stratum (half the corpus one language) never
sorts in full; skew is bounded by the limit pushdown. The hash-fraction
variant is a pure map-side filter — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sample_order(id_col: Column) -> Column:
    """The deterministic shuffle key: md5 of the id rendered as text.
    Uniform over rows, stable across runs, identical in any engine with
    md5() — which is what makes sampled pipelines diffable."""
    return F.md5(id_col.cast("string"))


def stratified_sample_n(
    df: DataFrame,
    strata_col: str,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, deterministically:
    the first ``n`` rows of each stratum in md5(id) order (ties by id —
    md5 collisions on distinct ids are practically impossible but the
    tiebreak keeps the plan formally deterministic)."""
    w = Window.partitionBy(strata_col).orderBy(
        sample_order(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def hash_fraction_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose md5(id)
    prefix, read as a 28-bit integer, falls under the cutoff. Pure
    map-side filter — the scale path when quotas are fractions rather
    than exact counts (no shuffle, no window; composable with any
    downstream op). The same row set is selected on every engine."""
    cutoff = int(fraction * float(1 << 28))
    bucket = F.conv(F.substring(sample_order(F.col(id_col)), 1, 7), 16, 10).cast(
        "long"
    )
    return df.where(bucket < F.lit(cutoff))


def sql_stratified_sample_n(
    table: str = "documents",
    strata_col: str = "lang",
    n: int = 20,
    id_col: str = "doc_id",
    cols: str = "doc_id, lang, source, n_chars",
) -> str:
    """DuckDB twin of :func:`stratified_sample_n`."""
    return f"""
    SELECT {cols} FROM (
      SELECT *, row_number() OVER (
        PARTITION BY {strata_col}
        ORDER BY md5(CAST({id_col} AS VARCHAR)) ASC, {id_col} ASC
      ) AS _rn
      FROM {table}
    ) WHERE _rn <= {n}
    """


def sql_hash_fraction_sample(
    table: str = "documents",
    fraction: float = 0.1,
    id_col: str = "doc_id",
    cols: str = "doc_id, lang, source, n_chars",
) -> str:
    """DuckDB twin of :func:`hash_fraction_sample`."""
    cutoff = int(fraction * float(1 << 28))
    return f"""
    SELECT {cols} FROM {table}
    WHERE CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 7) AS BIGINT)
          < {cutoff}
    """
