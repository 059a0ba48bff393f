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


def _bucket28(id_col: Column, salt: str) -> Column:
    """28-bit integer from the md5 of salt+id. Each operator salts its
    hash differently so composed stages (split -> mix -> sample) draw
    INDEPENDENT permutations — sharing one hash would correlate them
    (e.g. every sampled row landing in 'train')."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 7),
        16,
        10,
    ).cast("long")


def _sql_bucket28(id_col: str, salt: str) -> str:
    return (
        f"CAST('0x' || substr(md5('{salt}' || CAST({id_col} AS VARCHAR)), 1, 7)"
        " AS BIGINT)"
    )


def corpus_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: a ``split`` column from
    the row's salted 28-bit hash against the cumulative weight
    thresholds. Every engine and every run assigns each id to the same
    split — the property that keeps eval sets leak-free when the corpus
    is re-materialized. Pure map-side (no shuffle); weights are
    normalized, so {9, 0.5, 0.5} works as well as fractions."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = _bucket28(F.col(id_col), "split:")
    expr: Column | None = None
    acc = 0.0
    items = list(weights.items())
    for name, wt in items[:-1]:
        acc += wt / total
        cutoff = int(acc * float(1 << 28))
        expr = (
            F.when(bucket < cutoff, F.lit(name))
            if expr is None
            else expr.when(bucket < cutoff, F.lit(name))
        )
    last = items[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", split)


def weighted_mix(
    df: DataFrame,
    source_weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source subsampling — the corpus-mixture step ("keep 100% of
    wiki, 30% of web, 5% of forum"): a row survives when its salted
    hash falls under its source's keep-fraction. Sources not listed
    pass through whole (weight 1.0). Map-side only, reproducible, and
    composable with :func:`corpus_split` (independent salts)."""
    pairs: list[Column] = []
    for s, wt in source_weights.items():
        pairs += [F.lit(s), F.lit(int(min(max(wt, 0.0), 1.0) * float(1 << 28)))]
    cutoff = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(source_col)),
        F.lit(1 << 28),
    )
    return df.where(_bucket28(F.col(id_col), "mix:") < cutoff)


def sql_corpus_split(
    table: str = "documents",
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    cols: str = "doc_id, lang, source",
) -> str:
    """DuckDB twin of :func:`corpus_split`."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    b = _sql_bucket28(id_col, "split:")
    acc = 0.0
    whens = []
    items = list(weights.items())
    for name, wt in items[:-1]:
        acc += wt / total
        whens.append(f"WHEN {b} < {int(acc * float(1 << 28))} THEN '{name}'")
    case = "CASE " + " ".join(whens) + f" ELSE '{items[-1][0]}' END"
    return f"SELECT {cols}, {case} AS split FROM {table}"


def sql_weighted_mix(
    table: str = "documents",
    source_weights: dict[str, float] | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
    cols: str = "doc_id, lang, source",
) -> str:
    """DuckDB twin of :func:`weighted_mix`."""
    source_weights = source_weights or {}
    whens = " ".join(
        f"WHEN '{s}' THEN {int(min(max(w, 0.0), 1.0) * float(1 << 28))}"
        for s, w in source_weights.items()
    )
    cutoff = f"CASE {source_col} {whens} ELSE {1 << 28} END"
    return f"""
    SELECT {cols} FROM {table}
    WHERE {_sql_bucket28(id_col, 'mix:')} < {cutoff}
    """


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
