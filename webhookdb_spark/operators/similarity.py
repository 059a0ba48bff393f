"""Similarity search over an embedding column (``array<float>``).

Two tiers, as a real 100 TB pipeline needs:

- **Brute-force cosine top-k** — the exactness baseline. Query side is
  broadcast (a handful of probe vectors), corpus side streams through a
  single narrow stage: no shuffle except the final per-query top-k
  (a tiny groupBy over k·|queries| rows after local pruning via window).
  All arithmetic native (``zip_with`` + ``aggregate``), no UDF.
- **LSH-bucketed (random hyperplane / sign) ANN** — the scale path.
  Hyperplane directions are derived deterministically from md5 so the
  index is reproducible across runs and engines. Candidates share a
  sign-signature bucket; exact cosine re-ranks within the bucket. At
  100 TB the bucket join replaces the full scan with a hash join on the
  signature — the same shape as dedup.lsh_candidate_pairs.

Cosine results are rounded to 6 places and tie-broken by vec_id so
rankings are engine-portable (see tests / oracle twins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries`` is expected to be small — it is broadcast, making the
    pairing a map-side nested loop over the corpus scan (no shuffle),
    followed by a per-query window top-k.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    paired = c.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("query_id"))
    scored = paired.select(
        "query_id",
        "vec_id",
        cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine_sim", F.col("rank").cast("int").alias("rank"))
    )


def sql_cosine_topk(
    table: str = "embeddings", query_pred: str = "vec_id < 3", k: int = 5
) -> str:
    """DuckDB oracle twin of :func:`cosine_topk`.

    Computes the dot/norms explicitly in double precision (matching the
    Spark arithmetic) rather than using list_cosine_similarity (which
    works in float32); rounding to 6 places absorbs any residual
    last-bit noise.
    """
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS q_vec FROM {table} WHERE {query_pred}
    ),
    pairs AS (
      SELECT q.query_id, c.vec_id,
             round(
               list_sum(list_transform(range(1, len(c.embedding) + 1),
                        i -> q.q_vec[i]::DOUBLE * c.embedding[i]::DOUBLE))
               / (sqrt(list_sum(list_transform(q.q_vec, x -> x::DOUBLE * x::DOUBLE)))
                  * sqrt(list_sum(list_transform(c.embedding, x -> x::DOUBLE * x::DOUBLE)))),
               6) AS cosine_sim
      FROM {table} c, q
      WHERE c.vec_id != q.query_id
    ),
    ranked AS (
      SELECT query_id, vec_id, cosine_sim,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine_sim DESC, vec_id ASC) AS INTEGER) AS rank
      FROM pairs
    )
    SELECT query_id, vec_id, cosine_sim, rank FROM ranked WHERE rank <= {k}
    """


# -- LSH (random hyperplane) ANN -------------------------------------------

def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1),
    derived from md5 — reproducible across engines and runs."""
    import hashlib

    h = hashlib.md5(f"plane:{plane}:{dim}".encode()).hexdigest()
    return (int(h[:8], 16) / 0x80000000) - 1.0


def hyperplanes(n_planes: int, n_dims: int) -> list[list[float]]:
    return [
        [_plane_component(p, d) for d in range(n_dims)] for p in range(n_planes)
    ]


def sign_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Bit-string signature: bit p = 1 iff vec · plane_p > 0."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(x) for x in plane]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the sign-signature bucket,
    exact cosine re-ranks within the bucket.

    At scale the corpus is written bucketed by signature, so a query
    reads one bucket (plus optionally hamming-1 neighbors for recall).
    Here both sides compute signatures inline and hash-join on them.
    """
    n_dims = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(n_planes, n_dims)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        sign_signature(F.col(vec_col), planes).alias("sig"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        sign_signature(F.col(vec_col), planes).alias("sig"),
    )
    paired = c.join(F.broadcast(q), on="sig").where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = paired.select(
        "query_id", "vec_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine_sim", F.col("rank").cast("int").alias("rank"))
    )
