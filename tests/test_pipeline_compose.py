"""End-to-end composition: the training-data operators must CHAIN —
filter -> cross-corpus segment dedup -> near-dup clustering keep-list ->
LM quality gate -> split -> shuffle -> sequence packing — one dataflow,
schemas lining up at every hop, no materialization between stages.

This is the "a user could run their real pipeline" proof: each operator
is tested in isolation elsewhere; this test pins that the composition
is lazy (one logical plan to the final action) and semantically sane
(counts monotone, packs contiguous)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webhookdb_spark.operators.corpus import corpus_filter
from webhookdb_spark.operators.dedup import dedup_clusters, segment_dedup
from webhookdb_spark.operators.sampling import corpus_split, sequence_pack
from webhookdb_spark.operators.text import lm_familiarity

SF = "/root/testdata/sf0.001"


def test_full_training_pipeline_composes(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n0 = docs.count()

    # 1. rule-cascade filter
    verdicts = corpus_filter(docs)
    kept_ids = verdicts.where("keep").select("doc_id")
    stage1 = docs.join(kept_ids, "doc_id")
    n1 = stage1.count()
    assert 0 < n1 < n0

    # 2. cross-corpus segment dedup rewrites text
    deduped = segment_dedup(stage1).where(F.length("clean_text") > 0)
    stage2 = deduped.select("doc_id", F.col("clean_text").alias("text")).join(
        stage1.select("doc_id", "lang", "source"), "doc_id"
    )
    n2 = stage2.count()
    assert 0 < n2 <= n1

    # 3. near-dup clustering keep-list (minhash -> CC -> canonical pick)
    keep = dedup_clusters(stage2).where("keep").select("doc_id")
    stage3 = stage2.join(keep, "doc_id")
    n3 = stage3.count()
    assert 0 < n3 <= n2

    # 4. LM quality gate: drop the lowest-scoring decile
    scored = lm_familiarity(stage3)
    cut = scored.approxQuantile("lm_score", [0.1], 0.0)[0]
    good = scored.where(F.col("lm_score") >= cut).select("doc_id")
    stage4 = stage3.join(good, "doc_id")
    n4 = stage4.count()
    assert 0 < n4 <= n3

    # 5. split -> train slice -> pack
    train = corpus_split(stage4).where("split = 'train'")
    packed = sequence_pack(train, context_len=128)
    rows = sorted(packed.collect(), key=lambda r: r.global_offset)
    assert rows, "pipeline produced an empty corpus"
    # contiguous token layout end-to-end
    total = 0
    for r in rows:
        assert r.global_offset == total
        total += r.n_tokens
    assert rows[-1].pack_id == (rows[-1].global_offset // 128)
