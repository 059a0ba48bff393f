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


def test_search_bm25_ranking_properties(spark):
    """BM25 sanity on a constructed corpus: a doc with more matched
    distinct terms outranks fewer; rare terms outweigh common ones;
    longer docs are length-penalized at equal tf."""
    from webhookdb_spark.operators.corpus import search_bm25

    docs = [
        (1, "apple banana cherry filler filler"),
        (2, "apple filler filler filler filler"),
        (3, "banana filler filler filler filler"),
        (4, "apple apple apple filler filler"),
        (5, "apple " + "filler " * 40),
        (6, "common common common common common"),
    ] + [(10 + i, "common filler pad pad pad") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: (r.score, r.rank)
           for r in search_bm25(df, ("apple", "banana", "common"), k=30).collect()}
    # doc 1 matches two rare terms -> top rank
    assert out[1][1] == 1
    # rare 'apple' beats ubiquitous 'common' at same tf shape
    assert out[2][0] > out[6][0]
    # length normalization: same single 'apple', longer doc scores less
    assert out[2][0] > out[5][0]
    # tf saturation: 3x apple > 1x apple, but less than 3x the score
    assert out[4][0] > out[2][0] and out[4][0] < 3 * out[2][0]
