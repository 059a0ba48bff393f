"""Semantics of duplicate clustering (connected components + canonical
pick) and deterministic sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from webhookdb_spark.operators.dedup import connected_components, dedup_clusters
from webhookdb_spark.operators.sampling import (
    hash_fraction_sample,
    stratified_sample_n,
)


def test_connected_components_chain_collapses(spark):
    # a-b, b-c, plus isolated pair d-e: two components, labels = min id
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r["v"]: r["label"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_needs_iterations(spark):
    # a path graph 0-1-2-...-7: diameter 7 forces several propagation
    # rounds; all vertices must still land on label 0
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "doc_a long, doc_b long"
    )
    got = {r["v"]: r["label"] for r in connected_components(edges).collect()}
    assert got == {i: 0 for i in range(8)}


def test_dedup_clusters_keep_list(spark):
    # docs 1,2,3 are near-identical (cluster via explicit pairs); doc 2
    # is the longest so it is the canonical keep; doc 9 is a singleton
    docs = spark.createDataFrame(
        [
            (1, "aa bb cc"),
            (2, "aa bb cc dd ee"),
            (3, "aa bb cc dd"),
            (9, "zz"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    rows = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["keep"])
        for r in dedup_clusters(docs, pairs=pairs).collect()
    }
    assert rows == {
        1: (1, 3, False),
        2: (1, 3, True),
        3: (1, 3, False),
        9: (9, 1, True),
    }


def test_stratified_sample_quota_and_determinism(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s1 = stratified_sample_n(docs, "lang", 5)
    per = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(5, totals[lang])
    # deterministic: same ids on a re-run
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"] for r in stratified_sample_n(docs, "lang", 5).select("doc_id").collect()
    )
    assert ids1 == ids2


def test_stratified_sample_plan_has_group_limit(spark):
    # the row_number <= N predicate must push into a WindowGroupLimit so
    # each map task pre-trims its stratum before the shuffle
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = stratified_sample_n(docs, "lang", 5)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_hash_fraction_sample_subset_semantics(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tenth = {r["doc_id"] for r in hash_fraction_sample(docs, 0.1).select("doc_id").collect()}
    fifth = {r["doc_id"] for r in hash_fraction_sample(docs, 0.2).select("doc_id").collect()}
    # a smaller fraction is always a subset of a larger one (cutoff is a
    # prefix of the same hash order) — what makes samples diffable
    assert tenth <= fifth
    n = docs.count()
    assert 0.02 * n <= len(tenth) <= 0.25 * n


def test_decontaminate_flags_shared_ngrams(spark):
    """Planted contamination: a train doc embedding a full eval 5-gram
    is flagged with the right shared-gram count; clean and too-short
    docs are not. Cross-engine: the DuckDB twin on the same carved
    corpus agrees exactly."""
    import duckdb

    from webhookdb_spark.operators.dedup import decontaminate, sql_decontaminate

    # doc 0 is the eval doc (0 % 7 == 0, the twin's default carve);
    # 1 embeds 6 of its tokens (two shared 5-grams), 2 is clean, 3 is
    # too short for any 5-gram
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "intro text then the quick brown fox jumps over and done"),
        (2, "completely different words in this training document here"),
        (3, "too short"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ev = docs.where(F.col("doc_id") % 7 == 0)
    train = docs.where(F.col("doc_id") % 7 != 0)
    got = {
        r.doc_id: (r.n_shared_ngrams, r.n_ngrams, r.contaminated)
        for r in decontaminate(train, ev).collect()
    }
    assert got[1] == (2, 7, True)   # "the quick brown fox jumps (over)"
    assert got[2] == (0, 4, False)
    assert got[3] == (0, 0, False)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(sql_decontaminate()).fetchall()
    }
    assert got == want


def test_decontaminate_plan_broadcasts_eval_grams(spark):
    """The gram probe must be a broadcast join (eval grams are tiny);
    a sort-merge join on gram values would shuffle the exploded corpus."""
    from webhookdb_spark.operators.dedup import decontaminate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.where(F.col("doc_id") % 101 == 0)
    train = docs.where(F.col("doc_id") % 101 != 0)
    plan = decontaminate(train, ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_connected_components_one_job_per_round(spark):
    """Driver-action budget gate: the CC loop must spend exactly ONE
    Spark job per round (the eager localCheckpoint whose Observation
    carries the convergence sum) — a regression to probe-per-round
    doubles the fixed cost that dominates dedup_clusters."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup("cc_gate") or [])
    # AQE materializes query stages as separate jobs, which would make
    # the job count plan-dependent; the gate measures driver actions.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sc.setJobGroup("cc_gate", "cc jobs-per-round gate")
        stats = {}
        labels = connected_components(edges, stats=stats)
    finally:
        sc.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    jobs = set(tracker.getJobIdsForGroup("cc_gate") or []) - before
    # chain 1-2-3 with min-seeding: seed round + 1 propagation + 1
    # fixpoint-confirm round = 3 rounds, 3 jobs
    assert stats["rounds"] == len(jobs), (stats, len(jobs))
    got = {r.v: r.label for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_corpus_filter_cascade_order_is_contractual(spark):
    """A doc failing several rules reports the FIRST failing rule
    (lang beats source beats length beats badword)."""
    from webhookdb_spark.operators.corpus import corpus_filter

    df = spark.createDataFrame(
        [
            (1, "xx", "src13", "dup " * 5),          # lang wins over all
            (2, "en", "src13", "dup " * 20),         # source beats length+badword
            (3, "en", "src0", "dup short"),          # too_short beats badword
            (4, "en", "src0", " ".join(["dup"] * 20)),  # badword
            (5, "en", "src0", " ".join(["ok"] * 20)),   # kept
        ],
        "doc_id long, lang string, source string, text string",
    )
    out = {r.doc_id: r.reason for r in corpus_filter(df).collect()}
    assert out == {1: "lang", 2: "source", 3: "too_short",
                   4: "badword", 5: "kept"}


def test_kmv_estimate_accuracy_and_exact_small_groups(spark):
    """Groups under k are exact; groups over k estimate within ~2/sqrt(k)
    relative error (k=64 -> 25%); planting 1000 distinct values checks
    the estimator path, not just the exact path."""
    from webhookdb_spark.operators.sketches import kmv_distinct

    rows = [("big", f"v{i}") for i in range(1000)]
    rows += [("small", f"s{i % 10}") for i in range(50)]
    df = spark.createDataFrame(rows, "g string, v string")
    out = {r.g: r for r in kmv_distinct(df, "g", "v", k=64).collect()}
    assert out["small"].exact_k and out["small"].est_distinct == 10
    assert not out["big"].exact_k
    assert abs(out["big"].est_distinct - 1000) / 1000 < 0.3, out["big"]


def test_search_all_terms_requires_every_term(spark):
    from webhookdb_spark.operators.corpus import search_all_terms

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "c a"), (4, "x y z")],
        "doc_id long, text string",
    )
    out = {r.doc_id for r in search_all_terms(df, ("a", "c")).collect()}
    assert out == {1, 3}
    # duplicate terms in the query must not double-count
    out2 = {r.doc_id for r in search_all_terms(df, ("a", "a", "c")).collect()}
    assert out2 == {1, 3}


def test_bucketed_index_caps_rows_on_stopword_corpus(spark):
    """A token present in EVERY document (the stop-word skew case) must
    chunk into rows of at most postings_per_row ids, spread over
    n_shards, while the narrow-column df aggregate still recovers the
    exact document frequency and the chunks reassemble losslessly."""
    from webhookdb_spark.operators.corpus import (
        inverted_index_bucketed,
        token_df_from_index,
    )

    n_docs, cap, shards = 500, 16, 4
    df = spark.createDataFrame(
        [(i, f"the uniq{i}") for i in range(n_docs)], "doc_id long, text string"
    )
    idx = inverted_index_bucketed(
        df, n_shards=shards, postings_per_row=cap
    ).cache()
    the_rows = idx.where("token = 'the'").collect()
    assert max(r.n_postings for r in the_rows) <= cap
    assert all(len(r.postings.split(",")) == r.n_postings for r in the_rows)
    # chunk ids are dense per shard: 0..ceil(shard_size/cap)-1
    by_shard = {}
    for r in the_rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == set(range(shards))
    for rows in by_shard.values():
        chunks = sorted(r.chunk for r in rows)
        assert chunks == list(range(len(rows)))
        full = sorted(r for r in rows if r.n_postings == cap)
        assert sum(r.n_postings for r in rows) > 0
    # exact df from the narrow columns only
    dfc = {r.token: r.df_count for r in token_df_from_index(idx).collect()}
    assert dfc["the"] == n_docs
    assert dfc[f"uniq{7}"] == 1
    # lossless reassembly of the hot token's postings
    got = sorted(
        int(d) for r in the_rows for d in r.postings.split(",")
    )
    assert got == list(range(n_docs))
    idx.unpersist()


def test_countmin_estimates_upper_bound_and_merge(spark):
    """Count-min guarantees est >= exact always, and est <= exact +
    eps*n w.h.p.; the sketch must also merge by cell-wise addition
    (sketch(A ++ B) == sketch(A) cell+ sketch(B)) — the property that
    makes it a distributed/streaming accumulator."""
    from webhookdb_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    vals = (
        [("hot",)] * 400
        + [("warm",)] * 60
        + [(f"cold{i}",) for i in range(200)]
    )
    df = spark.createDataFrame(vals, "v string")
    depth, width = 4, 256
    sk = countmin_sketch(df, "v", depth=depth, width=width).cache()
    exact = {"hot": 400, "warm": 60, "cold7": 1, "absent": 0}
    est = {
        r.value: r.est
        for r in countmin_estimate(
            sk, list(exact), depth=depth, width=width
        ).collect()
    }
    n = len(vals)
    for v, x in exact.items():
        assert est[v] >= x, (v, est[v], x)
        assert est[v] <= x + (4 * n) // width, (v, est[v], x)

    # mergeability: cell-wise sum of two half sketches == whole sketch
    from pyspark.sql import functions as F

    a = spark.createDataFrame(vals[:300], "v string")
    b = spark.createDataFrame(vals[300:], "v string")
    sa = countmin_sketch(a, "v", depth=depth, width=width)
    sb = countmin_sketch(b, "v", depth=depth, width=width)
    merged = (
        sa.unionByName(sb)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    whole = {(r.row, r.bucket): r.cnt for r in sk.collect()}
    got = {(r.row, r.bucket): r.cnt for r in merged.collect()}
    assert got == whole
    sk.unpersist()


def test_table_digest_detects_any_single_row_drift(spark):
    """The anti-entropy contract: identical tables digest identically;
    a changed, missing, or extra row flips exactly the owning bucket
    (and digest_diff returns just that bucket); NULL position matters."""
    from webhookdb_spark.operators.digest import digest_diff, table_digest

    rows = [(i, f"v{i}" if i % 7 else None, float(i) * 1.5) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, s string, x double")
    base = table_digest(df, key_col="id", n_buckets=8)
    again = table_digest(
        spark.createDataFrame(list(reversed(rows)), "id long, s string, x double"),
        key_col="id", n_buckets=8,
    )
    assert digest_diff(base, again).count() == 0  # order-insensitive

    changed = [(i, s, x if i != 42 else x + 1) for i, s, x in rows]
    d2 = table_digest(
        spark.createDataFrame(changed, "id long, s string, x double"),
        key_col="id", n_buckets=8,
    )
    diff = digest_diff(base, d2).collect()
    assert len(diff) == 1 and diff[0].n_rows_a == diff[0].n_rows_b

    missing = [r for r in rows if r[0] != 42]
    d3 = table_digest(
        spark.createDataFrame(missing, "id long, s string, x double"),
        key_col="id", n_buckets=8,
    )
    diff3 = digest_diff(base, d3).collect()
    assert len(diff3) == 1 and diff3[0].n_rows_a == diff3[0].n_rows_b + 1

    # NULL in a different column is a different row
    swapped = [(1000, None, 5.0)]
    swapped2 = [(1000, "5.000000", None)]
    da = table_digest(spark.createDataFrame(swapped, "id long, s string, x double"),
                      key_col="id", n_buckets=8)
    db = table_digest(spark.createDataFrame(swapped2, "id long, s string, x double"),
                      key_col="id", n_buckets=8)
    assert digest_diff(da, db).count() == 1


def test_zorder_key4_is_exact_4d_morton(spark):
    """zorder_key4 must equal the definitional 4-way bit interleave
    (cycle a,b,c,d), reject out-of-range inputs, and match its DuckDB
    twin."""
    import duckdb as _dd

    from webhookdb_spark.operators.layout import (
        sql_zorder_expr4,
        zorder_key4,
    )
    from pyspark.sql import functions as F

    def morton4(a, b, c, d):
        z = 0
        for i in range(15):
            z |= ((a >> i) & 1) << (4 * i)
            z |= ((b >> i) & 1) << (4 * i + 1)
            z |= ((c >> i) & 1) << (4 * i + 2)
            z |= ((d >> i) & 1) << (4 * i + 3)
        return z

    rows = [(i, (i * 7) % 32768, (i * 131) % 32768, (i * 29) % 32768,
             (i * 997) % 32768) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, a long, b long, c long, d long")
    got = {
        r.id: r.z
        for r in df.select(
            "id",
            zorder_key4(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("z"),
        ).collect()
    }
    for i, a, b, c, d in rows:
        assert got[i] == morton4(a, b, c, d), (i, a, b, c, d)

    con = _dd.connect()
    con.execute("CREATE TABLE t (id BIGINT, a BIGINT, b BIGINT, c BIGINT, d BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
    want = dict(con.execute(
        f"SELECT id, {sql_zorder_expr4('a','b','c','d')} FROM t"
    ).fetchall())
    assert got == want

    import pytest as _pt
    bad = spark.createDataFrame([(1 << 15, 0, 0, 0)], "a long, b long, c long, d long")
    with _pt.raises(Exception, match="outside"):
        bad.select(zorder_key4(F.col("a"), F.col("b"), F.col("c"), F.col("d"))).collect()


def test_corpus_filter_joined_matches_literal_form(spark):
    """The DataFrame-blocklist filter must agree row-for-row with the
    literal isin cascade on the same rule sets — same reasons, same
    keeps — including docs failing multiple rules (cascade order)."""
    from webhookdb_spark.operators.corpus import (
        DEFAULT_BADWORDS,
        DEFAULT_BLOCKED_SOURCES,
        DEFAULT_LANGS,
        corpus_filter,
        corpus_filter_joined,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # NULL-lang doc: corpus_filter's ~isin(...) is NULL there, so the
    # lang branch is SKIPPED and the doc falls through to later rules —
    # the joined form must reproduce that, not reject with 'lang'
    # (the ADVICE corpus.py finding)
    null_lang = docs.limit(1).select(
        F.lit(-1).alias("doc_id"),
        F.lit(None).cast("string").alias("lang"),
        *[c for c in docs.columns if c not in ("doc_id", "lang")],
    )
    docs = docs.unionByName(null_lang.select(docs.columns))
    lit_out = {
        r.doc_id: (r.n_tokens, r.keep, r.reason)
        for r in corpus_filter(docs).collect()
    }
    assert lit_out[-1][2] != "lang"  # NULL lang fell through
    joined_out = {
        r.doc_id: (r.n_tokens, r.keep, r.reason)
        for r in corpus_filter_joined(
            docs,
            langs_df=spark.createDataFrame([(x,) for x in DEFAULT_LANGS], "lang string"),
            blocked_sources_df=spark.createDataFrame(
                [(x,) for x in DEFAULT_BLOCKED_SOURCES], "source string"),
            badwords_df=spark.createDataFrame(
                [(x,) for x in DEFAULT_BADWORDS], "word string"),
        ).collect()
    }
    assert lit_out == joined_out
    assert any(v[2] != "kept" for v in lit_out.values())  # rules fired


def test_persisted_inverted_index_append_and_compact(spark, tmp_path):
    """The persisted segment store must (a) answer searches and df
    counts identically whether built one-shot or grown by append —
    BEFORE any compaction, the always-true query contract — and (b)
    after compact_inverted_index, be ROW-IDENTICAL to the one-shot
    build (chunk ids, n_postings, postings strings), the exact
    grown == one-shot contract the persisted LSH/IVF indexes carry."""
    from webhookdb_spark.operators.corpus import (
        append_inverted_index,
        compact_inverted_index,
        inverted_index_bucketed,
        read_inverted_index,
        search_all_terms,
        search_terms_from_index,
        token_df_from_persisted,
        write_inverted_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    half1 = docs.where("doc_id % 2 = 0")
    half2 = docs.where("doc_id % 2 = 1")
    grown = str(tmp_path / "ii_grown")
    write_inverted_index(half1, grown, n_shards=4, postings_per_row=16)
    append_inverted_index(half2, grown)

    terms = ("spark", "merge", "window")
    direct = sorted(
        (r.doc_id, r.n_terms_matched)
        for r in search_all_terms(docs, terms).collect()
    )
    from_idx = sorted(
        (r.doc_id, r.n_terms_matched)
        for r in search_terms_from_index(spark, grown, terms).collect()
    )
    assert from_idx == direct and direct  # non-trivial result

    # df counts across segments == one aggregate over the full corpus
    oneshot_idx = inverted_index_bucketed(
        docs, n_shards=4, postings_per_row=16
    )
    want_df = sorted(
        (r.token, int(r.df_count))
        for r in oneshot_idx.groupBy("token")
        .agg(F.sum("n_postings").cast("int").alias("df_count"))
        .collect()
    )
    got_df = sorted(
        (r.token, int(r.df_count))
        for r in token_df_from_persisted(spark, grown).collect()
    )
    assert got_df == want_df

    # (b) physical contract after compaction
    compact_inverted_index(spark, grown)
    rows = lambda df: sorted(map(tuple, df.select(
        "token", "shard", "chunk", "n_postings", "postings").collect()))
    assert rows(read_inverted_index(spark, grown)) == rows(oneshot_idx)

    # and the logical view pre/post compaction already agreed: re-grow
    # and check the renumbered view equals the one-shot rows too
    grown2 = str(tmp_path / "ii_grown2")
    write_inverted_index(half1, grown2, n_shards=4, postings_per_row=16)
    append_inverted_index(half2, grown2)
    # chunk ids renumber by segment order; contents may pack differently
    # at the segment boundary, so compare the query surface, not rows
    assert sorted(
        (r.doc_id, r.n_terms_matched)
        for r in search_terms_from_index(spark, grown2, terms).collect()
    ) == direct


def test_persisted_inverted_index_query_prunes_scan(spark, tmp_path):
    """A term lookup against the persisted store must push the token
    isin predicate into the parquet scan (PushedFilters) and read only
    the narrow columns its stage needs — never a full-index scan."""
    from webhookdb_spark.operators.corpus import (
        search_terms_from_index,
        write_inverted_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = str(tmp_path / "ii_plan")
    write_inverted_index(docs, p, n_shards=4, postings_per_row=16)
    out = search_terms_from_index(spark, p, ("spark", "merge"))
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "In(token" in pushed[0], plan


def test_persisted_index_empty_term_set(spark, tmp_path):
    """Zero query terms is an empty result, not an isin() crash."""
    from webhookdb_spark.operators.corpus import (
        search_terms_from_index,
        write_inverted_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = str(tmp_path / "ii_empty")
    write_inverted_index(docs.limit(50), p, n_shards=2, postings_per_row=16)
    assert search_terms_from_index(spark, p, ()).count() == 0


def test_chunk_documents_boundaries(spark):
    """Chunk arithmetic pinned by hand: stride = chunk - overlap, last
    window clamps (shorter, never empty), short docs yield exactly one
    chunk, and consecutive chunks share `overlap` tokens."""
    import pytest as _pt

    from webhookdb_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),   # 10 toks
            (2, " ".join(f"w{i}" for i in range(4))),    # 4 toks -> 1 chunk
            (3, "only"),                                  # 1 tok
        ],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.chunk_id): (r.n_tokens, r.chunk)
           for r in chunk_documents(docs, chunk_tokens=4, overlap=1).collect()}
    # doc1: stride 3 -> ceil((10-1)/3) = 3 chunks: [0:4], [3:7], [6:10]
    assert out[(1, 0)] == (4, "w0 w1 w2 w3")
    assert out[(1, 1)] == (4, "w3 w4 w5 w6")
    assert out[(1, 2)] == (4, "w6 w7 w8 w9")
    assert (1, 3) not in out
    assert out[(2, 0)] == (4, "w0 w1 w2 w3")
    assert out[(3, 0)] == (1, "only")
    # overlap row: chunk i ends with the token chunk i+1 starts with
    assert out[(1, 0)][1].split()[-1] == out[(1, 1)][1].split()[0]
    with _pt.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_phrase_search_adjacency_and_repeats(spark):
    """Phrase semantics pinned by hand: terms must be ADJACENT and in
    order; overlapping occurrences each count; repeated-term phrases
    match self-overlapping runs; conjunctive-but-not-adjacent docs
    are excluded."""
    import duckdb

    from webhookdb_spark.operators.corpus import (
        phrase_search,
        sql_phrase_search,
    )

    rows = [
        (1, "big data pipeline big data lake"),   # "big data" x2
        (2, "data big pipeline"),                 # both terms, wrong order
        (3, "big shiny data"),                    # not adjacent
        (4, "la la la land"),                     # repeated-term phrase
        (5, "nothing here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n_occurrences
           for r in phrase_search(df, ("big", "data")).collect()}
    assert got == {1: 2}
    rep = {r.doc_id: r.n_occurrences
           for r in phrase_search(df, ("la", "la")).collect()}
    assert rep == {4: 2}  # positions (0,1) and (1,2)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    for ph in (("big", "data"), ("la", "la"), ("la", "la", "la")):
        want = sorted(con.execute(
            "SELECT doc_id, n_occurrences FROM ("
            + sql_phrase_search(ph, "t") + ")").fetchall())
        have = sorted((r.doc_id, r.n_occurrences)
                      for r in phrase_search(df, ph).collect())
        assert have == want, ph


def test_weighted_sample_k_determinism_bias_and_plan(spark):
    """Efraimidis-Spirakis hash sampling: same rows every run, heavy
    weights overrepresented, non-positive weights never drawn, and the
    plan is a top-k (TakeOrderedAndProject) — no global sort node, no
    full-table shuffle."""
    from webhookdb_spark.operators.sampling import weighted_sample_k

    rows = [(i, 100.0 if i < 100 else 1.0) for i in range(1000)] + [
        (2000, 0.0), (2001, -5.0)
    ]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    s1 = sorted(r.doc_id for r in weighted_sample_k(df, 50, "w").collect())
    s2 = sorted(r.doc_id for r in weighted_sample_k(df, 50, "w").collect())
    assert s1 == s2 and len(s1) == 50
    assert 2000 not in s1 and 2001 not in s1
    # 100 rows hold ~92% of the mass; they must dominate the draw
    heavy = sum(1 for d in s1 if d < 100)
    assert heavy >= 35, heavy
    # a different salt draws a genuinely different sample
    s3 = sorted(
        r.doc_id for r in weighted_sample_k(df, 50, "w", salt="other:").collect()
    )
    assert s3 != s1

    plan = weighted_sample_k(df, 50, "w")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_weighted_sample_k_per_group_quota_and_bias(spark):
    """Each group keeps at most k positive-weight rows; heavy rows
    dominate within their group; short groups keep everything."""
    from webhookdb_spark.operators.sampling import weighted_sample_k_per_group

    rows = (
        [(i, "big", 100.0 if i < 50 else 1.0) for i in range(500)]
        + [(1000 + i, "small", 1.0) for i in range(3)]
        + [(2000, "small", -1.0)]
    )
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    out = weighted_sample_k_per_group(df, 20, "w", "g").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r.doc_id)
    assert len(by_g["big"]) == 20
    assert sorted(by_g["small"]) == [1000, 1001, 1002]  # < k, no negatives
    heavy = sum(1 for d in by_g["big"] if d < 50)
    assert heavy >= 14, heavy  # 50 rows hold ~92% of group mass
    # deterministic
    out2 = weighted_sample_k_per_group(df, 20, "w", "g").collect()
    assert sorted(r.doc_id for r in out2) == sorted(r.doc_id for r in out)


def test_dsir_logweights_orders_target_like_docs_first(spark):
    """Docs written in the target slice's vocabulary score higher than
    docs from a disjoint vocabulary; weights are pure-integer micro
    sums (exactly reproducible); every doc gets exactly one row."""
    from webhookdb_spark.operators.corpus import dsir_logweights

    en = "the cat sat on the mat and the dog ran"
    de = "der hund lief durch den wald und die katze schlief"
    rows = (
        [(i, en, "en") for i in range(10)]
        + [(100 + i, de, "de") for i in range(10)]
        + [(200, en, "xx"), (201, de, "xx")]  # unlabeled docs to score
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r.logw_micro for r in dsir_logweights(df, "en").collect()}
    assert len(out) == 22
    # the en-vocabulary doc must be scored far more target-like
    assert out[200] > out[201]
    # deterministic: a second run is bit-identical
    out2 = {r.doc_id: r.logw_micro for r in dsir_logweights(df, "en").collect()}
    assert out == out2


def test_mixture_plan_temperature_upsamples_small_sources(spark):
    """alpha<1 gives the small source a larger mix share than its raw
    token share; alpha=1 recovers raw proportions; epochs_micro over
    1e6 flags a source the budget would repeat."""
    from webhookdb_spark.operators.sampling import mixture_plan

    rows = [(i, "w " * 99 + "w", "big") for i in range(90)] + [
        (1000 + i, "w " * 99 + "w", "small") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in
           mixture_plan(df, alpha=0.5, budget_tokens=20000).collect()}
    big, small = out["big"], out["small"]
    assert big.n_tokens == 9000 and small.n_tokens == 1000
    raw_share_small = small.n_tokens / (big.n_tokens + small.n_tokens)
    assert small.mix_weight_micro / 1e6 > raw_share_small
    flat = {r.source: r for r in
            mixture_plan(df, alpha=1.0, budget_tokens=20000).collect()}
    assert abs(flat["small"].mix_weight_micro - 100000) <= 1
    # 20k budget * ~25% share / 1k tokens ≈ 5 epochs for the small source
    assert out["small"].epochs_micro > 1_000_000


def test_neyman_allocation_favors_large_noisy_strata(spark):
    """Allocation is proportional to N_h * S_h: a zero-variance
    stratum gets 0 draws regardless of size; doubling a stratum's
    spread (same size) doubles its weight; alloc never exceeds the
    stratum size and uses exact integer division."""
    from webhookdb_spark.operators.sampling import (
        neyman_allocation, neyman_sample,
    )

    rows = (
        [("flat", i, 5.0) for i in range(100)]          # S=0
        + [("narrow", 200 + i, float(i % 2)) for i in range(100)]   # S=0.5
        + [("wide", 400 + i, float(i % 2) * 2) for i in range(100)] # S=1.0
        + [("tiny", 700 + i, float(i) * 100) for i in range(3)]     # huge S, N=3
    )
    df = spark.createDataFrame(rows, "stratum string, id long, v double")
    got = {r.stratum: r for r in neyman_allocation(
        df, "stratum", "v", total_n=60).collect()}
    assert got["flat"].weight == 0 and got["flat"].alloc == 0
    assert got["wide"].weight == 2 * got["narrow"].weight
    assert got["tiny"].alloc == 3  # capped at stratum size
    # allocations are floor-divided, so 2x weight gives 2x alloc +- 1
    assert got["wide"].alloc in (2 * got["narrow"].alloc,
                                 2 * got["narrow"].alloc + 1)
    total = sum(r.alloc for r in got.values())
    assert total <= 60  # floor division never overshoots
    # the draw honors the allocation exactly and is deterministic
    s1 = neyman_sample(df, "stratum", "v", "id", total_n=60).collect()
    s2 = neyman_sample(df, "stratum", "v", "id", total_n=60).collect()
    assert sorted(r.id for r in s1) == sorted(r.id for r in s2)
    from collections import Counter
    c = Counter(r.stratum for r in s1)
    assert c.get("flat", 0) == 0 and c["tiny"] == 3
    assert c["narrow"] == got["narrow"].alloc and c["wide"] == got["wide"].alloc


def test_prefix_sums_matches_single_window(spark):
    """The distributed two-phase prefix sum equals a single ordered
    window over arbitrary data, for multiple sum columns at once."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from webhookdb_spark.operators.sampling import prefix_sums

    rows = [(i * 7 % 101, i % 5, (i * 3) % 11) for i in range(500)]
    df = spark.createDataFrame(rows, "k int, a int, b int")
    # make k a total order key by deduplicating
    df = df.groupBy("k").agg(F.sum("a").alias("a"), F.sum("b").alias("b"))
    got = {r.k: (r.a_cum, r.b_cum) for r in prefix_sums(
        df, ["k"], ["a", "b"], bucket_partitions=8).collect()}
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {r.k: (r.ac, r.bc) for r in df.select(
        "k", F.sum("a").over(w).alias("ac"),
        F.sum("b").over(w).alias("bc")).collect()}
    assert got == want
