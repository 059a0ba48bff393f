"""Property-based cross-engine tests (hypothesis).

The repo's correctness story rests on isomorphic Spark/DuckDB pairs;
the fixed oracle queries check them on the synthetic corpus, and these
properties check them on ADVERSARIAL inputs hypothesis invents (unicode
edge cases, pathological whitespace, empty strings). Each property runs
ONE Spark job per example batch — examples are batches of strings, not
single rows, so the suite stays fast.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from webhookdb_spark.functions.converters import CONV_STR2HASH, str2inthash_py

# no NUL (parquet/duckdb varchar forbids it; the engine strips NULs on
# the JSON ingest path before any hashing — base.rb:793-811 parity)
_text = st.text(
    alphabet=st.characters(blacklist_characters="\x00", codec="utf-8"),
    max_size=40,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(st.lists(_text, min_size=1, max_size=24, unique=True))
@_settings
def test_str2inthash_three_way_agreement(spark, strings):
    """The partition-routing hash (partitionable_mixin.rb:74-90) must
    agree across the Python, Spark-Column, and DuckDB implementations
    for arbitrary unicode — a silent divergence would route rows to
    different buckets on different engines."""
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got_spark = {
        r.s: r.h
        for r in df.select("s", CONV_STR2HASH.spark(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in strings])
    got_duck = dict(
        con.execute(f"SELECT s, {CONV_STR2HASH.sql('s')} FROM t").fetchall()
    )
    for s in strings:
        py = str2inthash_py(s)
        assert got_spark[s] == py, f"spark vs py diverged on {s!r}"
        assert got_duck[s] == py, f"duckdb vs py diverged on {s!r}"


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**9), _text),
        min_size=1,
        max_size=24,
        unique_by=lambda t: t[0],
    )
)
@_settings
def test_corpus_split_and_mix_cross_engine(spark, rows):
    """Split assignment and mixture survival are pure functions of the
    id — Spark and DuckDB must pick identical splits and identical
    surviving rows for arbitrary ids."""
    from webhookdb_spark.operators.sampling import (
        corpus_split,
        sql_corpus_split,
        sql_weighted_mix,
        weighted_mix,
    )

    df = spark.createDataFrame(
        [(i, t, "s%d" % (i % 3)) for i, t in rows], "doc_id long, lang string, source string"
    )
    weights = {"s0": 0.5, "s1": 0.0}
    got_split = {
        r.doc_id: r.split for r in corpus_split(df).select("doc_id", "split").collect()
    }
    got_mix = {r.doc_id for r in weighted_mix(df, weights).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, lang VARCHAR, source VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?)",
        [(i, t, "s%d" % (i % 3)) for i, t in rows],
    )
    want_split = dict(
        con.execute(
            sql_corpus_split(cols="doc_id").replace("SELECT doc_id,", "SELECT doc_id,")
        ).fetchall()
    )
    want_mix = {
        r[0]
        for r in con.execute(
            sql_weighted_mix(source_weights=weights, cols="doc_id")
        ).fetchall()
    }
    assert got_split == want_split
    assert got_mix == want_mix
    # s1 rows never survive a 0-weight; unlisted s2 always survives
    for i, _ in rows:
        src = "s%d" % (i % 3)
        if src == "s1":
            assert i not in got_mix
        if src == "s2":
            assert i in got_mix


@given(st.lists(st.tuples(st.integers(0, 10**6), _text), min_size=1,
                max_size=12, unique_by=lambda t: t[0]))
@_settings
def test_repetition_and_bpe_cross_engine(spark, rows):
    """Repetition stats and BPE token counts agree across engines for
    arbitrary text (whitespace runs, punctuation, unicode)."""
    from webhookdb_spark.operators.text import (
        repetition_stats,
        sql_repetition_stats,
        sql_token_count_bpe,
        sql_token_count_bpe2,
        token_count_bpe,
        token_count_bpe2,
    )

    df = spark.createDataFrame(list(rows), "doc_id long, text string")
    got_rep = {
        r.doc_id: (r.n_segments, r.dup_segment_frac, r.dup_char_frac)
        for r in repetition_stats(df).collect()
    }
    got_bpe = {
        r.doc_id: (r.n_bpe_tokens, r.n_ws_tokens) for r in token_count_bpe(df).collect()
    }
    got_bpe2 = {
        r.doc_id: (r.n_bpe2_tokens, r.n_pretokens)
        for r in token_count_bpe2(df).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", list(rows))
    for did, n, dsf, dcf in con.execute(sql_repetition_stats()).fetchall():
        assert got_rep[did] == (n, dsf, dcf), f"repetition diverged on doc {did}"
    for did, nb, nw, _ in con.execute(sql_token_count_bpe()).fetchall():
        assert got_bpe[did] == (nb, nw), f"bpe diverged on doc {did}"
    for did, nb, np_, _ in con.execute(sql_token_count_bpe2()).fetchall():
        assert got_bpe2[did] == (nb, np_), f"bpe2 diverged on doc {did}"


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])


@given(st.lists(st.tuples(st.integers(0, 10**6), _text), min_size=1,
                max_size=10, unique_by=lambda t: t[0]))
@_settings
def test_winnow_and_fingerprint_cross_engine(spark, rows):
    """Winnowing fingerprints and the whole-document md5 agree across
    engines for arbitrary unicode — both depend on char-indexed
    substring + md5-of-UTF8 semantics matching exactly."""
    from webhookdb_spark.operators.text import (
        fingerprint,
        sql_fingerprint,
        sql_winnow_fingerprints,
        winnow_fingerprints,
    )

    df = spark.createDataFrame(list(rows), "doc_id long, text string")
    got_fp = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
    got_w = {(r.doc_id, r.fp) for r in winnow_fingerprints(df).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", list(rows))
    want_fp = dict(con.execute(sql_fingerprint()).fetchall())
    want_w = set(map(tuple, con.execute(sql_winnow_fingerprints()).fetchall()))
    assert got_fp == want_fp
    assert got_w == want_w


@given(st.lists(_text, min_size=1, max_size=16, unique=True))
@_settings
def test_comma_sep_converter_cross_engine(spark, strings):
    """The comma-split/trim converter (column.rb:55-67) yields identical
    arrays in both engines for arbitrary unicode values."""
    from webhookdb_spark.functions.converters import CONV_COMMA_SEP

    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {
        r.s: list(r.v)
        for r in df.select("s", CONV_COMMA_SEP.spark(F.col("s")).alias("v")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in strings])
    want = dict(con.execute(f"SELECT s, {CONV_COMMA_SEP.sql('s')} FROM t").fetchall())
    for s in strings:
        assert got[s] == list(want[s]), f"comma_sep diverged on {s!r}"


def test_lowercase_twins_on_unicode_edge_cases(spark):
    """Explicit nasty-case check for every twin that lowercases:
    Turkish dotted/dotless I, German sharp s, Greek final sigma,
    ligatures, full-width Latin. Full-Unicode lower() provably diverges
    between Java and DuckDB (İ → i+U+0307 and contextual final sigma on
    Java only), which is why the twins use locale-free ASCII
    translate-lowercasing — this pins that both engines agree under it,
    with the nasty characters passing through untouched."""
    from webhookdb_spark.operators.text import fingerprint, sql_fingerprint

    cases = ["İstanbul", "ıSPARTA", "STRASSE ß", "ΣΟΦΟΣ τέλος",
             "ＦＵＬＬＷＩＤＴＨ", "ﬁligature", "ǅungla"]
    rows = [(i, c) for i, c in enumerate(cases)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = dict(con.execute(sql_fingerprint()).fetchall())
    diverged = {cases[d] for d in got if got[d] != want[d]}
    assert not diverged, f"lowercase diverged on {diverged}"


@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=4),   # key id
                st.integers(min_value=0, max_value=6),   # ts (seconds)
                st.integers(min_value=0, max_value=99),  # payload value
            ),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=3,
    )
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_upsert_matches_reference_model(spark, batches):
    """Model-based check of THE core operator: a random sequence of
    envelope batches (duplicate keys, ties, stale updates, empty
    batches) through the real warehouse MERGE must land exactly where
    an in-memory reference model of the semantics lands:

    - intra-batch winner per key = max (received_at, arrival ordinal)
      (backfiller.rb:75-83 hash-overwrite order)
    - table update iff stored ts < winner ts (base.rb:861-879 guard);
      ties keep the stored row
    """
    import datetime as dt
    import json
    import shutil
    import tempfile

    from webhookdb_spark.operators.upsert import upsert_envelopes
    from webhookdb_spark.spec import Col, ReplicatorSpec
    from webhookdb_spark.storage import Warehouse
    from webhookdb_spark.types import ColumnType

    spec = ReplicatorSpec(
        name="model_sim",
        table="model_sim",
        remote_key=Col("k", ColumnType.TEXT),
        denorm_cols=(Col("at", ColumnType.TIMESTAMP), Col("v", ColumnType.INTEGER)),
        timestamp_col="at",
        update_where=lambda s, t: t("at") < s("at"),
        n_buckets=4,
    )
    base = dt.datetime(2026, 1, 1)
    model: dict[str, tuple[dt.datetime, int]] = {}
    wh_dir = tempfile.mkdtemp(prefix="whdb_model_")
    try:
        t = Warehouse(spark, wh_dir).table("org", "model_sim")
        for batch in batches:
            rows = [
                (json.dumps({"k": f"k{k}",
                             "at": (base + dt.timedelta(seconds=ts)).isoformat(),
                             "v": v}),
                 base + dt.timedelta(seconds=ts))
                for k, ts, v in batch
            ]
            env = spark.createDataFrame(rows, "body string, received_at timestamp") \
                if rows else spark.createDataFrame([], "body string, received_at timestamp")
            upsert_envelopes(t, env, spec)
            # reference model: per-key winner by (ts, arrival), then guard
            winners: dict[str, tuple[dt.datetime, int]] = {}
            for k, ts, v in batch:  # later arrival overwrites on >= ts
                key, at = f"k{k}", base + dt.timedelta(seconds=ts)
                if key not in winners or at >= winners[key][0]:
                    winners[key] = (at, v)
            for key, (at, v) in winners.items():
                if key not in model or model[key][0] < at:
                    model[key] = (at, v)
        got = {r.k: (r.at, r.v) for r in t.read().collect()}
        assert got == model
    finally:
        shutil.rmtree(wh_dir, ignore_errors=True)


# -- round-4 temporal joins + packing ----------------------------------------

_evt = st.tuples(
    st.integers(min_value=0, max_value=3),      # key
    st.integers(min_value=0, max_value=5000),   # seconds offset
    st.integers(min_value=0, max_value=10**6),  # payload
)


@given(
    st.lists(_evt, min_size=1, max_size=30),
    st.lists(_evt, min_size=0, max_size=30),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows):
    """The union-merge window construction must agree with pandas
    merge_asof (backward, by-key) on arbitrary event sets — a third
    independent implementation beyond the DuckDB ASOF oracle."""
    import datetime as dt

    import pandas as pd

    from webhookdb_spark.operators.joins import asof_join

    t0 = dt.datetime(2026, 1, 1)
    mk = lambda rows, tag: [  # noqa: E731
        (i + tag * 10**6, k, t0 + dt.timedelta(seconds=s), float(v))
        for i, (k, s, v) in enumerate(rows)
    ]
    # pandas merge_asof requires unique match candidates per ts to be
    # deterministic; dedupe right rows to one per (key, ts)
    rseen, rr = set(), []
    for row in mk(rrows, 2):
        if (row[1], row[2]) not in rseen:
            rseen.add((row[1], row[2]))
            rr.append(row)
    ll = mk(lrows, 1)
    schema = "event_id long, user_id long, ts timestamp, value double"
    out = asof_join(
        spark.createDataFrame(ll, schema),
        spark.createDataFrame(rr, schema) if rr
        else spark.createDataFrame([], schema),
        key="user_id", ts="ts", right_cols=("event_id",),
    ).collect()
    got = {r.event_id: r.event_id_r for r in out}

    lp = pd.DataFrame(ll, columns=["event_id", "user_id", "ts", "value"]).sort_values("ts", kind="stable")
    rp = pd.DataFrame(rr, columns=["event_id", "user_id", "ts", "value"]).sort_values("ts", kind="stable")
    if len(rp):
        m = pd.merge_asof(
            lp, rp, on="ts", by="user_id", direction="backward",
            suffixes=("", "_r"),
        )
        want = {
            int(r.event_id): (None if pd.isna(r.event_id_r) else int(r.event_id_r))
            for r in m.itertuples()
        }
    else:
        want = {int(e): None for e in lp.event_id}
    assert got == want


@given(st.lists(_evt, min_size=1, max_size=25),
       st.lists(_evt, min_size=0, max_size=25))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_range_join_matches_brute_force(spark, prows, irows):
    """Grid-bucketed point-in-interval join == the O(n*m) definition."""
    import datetime as dt

    from webhookdb_spark.operators.joins import range_join

    t0 = dt.datetime(2026, 1, 1)
    pts = [(k, t0 + dt.timedelta(seconds=s)) for k, s, _ in prows]
    ivs = [
        (i, k, t0 + dt.timedelta(seconds=s),
         t0 + dt.timedelta(seconds=s + 1 + (v % 300)))
        for i, (k, s, v) in enumerate(irows)
    ]
    pdf = spark.createDataFrame(pts, "user_id long, ts timestamp")
    idf = (
        spark.createDataFrame(
            ivs, "iid long, user_id long, start_ts timestamp, end_ts timestamp"
        )
        if ivs
        else spark.createDataFrame(
            [], "iid long, user_id long, start_ts timestamp, end_ts timestamp"
        )
    )
    got = {
        (r.user_id, r.ts, r.iid_i)
        for r in range_join(
            pdf, idf, key="user_id", grid_seconds=301, interval_cols=("iid",)
        ).collect()
    }
    want = {
        (k, ts, iid)
        for k, ts in set(pts)
        for iid, ik, s, e in ivs
        if ik == k and s <= ts < e
    }
    assert got == want


@given(st.lists(st.tuples(st.integers(0, 10**6), st.integers(0, 40)),
                min_size=1, max_size=40, unique_by=lambda t: t[0]))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_sequence_pack_layout_invariants(spark, rows):
    """For any corpus: offsets form a contiguous 0-based layout in
    deterministic order, pack arithmetic is self-consistent, and the
    Spark result equals the DuckDB twin."""
    from webhookdb_spark.operators.sampling import sequence_pack, sql_sequence_pack

    docs = [(i, " ".join(["w"] * max(n, 1))) for i, n in rows]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = sorted(sequence_pack(df, context_len=64).collect(),
                 key=lambda r: r.global_offset)
    total = 0
    for r in out:
        assert r.global_offset == total
        assert r.pack_id == r.global_offset // 64
        assert r.pack_offset == r.global_offset % 64
        end = r.global_offset + r.n_tokens - 1
        assert r.n_packs == end // 64 - r.pack_id + 1
        total += r.n_tokens

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    orows = sorted(
        [tuple(r) for r in con.execute(sql_sequence_pack(context_len=64)).fetchall()]
    )
    assert sorted([tuple(r) for r in out]) == orows


@given(st.lists(_text, min_size=1, max_size=20))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_segment_dedup_and_lm_score_cross_engine(spark, texts):
    """Round-4 twin pairs under adversarial unicode/whitespace text:
    segment dedup and the fixed-point bigram LM must agree with their
    DuckDB twins on arbitrary corpora (this test class found three real
    engine divergences in round 3)."""
    from webhookdb_spark.operators.dedup import segment_dedup, sql_segment_dedup
    from webhookdb_spark.operators.text import lm_familiarity, sql_lm_familiarity

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)

    s1 = sorted([tuple(r) for r in segment_dedup(df).collect()])
    o1 = sorted([tuple(r) for r in con.execute(sql_segment_dedup()).fetchall()])
    assert s1 == o1

    s2 = sorted([tuple(r) for r in lm_familiarity(df).collect()])
    o2 = sorted([tuple(r) for r in con.execute(sql_lm_familiarity()).fetchall()])
    assert s2 == o2


@given(st.lists(_text, min_size=1, max_size=20))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kmv_sketch_cross_engine(spark, texts):
    from webhookdb_spark.operators.sketches import kmv_distinct, sql_kmv_distinct

    docs = [(i, t, ["a", "b"][i % 2]) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", docs)
    s = sorted([tuple(r) for r in kmv_distinct(df, "lang", "text", k=8).collect()])
    o = sorted([tuple(r) for r in con.execute(sql_kmv_distinct(k=8)).fetchall()])
    assert s == o


@given(st.lists(_text, min_size=1, max_size=20))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_corpus_filter_cross_engine(spark, texts):
    from webhookdb_spark.operators.corpus import corpus_filter, sql_corpus_filter

    docs = [
        (i, t, ["en", "zh"][i % 2], ["src0", "src13"][(i // 2) % 2])
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, source string")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?)", docs)
    s = sorted([tuple(r) for r in corpus_filter(df).collect()])
    o = sorted([tuple(r) for r in con.execute(sql_corpus_filter()).fetchall()])
    assert s == o


@given(st.lists(_text, min_size=2, max_size=14))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_incremental_dedup_cross_engine(spark, texts):
    """Batch-vs-corpus LSH dedup twins under arbitrary text, including
    planted near-dup structure across the batch/corpus carve (every
    even doc repeats the preceding odd doc's text)."""
    from webhookdb_spark.operators.dedup import (
        incremental_minhash_dedup, sql_incremental_minhash_dedup,
    )

    docs = []
    for i, t in enumerate(texts):
        docs.append((i, texts[i - 1] if i % 2 == 1 and len(t) < 10 else t))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    s = sorted(
        tuple(r)
        for r in incremental_minhash_dedup(
            df.where(F.col("doc_id") % 2 == 0), df.where(F.col("doc_id") % 2 != 0)
        ).collect()
    )
    o = sorted(
        tuple(r)
        for r in con.execute(
            sql_incremental_minhash_dedup(new_pred="doc_id % 2 = 0")
        ).fetchall()
    )
    assert s == o


@given(st.lists(_text, min_size=1, max_size=16))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_retrieval_cross_engine(spark, texts):
    """Inverted index + ranked retrieval twins under arbitrary unicode
    corpora; query terms drawn from the corpus itself so matches are
    non-trivial."""
    from webhookdb_spark.operators.corpus import (
        inverted_index, search_ranked, sql_inverted_index, sql_search_ranked,
    )

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)

    s = sorted(
        (r.token, r.df_count, r.postings)
        for r in inverted_index(df).collect()
    )
    o = sorted(
        (t, c, p)
        for t, c, p in con.execute(sql_inverted_index()).fetchall()
    )
    assert s == o

    # terms: first token of the first doc + a never-present sentinel
    first = (texts[0].strip().split() or ["zz_absent"])[0]
    terms = (first, "zz_absent_term")
    s2 = sorted(tuple(r) for r in search_ranked(df, terms).collect())
    o2 = sorted(
        tuple(r)
        for r in con.execute(
            sql_search_ranked(terms=terms)
        ).fetchall()
    )
    assert s2 == o2


# -- round-5 PQ / IVF-PQ quantizer twins -------------------------------------

# fixed-point-friendly vector entries: multiples of 0.25 are exact in
# binary, so fold order cannot produce last-ulp divergence between the
# engines' IEEE sums
_vec8 = st.lists(
    st.integers(min_value=-8, max_value=8).map(lambda i: i / 4.0),
    min_size=8, max_size=8,
)


@given(st.lists(_vec8, min_size=4, max_size=12))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pq_and_ivfpq_cross_engine(spark, vecs):
    """The hand-rolled PQ / IVF-PQ numeric twins (seeding, fixed-point
    Lloyd, rounded L2 assignment, ADC fold order, tie-breaks) must
    agree between engines on arbitrary small corpora — the newest
    hand-rolled quantizers are exactly the class where the property
    suite keeps finding real divergences."""
    from webhookdb_spark.operators.similarity import (
        ann_topk_ivfpq, ann_topk_pq, sql_ann_topk_ivfpq, sql_ann_topk_pq,
    )

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)

    q = df.where(F.col("vec_id") < 2)
    s_pq = sorted(
        tuple(r)
        for r in ann_topk_pq(df, q, k=3, m=4, ksub=4).collect()
    )
    o_pq = sorted(
        tuple(r)
        for r in con.execute(
            sql_ann_topk_pq(query_pred="vec_id < 2", k=3, m=4, ksub=4, dims=8)
        ).fetchall()
    )
    assert s_pq == o_pq

    s_ip = sorted(
        tuple(r)
        for r in ann_topk_ivfpq(
            df, q, k=3, n_centroids=2, nprobe=1, m=4, ksub=4
        ).collect()
    )
    o_ip = sorted(
        tuple(r)
        for r in con.execute(
            sql_ann_topk_ivfpq(
                query_pred="vec_id < 2", k=3, n_centroids=2, nprobe=1,
                m=4, ksub=4, dims=8,
            )
        ).fetchall()
    )
    assert s_ip == o_ip


# -- round-5 vocab-coverage and cluster-profile twins ------------------------

@given(st.lists(_text, min_size=2, max_size=16))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_vocab_coverage_cross_engine(spark, texts):
    """OOV-rate twins under arbitrary unicode corpora — the top-K
    vocabulary boundary tie-break and the floor-quantized rate must
    agree between engines."""
    from webhookdb_spark.operators.corpus import sql_vocab_coverage, vocab_coverage

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)

    # tiny vocab so the top-K boundary actually cuts
    s = sorted(tuple(r) for r in vocab_coverage(df, vocab_size=3).collect())
    o = sorted(
        tuple(r) for r in con.execute(sql_vocab_coverage(vocab_size=3)).fetchall()
    )
    assert s == o


_vec4 = st.lists(
    st.integers(min_value=-8, max_value=8).map(lambda i: i / 4.0),
    min_size=4, max_size=4,
)


@given(st.lists(_vec4, min_size=3, max_size=10))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cluster_profile_cross_engine(spark, vecs):
    """Cluster-profile twins (IVF seed + fixed-point Lloyd + fixed-point
    tightness/purity) on arbitrary small corpora — the newest
    hand-rolled numeric twin pair."""
    from webhookdb_spark.operators.similarity import (
        embedding_cluster_profile, sql_cluster_profile,
    )

    rows = [(i, v, f"lab{i % 3}") for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[], label VARCHAR)"
    )
    con.executemany("INSERT INTO embeddings VALUES (?, ?, ?)", rows)

    n_c = min(3, len(vecs))
    s = sorted(
        tuple(r) for r in embedding_cluster_profile(df, n_centroids=n_c).collect()
    )
    o = sorted(
        tuple(r)
        for r in con.execute(sql_cluster_profile(n_centroids=n_c)).fetchall()
    )
    assert s == o


@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), _text),
            st.one_of(st.none(), st.integers(-10**18, 10**18)),
        ),
        min_size=1, max_size=20,
    )
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_profile_columns_cross_engine(spark, rows):
    """Profiler twins under adversarial unicode + NULLs: the string
    canonicalization, null accounting, and deterministic mode
    tie-break must agree between engines."""
    from webhookdb_spark.operators.profile import profile_columns, sql_profile_columns

    data = [(i, s, n) for i, (s, n) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, s string, n long")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, s VARCHAR, n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", data)

    got = sorted(tuple(r) for r in profile_columns(df).collect())
    want = sorted(
        tuple(r)
        for r in con.execute(
            sql_profile_columns("t", {"id": "num", "s": "raw", "n": "num"})
        ).fetchall()
    )
    assert got == want


def test_profile_columns_wide_numerics(spark):
    """Magnitudes beyond decimal(18,4) (the old canon) must still
    profile: 18-digit BIGINTs and doubles up to 1e30 canonicalize on
    both engines; past 32 integer digits BOTH engines null (try_cast),
    never one nulling while the other raises."""
    from webhookdb_spark.operators.profile import profile_columns, sql_profile_columns

    data = [
        (0, 999_999_999_999_999_999, 1e30),
        (1, -999_999_999_999_999_999, -1e30),
        (2, 7, 1e35),          # > decimal(38,6) -> NULL, consistently
        (3, None, None),
    ]
    df = spark.createDataFrame(data, "id long, big long, d double")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, big BIGINT, d DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", data)
    got = sorted(tuple(r) for r in profile_columns(df).collect())
    want = sorted(
        tuple(r)
        for r in con.execute(
            sql_profile_columns("t", {"id": "num", "big": "num", "d": "num"})
        ).fetchall()
    )
    assert got == want
    by_col = {r[0]: r for r in got}
    assert by_col["big"][2] == 1          # only the genuine NULL row
    assert by_col["d"][2] == 2            # 1e35 nulled + the real NULL
    # the 18-digit bigints canonicalized (would have overflowed (18,4))
    assert by_col["big"][4] == "-999999999999999999.000000"
    assert by_col["big"][5] == "999999999999999999.000000"


def test_profile_columns_approx_within_kmv_bounds(spark):
    """approx=True must keep every exact statistic byte-identical and
    estimate n_distinct within KMV error bounds (rel err ~1/sqrt(k-2);
    assert 5 sigma) — exact below k distincts."""
    from webhookdb_spark.operators.profile import profile_columns

    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    k = 256
    exact = {r.col_name: r for r in profile_columns(orders).collect()}
    approx = {
        r.col_name: r
        for r in profile_columns(orders, approx=True, kmv_k=k).collect()
    }
    assert set(exact) == set(approx)
    tol = 5.0 / (k - 2) ** 0.5
    for c, e in exact.items():
        a = approx[c]
        # everything but n_distinct is the same exact computation
        assert (a.n_rows, a.n_null, a.min_v, a.max_v, a.top_value,
                a.top_count) == (e.n_rows, e.n_null, e.min_v, e.max_v,
                                 e.top_value, e.top_count), c
        if e.n_distinct < k:
            assert a.n_distinct == e.n_distinct, c  # sketch saw everything
        else:
            rel = abs(a.n_distinct - e.n_distinct) / e.n_distinct
            assert rel <= tol, (c, a.n_distinct, e.n_distinct, rel)


_event_stream = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),            # key
        st.integers(min_value=0, max_value=50),           # ts offset (days)
        st.sampled_from(["a", "b", "c", None]),           # state
    ),
    min_size=1,
    max_size=40,
)


@given(_event_stream, st.integers(min_value=1, max_value=49))
@_settings
def test_scd2_apply_equals_rebuild_on_arbitrary_streams(spark, evs, cut):
    """For ANY event stream and ANY time cut, folding the tail batch
    into the head's SCD2 table equals the full rebuild — the
    incremental-maintenance contract under hypothesis's adversarial
    generation (exact-ts ties, NULL states, keys only in one side,
    empty batches)."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from webhookdb_spark.operators.history import scd2_apply, scd2_history

    rows = [
        (k, datetime(2024, 1, 1) + timedelta(days=d), i, s)
        for i, (k, d, s) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, state string"
    )
    cut_ts = datetime(2024, 1, 1) + timedelta(days=cut)
    full = scd2_history(df, "user_id", ("state",), "ts", "event_id")
    inc = scd2_apply(
        scd2_history(
            df.where(F.col("ts") < F.lit(cut_ts)),
            "user_id", ("state",), "ts", "event_id",
        ),
        df.where(F.col("ts") >= F.lit(cut_ts)),
        "user_id", ("state",), "ts", "event_id",
    )
    key = lambda r: (  # noqa: E731
        r.user_id, r.version, r.state, r.valid_from, r.valid_to, r.is_current
    )
    assert sorted(map(key, inc.collect())) == sorted(map(key, full.collect()))


_json_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**15), max_value=10**15),
    st.text(alphabet="abcdefghij XYZ.,-_0123456789", max_size=12),
)


@given(
    st.lists(
        st.fixed_dictionaries(
            {},
            optional={
                "doc_id": _json_scalar,
                "text": _json_scalar,
                "lang": _json_scalar,
                "n_chars": _json_scalar,
            },
        ),
        min_size=1,
        max_size=16,
    ),
    st.data(),
)
@_settings
def test_jsonl_quarantine_cross_engine(spark, dicts, data):
    """The quarantine classifier must agree between engines for
    arbitrary field subsets, JSON nulls, wrong-typed values, and a
    random truncation corruption — not just the fixture's five
    corruption classes."""
    import json as _json

    from webhookdb_spark.sources.jsonl import (
        parse_jsonl_with_quarantine,
        sql_parse_jsonl_with_quarantine,
    )

    fields = [("doc_id", "bigint"), ("text", "string"),
              ("lang", "string"), ("n_chars", "bigint")]
    lines = []
    for i, d in enumerate(dicts):
        s = _json.dumps(d)
        if data.draw(st.booleans()):
            s = s[: max(1, len(s) - data.draw(st.integers(1, 3)))]
        lines.append((i, s))

    df = spark.createDataFrame(lines, "src_id long, line string")
    out = parse_jsonl_with_quarantine(
        df, fields=fields, required=("text", "lang"))
    got = {r.src_id: (r.status, r.reason, r.doc_id_val, r.n_chars_val)
           for r in out.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE lines_t (src_id BIGINT, line VARCHAR)")
    con.executemany("INSERT INTO lines_t VALUES (?, ?)", lines)
    sql = sql_parse_jsonl_with_quarantine(
        "SELECT src_id, line FROM lines_t",
        fields=fields, required=("text", "lang"), keep=("src_id",))
    want = {
        r[0]: (r[-2], r[-1], r[1], r[4])
        for r in con.execute(
            f"SELECT src_id, doc_id_val, text_val, lang_val, n_chars_val,"
            f" status, reason FROM ({sql})"
        ).fetchall()
    }
    for i in got:
        assert got[i] == want[i], (i, lines[i][1], got[i], want[i])


@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=20),
        min_size=1, max_size=8,
    )
)
@_settings
def test_span_rewrite_invariants(spark, token_lists):
    """For arbitrary corpora: token counts are conserved
    (n_tokens == n_kept + n_removed), every doc comes back exactly
    once, removal is idempotent (rewriting the rewritten corpus with
    no remaining duplicate spans removes nothing more... only
    guaranteed when nothing was removed in pass 1 — a removal can
    create new adjacencies — so idempotence is asserted on the
    no-op case), and a corpus with all-unique windows passes through
    verbatim."""
    from webhookdb_spark.operators.dedup import remove_duplicate_spans

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_duplicate_spans(df, k=4).collect()
    assert sorted(r.doc_id for r in out) == sorted(i for i, _ in rows)
    by_id = {r.doc_id: r for r in out}
    for i, text in rows:
        r = by_id[i]
        assert r.n_tokens == r.n_kept + r.n_removed
        # clean_text's token count equals n_kept (empty text edge:
        # split('') yields [''], matching the operator's tokenizer)
        n_clean = len(r.clean_text.split(" ")) if r.clean_text else 0
        if r.n_kept > 0 and all(t for t in text.split(" ")):
            assert n_clean == r.n_kept
        if r.n_removed == 0 and r.n_tokens >= 1:
            # untouched docs come back byte-identical (modulo the
            # tokenizer's whitespace normalization)
            assert r.clean_text == " ".join(text.split())
    if all(r.n_removed == 0 for r in out):
        again = remove_duplicate_spans(
            spark.createDataFrame(
                [(r.doc_id, r.clean_text) for r in out],
                "doc_id long, text string"),
            k=4,
        ).collect()
        assert all(r.n_removed == 0 for r in again)


@given(
    st.dictionaries(
        st.integers(0, 7),
        st.lists(st.one_of(st.none(), st.integers(-50, 50)), max_size=12),
        min_size=1, max_size=8,
    ),
    st.integers(-60, 60),
    st.integers(0, 40),
    st.booleans(),
    st.data(),
)
@settings(max_examples=200, deadline=None)
def test_zonemap_candidates_never_skip_matching_rows(
    bucket_values, lo, width, hi_inclusive, data
):
    """Conservative-pruning property (retention delete / range read):
    a bucket excluded by zonemap_candidates must contain NO value in
    the window — under exact stats, randomly MISSING stats (pre-
    zonemap data: must stay candidates), and all-NULL buckets. Pure
    manifest arithmetic, no Spark."""
    import types

    from webhookdb_spark.storage import ManagedTable, Manifest

    hi = lo + width
    zonemaps = {}
    for b, vals in bucket_values.items():
        nn = [v for v in vals if v is not None]
        if data.draw(st.booleans(), label=f"stats_present_{b}"):
            zonemaps[str(b)] = {
                "v": [min(nn), max(nn)] if nn else [None, None]
            }
    m = Manifest(
        key="k", n_buckets=8, txn=1,
        buckets={str(b): f"buckets/{b}/v1" for b in bucket_values},
        schema_json="{}", zonemap_cols=["v"], zonemaps=zonemaps,
    )
    fake = types.SimpleNamespace(manifest=m)
    cands = ManagedTable.zonemap_candidates(
        fake, "v", lo, hi, hi_inclusive=hi_inclusive
    )
    assert set(cands) <= set(bucket_values)
    in_window = (
        (lambda v: lo <= v <= hi) if hi_inclusive
        else (lambda v: lo <= v < hi)
    )
    for b, vals in bucket_values.items():
        matching = [v for v in vals if v is not None and in_window(v)]
        if b not in cands:
            assert matching == [], (
                f"bucket {b} skipped but holds {matching} in "
                f"[{lo}, {hi}{']' if hi_inclusive else ')'}"
            )
        if str(b) not in zonemaps:
            assert b in cands  # stat-less buckets always read
    # untracked column -> None (caller must full-scan)
    assert ManagedTable.zonemap_candidates(fake, "other", lo, hi) is None


def test_zonemap_candidates_incomparable_types_degrade_to_full_scan():
    """Type-mismatched probes (string cutoffs against numeric zone
    stats — e.g. delete_stale_rows on a table whose tracked ts column
    is stored as epoch ints) must treat every stats-bearing bucket as
    a candidate, not raise TypeError: pruning is an optimization and
    the caller's residual filter keeps results exact."""
    import types

    from webhookdb_spark.storage import ManagedTable, Manifest

    m = Manifest(
        key="k", n_buckets=4, txn=1,
        buckets={str(b): f"buckets/{b}/v1" for b in range(4)},
        schema_json="{}", zonemap_cols=["ts"],
        zonemaps={
            "0": {"ts": [100, 200]},      # numeric stats vs str probe
            "1": {"ts": [None, None]},    # all-NULL: still skippable
            "2": {"ts": [300, 400]},
        },                                 # 3: stat-less
    )
    fake = types.SimpleNamespace(manifest=m)
    cands = ManagedTable.zonemap_candidates(
        fake, "ts", "2024-01-01", "2024-02-01", hi_inclusive=False
    )
    assert set(cands) == {0, 2, 3}


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.lists(
                st.sampled_from(["the", "spark", "merge", "window",
                                 "table", "row", "data", "of", "and"]),
                min_size=1, max_size=20,
            ),
        ),
        min_size=1, max_size=24,
    ),
    st.integers(1, 60),
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_token_budget_select_matches_greedy_model(spark, rows, budget):
    """token_budget_select == the obvious sequential greedy model:
    per source, walk docs in (quality desc, doc_id asc) order keeping
    each while the running token total stays within budget. The Spark
    window form must reproduce the sequential semantics exactly —
    including that one over-budget doc BLOCKS everything after it in
    that source (prefix-sum cut, not best-fit knapsack)."""
    from webhookdb_spark.operators.sampling import token_budget_select
    from webhookdb_spark.operators.text import quality_score

    docs = [(i, " ".join(words), src) for i, (src, words) in enumerate(rows)]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = sorted(
        (r.source, r.doc_id, r.n_tokens, r.cum_tokens)
        for r in token_budget_select(df, budget).collect()
    )

    q = {r.doc_id: (r.quality_score, r.n_tokens)
         for r in quality_score(df).collect()}
    want = []
    by_src: dict[str, list] = {}
    for i, _, src in docs:
        by_src.setdefault(src, []).append(i)
    for src, ids in by_src.items():
        ids.sort(key=lambda i: (-q[i][0], i))
        cum = 0
        for i in ids:
            cum += q[i][1]
            if cum > budget:
                break  # prefix cut: later (worse) docs blocked too
            want.append((src, i, q[i][1], cum))
    assert got == sorted(want)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["click", "view", "error"]),
            # small value set -> heavy ties (the tie-correction path is
            # the subtle arithmetic); fractions + negatives included
            st.sampled_from([-2.5, -1.0, 0.0, 0.125, 1.0, 1.0, 3.75, 10.0]),
        ),
        min_size=4, max_size=40,
    )
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mannwhitney_and_ks_cross_engine(spark, tmp_path_factory, rows):
    """Cross-engine property pin for the two rank statistics about to
    enter the driver rotation (VERDICT r8: 'subtlest arithmetic
    first'): on ARBITRARY tied/negative/fractional samples, Spark and
    the DuckDB twin must agree exactly — the integer tie identity
    (avgrank*2 = 2*min_rank + cnt - 1), the decimal(38)/HUGEINT rank
    sums, and the cross-multiplied KS distance leave no float seam to
    disagree over."""
    import duckdb as _duck

    import __spark_entry__ as entry

    # need at least one click and one view for the statistics to exist
    rows = rows + [("click", 1.0), ("view", 0.0)]
    data = [(i, g, float(v), None) for i, (g, v) in enumerate(rows)]
    tmp = tmp_path_factory.mktemp("mwks")
    spark.createDataFrame(
        [(i, g, v) for i, g, v, _ in data],
        "event_id long, event_type string, value double",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "events.parquet"))

    got_mw = [tuple(r) for r in entry.q_mannwhitney_u(spark, str(tmp)).collect()]
    got_ks = [tuple(r) for r in entry.q_ks_statistic(spark, str(tmp)).collect()]

    con = _duck.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{tmp}/events.parquet/*.parquet'"
    )
    want_mw = con.execute(entry.SQL_MANNWHITNEY_U).fetchall()
    want_ks = con.execute(entry.SQL_KS_STATISTIC).fetchall()
    assert got_mw == want_mw
    assert got_ks == want_ks
    # sanity bounds: effect in [0, 1e6], KS in [0, 1e6]
    assert 0 <= got_mw[0][3] <= 1_000_000
    assert 0 <= got_ks[0][2] <= 1_000_000


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            st.sampled_from([0.01, 1.0, 2.5, 2.5, 7.75, 100.0, 9999.99]),
            st.integers(1, 50),
        ),
        min_size=2, max_size=40,
    )
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_weighted_median_and_winsorize_cross_engine(
    spark, tmp_path_factory, rows
):
    """Cross-engine property pin for the remaining subtle-arithmetic
    statistics entering the driver rotation: weighted median (exact
    decimal cumulative-weight order statistic, tie-heavy prices) and
    percentile winsorization (exact interpolated bounds) must agree
    with the DuckDB twins on arbitrary inputs."""
    import duckdb as _duck

    import __spark_entry__ as entry
    from webhookdb_spark.operators.analytics import (
        sql_winsorize_summary,
        winsorize_summary,
    )

    tmp = tmp_path_factory.mktemp("wmw")
    li = spark.createDataFrame(
        [(f, p, q) for f, p, q in rows],
        "l_returnflag string, l_extendedprice double, l_quantity int",
    )
    li.coalesce(1).write.mode("overwrite").parquet(
        str(tmp / "lineitem.parquet")
    )
    got_wm = sorted(
        tuple(r)
        for r in entry.q_weighted_median_price(spark, str(tmp)).collect()
    )
    ev = spark.createDataFrame(
        [(i, f, p) for i, (f, p, _) in enumerate(rows)],
        "event_id long, event_type string, value double",
    )
    got_wz = sorted(
        tuple(r) for r in winsorize_summary(
            ev, "event_type", "value", lo_pct=0.1, hi_pct=0.9
        ).collect()
    )

    con = _duck.connect()
    con.execute("CREATE VIEW lineitem AS SELECT * FROM "
                f"'{tmp}/lineitem.parquet/*.parquet'")
    con.execute("CREATE TABLE events (event_id BIGINT, event_type VARCHAR, "
                "value DOUBLE)")
    con.executemany(
        "INSERT INTO events VALUES (?, ?, ?)",
        [(i, f, p) for i, (f, p, _) in enumerate(rows)],
    )
    want_wm = sorted(map(tuple, con.execute(
        entry.SQL_WEIGHTED_MEDIAN_PRICE).fetchall()))
    want_wz = sorted(map(tuple, con.execute(sql_winsorize_summary(
        "events", "event_type", "value", lo_pct=0.1, hi_pct=0.9
    )).fetchall()))
    assert got_wm == want_wm
    assert got_wz == want_wz


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["click", "view", "error"]),
            st.sampled_from(
                [-3.5, -1.0, 0.0, 0.01, 0.125, 1.0, 2.5, 7.75, 42.0]
            ),
        ),
        min_size=6, max_size=40,
    )
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_welch_and_ols_cross_engine(spark, tmp_path_factory, rows):
    """Random-input cross-engine pin for the floor-quantized double
    statistics (Welch t readout, group-wise OLS): both engines start
    from identical exact-decimal moments, but their decimal->double
    conversions can differ in the last ulp (the winsorize bug class),
    which a floor(x*1e6) would amplify into an off-by-one micro unit.
    Random tied/negative/fractional samples must agree exactly."""
    import duckdb as _duck

    import __spark_entry__ as entry
    from webhookdb_spark.operators.analytics import (
        groupwise_ols,
        sql_groupwise_ols,
    )

    # every group needs n >= 2 for a variance; 0.9 repeated makes the
    # group mean an exact-6dp value — the case where DuckDB's
    # decimal->double (900000*1e-6 = 0.8999999999999999) used to flip
    # a floor-quantized mean
    rows = rows + [("click", 1.0), ("click", 2.0), ("view", 0.5),
                   ("view", 3.0), ("error", 0.9), ("error", 0.9),
                   ("error", 0.9)]
    tmp = tmp_path_factory.mktemp("welch")
    spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)],
        "event_id long, event_type string, value double",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "events.parquet"))
    got_w = sorted(
        tuple(r) for r in entry.q_ab_test_readout(spark, str(tmp)).collect()
    )
    # group "P" is a perfect fit (y == x): slope_ppm/r2_ppm land
    # EXACTLY on 1e6 — the integral-ppm case round must keep stable
    ols_rows = [(g, v, float(i % 7)) for i, (g, v) in enumerate(rows)]
    ols_rows += [("P", 0.9, 0.9), ("P", 2.5, 2.5), ("P", 7.0, 7.0)]
    li = spark.createDataFrame(
        ols_rows,
        "l_returnflag string, l_discount double, l_quantity double",
    )
    got_ols = sorted(
        tuple(r) for r in groupwise_ols(
            li, "l_returnflag", "l_discount", "l_quantity"
        ).collect()
    )

    con = _duck.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"'{tmp}/events.parquet/*.parquet'")
    con.execute("CREATE TABLE lineitem (l_returnflag VARCHAR, "
                "l_discount DOUBLE, l_quantity DOUBLE)")
    con.executemany("INSERT INTO lineitem VALUES (?, ?, ?)", ols_rows)
    want_w = sorted(map(tuple, con.execute(
        entry.SQL_AB_TEST_READOUT).fetchall()))
    want_ols = sorted(map(tuple, con.execute(sql_groupwise_ols(
        "lineitem", "l_returnflag", "l_discount", "l_quantity"
    )).fetchall()))
    assert got_w == want_w
    assert got_ols == want_ols


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.sampled_from([-2.5, 0.0, 0.01, 1.0, 1.0, 3.75, 99.99]),
        ),
        min_size=2, max_size=40,
    ),
    st.integers(1, 500),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_neyman_allocation_cross_engine(spark, rows, total_n):
    """Random-input pin for Neyman allocation: the weight is
    floor(N_h * sqrt(pop-variance) * 1e6) with the variance built from
    exact decimal moments — the sqrt/floor runs in doubles, so the
    decimal->double seam class (winsorize bug) would flip weights by
    one. Strata with zero variance and singleton strata included."""
    import duckdb as _duck

    from webhookdb_spark.operators.sampling import (
        neyman_allocation,
        sql_neyman_allocation,
    )

    df = spark.createDataFrame(
        [(g, v) for g, v in rows], "event_type string, value double"
    )
    got = sorted(
        tuple(r)
        for r in neyman_allocation(df, "event_type", "value", total_n).collect()
    )
    con = _duck.connect()
    con.execute("CREATE TABLE events (event_type VARCHAR, value DOUBLE)")
    con.executemany("INSERT INTO events VALUES (?, ?)", list(rows))
    want = sorted(map(tuple, con.execute(sql_neyman_allocation(
        "events", "event_type", "value", total_n)).fetchall()))
    assert got == want
    # allocations never exceed stratum sizes and never go negative
    for _, n_rows, _, alloc in got:
        assert 0 <= alloc <= n_rows


@given(
    st.lists(
        st.tuples(
            st.integers(0, 30),  # day offsets with gaps and ties
            st.sampled_from([10.0, 10.0, 99.99, 250.5, 1000.0, 12345.67]),
        ),
        min_size=3, max_size=50,
    )
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_revenue_autocorrelation_cross_engine(spark, tmp_path_factory, rows):
    """Random-input pin for the lag-1..7 autocorrelation (floor-
    quantized ppm Pearson from exact decimal moments): gappy dates,
    tied days, constant stretches (zero-variance lags -> NULL rows)
    must agree across engines."""
    import datetime as _dt

    import duckdb as _duck

    import __spark_entry__ as entry

    tmp = tmp_path_factory.mktemp("acf")
    data = [
        (i, _dt.date(2024, 1, 1) + _dt.timedelta(days=d), v)
        for i, (d, v) in enumerate(rows)
    ]
    spark.createDataFrame(
        data, "o_orderkey long, o_orderdate date, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "orders.parquet"))
    got = sorted(
        tuple(r)
        for r in entry.q_revenue_autocorrelation(spark, str(tmp)).collect()
    )
    con = _duck.connect()
    con.execute("CREATE VIEW orders AS SELECT * FROM "
                f"'{tmp}/orders.parquet/*.parquet'")
    want = sorted(map(tuple, con.execute(
        entry.oracle_sql()["revenue_autocorrelation"]).fetchall()))
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1", "s2", "s3"]),
            # Words per doc: small range PLUS exact powers of 2 and 10 so
            # per-source totals frequently hit pow-integer boundaries —
            # e.g. n_tokens=1024 with alpha=0.5 makes n^alpha exactly 32,
            # the inputs where a libm-pow ulp used to flip floor().
            st.sampled_from(
                list(range(1, 31)) + [16, 64, 100, 256, 1000, 1024, 4096]
            ),
        ),
        min_size=1, max_size=40,
    ),
    st.sampled_from([0.5, 0.7, 1.0]),
    st.sampled_from([1000, 1024, 1_000_000]),
)
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mixture_plan_cross_engine(spark, rows, alpha, budget):
    """Random-input pin for the temperature mixture plan: the n^alpha
    weights run through libm pow (JVM vs glibc are each within an ulp
    but not guaranteed identical); the r11 rebuild quantizes pow to
    integer micro-units at that boundary and runs everything after —
    normalizer sum, both ratios, both quantizations — in exact
    integer/decimal arithmetic shared between the twins. Sweeps alpha
    in {0.5, 0.7, 1.0} and budgets including exact powers; alpha=1.0
    with power-of-two token totals makes p/t hit dyadic rationals,
    alpha=0.5 with square totals makes p itself integral — the worst
    boundary cases."""
    import duckdb as _duck

    from webhookdb_spark.operators.sampling import (
        mixture_plan,
        sql_mixture_plan,
    )

    docs = [(i, " ".join(["tok"] * w), src)
            for i, (src, w) in enumerate(rows)]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, source string"
    )
    got = sorted(
        tuple(r)
        for r in mixture_plan(
            df, alpha=alpha, budget_tokens=budget
        ).collect()
    )
    con = _duck.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, source VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", docs)
    want = sorted(map(tuple, con.execute(
        sql_mixture_plan("documents", alpha=alpha, budget_tokens=budget)
    ).fetchall()))
    assert got == want


def test_mixture_plan_ulp_invariance():
    """Simulated-foreign-libm pin for the r11 mixture_plan rebuild:
    replays the exact arithmetic contract of BOTH twins (quantize
    ``pow`` to integer micro-units at the libm boundary, then exact
    integer sum / half-up ratio via ``(2a+b) div (2b)``) in pure
    Python over the real sf0.01 per-source token masses, perturbing
    each ``pow`` output by up to ±200 ulps — two orders of magnitude
    beyond any real libm disagreement — and asserts the emitted plan
    is bit-identical. The r10 pin only proved the LOCAL engines agree
    (true even while the driver row was red); this one proves the
    chain is invariant under the cross-engine seam itself. Measured
    margin on this data: the nearest element sits ~12,000× the
    200-ulp band from its rounding half-boundary."""
    import math

    import duckdb as _duck

    from webhookdb_spark.operators import sampling as SA

    alpha, budget = 0.7, 10_000_000
    con = _duck.connect()
    rows = con.execute(
        SA.sql_mixture_plan_tokens().replace(
            "documents", "'/root/testdata/sf0.01/documents.parquet'"
        )
    ).fetchall()
    assert len(rows) >= 10

    def plan(perturb_ulps):
        pm = {}
        for i, (src, _nd, nt) in enumerate(rows):
            p = math.pow(float(nt), alpha)
            p += perturb_ulps(i) * math.ulp(p)
            v = p * 1e6
            pm[src] = math.floor(v + 0.5)  # round half-up, positive
        tm = sum(pm.values())
        out = {}
        for src, _nd, nt in rows:
            mix = (2 * 10**6 * pm[src] + tm) // (2 * tm)
            ep = (2 * 10**6 * budget * pm[src] + tm * nt) // (2 * tm * nt)
            out[src] = (mix, ep)
        return out

    base = plan(lambda i: 0)
    assert plan(lambda i: 200) == base
    assert plan(lambda i: -200) == base
    assert plan(lambda i: 200 if i % 2 else -200) == base
    for k in range(len(rows)):  # one element at a time, both directions
        assert plan(lambda i, k=k: 200 if i == k else 0) == base
        assert plan(lambda i, k=k: -200 if i == k else 0) == base


@given(
    st.lists(
        st.sampled_from([0.01, 0.9, 0.9, 1.0, 2.5, 2.5, 7.75, 100.0]),
        min_size=4, max_size=40,
    )
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_outliers_iqr_cross_engine(spark, values):
    """Random-input pin for the Tukey-fence outlier audit: tie-heavy
    samples make q1/q3 land ON data values where the engines'
    interpolation-formula ulp used to flip fence membership (the
    winsorize bug class). Fence arithmetic is exact decimal now —
    membership and quantized fences must agree on arbitrary input."""
    import duckdb as _duck

    from webhookdb_spark.operators.analytics import (
        outliers_iqr,
        sql_outliers_iqr,
    )

    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    got = sorted(
        tuple(r) for r in outliers_iqr(df, "value", "event_id").collect()
    )
    con = _duck.connect()
    con.execute("CREATE TABLE events (event_id BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        sql_outliers_iqr("value", "event_id", "events")).fetchall()))
    assert got == want


@given(
    st.lists(
        st.tuples(st.sampled_from("AB"), st.sampled_from("XY")),
        min_size=2, max_size=60,
    )
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_categorical_dependence_cross_engine(spark, pairs):
    """Random-input pin for the MI/entropy audit's libm-ln seam:
    near-independent 2x2 tables put per-cell mi terms at +/-ulp of 0,
    where the old floor(term*1e12) flipped between 0 and -1 across
    engines (JVM vs glibc ln). The term layer rounds now — every
    random contingency table must hash-match."""
    import duckdb as _duck

    from webhookdb_spark.operators.analytics import (
        categorical_dependence,
        sql_categorical_dependence,
    )

    rows = [(i, a, b) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "id long, ca string, cb string")
    got = sorted(
        tuple(r)
        for r in categorical_dependence(df, "ca", "cb").collect()
    )
    con = _duck.connect()
    con.execute("CREATE TABLE t (id BIGINT, ca VARCHAR, cb VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        sql_categorical_dependence("t", "ca", "cb")).fetchall()))
    assert got == want


@given(
    st.lists(
        st.tuples(st.sampled_from(["c0", "c1", "c2"]), st.booleans()),
        min_size=2, max_size=60,
    )
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_distribution_drift_cross_engine(spark, rows_in):
    """Random-input pin for the JS-drift libm-ln seam: when both
    snapshots have (near-)identical per-category proportions the js
    term sits at +/-ulp of 0 — the old floor(term*1e12) flipped its
    sign across engines there (0 vs -1e-12). Term layer rounds now."""
    import duckdb as _duck

    from webhookdb_spark.operators.analytics import (
        distribution_drift,
        sql_distribution_drift,
    )
    from pyspark.sql import functions as F

    cats = [c for c, _ in rows_in]
    if len(cats) % 2 == 0:
        # Skew toward identical snapshots: mirror every category into
        # both sides (p==q exactly per category — the +/-ulp-of-0
        # js_term case).
        rows = [(i, c, True) for i, c in enumerate(cats)] + [
            (i + len(cats), c, False) for i, c in enumerate(cats)
        ]
    else:
        # Random split, but keep both snapshots non-empty (the
        # operator's documented domain: proportions divide by each
        # side's total).
        rows = [(i, c, p) for i, (c, p) in enumerate(rows_in)]
        rows += [(len(rows), "c0", True), (len(rows) + 1, "c0", False)]
    df = spark.createDataFrame(rows, "id long, cat string, in_p boolean")
    got = sorted(
        tuple(r)
        for r in distribution_drift(df, "cat", F.col("in_p")).collect()
    )
    con = _duck.connect()
    con.execute("CREATE TABLE t (id BIGINT, cat VARCHAR, in_p BOOLEAN)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        sql_distribution_drift("t", "cat", "in_p")).fetchall()))
    assert got == want


@given(
    st.lists(
        # 2-dp money values; duplicates force interpolated percentiles
        # exactly ON the 1e-6 grid — the integer attractor where the
        # engines' different interpolation formulas (a+f*(b-a) vs
        # (1-f)*a+f*b) straddle the boundary by an ulp.
        st.sampled_from([10.25, 10.25, 99.99, 100.00, 107.13, 250.50]),
        min_size=1, max_size=25,
    )
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_order_percentiles_cross_engine(spark, tmp_path_factory, prices):
    """Random-input pin for the percentile quantization: 2-dp values
    at 1-2-dp interpolation factors put the true p*1e6 exactly on
    integers; quantization must be round (r10), floor flipped at the
    attractor."""
    import duckdb as _duck

    import __spark_entry__ as entry

    tmp = tmp_path_factory.mktemp("op_pcts")
    rows = [(i, f"P{i % 2}", float(v)) for i, v in enumerate(prices)]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "orders.parquet"))
    got = sorted(
        tuple(r)
        for r in entry.q_order_percentiles(spark, str(tmp)).collect()
    )
    con = _duck.connect()
    con.execute("CREATE VIEW orders AS SELECT * FROM "
                f"'{tmp}/orders.parquet/*.parquet'")
    want = sorted(map(tuple, con.execute(
        entry.oracle_sql()["order_percentiles"]).fetchall()))
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(1, 6),                     # user_id (collisions)
            st.integers(0, 5),                     # day offset (ts ties)
            st.sampled_from(["click", "purchase", "error", "view"]),
            st.sampled_from([0.01, 3.5, 120.0, 405.0, 450.0]),  # 405+ → quarantine
        ),
        min_size=1, max_size=18,
    )
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pipeline_lifecycle_cross_engine(spark, tmp_path_factory, rows_in):
    """Random-input pin for the full ops-lifecycle query: envelope
    intake → contract quarantine ('error' type, value > 400.00) →
     3-window MERGE → IVM matview → change-feed sync export, against
    the from-scratch SQL oracle. Generates user collisions, (user, ts)
    TIES (same window by construction — equal ts always lands in one
    arrival window, where last-wins keys on event_id, matching the
    oracle's event_id DESC), all-quarantined users (absent from the
    export), and empty middle windows."""
    import duckdb as _duck

    import __spark_entry__ as entry

    tmp = tmp_path_factory.mktemp("lifecycle")
    rows = [
        (i, f"2024-01-{10 + d:02d} 00:00:00", u, et, v)
        for i, (u, d, et, v) in enumerate(rows_in)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, "
              "event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp / "events.parquet")
    )
    got = sorted(
        tuple(r)
        for r in entry.q_pipeline_lifecycle(spark, str(tmp)).collect()
    )
    con = _duck.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"'{tmp}/events.parquet/*.parquet'")
    want = sorted(map(tuple, con.execute(
        entry.oracle_sql()["pipeline_lifecycle"]).fetchall()))
    assert got == want


@given(
    st.dictionaries(
        st.text(alphabet="ABCDEFGHabcdefgh_", min_size=1, max_size=10),
        st.text(
            alphabet="abc 123&=%+é中\r\n'\"",
            max_size=20,
        ),
        min_size=1, max_size=8,
    )
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_plivo_urlencode_roundtrip(spark, fields):
    """Random form fields through urlencode → the plivo unwrap must
    decode them back exactly (plus the MessageUUID key so the row
    isn't dropped): '&', '=', '%', '+', unicode, quotes, and CR/LF in
    VALUES all round-trip; keys stay plain form names."""
    import json
    from urllib.parse import urlencode

    from webhookdb_spark.replicators.misc import _plivo_unwrap

    fields = {"MessageUUID": "u1", **fields}
    body = urlencode(fields)
    df = spark.createDataFrame([(body,)], "body string")
    resource, _ = _plivo_unwrap(F.col("body"))
    got = json.loads(df.select(resource.alias("r")).collect()[0].r)
    assert got == fields


@given(
    st.dictionaries(
        st.from_regex(r"q[0-9]{1,3}_[a-z]{1,8}", fullmatch=True),
        st.one_of(
            st.text(alphabet="abc 123é", max_size=12),
            st.lists(st.text(alphabet="xy", max_size=4), max_size=3),
            st.integers(-5, 5),
        ),
        max_size=6,
    ),
    st.text(alphabet="abcdef-123", min_size=4, max_size=12),
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_jotform_multipart_questions_roundtrip(spark, answers, ev):
    """Random q<d>_ answers (strings, arrays, numbers) synthesized into
    a multipart POST the way Jotform sends them (rawRequest as a
    JSON-encoded form field) must come back as the cleaned-key
    questions map, with rawRequest parsed into the stored data."""
    import json

    from webhookdb_spark.replicators.misc import _jotform_prepare_udf

    raw = {"event_id": ev, "submitDate": "1609459200500", **answers}
    boundary = "--------------------------testBoundaryABC123"
    parts = [
        ("formID", "77"), ("submissionID", "88"),
        ("rawRequest", json.dumps(raw)),
    ]
    body = "".join(
        f"{boundary}\r\nContent-Disposition: form-data; "
        f'name="{k}"\r\n\r\n{v}\r\n'
        for k, v in parts
    ) + boundary + "--\r\n"
    df = spark.createDataFrame([(body,)], "body string")
    got = json.loads(
        df.select(_jotform_prepare_udf()(F.col("body")).alias("r"))
        .collect()[0].r
    )
    assert got["formID"] == "77"
    assert got["rawRequest"]["event_id"] == ev
    import re
    want_q = {re.sub(r"^q\d+_", "", k): v for k, v in answers.items()}
    assert got["questions"] == want_q


@given(
    headers=st.dictionaries(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd"),
                whitelist_characters="-_",
            ),
            min_size=1, max_size=12,
        ),
        st.text(min_size=0, max_size=16),
        max_size=8,
    ),
)
@settings(max_examples=30, deadline=None)
def test_canonicalize_headers_properties(spark, headers):
    """Header canonicalization invariants (logged_webhook.rb:186-188):
    every output key is lowercase; the output keys are exactly the
    lowercased input keys; every output value was SOME input value of
    a case-colliding key; idempotent."""
    import json as _json

    from pyspark.sql import functions as F

    from webhookdb_spark.sources.envelopes import canonicalize_headers

    df = spark.createDataFrame(
        [(_json.dumps(headers),)], "j string"
    ).select(F.from_json("j", "map<string,string>").alias("h"))
    once = df.select(canonicalize_headers(F.col("h")).alias("h"))
    got = once.collect()[0].h or {}
    assert set(got) == {k.lower() for k in headers}
    for k, v in got.items():
        assert v in {hv for hk, hv in headers.items() if hk.lower() == k}
    twice = once.select(canonicalize_headers(F.col("h")).alias("h"))
    assert (twice.collect()[0].h or {}) == got
