"""Bulk JSONL quarantine ingestion: classification, reason priority,
typed value extraction (webhookdb_spark/sources/jsonl.py)."""

from __future__ import annotations

from webhookdb_spark.sources.jsonl import parse_jsonl_with_quarantine

FIELDS = [("doc_id", "bigint"), ("text", "string"),
          ("lang", "string"), ("n_chars", "bigint")]


def _parse(spark, rows):
    df = spark.createDataFrame(rows, "src_id long, line string")
    out = parse_jsonl_with_quarantine(
        df, fields=FIELDS, required=("text", "lang"))
    return {r.src_id: r for r in out.collect()}


def test_jsonl_quarantine_classes_and_values(spark):
    got = _parse(spark, [
        (1, '{"doc_id": 5, "text": "hi", "lang": "en", "n_chars": 2}'),
        (2, '{"doc_id": 6, "text": "x", "lang": "de", "n_chars": 1'),
        (3, '{"doc_id": 7, "text": "y", "n_chars": 2}'),
        (4, '{"doc_id": 8, "text": "z", "lang": null, "n_chars": 3}'),
        (5, '{"doc_id": 9, "text": "w", "lang": "fr", "n_chars": "xx"}'),
        (6, 'not json at all'),
    ])
    assert got[1].status == "valid" and got[1].reason is None
    assert (got[1].doc_id_val, got[1].text_val, got[1].lang_val,
            got[1].n_chars_val) == (5, "hi", "en", 2)
    assert got[2].reason == "malformed_json"
    assert got[3].reason == "missing_field:lang"
    # explicit JSON null == absent, deliberately
    assert got[4].reason == "missing_field:lang"
    assert got[5].reason == "bad_type:n_chars"
    assert got[5].n_chars_val is None and got[5].text_val == "w"
    assert got[6].reason == "malformed_json"
    assert all(r.status == "quarantined" for k, r in got.items() if k != 1)


def test_jsonl_quarantine_reason_priority_first_failure_wins(spark):
    # one line failing EVERY check after parse: missing text (declared
    # first in required) must win over missing lang and bad n_chars
    got = _parse(spark, [(1, '{"doc_id": 1, "n_chars": "xx"}')])
    assert got[1].reason == "missing_field:text"
    # lang present, text missing, n_chars bad: still text first
    got = _parse(spark, [(1, '{"doc_id": 1, "lang": "en", "n_chars": "xx"}')])
    assert got[1].reason == "missing_field:text"
    # all required present, only the cast fails
    got = _parse(spark, [(1, '{"doc_id": 1, "text": "t", "lang": "en", "n_chars": "xx"}')])
    assert got[1].reason == "bad_type:n_chars"


def test_jsonl_quarantine_numeric_coercion_and_passthrough_cols(spark):
    # JSON numbers coerce to their literal text before try_cast (the
    # string-first contract), and non-line input columns pass through
    got = _parse(spark, [(42, '{"doc_id": 3.0, "text": "t", "lang": "en", "n_chars": 7}')])
    r = got[42]
    assert r.src_id == 42 and r.status == "quarantined"
    # "3.0" does not try_cast to bigint: bad_type, not silent floor
    assert r.reason == "bad_type:doc_id"


def test_json_key_profile_classes_and_malformed_exclusion(spark):
    from webhookdb_spark.sources.jsonl import json_key_profile

    rows = [
        (1, '{"a": 1, "b": "x", "c": 2.5, "d": true, "e": null}'),
        (2, '{"a": -7, "f": [1,2], "g": {"h":1}}'),
        (3, '{"a": "12"}'),       # string "12" profiles as int — by design
        (4, 'broken {'),          # malformed: contributes nothing
    ]
    df = spark.createDataFrame(rows, "src_id long, line string")
    got = {(r.key, r.value_class): r.n
           for r in json_key_profile(df).collect()}
    assert got[("a", "int")] == 3
    assert got[("b", "string")] == 1
    assert got[("c", "float")] == 1
    assert got[("d", "bool")] == 1
    assert got[("e", "null")] == 1
    assert got[("f", "array")] == 1
    assert got[("g", "object")] == 1
    assert sum(n for (k, _), n in got.items() if k == "a") == 3


def test_jsonl_quarantine_runs_as_stream_with_two_sink_split(spark, tmp_warehouse):
    """The parser is a narrow map, so the SAME call works under
    readStream: a foreachBatch splits each micro-batch into valid and
    quarantine sinks, and the union of the two equals the batch
    parse of the same lines."""
    land = tmp_warehouse / "jsonl_land"
    land.mkdir(parents=True)
    lines = [
        '{"doc_id": 1, "text": "a", "lang": "en", "n_chars": 1}',
        '{"doc_id": 2, "text": "b", "lang": "de", "n_chars": 1',
        '{"doc_id": 3, "text": "c", "n_chars": 1}',
        '{"doc_id": 4, "text": "d", "lang": "fr", "n_chars": "xx"}',
    ]
    (land / "part0.txt").write_text("\n".join(lines) + "\n")

    valid_dir = str(tmp_warehouse / "valid")
    quar_dir = str(tmp_warehouse / "quarantine")

    def handle(batch, _bid):
        out = parse_jsonl_with_quarantine(
            batch.withColumnRenamed("value", "line"),
            fields=FIELDS, required=("text", "lang"))
        out.where("status = 'valid'").write.mode("append").parquet(valid_dir)
        out.where("status = 'quarantined'").write.mode("append").parquet(quar_dir)

    stream = spark.readStream.format("text").load(str(land))
    q = (stream.writeStream.foreachBatch(handle)
         .option("checkpointLocation", str(tmp_warehouse / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    valid = spark.read.parquet(valid_dir).collect()
    quar = spark.read.parquet(quar_dir).collect()
    assert [r.doc_id_val for r in valid] == [1]
    assert sorted(r.reason for r in quar) == [
        "bad_type:n_chars", "malformed_json", "missing_field:lang"]
    # stream result == batch result on the same lines
    batch_df = spark.createDataFrame([(l,) for l in lines], "line string")
    batch_out = parse_jsonl_with_quarantine(
        batch_df, fields=FIELDS, required=("text", "lang"))
    assert sorted((r.status, r.reason or "") for r in batch_out.collect()) == \
        sorted([(r.status, r.reason or "") for r in valid] +
               [(r.status, r.reason or "") for r in quar])


def test_anonymity_audit_k_and_l_flags(spark):
    """A 2-row class violates k=3 (but its 2 distinct sensitive values
    satisfy l=2); a 5-row class with one sensitive value satisfies k
    but violates l=2; a mixed large class passes both."""
    from webhookdb_spark.operators.profile import anonymity_audit

    rows = (
        [("seg_small", 0, 10), ("seg_small", 0, 11)]
        + [("seg_homog", 1, 42)] * 5
        + [("seg_ok", 2, i) for i in range(6)]
    )
    df = spark.createDataFrame(rows, "seg string, band int, nation int")
    got = {(r.seg, r.band): r for r in anonymity_audit(
        df, qi_cols=["seg", "band"], sensitive_col="nation", k=3, l=2
    ).collect()}
    small = got[("seg_small", 0)]
    assert (small.group_size, small.violates_k, small.violates_l) == (2, 1, 0)
    homog = got[("seg_homog", 1)]
    assert (homog.group_size, homog.n_sensitive_distinct,
            homog.violates_k, homog.violates_l) == (5, 1, 0, 1)
    ok = got[("seg_ok", 2)]
    assert (ok.violates_k, ok.violates_l) == (0, 0)


def test_fd_audit_verdicts_and_branching(spark):
    """An FD that holds reports 0 violations / holds=1; a broken one
    counts exactly the violating determinant values and the worst
    fan-out."""
    from webhookdb_spark.operators.profile import fd_audit

    rows = [
        (1, "a", "x"), (1, "a", "x"),     # det 1 -> one dep value
        (2, "b", "x"), (2, "b", "y"),     # det 2 -> 2 deps (violates)
        (3, "c", "x"), (3, "c", "y"), (3, "c", "z"),  # 3 deps
    ]
    df = spark.createDataFrame(rows, "k int, d string, v string")
    got = {(r.determinant, r.dependent): r for r in fd_audit(
        df, candidates=[("k", "d"), ("k", "v")]).collect()}
    holds = got[("k", "d")]
    assert (holds.n_det_values, holds.n_violating,
            holds.max_branching, holds.holds) == (3, 0, 1, 1)
    broken = got[("k", "v")]
    assert (broken.n_det_values, broken.n_violating,
            broken.max_branching, broken.holds) == (3, 2, 3, 0)


def test_integer_cast_gate_cross_engine_regression(spark):
    """The '0.' falsifying example found by the hypothesis pin,
    deterministic: DuckDB's TRY_CAST('0.' AS BIGINT) truncates to 0
    where Spark yields NULL — both twins now gate integer casts on the
    integral-string shape, so non-integral strings are bad_type on
    BOTH engines."""
    import duckdb

    from webhookdb_spark.sources.jsonl import (
        parse_jsonl_with_quarantine,
        sql_parse_jsonl_with_quarantine,
    )

    fields = [("doc_id", "bigint"), ("text", "string")]
    lines = [
        (0, '{"doc_id": "0."}'),
        (1, '{"doc_id": "1e3", "text": "x"}'),
        (2, '{"doc_id": " 7 ", "text": "x"}'),
        (3, '{"doc_id": "+5", "text": "x"}'),
        (4, '{"doc_id": "007", "text": "x"}'),
    ]
    df = spark.createDataFrame(lines, "src_id long, line string")
    got = {
        r.src_id: (r.status, r.reason, r.doc_id_val)
        for r in parse_jsonl_with_quarantine(
            df, fields=fields, required=("text",)).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE lt (src_id BIGINT, line VARCHAR)")
    con.executemany("INSERT INTO lt VALUES (?, ?)", lines)
    sql = sql_parse_jsonl_with_quarantine(
        "SELECT src_id, line FROM lt", fields=fields,
        required=("text",), keep=("src_id",))
    want = {
        r[0]: (r[3], r[4], r[1])
        for r in con.execute(
            f"SELECT src_id, doc_id_val, text_val, status, reason"
            f" FROM ({sql})").fetchall()
    }
    assert got == want
    assert got[0] == ("quarantined", "missing_field:text", None)
    assert got[1] == ("quarantined", "bad_type:doc_id", None)  # 1e3 gated
    assert got[2] == ("valid", None, 7)
    assert got[3] == ("valid", None, 5)
    assert got[4] == ("valid", None, 7)
