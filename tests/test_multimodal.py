"""Multimodal plumbing tests: schema, batching, explosion geometry,
and the stub-gating contract (decode raises without a codec unless the
deterministic fake is requested)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from webhookdb_spark.operators import multimodal as M


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "a somewhat longer document body here"), (3, "x")],
        "doc_id long, text string",
    )


def test_media_schema_and_summary(spark):
    media = M.media_from_documents(_docs(spark), kind="image")
    # same field names and types (nullability differs by construction)
    assert [(f.name, f.dataType.simpleString()) for f in media.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in M.MEDIA_SCHEMA.fields
    ]
    rows = {r.media_id: r for r in M.media_summary(media).collect()}
    assert rows[1].n_bytes == len(b"hello world")
    assert rows[1].mime == "image/png"
    expect = hashlib.md5(b"hello world".hex().upper().encode()).hexdigest()
    assert rows[1].content_hash == expect


def test_byte_histogram_features_shape_and_norm(spark):
    media = M.media_from_documents(_docs(spark))
    out = {r.media_id: r for r in M.byte_histogram_features(media).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        feats = [r[f"f{i}"] for i in range(M.FEATURE_DIM)]
        assert abs(sum(feats) - 1.0) < 1e-9  # normalized histogram
    assert out[1].n_bytes == len(b"hello world")
    # "hello world": bytes 0x20-0x7f → only nibble buckets 2,6,7 populated
    assert out[1].f2 == 1 / 11  # the space
    assert out[1].f0 == 0.0


def test_byte_histogram_matches_duckdb_oracle(spark):
    import duckdb

    media = M.media_from_documents(_docs(spark))
    got = {
        r.media_id: [r[f"f{i}"] for i in range(M.FEATURE_DIM)]
        for r in M.byte_histogram_features(media).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM (VALUES "
                "(1, 'hello world'), (2, 'a somewhat longer document body here'), "
                "(3, 'x')) t(doc_id, text)")
    for row in con.execute(M.sql_byte_histogram_features()).fetchall():
        assert got[row[0]] == list(row[2:]), f"media_id {row[0]} mismatch"


def test_decode_images_gated_without_codec(spark):
    media = M.media_from_documents(_docs(spark))
    try:
        import PIL.Image  # noqa: F401

        pytest.skip("codec present; stub gate not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        M.decode_images(media)


def test_decode_images_fake_path(spark):
    media = M.media_from_documents(_docs(spark), kind="image")
    rows = {r.media_id: r for r in M.decode_images(media, allow_fake=True).collect()}
    meta = {r.media_id: r.meta for r in media.collect()}
    assert rows[2].width == meta[2]["width"]
    assert rows[2].checksum == hashlib.md5(
        "a somewhat longer document body here".encode()
    ).hexdigest()


def test_sample_frames_explosion_geometry(spark):
    media = M.media_from_documents(_docs(spark), kind="video")
    # duration_ms = n_bytes * 10; every_ms=40 => n_frames = dur//40 (>=1)
    out = M.sample_frames(media, every_ms=40)
    counts = {
        r.media_id: r.n
        for r in out.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    assert counts[1] == (len(b"hello world") * 10) // 40
    assert counts[3] == 1  # tiny payload still yields one frame
    # frames reassemble a prefix of the payload in index order
    frames = sorted(
        (r.frame_idx, bytes(r.frame_bytes))
        for r in out.where(F.col("media_id") == 1).collect()
    )
    joined = b"".join(b for _, b in frames)
    assert b"hello world".startswith(joined[: len(b"hello world")])
