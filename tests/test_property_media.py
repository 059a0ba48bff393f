"""Property-based tests for the hand-rolled media byte walkers.

The decoders are exactly the code class where the round-3 property
suite found real cross-engine divergences in the text twins: manual
offset math over adversarial bytes. Three layers of properties:

1. the pure-Python parsers NEVER raise on arbitrary/truncated/mutated
   bytes (they return a value or None);
2. buffers built with planted parameters round-trip through the
   parsers exactly;
3. the Spark kernels and their DuckDB hex twins agree on media built
   from arbitrary unicode documents, and ``on_error='null'`` never
   kills a job regardless of payload.
"""

from __future__ import annotations

import struct

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from webhookdb_spark.operators import multimodal as M

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_PARSERS = (
    M._parse_image_header,
    M._parse_jpeg_dims,
    M._parse_tiff_dims,
    M._parse_webp_dims,
    M._parse_wav_header,
    M._parse_avi_frames,
    M._parse_avi_usec_per_frame,
)


# -- layer 1: parsers never raise -------------------------------------------

@given(st.binary(max_size=300))
@settings(max_examples=200, deadline=None)
def test_parsers_never_raise_on_arbitrary_bytes(buf):
    for p in _PARSERS:
        p(buf)  # any return value is fine; raising is the failure


@given(
    st.binary(min_size=2, max_size=120),
    st.integers(min_value=0, max_value=119),
    st.integers(min_value=0, max_value=255),
)
@settings(max_examples=200, deadline=None)
def test_parsers_never_raise_on_magic_prefixed_mutations(buf, pos, byte):
    """Adversarial case: buffers that START with a real magic number but
    carry arbitrary mutated tails — the path where offset math runs."""
    for magic in (b"BM", b"\x89PNG\r\n\x1a\n", b"GIF8", b"\xff\xd8",
                  b"II*\x00", b"MM\x00*", b"RIFF\x20\x00\x00\x00WEBP",
                  b"RIFF\x20\x00\x00\x00WAVE", b"RIFF\x20\x00\x00\x00AVI "):
        b = bytearray(magic + buf)
        if pos < len(b):
            b[pos] = byte
        for p in _PARSERS:
            p(bytes(b))


# -- layer 2: planted-parameter roundtrips ----------------------------------

def _wav(rate, ch, bits, data):
    block = max(ch * (bits // 8), 1)
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, ch, rate, rate * block, block, bits)
    d = b"data" + struct.pack("<I", len(data)) + data
    body = b"WAVE" + fmt + d
    return b"RIFF" + struct.pack("<I", len(body)) + body, block


@given(
    st.integers(min_value=1, max_value=384000),
    st.integers(min_value=1, max_value=8),
    st.sampled_from([8, 16, 24, 32]),
    st.binary(max_size=64),
    st.integers(min_value=0, max_value=120),
)
@settings(max_examples=120, deadline=None)
def test_wav_roundtrip_and_truncation(rate, ch, bits, data, cut):
    buf, block = _wav(rate, ch, bits, data)
    assert M._parse_wav_header(buf) == (rate, ch, bits, len(data) // block)
    M._parse_wav_header(buf[:cut])  # truncation: None or partial, no raise


def _avi(frames, usec):
    avih = (b"avih" + struct.pack("<I", 56) + struct.pack("<I", usec)
            + b"\x00" * 12 + struct.pack("<I", len(frames)) + b"\x00" * 36)
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    chunks = b"".join(
        b"00db" + struct.pack("<I", len(f)) + f + (b"\x00" if len(f) & 1 else b"")
        for f in frames)
    movi = b"LIST" + struct.pack("<I", 4 + len(chunks)) + b"movi" + chunks
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


@given(
    st.lists(st.binary(min_size=1, max_size=24), max_size=6),
    st.integers(min_value=0, max_value=10**6),
    st.integers(min_value=0, max_value=160),
)
@settings(max_examples=120, deadline=None)
def test_avi_roundtrip_and_truncation(frames, usec, cut):
    buf = _avi(frames, usec)
    assert M._parse_avi_frames(buf) == frames
    assert M._parse_avi_usec_per_frame(buf) == (usec or None)
    M._parse_avi_frames(buf[:cut])
    M._parse_avi_usec_per_frame(buf[:cut])


@given(
    st.integers(min_value=0, max_value=65535),
    st.integers(min_value=0, max_value=65535),
    st.binary(max_size=40),
    st.integers(min_value=0, max_value=80),
)
@settings(max_examples=120, deadline=None)
def test_jpeg_roundtrip_and_truncation(w, h, junk, cut):
    app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HH", 1, 1) + b"\x00\x00")
    com = b"\xff\xfe" + struct.pack(">H", len(junk) + 2) + junk
    sof = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
           + struct.pack(">HH", h, w) + b"\x01\x01\x11\x00")
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    buf = b"\xff\xd8" + app0 + com + sof + sos + b"entropy" + b"\xff\xd9"
    assert M._parse_jpeg_dims(buf) == (w, h)
    M._parse_jpeg_dims(buf[:cut])


@given(
    st.integers(min_value=1, max_value=16384),
    st.integers(min_value=1, max_value=16384),
    st.integers(min_value=0, max_value=80),
)
@settings(max_examples=120, deadline=None)
def test_tiff_webp_roundtrip_and_truncation(w, h, cut):
    tiff = (b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 2)
            + struct.pack("<HHI", 256, 4, 1) + struct.pack("<I", w)
            + struct.pack("<HHI", 257, 4, 1) + struct.pack("<I", h)
            + struct.pack("<I", 0))
    assert M._parse_tiff_dims(tiff) == (w, h)
    M._parse_tiff_dims(tiff[:cut])
    bits = (w - 1) | ((h - 1) << 14)
    vp8l = (b"RIFF" + struct.pack("<I", 18) + b"WEBP" + b"VP8L"
            + struct.pack("<I", 5) + b"\x2f" + struct.pack("<I", bits) + b"\x00")
    assert M._parse_webp_dims(vp8l) == (w, h)
    M._parse_webp_dims(vp8l[:cut])
    vp8x = (b"RIFF" + struct.pack("<I", 22) + b"WEBP" + b"VP8X"
            + struct.pack("<I", 10) + b"\x00" * 4
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))
    assert M._parse_webp_dims(vp8x) == (w, h)
    M._parse_webp_dims(vp8x[:cut])


# -- layer 3: cross-engine agreement + null-mode resilience ------------------

_text = st.text(
    alphabet=st.characters(blacklist_characters="\x00", codec="utf-8"),
    max_size=40,
)
_doc_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10**6), _text),
    min_size=1, max_size=10, unique_by=lambda t: t[0],
)


def _duck_docs(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", list(rows))
    return con


@given(_doc_rows)
@_settings
def test_bmp_and_jpeg_decode_cross_engine(spark, rows):
    df = spark.createDataFrame(list(rows), "doc_id long, text string")
    con = _duck_docs(rows)
    for build, sql in (
        (M.media_bmp_from_documents, M.sql_media_decode()),
        (M.media_jpeg_from_documents, M.sql_media_jpeg_decode()),
        (M.media_tiff_webp_from_documents, M.sql_media_tiff_webp_decode()),
    ):
        got = {
            r.media_id: (r.width, r.height, r.checksum)
            for r in M.decode_images(build(df)).collect()
        }
        want = {m: (w, h, c) for m, w, h, c in con.execute(sql).fetchall()}
        assert got == want


@given(_doc_rows)
@_settings
def test_wav_decode_and_avi_demux_cross_engine(spark, rows):
    df = spark.createDataFrame(list(rows), "doc_id long, text string")
    con = _duck_docs(rows)
    got_wav = {
        r.media_id: (r.sample_rate, r.n_channels, r.bits, r.n_samples, r.checksum)
        for r in M.decode_audio(M.media_wav_from_documents(df)).collect()
    }
    want_wav = {
        m: rest for m, *rest in
        (tuple(r) for r in con.execute(M.sql_media_wav_decode()).fetchall())
    }
    assert got_wav == {m: tuple(v) for m, v in want_wav.items()}
    got_avi = {
        (r.media_id, r.frame_idx): (r.n_bytes, r.checksum)
        for r in M.demux_avi_frames(M.media_avi_from_documents(df)).collect()
    }
    want_avi = {
        (m, i): (n, c)
        for m, i, n, c in con.execute(M.sql_media_avi_frames()).fetchall()
    }
    assert got_avi == want_avi


@given(st.lists(st.binary(max_size=80), min_size=1, max_size=8))
@_settings
def test_null_mode_never_dies_on_arbitrary_payloads(spark, payloads):
    """The 100 TB posture: one corrupt payload must become a filterable
    row, not a dead job — for images, audio, AND frame sampling."""
    rows = [
        (i, "video", bytearray(b), (None, None, None, 1000, None))
        for i, b in enumerate(payloads)
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    n = len(payloads)
    assert len(M.decode_images(media, on_error="null").collect()) == n
    assert len(M.decode_audio(media).collect()) == n
    out = M.sample_frames(media, every_ms=100, on_error="null").collect()
    # every input produces >= 1 row; undecodable ones produce NULL markers
    assert {r.media_id for r in out} == set(range(n))
    for r in out:
        if r.frame_bytes is None:
            assert r.frame_idx is None and r.frame_ms is None


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])


@given(_doc_rows)
@_settings
def test_audio_and_pixel_features_cross_engine(spark, rows):
    """The two real-DSP twins (PCM waveform stats, stride-aware pixel
    means) under arbitrary unicode payloads: multi-byte UTF-8 makes the
    byte/hex offset math adversarial in exactly the way ASCII fixtures
    are not."""
    df = spark.createDataFrame(list(rows), "doc_id long, text string")
    con = _duck_docs(rows)

    got = sorted(
        tuple(r) for r in M.audio_features(M.media_wav_from_documents(df)).collect()
    )
    want = sorted(tuple(r) for r in con.execute(M.sql_media_audio_features()).fetchall())
    assert got == want

    got = sorted(
        tuple(r)
        for r in M.image_pixel_features(M.media_bmp_from_documents(df)).collect()
    )
    want = sorted(tuple(r) for r in con.execute(M.sql_media_pixel_features()).fetchall())
    assert got == want
