"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Design: media live as **opaque ``binary`` columns plus a typed metadata
struct** — the only representation that survives 100 TB (content stays
columnar/compressed in parquet, metadata is pushdown-filterable, and
Spark never interprets the bytes until a Pandas-UDF stage asks it to).

    media(media_id long, kind string, content binary,
          meta struct<mime string, width int, height int,
                      duration_ms long, sample_rate int>)

Decode strategy (round 3): this container ships no codec libraries
(PIL/librosa/av) and installs are prohibited, but *headerful* formats
need no codec at all — BMP/PNG/GIF dimensions and WAV fmt-chunk fields
sit at fixed offsets a pure-Python ``struct`` parse reads directly. So
``decode_images`` / ``decode_audio`` are now REAL decoders for those
formats (`_parse_image_header` / `_parse_wav_header`), with PIL as an
import-gated fallback for compressed formats and the deterministic
metadata fake only behind ``allow_fake``. Frame extraction is REAL for
RIFF/AVI containers (``_parse_avi_frames`` chunk walk, used by both
``demux_avi_frames`` and ``sample_frames``, frame clock from the
container's own ``dwMicroSecPerFrame``); non-AVI video sampling
(inherently codec-bound) raises by default, emits filterable NULL
marker rows under ``on_error='null'``, and produces the clearly-marked
deterministic fake only behind ``allow_fake`` — identical explosion
geometry, schema, and partitioning on every branch.

Scale notes: binary payloads make row-group sizing the lever —
keep ``spark.sql.files.maxPartitionBytes`` at the default 128 MB and
let ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set small here)
bound Arrow batch memory, since one batch holds ``batch_rows × avg
media size`` bytes. Feature extraction shuffles nothing; frame
sampling multiplies rows, so it repartitions first.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from webhookdb_spark.operators.util import scale_out

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

META_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", META_TYPE),
    ]
)

_KIND_MIME = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Derive a deterministic media table from the ``documents`` table
    (UTF-8 bytes of the text as the opaque payload) — the fixture
    generator for multimodal plumbing, not a decoder."""
    mime = _KIND_MIME[kind]
    content = F.encode(F.col("text"), "UTF-8")
    n = F.octet_length(content)
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.when(F.lit(kind == "image"), (n % 640 + 1).cast("int")).alias("width"),
        F.when(F.lit(kind == "image"), (n % 480 + 1).cast("int")).alias("height"),
        F.when(F.lit(kind != "image"), (n * 10).cast("long")).alias("duration_ms"),
        F.when(F.lit(kind == "audio"), F.lit(16000)).alias("sample_rate"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        content.alias("content"),
        meta.alias("meta"),
    )


def media_summary(media: DataFrame) -> DataFrame:
    """Typed-metadata + payload summary, fully native (no UDF): byte
    length and a portable content hash — md5 over the uppercase hex of
    the payload, which DuckDB reproduces as ``md5(hex(blob))``. (Spark's
    ``base64`` would be the natural choice but it MIME-chunks at 76
    chars, which other engines don't.)"""
    return media.select(
        "media_id",
        "kind",
        F.col("meta.mime").alias("mime"),
        F.octet_length("content").alias("n_bytes"),
        F.md5(F.hex(F.col("content")).cast("binary")).alias("content_hash"),
    )


def sql_media_summary(table: str = "documents", kind: str = "image") -> str:
    """DuckDB twin of media_from_documents → media_summary."""
    return f"""
    SELECT doc_id AS media_id, '{kind}' AS kind, '{_KIND_MIME[kind]}' AS mime,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(hex(encode(text))) AS content_hash
    FROM {table}
    """


# -- Pandas-UDF kernels ------------------------------------------------------

FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType(
    [T.StructField("media_id", T.LongType()), T.StructField("n_bytes", T.IntegerType())]
    + [T.StructField(f"f{i}", T.DoubleType()) for i in range(FEATURE_DIM)]
)


def byte_histogram_features(media: DataFrame) -> DataFrame:
    """Feature extraction over the opaque payload: normalized histogram
    of byte values in 16 buckets, one scalar double column per bucket
    (``f0``..``f15`` — scalars, not ``array<double>``, so any downstream
    engine/canonicalizer can sort and hash the result).

    This is the real multimodal plumbing: Arrow-batched ``mapInPandas``
    (never row-at-a-time Python), numpy-vectorized inside the batch. A
    codec-backed embedding model drops into the same iterator.

    Values are unrounded IEEE-754 ``count/total`` quotients: both numpy
    and any SQL engine compute the identical double for the same two
    ints, whereas round-to-6 can straddle a half-even/half-away tie
    (e.g. 4/512) across engines.
    """
    import numpy as np

    dim = FEATURE_DIM
    bucket = 256 // dim

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            hists = np.zeros((n, dim), dtype="int64")
            sizes = np.zeros(n, dtype="int32")
            for j, buf in enumerate(pdf["content"]):
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                sizes[j] = len(arr)
                hists[j] = np.bincount(arr // bucket, minlength=dim)[:dim]
            feats = hists / np.maximum(sizes, 1)[:, None]
            out = {"media_id": pdf["media_id"], "n_bytes": sizes}
            for i in range(dim):
                out[f"f{i}"] = feats[:, i]
            yield pd.DataFrame(out)

    return scale_out(media.select("media_id", "content")).mapInPandas(
        extract, schema=_FEATURES_SCHEMA
    )


def sql_byte_histogram_features(table: str = "documents") -> str:
    """DuckDB twin of media_from_documents → byte_histogram_features.

    With dim=16 the bucket of a byte is exactly its high nibble, so the
    histogram falls out of ``hex(encode(text))``: strip every second hex
    char (``regexp_replace('(.).', '\\1')``) leaving one nibble per
    byte, then count each hex digit by length-difference."""
    digits = "0123456789ABCDEF"
    fcols = ",\n  ".join(
        "CAST(length(hi) - length(replace(hi, '%s', '')) AS DOUBLE)"
        " / greatest(n_bytes, 1) AS f%d" % (d, i)
        for i, d in enumerate(digits)
    )
    return f"""
WITH nib AS (
  SELECT doc_id AS media_id,
         CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         regexp_replace(hex(encode(text)), '(.).', '\\1', 'g') AS hi
  FROM {table}
)
SELECT media_id, n_bytes,
  {fcols}
FROM nib
"""


# -- Real zero-dependency decoders -------------------------------------------
#
# Headerful formats carry their dimensions/parameters at fixed or
# chunk-addressed offsets; parsing them needs `struct`, not a codec.
# (Reference analog: the engine's converters parse provider payload
# bytes/strings directly — lib/webhookdb/replicator/column.rb — rather
# than shelling to a library; same spirit for media headers.)


def _parse_image_header(buf: bytes) -> tuple[int, int] | None:
    """(width, height) from a BMP / PNG / GIF / JPEG / TIFF / WebP
    header, else None."""
    import struct

    if len(buf) >= 26 and buf[:2] == b"BM":
        w, h = struct.unpack_from("<ii", buf, 18)
        return w, abs(h)  # negative height = top-down DIB
    if len(buf) >= 24 and buf[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack_from(">II", buf, 16)
        return int(w), int(h)
    if len(buf) >= 10 and buf[:4] in (b"GIF8",):
        w, h = struct.unpack_from("<HH", buf, 6)
        return w, h
    if len(buf) >= 4 and buf[:2] == b"\xff\xd8":
        return _parse_jpeg_dims(buf)
    if len(buf) >= 8 and buf[:4] in (b"II*\x00", b"MM\x00*"):
        return _parse_tiff_dims(buf)
    if len(buf) >= 20 and buf[:4] == b"RIFF" and buf[8:12] == b"WEBP":
        return _parse_webp_dims(buf)
    return None


def _parse_jpeg_dims(buf: bytes) -> tuple[int, int] | None:
    """Walk JPEG marker segments to the first SOFn frame header and
    read its height/width fields — pure ``struct``, no codec (the SOF
    always precedes the entropy-coded scan, so decoding never starts).
    Covers baseline (SOF0), extended (SOF1), progressive (SOF2) and
    the other SOFn variants; DHT/JPG/DAC (C4/C8/CC) are not frame
    headers and are skipped like any other segment."""
    import struct

    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            return None  # lost sync: not a well-formed marker stream
        marker = buf[pos + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone markers
            pos += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF: give up
            return None
        seg_len = struct.unpack_from(">H", buf, pos + 2)[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 <= len(buf):
                h, w = struct.unpack_from(">HH", buf, pos + 5)
                return w, h
            return None
        pos += 2 + seg_len
    return None


def _parse_tiff_dims(buf: bytes) -> tuple[int, int] | None:
    """Walk TIFF IFD0 to tags 256/257 (ImageWidth/ImageLength) — pure
    ``struct`` over the TIFF 6.0 directory layout, both byte orders
    (``II``/``MM``); SHORT(3) and LONG(4) values are inline in the
    12-byte entry's value field, so no second seek is needed. Any
    other value type, a truncated directory, or a missing tag yields
    None (corrupt payloads become filterable rows, not dead tasks)."""
    import struct

    if len(buf) < 8:  # callable on raw bytes too, not just behind magic
        return None
    endian = "<" if buf[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(endian + "I", buf, 4)
    if ifd_off + 2 > len(buf):
        return None
    (n_entries,) = struct.unpack_from(endian + "H", buf, ifd_off)
    width = height = None
    for i in range(n_entries):
        entry = ifd_off + 2 + 12 * i
        if entry + 12 > len(buf):
            return None
        tag, vtype = struct.unpack_from(endian + "HH", buf, entry)
        if tag not in (256, 257):
            continue
        if vtype == 3:  # SHORT
            (val,) = struct.unpack_from(endian + "H", buf, entry + 8)
        elif vtype == 4:  # LONG
            (val,) = struct.unpack_from(endian + "I", buf, entry + 8)
        else:
            return None
        if tag == 256:
            width = int(val)
        else:
            height = int(val)
        if width is not None and height is not None:
            return width, height
    return None


def _parse_webp_dims(buf: bytes) -> tuple[int, int] | None:
    """Canvas (width, height) from a RIFF/WEBP payload via the same
    word-aligned chunk walk as :func:`_parse_wav_header`, reading
    whichever frame-header chunk appears (RFC 9649 wire layouts):
    ``VP8 `` lossy (start code ``9D 01 2A`` then 14-bit LE dims),
    ``VP8L`` lossless (``2F`` then width-1/height-1 packed 14+14 bits),
    ``VP8X`` extended (24-bit LE canvas minus-one fields). No entropy
    decoding — the dimensions precede the coded data in all three."""
    import struct

    pos = 12
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        body = pos + 8
        if cid == b"VP8 " and body + 10 <= len(buf):
            if buf[body + 3 : body + 6] != b"\x9d\x01\x2a":
                return None
            w, h = struct.unpack_from("<HH", buf, body + 6)
            return w & 0x3FFF, h & 0x3FFF
        if cid == b"VP8L" and body + 5 <= len(buf):
            if buf[body] != 0x2F:
                return None
            (bits,) = struct.unpack_from("<I", buf, body + 1)
            return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
        if cid == b"VP8X" and body + 10 <= len(buf):
            w = int.from_bytes(buf[body + 4 : body + 7], "little") + 1
            h = int.from_bytes(buf[body + 7 : body + 10], "little") + 1
            return w, h
        pos = body + size + (size & 1)  # chunks are word-aligned
    return None


def _parse_wav_header(buf: bytes) -> tuple[int, int, int, int] | None:
    """(sample_rate, n_channels, bits, n_samples) from a RIFF/WAVE
    payload via a real chunk walk (fmt may sit anywhere), else None."""
    import struct

    if len(buf) < 20 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        if cid == b"fmt " and pos + 8 + 16 <= len(buf):
            fmt = struct.unpack_from("<HHIIHH", buf, pos + 8)
        elif cid == b"data":
            data_size = min(size, len(buf) - pos - 8)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        return None
    _, n_channels, sample_rate, _, block_align, bits = fmt
    n_samples = (data_size or 0) // max(block_align, 1)
    return sample_rate, n_channels, bits, n_samples


def _hex_md5(buf: bytes) -> str:
    """md5 over the uppercase-hex text of the payload — the portable
    content hash (DuckDB: ``md5(hex(blob))``), same convention as
    media_summary."""
    import hashlib

    return hashlib.md5(buf.hex().upper().encode()).hexdigest()


_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def decode_images(
    media: DataFrame, allow_fake: bool = False, on_error: str = "raise"
) -> DataFrame:
    """Decode image payloads to (width, height, payload checksum).

    REAL for headerful formats: BMP/PNG/GIF/TIFF/WebP dimensions are
    parsed from the bytes by ``_parse_image_header`` (TIFF via the
    IFD0 tag walk, WebP via the RIFF chunk walk over all three frame
    headers), and JPEG dimensions by the SOFn marker walk
    (``_parse_jpeg_dims``) — no codec library involved. Other
    compressed formats fall back to PIL when importable; otherwise ``allow_fake`` substitutes metadata dimensions, and with
    neither available an unrecognized payload follows ``on_error``:
    ``"raise"`` fails the task (strict pipelines), ``"null"`` emits
    NULL dimensions — the 100 TB posture, where one corrupt payload
    must become a filterable row, not a dead job (same convention as
    :func:`decode_audio`). Arrow-batched ``mapInPandas``; no row
    iterators.
    """
    if on_error not in ("raise", "null"):
        raise ValueError("on_error must be 'raise' or 'null'")
    try:  # pragma: no cover - codec not present in this container
        import PIL.Image  # noqa: F401

        have_codec = True
    except ImportError:
        have_codec = False

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io

        import pandas as pd

        for pdf in batches:
            bufs = [bytes(b) for b in pdf["content"]]
            dims: list[tuple[int | None, int | None]] = []
            for buf, meta in zip(bufs, pdf["meta"]):
                parsed = _parse_image_header(buf)
                if parsed is None and have_codec:  # pragma: no cover
                    import PIL.Image

                    # A PIL-unreadable payload must fall through to the
                    # allow_fake / on_error ladder, not kill the task —
                    # the codec is an upgrade, not a new failure mode.
                    try:
                        parsed = PIL.Image.open(io.BytesIO(buf)).size
                    except Exception:
                        parsed = None
                if parsed is None:
                    if allow_fake:
                        parsed = (int(meta["width"] or 0), int(meta["height"] or 0))
                    elif on_error == "raise":
                        raise NotImplementedError(
                            "unrecognized image format (not BMP/PNG/GIF/JPEG/"
                            "TIFF/WebP) and no codec available; install "
                            "pillow, pass allow_fake, or use on_error='null'"
                        )
                    else:
                        parsed = (None, None)
                dims.append(parsed)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array([w for w, _ in dims], dtype="Int32"),
                    "height": pd.array([h for _, h in dims], dtype="Int32"),
                    "checksum": [_hex_md5(b) for b in bufs],
                }
            )

    return scale_out(media.select("media_id", "content", "meta")).mapInPandas(
        decode, schema=_DECODED_SCHEMA
    )


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def decode_audio(media: DataFrame) -> DataFrame:
    """Decode RIFF/WAVE payloads to (sample_rate, n_channels, bits,
    n_samples, checksum) — a real chunk-walking parser, codec-free.
    Unrecognized payloads yield NULL fields (so a mixed corpus maps to
    a filterable column, not a failed job)."""

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            bufs = [bytes(b) for b in pdf["content"]]
            parsed = [_parse_wav_header(b) for b in bufs]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [p[0] if p else None for p in parsed],
                    "n_channels": [p[1] if p else None for p in parsed],
                    "bits": [p[2] if p else None for p in parsed],
                    "n_samples": [p[3] if p else None for p in parsed],
                    "checksum": [_hex_md5(b) for b in bufs],
                }
            )

    return scale_out(media.select("media_id", "content")).mapInPandas(
        decode, schema=_AUDIO_SCHEMA
    )


# -- Hex-assembled fixtures (engine-portable real payloads) ------------------
#
# Both engines assemble the identical payload as an uppercase hex string
# from the documents table — Spark materializes it to binary via unhex()
# so the kernels parse *real bytes*, while the DuckDB twin parses the
# same bytes out of the hex text at the same offsets. No files, no
# codecs, and the oracle genuinely re-reads the header fields.


def _le_hex(c, nbytes: int):
    """Little-endian uppercase hex of an int Column (Spark side)."""
    c = c.cast("long")
    return F.format_string(
        "%02X" * nbytes,
        *[F.shiftright(c, 8 * i).bitwiseAND(F.lit(255)) for i in range(nbytes)],
    )


def _sql_le_hex(expr: str, nbytes: int) -> str:
    """DuckDB twin of _le_hex."""
    fmt = "%02X" * nbytes
    args = ", ".join(f"(({expr}) >> {8 * i}) & 255" for i in range(nbytes))
    return f"printf('{fmt}', {args})"


def _sql_hex_byte(hex_col: str, p: int) -> str:
    """DuckDB: the unsigned value of byte ``p`` (0-based) of an
    uppercase hex string."""
    hi = f"(strpos('0123456789ABCDEF', substr({hex_col}, {2 * p + 1}, 1)) - 1)"
    lo = f"(strpos('0123456789ABCDEF', substr({hex_col}, {2 * p + 2}, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


def _sql_le_int(hex_col: str, byte_off: int, nbytes: int) -> str:
    """DuckDB: parse a little-endian unsigned int out of an uppercase
    hex string at a 0-based byte offset (pure string math — no blob
    functions needed because hex text IS the byte sequence)."""
    return "(" + " + ".join(
        f"{_sql_hex_byte(hex_col, byte_off + i)} * {256 ** i}" for i in range(nbytes)
    ) + ")"


def _sql_be_int(hex_col: str, byte_off: int, nbytes: int) -> str:
    """Big-endian variant of :func:`_sql_le_int` (JPEG fields are
    network byte order)."""
    return "(" + " + ".join(
        f"{_sql_hex_byte(hex_col, byte_off + i)} * {256 ** (nbytes - 1 - i)}"
        for i in range(nbytes)
    ) + ")"


_BMP_ZEROS = "0" * 48  # compression..importantcolors: 6 zero uint32 fields


def media_bmp_from_documents(
    docs: DataFrame,
    fixed_w: int | None = None,
    fixed_h: int | None = None,
) -> DataFrame:
    """Structurally valid 24-bpp BMP per document: 54-byte header
    (deterministic width/height from doc_id — or ``fixed_w``/
    ``fixed_h`` for a uniform canvas, which is what perceptual
    hashing needs: near-duplicate TEXTS then become near-duplicate
    IMAGES because the sample grid lands on the same offsets) + the
    document's UTF-8 bytes as the pixel stream. Entirely native column
    expressions — the binary is unhex() of a computed hex string."""
    n = F.octet_length(F.encode(F.col("text"), "UTF-8"))
    w = (F.lit(fixed_w) if fixed_w else (F.col("doc_id") % 64 + 1)).cast("int")
    h = (F.lit(fixed_h) if fixed_h else (F.col("doc_id") % 48 + 1)).cast("int")
    header_hex = F.concat(
        F.lit("424D"),  # 'BM'
        _le_hex(n + F.lit(54), 4),  # file size
        F.lit("00000000"),  # reserved
        F.lit("36000000"),  # pixel offset = 54
        F.lit("28000000"),  # DIB header size = 40
        _le_hex(w, 4),
        _le_hex(h, 4),
        F.lit("0100"),  # planes = 1
        F.lit("1800"),  # bpp = 24
        F.lit(_BMP_ZEROS),
    )
    content = F.unhex(F.concat(header_hex, F.hex(F.encode(F.col("text"), "UTF-8"))))
    meta = F.struct(
        F.lit("image/bmp").alias("mime"),
        w.alias("width"),
        h.alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        content.alias("content"),
        meta.alias("meta"),
    )


def sql_media_bmp_hex(
    table: str = "documents",
    fixed_w: int | None = None,
    fixed_h: int | None = None,
) -> str:
    """DuckDB expression building the identical BMP payload as hex."""
    n = "octet_length(encode(text))"
    w = f"({fixed_w})" if fixed_w else "(doc_id % 64 + 1)"
    h = f"({fixed_h})" if fixed_h else "(doc_id % 48 + 1)"
    return (
        f"'424D' || {_sql_le_hex(f'{n} + 54', 4)} || '0000000036000000' || "
        f"'28000000' || {_sql_le_hex(w, 4)} || {_sql_le_hex(h, 4)} || "
        f"'01001800' || '{_BMP_ZEROS}' || hex(encode(text))"
    )


def sql_media_decode(table: str = "documents") -> str:
    """DuckDB twin of media_bmp_from_documents → decode_images: builds
    the same bytes, then *parses width/height back out of them* at the
    BMP header offsets (18 and 22) and hashes the payload."""
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, {sql_media_bmp_hex(table)} AS hx
  FROM {table}
)
SELECT media_id,
       CAST({_sql_le_int("hx", 18, 4)} AS INTEGER) AS width,
       CAST({_sql_le_int("hx", 22, 4)} AS INTEGER) AS height,
       md5(hx) AS checksum
FROM m
"""


# SOI + APP0/JFIF (fixed 18-byte segment): the canonical JPEG preamble.
_JPEG_SOI_APP0 = "FFD8" + "FFE0" + "0010" + "4A46494600" + "0101" + "00" + \
    "0001" + "0001" + "0000"
# SOS for one component + EOI; entropy data (the text bytes) sits between.
_JPEG_SOS = "FFDA" + "0008" + "01" + "0100" + "003F00"
# SOF0 layout: FFC0 000B precision=8, then BE height, BE width, 1 component.
_JPEG_SOF_PRE = "FFC0" + "000B" + "08"
_JPEG_SOF_POST = "01" + "011100"
# byte offsets of the BE height/width fields given the fixed preamble:
# SOI+APP0 = 20 bytes, SOF marker+len+precision = 5 more.
_JPEG_H_OFF = 25
_JPEG_W_OFF = 27


def media_jpeg_from_documents(docs: DataFrame) -> DataFrame:
    """Structurally valid baseline JPEG per document: SOI + JFIF APP0 +
    SOF0 (deterministic width/height from doc_id, big-endian as the
    format demands) + SOS + the document's UTF-8 bytes as the entropy
    stream + EOI. Native hex assembly like the BMP/WAV fixtures; the
    SOFn walker reads the dimensions back out of the real marker
    stream."""
    w = (F.col("doc_id") % 100 + 16).cast("int")
    h = (F.col("doc_id") % 80 + 16).cast("int")
    content = F.unhex(
        F.concat(
            F.lit(_JPEG_SOI_APP0),
            F.lit(_JPEG_SOF_PRE),
            F.format_string("%04X", h),
            F.format_string("%04X", w),
            F.lit(_JPEG_SOF_POST),
            F.lit(_JPEG_SOS),
            F.hex(F.encode(F.col("text"), "UTF-8")),
            F.lit("FFD9"),
        )
    )
    meta = F.struct(
        F.lit("image/jpeg").alias("mime"),
        w.alias("width"),
        h.alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        content.alias("content"),
        meta.alias("meta"),
    )


def sql_media_jpeg_decode(table: str = "documents") -> str:
    """DuckDB twin of media_jpeg_from_documents → decode_images: builds
    the identical JPEG bytes as hex, then parses the big-endian
    height/width back out at the SOF0 field offsets and hashes the
    payload."""
    w = "(doc_id % 100 + 16)"
    h = "(doc_id % 80 + 16)"
    hx = (
        f"'{_JPEG_SOI_APP0}' || '{_JPEG_SOF_PRE}' || printf('%04X', {h}) || "
        f"printf('%04X', {w}) || '{_JPEG_SOF_POST}' || '{_JPEG_SOS}' || "
        f"hex(encode(text)) || 'FFD9'"
    )
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, {hx} AS hx FROM {table}
)
SELECT media_id,
       CAST({_sql_be_int("hx", _JPEG_W_OFF, 2)} AS INTEGER) AS width,
       CAST({_sql_be_int("hx", _JPEG_H_OFF, 2)} AS INTEGER) AS height,
       md5(hx) AS checksum
FROM m
"""


# Progressive-JPEG fixture pieces: a DHT segment (marker C4 — huffman
# tables, NOT a frame header; the SOFn walker must skip it) followed by
# an SOF2 (progressive) frame header. DHT length 0x13 = 2 length bytes
# + 1 class/dest byte + 16 zero code counts + 0 symbols.
_JPEG_DHT = "FFC4" + "0013" + "00" + "00" * 16
_JPEG_SOF2_PRE = "FFC2" + "000B" + "08"
# SOI+APP0 = 20 bytes, DHT = 2 + 0x13 = 21 bytes, SOF marker+len+
# precision = 5 more → big-endian height/width land at 46/48.
_JPEG2_H_OFF = 46
_JPEG2_W_OFF = 48


def media_jpeg_progressive_from_documents(docs: DataFrame) -> DataFrame:
    """Structurally valid PROGRESSIVE JPEG per document: SOI + JFIF
    APP0 + DHT + SOF2 + SOS + entropy bytes + EOI. Two things differ
    from the baseline fixture on purpose: the frame header is SOF2
    (the progressive marker, r13 verdict's one unexercised-at-registry-
    scale decode notch), and a DHT sits BEFORE it so a decoder that
    treats any FFCx as a frame header reads garbage dimensions — the
    walker must skip C4. Dimension arithmetic also differs from the
    baseline so the two queries cannot pass by mirroring each other."""
    w = (F.col("doc_id") % 90 + 32).cast("int")
    h = (F.col("doc_id") % 60 + 24).cast("int")
    content = F.unhex(
        F.concat(
            F.lit(_JPEG_SOI_APP0),
            F.lit(_JPEG_DHT),
            F.lit(_JPEG_SOF2_PRE),
            F.format_string("%04X", h),
            F.format_string("%04X", w),
            F.lit(_JPEG_SOF_POST),
            F.lit(_JPEG_SOS),
            F.hex(F.encode(F.col("text"), "UTF-8")),
            F.lit("FFD9"),
        )
    )
    meta = F.struct(
        F.lit("image/jpeg").alias("mime"),
        w.alias("width"),
        h.alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        content.alias("content"),
        meta.alias("meta"),
    )


def sql_media_jpeg_decode_progressive(table: str = "documents") -> str:
    """DuckDB twin of media_jpeg_progressive_from_documents →
    decode_images: rebuilds the identical SOF2 byte stream and parses
    the big-endian height/width at the post-DHT frame-header offsets."""
    w = "(doc_id % 90 + 32)"
    h = "(doc_id % 60 + 24)"
    hx = (
        f"'{_JPEG_SOI_APP0}' || '{_JPEG_DHT}' || '{_JPEG_SOF2_PRE}' || "
        f"printf('%04X', {h}) || printf('%04X', {w}) || "
        f"'{_JPEG_SOF_POST}' || '{_JPEG_SOS}' || hex(encode(text)) || 'FFD9'"
    )
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, {hx} AS hx FROM {table}
)
SELECT media_id,
       CAST({_sql_be_int("hx", _JPEG2_W_OFF, 2)} AS INTEGER) AS width,
       CAST({_sql_be_int("hx", _JPEG2_H_OFF, 2)} AS INTEGER) AS height,
       md5(hx) AS checksum
FROM m
"""


# TIFF fixture pieces (little-endian, fixed two-entry IFD0): magic +
# IFD offset 8 + entry count 2; entries are (tag, type LONG, count 1,
# inline value). Width value lands at byte 18, height at byte 30.
_TIFF_PRE = "49492A00" + "08000000" + "0200"
_TIFF_E1 = "0001" + "0400" + "01000000"  # tag 256 (ImageWidth), LONG
_TIFF_E2 = "0101" + "0400" + "01000000"  # tag 257 (ImageLength), LONG
_TIFF_NEXT = "00000000"
_TIFF_W_OFF = 18
_TIFF_H_OFF = 30
# WebP fixture pieces: RIFF + size + WEBP, then one frame-header chunk.
# VP8L payload = signature 2F + the packed (w-1 | (h-1)<<14) u32 at
# byte 21, odd size 5 so one pad byte; VP8X payload = 4 flag bytes +
# 24-bit canvas minus-one fields at bytes 24 and 27, even size 10.
_RIFF_MAGIC = "52494646"  # 'RIFF'; size + 'WEBP' + chunk follow
_VP8L_BITS_OFF = 21
_VP8X_W_OFF = 24
_VP8X_H_OFF = 27


def media_tiff_webp_from_documents(docs: DataFrame) -> DataFrame:
    """Structurally valid TIFF or WebP per document, chosen by
    ``doc_id % 3``: 0 → little-endian TIFF (two-entry IFD0, LONG
    width/height), 1 → WebP VP8L (lossless signature + 14+14-bit
    packed dimensions), 2 → WebP VP8X (extended header, 24-bit canvas
    fields). The document's UTF-8 bytes trail as image data. Native
    hex assembly like the BMP/JPEG fixtures — three different wire
    encodings of the same deterministic dimensions, so the TIFF IFD
    walk and both WebP frame-header branches all execute at registry
    scale."""
    n = F.octet_length(F.encode(F.col("text"), "UTF-8"))
    w = (F.col("doc_id") % 120 + 12).cast("int")
    h = (F.col("doc_id") % 96 + 12).cast("int")
    v = F.col("doc_id") % 3
    text_hex = F.hex(F.encode(F.col("text"), "UTF-8"))
    tiff = F.concat(
        F.lit(_TIFF_PRE + _TIFF_E1), _le_hex(w, 4),
        F.lit(_TIFF_E2), _le_hex(h, 4), F.lit(_TIFF_NEXT), text_hex,
    )
    vp8l = F.concat(
        F.lit(_RIFF_MAGIC), _le_hex(n + F.lit(18), 4),
        F.lit("57454250" + "5650384C" + "05000000" + "2F"),
        _le_hex((w - 1) + (h - 1) * 16384, 4), F.lit("00"), text_hex,
    )
    vp8x = F.concat(
        F.lit(_RIFF_MAGIC), _le_hex(n + F.lit(22), 4),
        F.lit("57454250" + "56503858" + "0A000000" + "00000000"),
        _le_hex(w - 1, 3), _le_hex(h - 1, 3), text_hex,
    )
    content = F.unhex(F.when(v == 0, tiff).when(v == 1, vp8l).otherwise(vp8x))
    meta = F.struct(
        F.when(v == 0, F.lit("image/tiff")).otherwise(F.lit("image/webp")).alias("mime"),
        w.alias("width"),
        h.alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        content.alias("content"),
        meta.alias("meta"),
    )


def sql_media_tiff_webp_decode(table: str = "documents") -> str:
    """DuckDB twin of media_tiff_webp_from_documents → decode_images:
    assembles the identical bytes as hex, then re-parses the
    dimensions out of each variant's own wire fields — the TIFF IFD
    value slots, the VP8L packed u32 (mod/div arithmetic on the
    14-bit lanes), the VP8X minus-one 24-bit fields — and hashes the
    payload."""
    n = "octet_length(encode(text))"
    w = "(doc_id % 120 + 12)"
    h = "(doc_id % 96 + 12)"
    tiff = (
        f"'{_TIFF_PRE}{_TIFF_E1}' || {_sql_le_hex(w, 4)} || '{_TIFF_E2}' || "
        f"{_sql_le_hex(h, 4)} || '{_TIFF_NEXT}' || hex(encode(text))"
    )
    vp8l = (
        f"'{_RIFF_MAGIC}' || {_sql_le_hex(f'{n} + 18', 4)} || "
        f"'574542505650384C050000002F' || "
        f"{_sql_le_hex(f'({w} - 1) + ({h} - 1) * 16384', 4)} || '00' || "
        f"hex(encode(text))"
    )
    vp8x = (
        f"'{_RIFF_MAGIC}' || {_sql_le_hex(f'{n} + 22', 4)} || "
        f"'57454250565038580A00000000000000' || "
        f"{_sql_le_hex(f'{w} - 1', 3)} || {_sql_le_hex(f'{h} - 1', 3)} || "
        f"hex(encode(text))"
    )
    bits = _sql_le_int("hx", _VP8L_BITS_OFF, 4)
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, doc_id % 3 AS v,
         CASE doc_id % 3 WHEN 0 THEN {tiff} WHEN 1 THEN {vp8l}
              ELSE {vp8x} END AS hx
  FROM {table}
)
SELECT media_id,
       CAST(CASE v WHEN 0 THEN {_sql_le_int("hx", _TIFF_W_OFF, 4)}
                   WHEN 1 THEN ({bits} % 16384) + 1
                   ELSE {_sql_le_int("hx", _VP8X_W_OFF, 3)} + 1
            END AS INTEGER) AS width,
       CAST(CASE v WHEN 0 THEN {_sql_le_int("hx", _TIFF_H_OFF, 4)}
                   WHEN 1 THEN (({bits} // 16384) % 16384) + 1
                   ELSE {_sql_le_int("hx", _VP8X_H_OFF, 3)} + 1
            END AS INTEGER) AS height,
       md5(hx) AS checksum
FROM m
"""


def media_wav_from_documents(docs: DataFrame) -> DataFrame:
    """Canonical 44-byte-header PCM WAV per document (deterministic
    rate/channels from doc_id; UTF-8 text bytes as sample data)."""
    n = F.octet_length(F.encode(F.col("text"), "UTF-8"))
    ch = (F.col("doc_id") % 2 + 1).cast("int")
    rate = (F.lit(8000) + (F.col("doc_id") % 5) * 4000).cast("int")
    block = ch * 2  # 16-bit samples
    header_hex = F.concat(
        F.lit("52494646"),  # 'RIFF'
        _le_hex(n + F.lit(36), 4),  # riff size
        F.lit("57415645"),  # 'WAVE'
        F.lit("666D7420"),  # 'fmt '
        F.lit("10000000"),  # fmt size = 16
        F.lit("0100"),  # PCM
        _le_hex(ch, 2),
        _le_hex(rate, 4),
        _le_hex(rate * block, 4),  # byte rate
        _le_hex(block, 2),
        F.lit("1000"),  # 16 bits
        F.lit("64617461"),  # 'data'
        _le_hex(n, 4),
    )
    content = F.unhex(F.concat(header_hex, F.hex(F.encode(F.col("text"), "UTF-8"))))
    meta = F.struct(
        F.lit("audio/wav").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        rate.alias("sample_rate"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        content.alias("content"),
        meta.alias("meta"),
    )


def sql_media_wav_decode(table: str = "documents") -> str:
    """DuckDB twin of media_wav_from_documents → decode_audio: builds
    the same bytes and parses the fmt-chunk fields back out at the
    canonical offsets (22, 24, 34) plus n_samples from the data size."""
    n = "octet_length(encode(text))"
    ch = "(doc_id % 2 + 1)"
    rate = "(8000 + (doc_id % 5) * 4000)"
    hx = (
        f"'52494646' || {_sql_le_hex(f'{n} + 36', 4)} || '57415645666D7420"
        f"10000000' || '0100' || {_sql_le_hex(ch, 2)} || {_sql_le_hex(rate, 4)} || "
        f"{_sql_le_hex(f'{rate} * {ch} * 2', 4)} || {_sql_le_hex(f'{ch} * 2', 2)} || "
        f"'1000' || '64617461' || {_sql_le_hex(n, 4)} || hex(encode(text))"
    )
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, {hx} AS hx FROM {table}
)
SELECT media_id,
       CAST({_sql_le_int("hx", 24, 4)} AS INTEGER) AS sample_rate,
       CAST({_sql_le_int("hx", 22, 2)} AS INTEGER) AS n_channels,
       CAST({_sql_le_int("hx", 34, 2)} AS INTEGER) AS bits,
       CAST({_sql_le_int("hx", 40, 4)} // ({_sql_le_int("hx", 32, 2)}) AS BIGINT) AS n_samples,
       md5(hx) AS checksum
FROM m
"""


# -- Real AVI demuxing (RIFF container walk, codec-free) ---------------------


def _parse_avi_frames(buf: bytes) -> list[bytes] | None:
    """Extract video frame payloads from a RIFF/AVI container by
    walking the chunk tree to the ``movi`` LIST and collecting
    ``##db``/``##dc`` stream chunks — real demuxing (frame addressing
    needs no codec; only pixel DECODING would). Descends into ``rec ``
    grouping LISTs (interleaved AVIs wrap frame runs in them)."""
    import struct

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        return None
    frames: list[bytes] = []

    def walk(mp: int, mend: int) -> None:
        while mp + 8 <= mend:
            mcid = buf[mp : mp + 4]
            msize = struct.unpack_from("<I", buf, mp + 4)[0]
            if mcid == b"LIST" and buf[mp + 8 : mp + 12] == b"rec ":
                walk(mp + 12, min(mp + 8 + msize, mend))
            elif mcid[2:4] in (b"db", b"dc"):
                frames.append(buf[mp + 8 : mp + 8 + msize])
            mp += 8 + msize + (msize & 1)

    pos, end = 12, len(buf)
    while pos + 8 <= end:
        cid, size = buf[pos : pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        body = pos + 8
        if cid == b"LIST" and buf[body : body + 4] == b"movi":
            walk(body + 4, min(body + size, end))
        pos = body + size + (size & 1)
    return frames


def _parse_avi_usec_per_frame(buf: bytes) -> int | None:
    """dwMicroSecPerFrame (first uint32 of the ``avih`` chunk inside
    the ``hdrl`` LIST), or None when absent/zero — the container's own
    frame clock, so sampling never assumes a frame rate."""
    import struct

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        return None
    pos, end = 12, len(buf)
    while pos + 8 <= end:
        cid, size = buf[pos : pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        body = pos + 8
        if cid == b"LIST" and buf[body : body + 4] == b"hdrl":
            hp, hend = body + 4, min(body + size, end)
            while hp + 8 <= hend:
                hcid = buf[hp : hp + 4]
                hsize = struct.unpack_from("<I", buf, hp + 4)[0]
                if hcid == b"avih" and hp + 12 <= hend:
                    usec = struct.unpack_from("<I", buf, hp + 8)[0]
                    return usec or None
                hp += 8 + hsize + (hsize & 1)
        pos = body + size + (size & 1)
    return None


_DEMUX_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def demux_avi_frames(media: DataFrame) -> DataFrame:
    """REAL frame extraction for RIFF/AVI payloads: one output row per
    stream chunk in the container's ``movi`` list, with the frame's
    size and portable checksum. The row-multiplying (UDTF) shape of
    :func:`sample_frames`, but with a genuine demuxer kernel;
    non-AVI payloads yield no rows."""

    def demux(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            sizes: list[int] = []
            sums: list[str] = []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                for i, fr in enumerate(_parse_avi_frames(bytes(buf)) or []):
                    ids.append(mid)
                    idxs.append(i)
                    sizes.append(len(fr))
                    sums.append(_hex_md5(fr))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                    "checksum": pd.Series(sums, dtype="object"),
                }
            )

    return scale_out(media.select("media_id", "content")).mapInPandas(
        demux, schema=_DEMUX_SCHEMA
    )


_AVI_FRAME_BYTES = 16
# '00db' uncompressed-video chunk header + fixed 16-byte size
_AVI_FRAME_HDR_HEX = "30306462" + "10000000"


def media_avi_from_documents(docs: DataFrame) -> DataFrame:
    """Structurally valid RIFF/AVI per document: a minimal ``hdrl``
    (avih with the true frame count) and a ``movi`` LIST holding one
    16-byte ``00db`` chunk per full 16-byte slice of the document's
    UTF-8 bytes (docs under 16 bytes carry zero frames). Native hex
    assembly, like the BMP/WAV fixtures."""
    s = _AVI_FRAME_BYTES
    n_bytes = F.octet_length(F.encode(F.col("text"), "UTF-8"))
    n = F.floor(n_bytes / s).cast("int")
    body_hex = F.hex(F.encode(F.col("text"), "UTF-8"))
    frames_hex = F.when(
        n >= 1,
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), n - 1),
                lambda i: F.concat(
                    F.lit(_AVI_FRAME_HDR_HEX),
                    F.substring(body_hex, i * (2 * s) + 1, 2 * s),
                ),
            ),
            "",
        ),
    ).otherwise(F.lit(""))
    # avih: 14 uint32 fields; dwMicroSecPerFrame=40000, dwTotalFrames=n
    avih_hex = F.concat(
        F.lit("61766968" + "38000000"),  # 'avih', size 56
        F.lit("409C0000"),  # 40000 us/frame (25 fps)
        F.lit("00" * 12),  # maxbytes, padding, flags
        _le_hex(n, 4),  # dwTotalFrames
        F.lit("00" * 36),
    )
    hdrl_hex = F.concat(F.lit("4C495354" + "44000000" + "6864726C"), avih_hex)
    movi_size = F.lit(4) + n * (8 + s)
    movi_hex = F.concat(
        F.lit("4C495354"), _le_hex(movi_size, 4), F.lit("6D6F7669"), frames_hex
    )
    riff_size = F.lit(4 + 8 + 68 + 8 + 4) + n * (8 + s)
    content = F.unhex(
        F.concat(
            F.lit("52494646"), _le_hex(riff_size, 4), F.lit("41564920"),
            hdrl_hex, movi_hex,
        )
    )
    meta = F.struct(
        F.lit("video/x-msvideo").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (n.cast("long") * 40).alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        content.alias("content"),
        meta.alias("meta"),
    )


def sql_media_avi_frames(table: str = "documents") -> str:
    """DuckDB twin of media_avi_from_documents → demux_avi_frames:
    assembles the identical container hex, then slices each frame back
    out at its computed chunk offset (frame k's data begins at byte
    100 + 24k + 8 — RIFF header 12, hdrl LIST 76, movi LIST header 12)
    and hashes it."""
    s = _AVI_FRAME_BYTES
    n = f"CAST(floor(octet_length(encode(text)) / {s}) AS INTEGER)"
    frames = (
        "list_aggregate(list_transform(range(0, n), i -> "
        f"'{_AVI_FRAME_HDR_HEX}' || substr(body_hex, i * {2 * s} + 1, {2 * s})"
        "), 'string_agg', '')"
    )
    avih = (
        "'6176696838000000409C0000' || repeat('00', 12) || "
        + _sql_le_hex("n", 4)
        + " || repeat('00', 36)"
    )
    hx = (
        "'52494646' || " + _sql_le_hex(f"92 + n * {8 + s}", 4)
        + " || '41564920' || '4C495354440000006864726C' || " + avih  # noqa: W503
        + " || '4C495354' || " + _sql_le_hex(f"4 + n * {8 + s}", 4)  # noqa: W503
        + " || '6D6F7669' || coalesce(" + frames + ", '')"  # noqa: W503
    )
    return f"""
    WITH d AS (
      SELECT doc_id AS media_id, {n} AS n,
             hex(encode(text)) AS body_hex
      FROM {table}
    ), c AS (
      SELECT media_id, n, {hx} AS hx FROM d
    )
    SELECT media_id,
           CAST(u.k AS INTEGER) AS frame_idx,
           {s} AS n_bytes,
           md5(substr(hx, (108 + u.k * {8 + s}) * 2 + 1, {2 * s})) AS checksum
    FROM c, unnest(range(0, n)) AS u(k)
    """


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    allow_fake: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """Frame sampling: one output row per sampled frame — the
    row-multiplying UDTF shape (``mapInPandas`` yielding more rows than
    it consumes).

    REAL for RIFF/AVI payloads: frames come from the actual ``movi``
    chunk walk (:func:`_parse_avi_frames`) and timestamps from the
    container's own ``dwMicroSecPerFrame`` clock
    (:func:`_parse_avi_usec_per_frame`; 40 ms only when the field is
    absent/zero), thinned to every ``max(1, every_ms // frame_ms)``-th
    frame. Other containers need a codec demuxer (``av``) this
    environment cannot ship, so by default a non-AVI payload follows
    ``on_error`` — ``"raise"`` fails the task, ``"null"`` emits one
    NULL-frame marker row (filterable, never plausible-looking) — and
    only ``allow_fake=True`` opts into the clearly-marked deterministic
    fake (equal byte slices, one per ``every_ms`` of
    ``meta.duration_ms``), same posture as :func:`decode_images`.
    Explosion geometry, schema, and partitioning are identical on all
    branches.
    """
    if on_error not in ("raise", "null"):
        raise ValueError("on_error must be 'raise' or 'null'")

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_id: list[int] = []
            out_idx: list[int | None] = []
            out_ms: list[int | None] = []
            out_b: list[bytes | None] = []
            fake_rows = []
            for mid, buf, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                buf = bytes(buf)
                frames = _parse_avi_frames(buf)
                if frames is not None:
                    frame_ms = max((_parse_avi_usec_per_frame(buf) or 40000) // 1000, 1)
                    stride = max(1, every_ms // frame_ms)
                    for j, k in enumerate(range(0, len(frames), stride)):
                        out_id.append(mid)
                        out_idx.append(j)
                        out_ms.append(k * frame_ms)
                        out_b.append(frames[k])
                elif allow_fake:
                    fake_rows.append((mid, buf, int(meta["duration_ms"] or 0)))
                elif on_error == "raise":
                    raise NotImplementedError(
                        "cannot demux non-AVI video without a codec; pass "
                        "allow_fake for the deterministic fake or "
                        "on_error='null' for a filterable marker row"
                    )
                else:  # NULL marker row: visible, filterable, never fabricated
                    out_id.append(mid)
                    out_idx.append(None)
                    out_ms.append(None)
                    out_b.append(None)
            if fake_rows:
                durs = np.array([d for _, _, d in fake_rows], dtype="int64")
                n_frames = np.maximum(durs // every_ms, 1)
                steps = np.maximum(
                    np.array([len(b) for _, b, _ in fake_rows], dtype="int64")
                    // n_frames,
                    1,
                )
                for (mid, buf, _), k, step in zip(fake_rows, n_frames, steps):
                    for i in range(k):
                        out_id.append(mid)
                        out_idx.append(i)
                        out_ms.append(i * every_ms)
                        out_b.append(buf[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_id, dtype="int64"),
                    "frame_idx": pd.array(out_idx, dtype="Int32"),
                    "frame_ms": pd.array(out_ms, dtype="Int64"),
                    "frame_bytes": pd.Series(out_b, dtype="object"),
                }
            )

    return scale_out(media.select("media_id", "content", "meta")).mapInPandas(
        sample, schema=_FRAMES_SCHEMA
    )


# -- Real waveform features (PCM DSP, exact integer math) --------------------

_AUDIO_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_pcm16", T.IntegerType()),
        T.StructField("energy", T.LongType()),
        T.StructField("zero_crossings", T.IntegerType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def _parse_wav_pcm(buf: bytes) -> bytes | None:
    """The data chunk's bytes from a RIFF/WAVE payload (same chunk walk
    as :func:`_parse_wav_header`), else None."""
    import struct

    if len(buf) < 20 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    pos = 12
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        if cid == b"data":
            return buf[pos + 8 : pos + 8 + min(size, len(buf) - pos - 8)]
        pos += 8 + size + (size & 1)
    return None


def audio_features(media: DataFrame) -> DataFrame:
    """REAL waveform DSP over decoded 16-bit PCM — not header fields:
    mean-square energy, zero-crossing count, and peak amplitude over
    the raw interleaved int16 stream (numpy kernel, Arrow-batched).
    Every statistic is exact integer arithmetic (``energy`` is
    ``sum(s^2) div n`` — no sqrt, no floats), so the DuckDB twin
    recomputes the identical values from the same bytes and the
    operator carries a full value-hash oracle, which real-world audio
    feature extractors (float RMS/dB) cannot.

    Zero-crossings are counted over the interleaved stream (channel
    boundaries included) — a deterministic definition the twin shares;
    per-channel analysis would deinterleave first. Undecodable payloads
    yield NULL features (filterable rows, not dead jobs)."""

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                data = _parse_wav_pcm(bytes(b))
                n = (len(data) // 2) if data is not None else 0
                if data is None or n == 0:
                    rows.append((mid, None, None, None, None))
                    continue
                s = np.frombuffer(data[: n * 2], "<i2").astype(np.int64)
                energy = int((s * s).sum()) // n
                zc = int(np.count_nonzero((s[1:] >= 0) != (s[:-1] >= 0)))
                peak = int(np.abs(s).max())
                rows.append((mid, n, energy, zc, peak))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_pcm16", "energy",
                         "zero_crossings", "peak"],
            )

    return scale_out(media.select("media_id", "content")).mapInPandas(
        feats, schema=_AUDIO_FEAT_SCHEMA
    )


def sql_media_audio_features(table: str = "documents") -> str:
    """DuckDB twin of media_wav_from_documents → :func:`audio_features`:
    rebuilds the same WAV hex, reads each int16 LE sample out of the
    hex text (data chunk at byte 44 in the canonical fixture), and
    recomputes the identical integer statistics."""
    n = "octet_length(encode(text))"
    ch = "(doc_id % 2 + 1)"
    rate = "(8000 + (doc_id % 5) * 4000)"
    hx = (
        f"'52494646' || {_sql_le_hex(f'{n} + 36', 4)} || '57415645666D7420"
        f"10000000' || '0100' || {_sql_le_hex(ch, 2)} || {_sql_le_hex(rate, 4)} || "
        f"{_sql_le_hex(f'{rate} * {ch} * 2', 4)} || {_sql_le_hex(f'{ch} * 2', 2)} || "
        f"'1000' || '64617461' || {_sql_le_hex(n, 4)} || hex(encode(text))"
    )
    # sample i (0-based): lo byte at 44+2i -> hex pos 89+4i; hi at 45+2i -> 91+4i
    raw = ("(CAST('0x' || substr(hx, 91 + 4 * CAST(i AS INTEGER), 2) AS INTEGER) * 256"
           " + CAST('0x' || substr(hx, 89 + 4 * CAST(i AS INTEGER), 2) AS INTEGER))")
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id, {hx} AS hx, {n} // 2 AS np FROM {table}
    ), sig AS (
      SELECT media_id, np,
             list_transform(range(0, np),
               i -> {raw} - CASE WHEN {raw} >= 32768 THEN 65536 ELSE 0 END) AS s
      FROM m
    )
    SELECT media_id,
           CASE WHEN np > 0 THEN CAST(np AS INTEGER) END AS n_pcm16,
           CASE WHEN np > 0 THEN
             CAST(list_sum(list_transform(s, x -> CAST(x AS BIGINT) * x)) // np AS BIGINT)
           END AS energy,
           CASE WHEN np > 0 THEN
             CAST(coalesce(list_sum(list_transform(range(1, CAST(np AS INTEGER)),
               i -> CASE WHEN (s[CAST(i AS INTEGER)] >= 0) != (s[CAST(i AS INTEGER) + 1] >= 0)
                         THEN 1 ELSE 0 END)), 0) AS INTEGER)
           END AS zero_crossings,
           CASE WHEN np > 0 THEN
             CAST(list_max(list_transform(s, x -> abs(x))) AS INTEGER)
           END AS peak
    FROM sig
    """


# -- Real pixel-domain features (BMP, exact integer math) --------------------

_IMAGE_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_pixels", T.IntegerType()),
        T.StructField("mean_b", T.IntegerType()),
        T.StructField("mean_g", T.IntegerType()),
        T.StructField("mean_r", T.IntegerType()),
    ]
)


def image_pixel_features(media: DataFrame) -> DataFrame:
    """REAL pixel-domain statistics from uncompressed 24-bpp BMPs: walk
    the actual BMP layout (pixel array at the header's offset, rows
    padded to 4-byte strides) and compute per-channel BGR means over
    every complete pixel the buffer actually contains — numpy kernel,
    Arrow-batched, exact integer division so the DuckDB twin reproduces
    the values bit-for-bit. Non-BMP / truncated payloads yield NULL
    rows (the standard filterable-not-fatal posture)."""

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(b)
                if len(buf) < 54 or buf[:2] != b"BM":
                    rows.append((mid, None, None, None, None))
                    continue
                off = struct.unpack_from("<I", buf, 10)[0]
                w = struct.unpack_from("<i", buf, 18)[0]
                h = struct.unpack_from("<i", buf, 22)[0]
                bpp = struct.unpack_from("<H", buf, 28)[0]
                if bpp != 24 or w <= 0 or h == 0:
                    rows.append((mid, None, None, None, None))
                    continue
                stride = (w * 3 + 3) // 4 * 4
                sums = np.zeros(3, dtype=np.int64)
                count = 0
                for r in range(abs(h)):
                    start = off + r * stride
                    avail = min(w * 3, len(buf) - start)
                    if avail < 3:
                        continue
                    px = np.frombuffer(
                        buf, dtype=np.uint8, count=avail - avail % 3, offset=start
                    ).reshape(-1, 3)
                    sums += px.astype(np.int64).sum(axis=0)
                    count += len(px)
                if count == 0:
                    rows.append((mid, None, None, None, None))
                    continue
                rows.append(
                    (mid, count, int(sums[0]) // count,
                     int(sums[1]) // count, int(sums[2]) // count)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_pixels", "mean_b", "mean_g", "mean_r"],
            )

    return scale_out(media.select("media_id", "content")).mapInPandas(
        feats, schema=_IMAGE_FEAT_SCHEMA
    )


def sql_media_pixel_features(table: str = "documents") -> str:
    """DuckDB twin of media_bmp_from_documents →
    :func:`image_pixel_features`: the same stride-aware pixel walk over
    the identical hex string (pixel array at byte 54, rows padded to
    4-byte strides, complete BGR triplets only)."""
    n = "octet_length(encode(text))"
    w = "(doc_id % 64 + 1)"
    h = "(doc_id % 48 + 1)"
    hx = sql_media_bmp_hex(table)
    # byte value at 0-based offset p of the payload == hex chars [2p+1, 2p+2]
    byte_at = "CAST('0x' || substr(hx, 2 * CAST({p} AS INTEGER) + 1, 2) AS BIGINT)"
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id, ({hx}) AS hx,
             {w} AS w, {h} AS h, {n} + 54 AS total,
             ({w} * 3 + 3) // 4 * 4 AS stride
      FROM {table}
    ), px AS (
      SELECT media_id, hx,
             flatten(list_transform(range(0, h),
               r -> list_filter(
                      list_transform(range(0, w), c -> 54 + r * stride + c * 3),
                      p -> p + 3 <= total))) AS ps
      FROM m
    )
    SELECT media_id,
           CASE WHEN len(ps) > 0 THEN CAST(len(ps) AS INTEGER) END AS n_pixels,
           CASE WHEN len(ps) > 0 THEN CAST(
             list_sum(list_transform(ps, p -> {byte_at.format(p='p')})) // len(ps)
             AS INTEGER) END AS mean_b,
           CASE WHEN len(ps) > 0 THEN CAST(
             list_sum(list_transform(ps, p -> {byte_at.format(p='p + 1')})) // len(ps)
             AS INTEGER) END AS mean_g,
           CASE WHEN len(ps) > 0 THEN CAST(
             list_sum(list_transform(ps, p -> {byte_at.format(p='p + 2')})) // len(ps)
             AS INTEGER) END AS mean_r
    FROM px
    """


def image_dhash(media: DataFrame) -> DataFrame:
    """(media_id, dhash): 63-bit difference hash of a 24-bpp BMP — the
    image-modality member of the dedup family (dHash: public
    perceptual-hash technique; near-duplicate images land within a few
    bits of each other). The image is point-sampled on a 9x8 grid
    (nearest-neighbor in FILE row order; col i of 9 at
    floor(i*w/9), row j of 8 at floor(j*|h|/8)), integer luminance
    (b+g+r) // 3 per sample, and bit j*8+i set when lum[j][i+1] >
    lum[j][i]. The (7,7) comparison is dropped so the hash stays below
    2^63 — identical BIGINT arithmetic in the DuckDB twin, no sign
    wrap in either engine. Images narrower than 10 px or shorter than
    9 px (or truncated buffers) yield NULL — filterable, not fatal.

    Arrow-batched numpy kernel; everything downstream
    (:func:`image_dhash_pairs`) is banded hash joins.
    """

    def kern(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct

        import pandas as pd

        for pdf in batches:
            out = []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(b)
                if len(buf) < 54 or buf[:2] != b"BM":
                    out.append((mid, None))
                    continue
                off = struct.unpack_from("<I", buf, 10)[0]
                w = struct.unpack_from("<i", buf, 18)[0]
                h = abs(struct.unpack_from("<i", buf, 22)[0])
                bpp = struct.unpack_from("<H", buf, 28)[0]
                if bpp != 24 or w < 10 or h < 9:
                    out.append((mid, None))
                    continue
                stride = (w * 3 + 3) // 4 * 4
                # positions wrap modulo the usable payload: a complete
                # pixel array is sampled at its true offsets (lin <
                # usable there), while short/truncated payloads tile —
                # so fixture BMPs whose "pixels" are a text stream
                # still hash every byte deterministically
                usable = len(buf) - off - 2
                if usable < 1:
                    out.append((mid, None))
                    continue
                lum = [[0] * 9 for _ in range(8)]
                for j in range(8):
                    r = j * h // 8
                    for i in range(9):
                        c = i * w // 9
                        p = off + (r * stride + c * 3) % usable
                        lum[j][i] = (buf[p] + buf[p + 1] + buf[p + 2]) // 3
                hv = 0
                for j in range(8):
                    for i in range(8):
                        if j == 7 and i == 7:
                            continue
                        if lum[j][i + 1] > lum[j][i]:
                            hv |= 1 << (j * 8 + i)
                out.append((mid, hv))
            yield pd.DataFrame(out, columns=["media_id", "dhash"])

    return media.select("media_id", "content").mapInPandas(
        kern, "media_id long, dhash long"
    )


def image_dhash_pairs(
    hashes: DataFrame, max_hamming: int = 4, n_bits: int = 63
) -> DataFrame:
    """(media_a, media_b, hamming): near-duplicate pairs whose hashes
    differ in <= ``max_hamming`` bits. Candidates come from a banded
    equality join — the ``n_bits``-wide hash splits into
    ``max_hamming + 1`` contiguous slices, and by pigeonhole any pair
    within the budget agrees on at least one slice — so candidate
    generation is a hash join on (band, slice), NEVER an all-pairs
    hamming scan. Verification is one bit_count(xor) per candidate.
    ``n_bits`` must cover the hash's real width: slicing a narrower
    hash with a wider layout would leave always-zero bands that match
    EVERY pair (works for any fingerprint column named ``dhash`` —
    the audio fingerprint reuses this with its own width).
    """
    bands = max_hamming + 1
    width = -(-n_bits // bands)  # ceil
    mask = (1 << width) - 1
    h = hashes.where(F.col("dhash").isNotNull())
    sliced = h.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright("dhash", width * i)
                    .bitwiseAND(F.lit(mask))
                    .alias("slice"),
                )
                for i in range(bands)
            ])
        ).alias("_b"),
    ).select("media_id", "dhash", "_b.band", "_b.slice")
    cands = (
        sliced.alias("a")
        .join(sliced.alias("b"), ["band", "slice"])
        .where(F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.col("a.dhash").alias("_ha"),
            F.col("b.dhash").alias("_hb"),
        )
        .distinct()
    )
    ham = F.bit_count(
        F.col("_ha").bitwiseXOR(F.col("_hb"))
    ).cast("int")
    return (
        cands.select("media_a", "media_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def sql_image_dhash(
    table: str = "documents",
    fixed_w: int | None = None,
    fixed_h: int | None = None,
) -> str:
    """DuckDB twin of media_bmp_from_documents -> :func:`image_dhash`
    over the same hex-built BMPs: the full sampling + luminance + bit
    pipeline recomputed from the hex string — a strong per-image
    value oracle for the whole kernel."""
    hx = sql_media_bmp_hex(table, fixed_w, fixed_h)
    n = "octet_length(encode(text))"
    w = f"({fixed_w})" if fixed_w else "(doc_id % 64 + 1)"
    h = f"({fixed_h})" if fixed_h else "(doc_id % 48 + 1)"
    byte_at = "CAST('0x' || substr(hx, 2 * CAST({p} AS INTEGER) + 1, 2) AS BIGINT)"
    lum = (
        "(" + byte_at.format(p="pp") + " + " + byte_at.format(p="pp + 1")
        + " + " + byte_at.format(p="pp + 2") + ") // 3"
    )
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id, ({hx}) AS hx,
             {w} AS w, {h} AS h, {n} + 54 AS total,
             ({w} * 3 + 3) // 4 * 4 AS stride
      FROM {table}
      WHERE {w} >= 10 AND {h} >= 9
    ),
    pos AS (
      SELECT media_id, hx,
             flatten(list_transform(range(0, 8), j ->
               list_transform(range(0, 9), i ->
                 54 + ((j * h // 8) * stride + (i * w // 9) * 3)
                      % (total - 56)))) AS ps
      FROM m
      WHERE total >= 57
    ),
    lums AS (
      SELECT media_id,
             list_transform(ps, pp -> {lum}) AS lu
      FROM pos
    ),
    hashed AS (
      SELECT media_id,
             CAST(list_sum(flatten(list_transform(range(0, 8), j ->
               list_transform(range(0, 8), i ->
                 CASE WHEN j = 7 AND i = 7 THEN 0
                      WHEN lu[j * 9 + i + 2] > lu[j * 9 + i + 1]
                      THEN 1::BIGINT << (j * 8 + i)
                      ELSE 0 END)))) AS BIGINT) AS dhash
      FROM lums
    )
    SELECT media_id, dhash FROM hashed
    """


def sql_image_dhash_pairs(
    table: str = "documents",
    max_hamming: int = 4,
    fixed_w: int | None = None,
    fixed_h: int | None = None,
) -> str:
    """Brute-force ALL-PAIRS hamming join over :func:`sql_image_dhash`
    — shares none of the banding machinery, so equality with
    :func:`image_dhash_pairs` proves the bands lose no pair."""
    return f"""
    WITH hashed AS ({sql_image_dhash(table, fixed_w, fixed_h)})
    SELECT a.media_id AS media_a, b.media_id AS media_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
    FROM hashed a JOIN hashed b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= {max_hamming}
    """


def audio_fingerprint(media: DataFrame, n_frames: int = 32) -> DataFrame:
    """(media_id, dhash): 31-bit energy-envelope fingerprint of a WAV
    payload — the audio-modality dedup primitive, same delta-hash idea
    as :func:`image_dhash`: split the decoded int16 PCM into
    ``n_frames`` equal frames, compute each frame's exact integer
    mean-square energy (sum(s^2) // len), and set bit k when frame
    k+1's energy exceeds frame k's. Streams shorter than ``n_frames``
    samples (or non-WAV payloads) yield NULL. The column is named
    ``dhash`` so :func:`image_dhash_pairs` (with ``n_bits=31``) runs
    the banded near-dup join unchanged.
    """

    def kern(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                data = _parse_wav_pcm(bytes(b))
                if data is None or len(data) // 2 < n_frames:
                    out.append((mid, None))
                    continue
                s = np.frombuffer(
                    data[: len(data) // 2 * 2], dtype="<i2"
                ).astype(np.int64)
                n = len(s)
                en = []
                for k in range(n_frames):
                    a, z = k * n // n_frames, (k + 1) * n // n_frames
                    seg = s[a:z]
                    en.append(int((seg * seg).sum()) // max(len(seg), 1))
                hv = 0
                for k in range(n_frames - 1):
                    if en[k + 1] > en[k]:
                        hv |= 1 << k
                out.append((mid, hv))
            yield pd.DataFrame(out, columns=["media_id", "dhash"])

    return media.select("media_id", "content").mapInPandas(
        kern, "media_id long, dhash long"
    )


def sql_audio_fingerprint(
    table: str = "documents", n_frames: int = 32
) -> str:
    """DuckDB twin of media_wav_from_documents ->
    :func:`audio_fingerprint` — same framing, same exact integer
    energies, same bit rule, recomputed from the hex-built WAV."""
    n = "octet_length(encode(text))"
    ch = "(doc_id % 2 + 1)"
    rate = "(8000 + (doc_id % 5) * 4000)"
    hx = (
        f"'52494646' || {_sql_le_hex(f'{n} + 36', 4)} || '57415645666D7420"
        f"10000000' || '0100' || {_sql_le_hex(ch, 2)} || {_sql_le_hex(rate, 4)} || "
        f"{_sql_le_hex(f'{rate} * {ch} * 2', 4)} || {_sql_le_hex(f'{ch} * 2', 2)} || "
        f"'1000' || '64617461' || {_sql_le_hex(n, 4)} || hex(encode(text))"
    )
    raw = ("(CAST('0x' || substr(hx, 91 + 4 * CAST(i AS INTEGER), 2) AS INTEGER) * 256"
           " + CAST('0x' || substr(hx, 89 + 4 * CAST(i AS INTEGER), 2) AS INTEGER))")
    nf = n_frames
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id, {hx} AS hx, {n} // 2 AS np FROM {table}
    ), sig AS (
      SELECT media_id, np,
             list_transform(range(0, np),
               i -> {raw} - CASE WHEN {raw} >= 32768 THEN 65536 ELSE 0 END) AS s
      FROM m
      WHERE np >= {nf}
    ), en AS (
      SELECT media_id,
             list_transform(range(0, {nf}), k ->
               list_sum(list_transform(
                 range(k * np // {nf}, (k + 1) * np // {nf}),
                 i -> CAST(s[CAST(i AS INTEGER) + 1] AS BIGINT)
                      * s[CAST(i AS INTEGER) + 1]))
               // greatest((k + 1) * np // {nf} - k * np // {nf}, 1)) AS e
      FROM sig
    )
    SELECT media_id,
           CAST(list_sum(list_transform(range(0, {nf - 1}), k ->
             CASE WHEN e[CAST(k AS INTEGER) + 2] > e[CAST(k AS INTEGER) + 1]
                  THEN 1::BIGINT << CAST(k AS INTEGER) ELSE 0 END))
             AS BIGINT) AS dhash
    FROM en
    """


def frame_set_similarity(
    frames: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> DataFrame:
    """(media_a, media_b, jaccard): video near-duplicate pairs by
    EXACT Jaccard over their distinct frame-checksum sets — the video
    member of the dedup family, fed by :func:`demux_avi_frames` (or
    any (media_id, checksum) frame stream, e.g. per-frame
    :func:`image_dhash` values rendered to hex for decoded codecs).

    Shape: candidates come from the checksum equi-join (videos
    sharing at least one identical frame) — content-addressed, so
    fan-out tracks genuinely repeated frames, not catalog size;
    intersection counts aggregate per pair and the threshold is the
    integer cross-multiplication. A pathologically repeated frame
    (e.g. an all-black intro card shared by every video) is the skew
    key to pre-filter, exactly like a stop-word in a token join.
    """
    num, den = threshold_num, threshold_den
    # Three consumers (both self-join sides + the per-video sizes)
    # otherwise re-execute the upstream frame stream — for the AVI
    # path that is the container assembly + demux kernel, the whole
    # cost of the query. Pin the tiny (media_id, checksum) set once;
    # blocks are freed when the RDD is GC'd (pagerank posture).
    u = (
        frames.select("media_id", "checksum")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sz = u.groupBy("media_id").agg(F.count(F.lit(1)).alias("_n"))
    inter = (
        u.alias("a")
        .join(u.alias("b"), "checksum")
        .where(F.col("a.media_id") < F.col("b.media_id"))
        .groupBy(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
        )
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    out = (
        inter.join(
            sz.select(F.col("media_id").alias("media_a"),
                      F.col("_n").alias("_na")), "media_a")
        .join(
            sz.select(F.col("media_id").alias("media_b"),
                      F.col("_n").alias("_nb")), "media_b")
    )
    union_ = F.col("_na") + F.col("_nb") - F.col("_inter")
    return (
        out.where(F.col("_inter") * den >= num * union_)
        .select(
            "media_a",
            "media_b",
            F.round(
                F.col("_inter").cast("double") / union_.cast("double"), 6
            ).alias("jaccard"),
        )
    )


def sql_frame_set_similarity(
    table: str = "documents",
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> str:
    """DuckDB twin of media_avi_from_documents -> demux_avi_frames ->
    :func:`frame_set_similarity` — same frames, same integer
    cross-multiplied threshold."""
    num, den = threshold_num, threshold_den
    return f"""
    WITH fr AS ({sql_media_avi_frames(table)}),
    u AS (SELECT DISTINCT media_id, checksum FROM fr),
    sz AS (SELECT media_id, count(*) AS n FROM u GROUP BY 1),
    p AS (
      SELECT a.media_id AS media_a, b.media_id AS media_b,
             count(*) AS inter
      FROM u a JOIN u b ON a.checksum = b.checksum
                       AND a.media_id < b.media_id
      GROUP BY 1, 2
    )
    SELECT media_a, media_b,
           round(CAST(inter AS DOUBLE)
                 / CAST(sa.n + sb.n - inter AS DOUBLE), 6) AS jaccard
    FROM p
    JOIN sz sa ON sa.media_id = media_a
    JOIN sz sb ON sb.media_id = media_b
    WHERE inter * {den} >= {num} * (sa.n + sb.n - inter)
    """
