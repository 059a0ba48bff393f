"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Design: media live as **opaque ``binary`` columns plus a typed metadata
struct** — the only representation that survives 100 TB (content stays
columnar/compressed in parquet, metadata is pushdown-filterable, and
Spark never interprets the bytes until a Pandas-UDF stage asks it to).

    media(media_id long, kind string, content binary,
          meta struct<mime string, width int, height int,
                      duration_ms long, sample_rate int>)

The decode/resize/frame-sample kernels are STUBS: this container ships
no codec libraries (PIL/librosa/av), so each kernel import-gates the
real library and otherwise either raises ``NotImplementedError`` or
runs a clearly-marked deterministic fake. Everything AROUND the kernel
— schema, Arrow batching, ``mapInPandas`` iterator signatures, frame
explosion, partition sizing — is real and tested; swapping the fake for
``PIL.Image.open(io.BytesIO(buf))`` changes one function body and no
plan shape.

Status note (round 2, 2026-08): flipping ``decode_images`` to a real
codec was re-evaluated — ``import PIL`` still fails in this container
and installing packages is prohibited, so the import-gated fake remains
the honest maximum here. The gate is live code: in an environment with
pillow present, ``decode_images`` takes the real branch with no edits.

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


_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def decode_images(media: DataFrame, allow_fake: bool = False) -> DataFrame:
    """Decode image payloads to (width, height, pixel checksum).

    STUB KERNEL: with a real codec available (``PIL``) this decodes;
    otherwise it raises ``NotImplementedError`` unless ``allow_fake``,
    in which case a deterministic fake "decodes" dimensions from the
    metadata struct and checksums the raw bytes. The mapInPandas
    batching, schema, and partition shape are the production ones.
    """
    try:  # pragma: no cover - codec not present in this container
        import PIL.Image  # noqa: F401

        have_codec = True
    except ImportError:
        have_codec = False
    if not have_codec and not allow_fake:
        raise NotImplementedError(
            "no image codec available in this environment; "
            "install pillow or pass allow_fake=True for the deterministic stub"
        )

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib
        import io

        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "checksum": []}
            for _, row in pdf.iterrows():
                buf = bytes(row["content"])
                if have_codec:  # pragma: no cover
                    import PIL.Image

                    img = PIL.Image.open(io.BytesIO(buf))
                    w, h = img.size
                else:
                    # deterministic fake: dimensions from metadata
                    w = int(row["meta"]["width"] or 0)
                    h = int(row["meta"]["height"] or 0)
                out["media_id"].append(row["media_id"])
                out["width"].append(w)
                out["height"].append(h)
                out["checksum"].append(hashlib.md5(buf).hexdigest())
            yield pd.DataFrame(out)

    return scale_out(media.select("media_id", "content", "meta")).mapInPandas(
        decode, schema=_DECODED_SCHEMA
    )


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling: one output row per sampled frame — the
    row-multiplying UDTF shape (``mapInPandas`` yielding more rows than
    it consumes).

    STUB KERNEL: a real build hands the payload to a demuxer (``av``)
    and emits encoded frames; the deterministic fake slices the payload
    into equal chunks, one per ``every_ms`` of ``meta.duration_ms``.
    The explosion geometry, schema, and partitioning are production.
    """

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_ms": [], "frame_bytes": []}
            for _, row in pdf.iterrows():
                buf = bytes(row["content"])
                dur = int(row["meta"]["duration_ms"] or 0)
                n_frames = max(dur // every_ms, 1)
                step = max(len(buf) // n_frames, 1)
                for i in range(n_frames):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(i * every_ms)
                    out["frame_bytes"].append(buf[i * step : (i + 1) * step])
            yield pd.DataFrame(out)

    return scale_out(media.select("media_id", "content", "meta")).mapInPandas(
        sample, schema=_FRAMES_SCHEMA
    )
