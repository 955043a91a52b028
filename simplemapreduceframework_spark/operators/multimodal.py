"""Multimodal columns (BASELINE.json north star): image/audio/video as
opaque binary columns with typed metadata, processed by Arrow-batched
mapInPandas decoders.

The container has no image/audio libraries, so the *decode* step is
stubbed (deterministic fake features, or NotImplementedError for real
codecs) — but the Spark-side plumbing is real and tested: binary
payload column, metadata struct, mapInPandas batch shape, and the
partitioning story (payloads never shuffle; feature extraction is
row-local so it scales linearly).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

# Schema produced by the fake decoder: keep in sync with decode_features.
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, checksum bigint, "
    "width int, height int, format string"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    Stand-in for reading real media bytes: payload = utf-8 bytes of the
    text (deterministic). The metadata struct mirrors what an image
    source would carry (format/width/height nullable until decode).
    """
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            F.octet_length(F.col("text")).cast("int").alias("n_bytes"),
            F.col("source").alias("uri"),
        ).alias("meta"),
    )


def decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched fake decoder (mapInPandas body).

    Deterministic per-payload features: byte length, a content checksum
    (first 8 hex digits of the payload md5 as an int — portable, so the
    whole decode is oracle-checkable in SQL), and fake width/height
    derived from the checksum. A real deployment swaps the body for
    PIL/ffmpeg calls; the batch shape, schema, and partitioning are
    exactly what that real decoder would use.
    """
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        checksum = payloads.map(
            lambda b: int(hashlib.md5(bytes(b)).hexdigest()[:8], 16)
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int64"),
                "checksum": checksum.astype("int64"),
                "width": (checksum % 1920).astype("int32"),
                "height": (checksum % 1080).astype("int32"),
                "format": "fake/raw",
            }
        )


def decode_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real-codec decode path — requires media libraries not present in
    this environment. Kept as the documented integration point."""
    raise NotImplementedError(
        "real image/audio decode requires PIL/ffmpeg; use decode_features "
        "(deterministic fake) for plumbing tests"
    )


RESIZE_SCHEMA = "doc_id bigint, width int, height int, payload binary"


def make_resize(target_w: int, target_h: int):
    """Image-resize stage (mapInPandas body factory).

    Deterministic fake: "resizing" truncates/zero-pads the payload to
    target_w*target_h bytes — the real implementation swaps in
    PIL.Image.resize; batch shape, schema, and the row-local/no-shuffle
    contract are identical.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = target_w * target_h
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda b: bytes(b[:n]) + b"\x00" * max(0, n - len(b))
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": resized,
                }
            )

    return resize


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"


def make_frame_sampler(n_frames: int, frame_bytes: int = 16):
    """Video frame-sampling stage (1 row -> n_frames rows).

    Deterministic fake: evenly spaced byte-slices of the payload stand
    in for decoded frames (real impl: ffmpeg keyframe extraction). The
    1->N fan-out shape matches the UDTF contract, so downstream
    per-frame feature extraction composes unchanged.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_frame = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                total = len(payload)
                for i in range(n_frames):
                    start = (i * max(total - frame_bytes, 0)) // max(n_frames - 1, 1)
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_frame.append(bytes(payload[start : start + frame_bytes]))
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame": out_frame}
            )

    return sample


@query(
    "multimodal_meta",
    oracle="""
SELECT doc_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
       MD5(text) AS content_md5,
       source
FROM documents
""",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction (byte length + content hash) —
    pure JVM expressions over the payload, no Python, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "UTF-8"))
        .cast("bigint")
        .alias("n_bytes"),
        F.md5("text").alias("content_md5"),
        "source",
    )


@query(
    "multimodal_decode",
    oracle="""
SELECT doc_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
       CAST(CONCAT('0x', SUBSTR(MD5(text), 1, 8)) AS BIGINT) AS checksum,
       CAST(CAST(CONCAT('0x', SUBSTR(MD5(text), 1, 8)) AS BIGINT) % 1920 AS INTEGER) AS width,
       CAST(CAST(CONCAT('0x', SUBSTR(MD5(text), 1, 8)) AS BIGINT) % 1080 AS INTEGER) AS height,
       'fake/raw' AS format
FROM documents
""",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over binary payloads via mapInPandas.

    The decoder body is Python-side by nature, but its fake features
    are md5-derived, so the full decode is oracle-checked in SQL (the
    real-codec path stays `decode_real`). Scale: row-local Arrow
    batches, no shuffle, linear in corpus bytes; on a cluster the
    payload column stays columnar end-to-end.
    """
    docs = load_table(spark, sf_dir, "documents")
    with_payload = attach_payload(docs)
    return with_payload.mapInPandas(decode_features, FEATURE_SCHEMA)


from .._serde import pickle_by_value as _pbv  # noqa: E402
_pbv(__name__)
