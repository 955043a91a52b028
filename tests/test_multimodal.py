"""Multimodal column plumbing: binary payloads + typed metadata +
Arrow-batched decode — the decode body is a deterministic fake (no
media libs in this environment) but the schema/batching/partitioning
are the real integration surface."""

from __future__ import annotations

import pandas as pd
import pytest

from simplemapreduceframework_spark import registry
from simplemapreduceframework_spark.operators.multimodal import (
    attach_payload,
    decode_features,
    decode_real,
)

registry.load_all()
Q = registry.QUERIES


def test_payload_schema(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wp = attach_payload(docs)
    dtypes = dict(wp.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["meta"].startswith("struct<")


def test_decode_is_deterministic(spark, sf_dir):
    a = sorted(r.asDict().items() for r in Q["multimodal_decode"](spark, sf_dir).collect())
    b = sorted(r.asDict().items() for r in Q["multimodal_decode"](spark, sf_dir).collect())
    assert a == b


def test_decode_features_batch_contract():
    """The mapInPandas body honors the declared FEATURE_SCHEMA on a
    plain pandas batch (what each Arrow batch looks like)."""
    import hashlib

    batch = pd.DataFrame({"doc_id": [1, 2], "payload": [b"abc", b"\x00\xff"]})
    out = pd.concat(list(decode_features(iter([batch]))))
    assert list(out.columns) == [
        "doc_id", "n_bytes", "checksum", "width", "height", "format",
    ]
    assert out["n_bytes"].tolist() == [3, 2]
    expected = [
        int(hashlib.md5(b).hexdigest()[:8], 16) for b in (b"abc", b"\x00\xff")
    ]
    assert out["checksum"].tolist() == expected
    assert out["width"].tolist() == [c % 1920 for c in expected]


def test_decode_matches_payload_bytes(spark, sf_dir):
    feats = {r["doc_id"]: r for r in Q["multimodal_decode"](spark, sf_dir).collect()}
    meta = {r["doc_id"]: r for r in Q["multimodal_meta"](spark, sf_dir).collect()}
    assert feats.keys() == meta.keys()
    for doc_id, f in feats.items():
        assert f["n_bytes"] == meta[doc_id]["n_bytes"]


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        next(decode_real(iter([])))


def test_resize_stage(spark, sf_dir):
    """Resize plumbing: fixed output dims, payload truncated/padded to
    exactly w*h bytes, row count preserved, no shuffle in the plan."""
    from simplemapreduceframework_spark.operators.multimodal import (
        RESIZE_SCHEMA,
        attach_payload,
        make_resize,
    )
    from simplemapreduceframework_spark.plans import n_exchanges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wp = attach_payload(docs)
    resized = wp.mapInPandas(make_resize(16, 8), RESIZE_SCHEMA)
    assert n_exchanges(resized) == 0
    rows = resized.collect()
    assert len(rows) == docs.count()
    assert all(len(r["payload"]) == 16 * 8 for r in rows)
    assert all((r["width"], r["height"]) == (16, 8) for r in rows)


def test_frame_sampler_fanout(spark, sf_dir):
    """Frame sampling: 1 row -> n_frames rows, deterministic slices."""
    from simplemapreduceframework_spark.operators.multimodal import (
        FRAME_SCHEMA,
        attach_payload,
        make_frame_sampler,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    wp = attach_payload(docs)
    frames = wp.mapInPandas(make_frame_sampler(4), FRAME_SCHEMA)
    rows = frames.collect()
    assert len(rows) == 20 * 4
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_doc.values())
    # deterministic across runs
    again = sorted((r["doc_id"], r["frame_idx"], bytes(r["frame"])) for r in frames.collect())
    first = sorted((r["doc_id"], r["frame_idx"], bytes(r["frame"])) for r in rows)
    assert again == first
