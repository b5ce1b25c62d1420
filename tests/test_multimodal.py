"""Multimodal plumbing pins (operators/multimodal.py): the Arrow
batch shapes and schema contracts a real decoder would plug into.
The metadata path's values are covered by the `multimodal_metadata`
oracle query; these cover the binary→binary resize stage and
composition between stages.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from logsdb_spark.catalog import load_table
from logsdb_spark.operators.multimodal import (
    attach_binary_payload,
    extract_media_metadata,
    frame_sample_plan,
    resize_media,
)

from conftest import SF_DIR


def test_resize_media_normalizes_payload_size(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    resized = resize_media(attach_binary_payload(docs), target_bytes=256)
    assert dict(resized.dtypes)["payload"] == "binary"
    sizes = resized.select(F.length("payload").alias("n")).distinct().collect()
    assert [r["n"] for r in sizes] == [256]


def test_resize_composes_with_metadata_and_frame_sample(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(20)
    resized = resize_media(attach_binary_payload(docs), target_bytes=300)
    meta = extract_media_metadata(resized)
    assert meta.count() == 20
    assert all(r["n_bytes"] == 300 for r in meta.collect())
    # 300-byte payload at 1 KiB stride → exactly one frame at offset 0
    frames = frame_sample_plan(resized).collect()
    assert len(frames) == 20
    assert all(r["frame_idx"] == 0 and r["byte_offset"] == 0 for r in frames)


def test_resize_is_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(10)
    a = resize_media(attach_binary_payload(docs)).orderBy("doc_id").collect()
    b = resize_media(attach_binary_payload(docs)).orderBy("doc_id").collect()
    assert [bytes(r["payload"]) for r in a] == [bytes(r["payload"]) for r in b]


def test_extract_features_matches_numpy(spark):
    """Byte-histogram features: dimension, normalization (sums to 1),
    and exact agreement with a driver-side numpy recompute."""
    import numpy as np

    from logsdb_spark.catalog import load_table
    from logsdb_spark.operators.multimodal import (
        attach_binary_payload,
        extract_features,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    blobs = attach_binary_payload(docs)
    rows = {r.doc_id: r.features for r in extract_features(blobs).collect()}
    raw = {r.doc_id: bytes(r.payload) for r in blobs.collect()}
    assert rows.keys() == raw.keys()
    for doc_id, feats in rows.items():
        assert len(feats) == 64
        arr = np.frombuffer(raw[doc_id], dtype=np.uint8)
        want, _ = np.histogram(arr, bins=64, range=(0, 256))
        want = (want / arr.size).astype("float32")
        assert np.allclose(np.array(feats, dtype="float32"), want)
        assert abs(sum(feats) - 1.0) < 1e-3


def test_features_compose_with_similarity(spark):
    """The multimodal features column must plug straight into the
    similarity operators (blob → embedding → top-k), staying
    executor-side end to end."""
    from pyspark.sql import functions as F

    from logsdb_spark.catalog import load_table
    from logsdb_spark.operators.multimodal import (
        attach_binary_payload,
        extract_features,
    )
    from logsdb_spark.operators.similarity import brute_force_topk

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    emb = extract_features(attach_binary_payload(docs)).select(
        F.col("doc_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    probes = emb.limit(2).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    top = brute_force_topk(emb, probes, k=3).collect()
    assert top
    best = {r.probe_id: r.neighbor_id for r in top if r.rank == 1}
    for p, n in best.items():
        assert p == n, "a vector must be its own nearest neighbor"
