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
