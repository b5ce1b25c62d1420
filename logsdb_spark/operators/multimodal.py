"""Multimodal-column plumbing — *[extension]* (SURVEY §2.12).

Images/audio/video are opaque ``binary`` columns plus typed metadata.
The real decode libraries (PIL/ffmpeg/etc.) are not in this container,
so the decode step is a clearly-marked deterministic fake; everything
Spark-side — schema, Arrow batching via mapInPandas, partitioning —
is real and is what a production decode would ride on.

Design for 100 TB of blobs: mapInPandas streams Arrow record batches
through Python, so per-row overhead is amortized; blobs never pass
through the driver; partition sizing is controlled by
spark.sql.files.maxPartitionBytes at the scan. A real pipeline would
bound Arrow batch bytes with spark.sql.execution.arrow.maxRecordsPerBatch
to keep executor memory flat.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha256_8", StringType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
    ]
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat each document's utf-8 bytes as an opaque media blob —
    the container has no real image/audio fixtures, so the text bytes
    stand in. Production: spark.read.format('binaryFile') or a blob
    column from parquet."""
    return docs.select("doc_id", F.encode(F.col(text_col), "UTF-8").alias("payload"))


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """STUB for the real media decode (PIL.Image.open etc. — not
    installed here). Deterministic fake dimensions derived from the
    bytes so tests and oracles can verify the plumbing end-to-end."""
    return (len(payload) % 640) + 1, (payload[0] if payload else 0) + 1


def extract_media_metadata(blobs: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: Arrow-batched,
    one Python round-trip per partition batch (not per row)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [_decode_stub(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "sha256_8": [
                        hashlib.sha256(bytes(p)).hexdigest()[:8] for p in payloads
                    ],
                    "fake_width": [d[0] for d in dims],
                    "fake_height": [d[1] for d in dims],
                }
            )

    return blobs.mapInPandas(extract, MEDIA_META_SCHEMA)


def frame_sample_plan(blobs: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling plumbing: emit one row per sampled "frame" offset
    (a real video pipeline would decode at these offsets). Pure
    expression: posexplode over a computed offset sequence."""
    offsets = F.sequence(
        F.lit(0), F.greatest(F.length("payload") - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return blobs.select(
        "doc_id", F.posexplode(offsets).alias("frame_idx", "byte_offset")
    )

def extract_features(blobs: DataFrame, n_bins: int = 64) -> DataFrame:
    """Feature extraction: binary payload → dense ``array<float>``
    embedding, here a normalized byte histogram (the deterministic
    stand-in for a real image/audio encoder — CLIP, wav2vec, … — whose
    output shape this matches: fixed-dim float vector per blob).

    mapInPandas so the vectorized numpy histogram runs once per Arrow
    batch; the output column is exactly the embedding shape the
    similarity operators consume, so blobs → features → ANN/dedup
    composes without leaving the executor."""
    import numpy as np

    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * n_bins)
                    continue
                hist, _ = np.histogram(arr, bins=n_bins, range=(0, 256))
                feats.append((hist / arr.size).astype("float32").tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return blobs.mapInPandas(extract, schema)


def resize_media(blobs: DataFrame, target_bytes: int = 256) -> DataFrame:
    """Resize/transcode plumbing: binary in → binary out through an
    Arrow-batched pandas UDF — the signature and batch shape a real
    thumbnailer (PIL resize / ffmpeg -s) plugs into.

    The transform itself is a deterministic STUB (truncate or
    zero-pad to ``target_bytes``; real decode libs aren't in this
    container). What this pins down for production is the part that
    is hard to retrofit: payloads stay executor-side end-to-end, the
    UDF sees pandas Series of bytes (one Arrow batch per ~10k rows,
    not per row), and the output column is again ``binary`` so
    downstream stages (metadata extract, frame sampling) compose."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    @pandas_udf(BinaryType())
    def _resize(payloads: pd.Series) -> pd.Series:
        def fake_resize(p: bytes) -> bytes:
            b = bytes(p)
            return b[:target_bytes].ljust(target_bytes, b"\x00")

        return payloads.map(fake_resize)

    return blobs.withColumn("payload", _resize(F.col("payload")))
