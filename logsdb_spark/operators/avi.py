"""MJPEG/AVI video container — *[extension]* (SURVEY §2.12 multimodal
scope), the video tier's SECOND real container (round 12), mirroring
how FLAC is the audio tier's second container next to WAV
(operators/flac.py) and how the image tier spans PNG/GIF/JPEG.

An AVI file is a RIFF form (`RIFF <size> 'AVI '`) holding a `hdrl`
LIST (main `avih` header + one `strl` stream LIST with `strh`/`strf`)
and a `movi` LIST whose `00dc` chunks each carry ONE complete
baseline JPEG — the Motion-JPEG convention every capture tool and
ffmpeg understand. The writer here emits that exact layout (plus a
conventional `idx1` index) around the repo's spec-conformant
block-constant JPEG builder (operators/multimodal.build_jpeg), and
the reader walks the RIFF tree and runs the REAL baseline JPEG
decoder on every frame chunk — so an AVI fixture's decoded frames
are exactly recomputable from the source text by a SQL oracle (the
DC-exact contract build_jpeg documents), while the decode path is an
honest container walk + full Huffman/IDCT pipeline.

Reference parity note: the reference (jwodder/logsdb) has no media
surface at all — this module is extension scope for the LLM
training-data pipeline (video dedup across containers), public
formats only (AVI/RIFF per the Microsoft/OpenDML public spec, JPEG
per ITU T.81).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .multimodal import (
    GIF_FRAMES_STATS_SCHEMA,
    build_jpeg,
    decode_jpeg_pixels,
)


def expand_block_pixels(width: int, height: int, content: bytes) -> bytes:
    """Expand per-BLOCK content (build_jpeg's contract: 8x8 block i in
    raster order carries ``content[i % len(content)]``) to per-PIXEL
    bytes — what a lossless container (GIF) must carry so its frames
    are pixel-identical to the MJPEG twin's decoded frames."""
    vals = content or b"\x00"
    bw = (width + 7) // 8
    out = bytearray(width * height)
    for y in range(height):
        row = (y // 8) * bw
        for x in range(width):
            out[y * width + x] = vals[(row + x // 8) % len(vals)]
    return bytes(out)


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(subtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", subtype + body)


def build_avi_mjpeg(width: int, height: int, frames: list,
                    fps: int = 10) -> bytes:
    """A REAL MJPEG AVI: RIFF('AVI ') → hdrl LIST (avih + one vids
    strl with 'MJPG' handler) → movi LIST with one '00dc' chunk per
    frame, each a complete baseline JPEG from build_jpeg — plus the
    conventional idx1 keyframe index. ``frames`` is a list of
    per-frame BLOCK content (build_jpeg's cycling contract), so every
    decoded pixel is a closed-form function of the content bytes.
    Any AVI reader opens the file; decode_avi_frames returns exactly
    the per-frame decoded pixel planes."""
    jpegs = [build_jpeg(width, height, f) for f in frames]
    nf = len(jpegs)
    maxbuf = max((len(j) for j in jpegs), default=0)

    avih = struct.pack(
        "<10I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        0,                          # dwMaxBytesPerSec
        0,                          # dwPaddingGranularity
        0x10,                       # dwFlags: AVIF_HASINDEX
        nf,                         # dwTotalFrames
        0,                          # dwInitialFrames
        1,                          # dwStreams
        maxbuf,                     # dwSuggestedBufferSize
        width,
        height,
    ) + b"\x00" * 16                # dwReserved[4]

    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, max(fps, 1), 0, nf,
                      maxbuf, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, width, height)  # rcFrame
    )
    # BITMAPINFOHEADER with 'MJPG' compression
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b""
    idx = b""
    for j in jpegs:
        # idx1 offsets are measured from the start of the movi LIST
        # data (i.e. the 'movi' fourcc is at offset 0, the first
        # chunk id at offset 4) — the convention players expect.
        idx += b"00dc" + struct.pack("<III", 0x10, 4 + len(movi_body),
                                     len(j))
        movi_body += _chunk(b"00dc", j)
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(b"idx1", idx)

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_frames(payload: bytes) -> dict | None:
    """REAL MJPEG/AVI decode: walk the RIFF tree (hdrl → avih for the
    declared dimensions, movi → every '00dc'/'00db' chunk), run the
    full baseline JPEG decoder on each frame chunk, and return the
    same shape decode_gif_frames does — ``{"width", "height",
    "n_frames", "n_channels", "frames": [bytes, ...]}`` (decoded
    pixel planes in stream order). None-not-crash contract on
    malformed input: truncated chunks, non-AVI RIFF forms, frames
    whose JPEG fails to decode or whose dimensions disagree with the
    avih header, 12-bit-precision frames (the hash consumers read
    byte samples), and mixed channel counts all return None."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    try:
        declared = None  # (w, h) from avih
        frames = []
        nch = None

        def walk(data: bytes) -> bool:
            nonlocal declared, nch
            i = 0
            while i + 8 <= len(data):
                fourcc = data[i:i + 4]
                (size,) = struct.unpack("<I", data[i + 4:i + 8])
                body = data[i + 8:i + 8 + size]
                if len(body) < size:
                    return False
                if fourcc == b"LIST":
                    sub = body[:4]
                    if sub in (b"hdrl", b"strl", b"movi", b"rec "):
                        if not walk(body[4:]):
                            return False
                elif fourcc == b"avih":
                    if size < 40:
                        return False
                    w, h = struct.unpack("<II", body[32:40])
                    declared = (int(w), int(h))
                elif fourcc[2:4] in (b"dc", b"db"):
                    dec = decode_jpeg_pixels(body)
                    if dec is None or dec.get("precision", 8) != 8:
                        return False
                    if declared is not None and (
                        (dec["width"], dec["height"]) != declared
                    ):
                        return False
                    c = dec.get("n_channels", 1)
                    if nch is None:
                        nch = c
                    elif nch != c:
                        return False
                    frames.append(
                        (dec["width"], dec["height"], dec["pixels"])
                    )
                i += 8 + size + (size & 1)
            return True

        if not walk(b[12:12 + struct.unpack("<I", b[4:8])[0] - 4]):
            return None
        if not frames:
            return None
        w, h = frames[0][0], frames[0][1]
        if any((fw, fh) != (w, h) for fw, fh, _ in frames):
            return None
        return {
            "width": int(w),
            "height": int(h),
            "n_frames": len(frames),
            "n_channels": int(nch or 1),
            "frames": [f for _, _, f in frames],
        }
    except (struct.error, IndexError, ValueError):
        return None


def synthesize_cross_videos(docs: DataFrame) -> DataFrame:
    """CROSS-CONTAINER video fixture corpus: sibling docs carry the
    SAME frame content in different containers — even doc_id gets an
    MJPEG AVI, odd doc_id a GIF89a animation, both derived from the
    EVEN sibling's text (sib = doc_id - doc_id % 2), so every
    (2k, 2k+1) pair is a true cross-container twin the video dedup
    must find (the video analogue of synthesize_flac_media's WAV/FLAC
    twins). Frame content is per-BLOCK (JPEG's DC-exact contract):
    frame f's block i carries byte (f*nb + i) % L of the sibling
    text, the GIF twin carrying the block-expanded pixels — so every
    decoded pixel, frame hash, and pair decision is closed-form for
    the SQL oracle. Dimensions w = sib%24+5, h = sib%12+5, n_frames =
    sib%4+3 (>= 3, so stride-2 sampling keeps >= 2 frames and the
    >= 2-shared-hash pair contract can fire). Input must carry
    (doc_id, sib_text) — the sibling join happens in the layout
    builder (operators/silver.cross_video_blob_layout)."""
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    from .multimodal import build_gif_animated

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["sib_text"]):
                sib = int(doc_id) - int(doc_id) % 2
                w = sib % 24 + 5
                h = sib % 12 + 5
                nf = sib % 4 + 3
                data = ("" if text is None else str(text)).encode("utf-8")
                data = data or b"\x00"
                nb = ((w + 7) // 8) * ((h + 7) // 8)
                stream = data * (nf * nb // len(data) + 1)
                blocks = [stream[f * nb: (f + 1) * nb] for f in range(nf)]
                if int(doc_id) % 2 == 0:
                    payloads.append(build_avi_mjpeg(w, h, blocks))
                else:
                    payloads.append(build_gif_animated(
                        w, h,
                        [expand_block_pixels(w, h, blk) for blk in blocks],
                    ))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ])
    return docs.select("doc_id", "sib_text").mapInPandas(synth, schema)


def avi_frames_stats(blobs: DataFrame) -> DataFrame:
    """gif_frames_stats' AVI twin: per-video frame count, exact total
    pixel sum, and the frame-order-sensitive checksum
    sum((f+1) * frame_sum) over REAL MJPEG decode — container walk +
    full baseline JPEG pipeline per frame inside one Arrow
    mapInPandas kernel. Undecodable payloads yield NULL stats (same
    row-preserving contract as the GIF kernel). A decoder that drops,
    repeats, or reorders '00dc' chunks — or misreads any block any
    frame's dhash grid samples — hash-mismatches the closed-form
    oracle."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("width", "height", "n_frames",
                                    "px_sum", "weighted_sum")}
            for p in pdf["payload"]:
                dec = decode_avi_frames(bytes(p) if p is not None else b"")
                if dec is None:
                    for k in rows:
                        rows[k].append(None)
                    continue
                sums = [int(np.frombuffer(f, np.uint8).sum(dtype=np.int64))
                        for f in dec["frames"]]
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["n_frames"].append(dec["n_frames"])
                rows["px_sum"].append(sum(sums))
                rows["weighted_sum"].append(
                    sum((f + 1) * s for f, s in enumerate(sums)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **rows})

    return blobs.mapInPandas(stats, GIF_FRAMES_STATS_SCHEMA)
