"""MJPEG/AVI container tests (round 12): RIFF walk + real JPEG frame
decode, GIF<->MJPEG cross-container twin hashing (the video analogue
of test_flac.py's WAV<->FLAC twins), the stats kernel's NULL
contract, and the cross-container dedup pipeline finding planted
twins."""

import pytest

from logsdb_spark.operators.avi import (
    avi_frames_stats,
    build_avi_mjpeg,
    decode_avi_frames,
    expand_block_pixels,
)
from logsdb_spark.operators.multimodal import (
    build_gif_animated,
    decode_gif_frames,
    dhash56,
)


def test_avi_roundtrip_exact_pixels():
    """decode(build(x)) == the block-constant expansion of x, frame
    order preserved — the DC-exact contract riding the container."""
    w, h = 21, 11
    frames = [bytes([10, 200, 30, 77]), bytes([5]), bytes(range(64))]
    dec = decode_avi_frames(build_avi_mjpeg(w, h, frames))
    assert dec is not None
    assert (dec["width"], dec["height"], dec["n_frames"]) == (w, h, 3)
    assert dec["n_channels"] == 1
    assert dec["frames"] == [expand_block_pixels(w, h, f) for f in frames]


def test_gif_mjpeg_twins_hash_hamming_zero():
    """Same content in both containers -> IDENTICAL frame hashes
    (Hamming 0), the property that makes video dedup cross-container:
    a GIF animation and an MJPEG AVI built from the same block
    content decode to the same pixels, so dhash56 agrees bit-for-bit
    on every frame."""
    w, h = 28, 15
    blocks = [bytes([40, 7, 250, 99, 3]), bytes([128, 61]),
              bytes(range(100, 140)), bytes([9, 9, 200])]
    pix = [expand_block_pixels(w, h, b) for b in blocks]
    adec = decode_avi_frames(build_avi_mjpeg(w, h, blocks))
    gdec = decode_gif_frames(build_gif_animated(w, h, pix))
    assert adec is not None and gdec is not None
    ah = [dhash56(f, w, h, 1) for f in adec["frames"]]
    gh = [dhash56(f, w, h, 1) for f in gdec["frames"]]
    assert ah == gh
    assert len(set(ah)) >= 2, "fixture degenerate: frames all hash equal"


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"RIFF",
        b"RIFF\x00\x00\x00\x00AVI ",          # empty form, no frames
        b"RIFF\x04\x00\x00\x00WAVE",          # wrong RIFF form
        b"GIF89a\x01\x00\x01\x00",            # not RIFF at all
    ],
)
def test_avi_malformed_returns_none(payload):
    assert decode_avi_frames(payload) is None


def test_avi_truncated_and_corrupt_return_none():
    avi = build_avi_mjpeg(9, 9, [bytes([1, 2])])
    # truncated mid-chunk
    assert decode_avi_frames(avi[: len(avi) // 2]) is None
    # frame chunk corrupted into an invalid JPEG
    pos = avi.find(b"\xff\xd8")
    assert pos > 0
    bad = avi[:pos] + b"\x00\x00" + avi[pos + 2:]
    assert decode_avi_frames(bad) is None


def test_avi_header_dimension_mismatch_returns_none():
    """avih declares one geometry, the frames decode another — the
    walker must refuse rather than trust either side blindly."""
    avi = bytearray(build_avi_mjpeg(16, 8, [bytes([50])]))
    i = avi.find(b"avih") + 8
    import struct as _s

    avi[i + 32:i + 36] = _s.pack("<I", 99)  # dwWidth = 99
    assert decode_avi_frames(bytes(avi)) is None


def test_avi_frames_stats_kernel(spark):
    """The Arrow stats kernel: exact sums for decodable rows, NULLs
    (row-preserving) for garbage."""
    w, h = 12, 10  # bw=2, bh=2 -> edge blocks 4 wide / 2 tall
    frames = [bytes([100, 2, 30, 255]), bytes([7])]
    avi = build_avi_mjpeg(w, h, frames)
    rows = [(1, bytearray(avi)), (2, bytearray(b"not an avi"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in avi_frames_stats(df).collect()}

    def frame_sum(blocks):
        bw = (w + 7) // 8
        s = 0
        for i in range((w + 7) // 8 * ((h + 7) // 8)):
            cnt = min(8, w - 8 * (i % bw)) * min(8, h - 8 * (i // bw))
            s += blocks[i % len(blocks)] * cnt
        return s

    s0, s1 = frame_sum(frames[0]), frame_sum(frames[1])
    r = got[1]
    assert (r.width, r.height, r.n_frames) == (w, h, 2)
    assert r.px_sum == s0 + s1
    assert r.weighted_sum == 1 * s0 + 2 * s1
    assert got[2].px_sum is None and got[2].n_frames is None


def test_video_frame_hashes_dispatches_avi(spark):
    """video_frame_hashes is container-SNIFFING (round 12): a mixed
    GIF/AVI corpus hashes through one kernel, and cross-container
    twins (same content) pair at identical fhash values — planted
    here as doc 0 (AVI) / doc 1 (GIF) twins, doc 2 disjoint."""
    from pyspark.sql import functions as F

    from logsdb_spark.operators.multimodal import video_frame_hashes
    from logsdb_spark.plans.extensions import _winnow_pairs_from_index

    w, h = 24, 13
    blocks = [bytes([17, 201, 44]), bytes([90, 5]), bytes(range(50, 80)),
              bytes([250, 1, 3, 128])]
    pix = [expand_block_pixels(w, h, b) for b in blocks]
    rows = [
        (0, bytearray(build_avi_mjpeg(w, h, blocks))),
        (1, bytearray(build_gif_animated(w, h, pix))),
        (2, bytearray(build_gif_animated(
            w, h, [bytes([x]) * (w * h) for x in (31, 77, 123, 211)]))),
    ]
    blobs = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = video_frame_hashes(blobs, stride=2)
    by_doc = {}
    for r in hashes.collect():
        by_doc.setdefault(r.doc_id, []).append((r.frame_idx, r.fhash))
    assert sorted(by_doc[0]) == sorted(by_doc[1]), "twins must hash equal"
    ex = (hashes.select("doc_id", F.col("fhash").alias("fp")).distinct())
    pairs = {(r.id_a, r.id_b) for r in _winnow_pairs_from_index(ex).collect()}
    assert pairs == {(0, 1)}, pairs
