"""FLAC codec + cross-container audio fingerprint invariance.

The claim under test (VERDICT r10 "What's missing" #1): the audio
dedup tier is container-invariant the way the image tier is — the
same PCM wrapped in WAV and FLAC must decode to identical samples and
therefore produce IDENTICAL audio_fp56 fingerprints, so
dedup_audio_fingerprint finds WAV↔FLAC twins with zero extra logic.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from logsdb_spark.operators.flac import (
    _BitReader,
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_code,
    build_flac,
    decode_flac_samples,
)
from logsdb_spark.operators.multimodal import (
    audio_fp56,
    build_wav,
    decode_wav_samples,
)


def _pcm(vals):
    return struct.pack(f"<{len(vals)}h", *vals)


def test_flac_roundtrip_mono():
    vals = [(i * 31 - 900) % 20000 - 10000 for i in range(6000)]
    blob = build_flac(1, 8000, 16, _pcm(vals))
    dec = decode_flac_samples(blob)
    assert dec is not None
    assert dec["n_channels"] == 1
    assert dec["sample_rate_hz"] == 8000
    assert dec["bit_depth"] == 16
    assert np.array_equal(dec["samples"], np.asarray(vals, np.int32))


def test_flac_roundtrip_stereo_both_modes():
    vals = [(i * 13) % 4000 - 2000 for i in range(5002)]
    for mode in ("independent", "left_side"):
        blob = build_flac(2, 16000, 16, _pcm(vals), stereo_mode=mode)
        dec = decode_flac_samples(blob)
        assert dec is not None, mode
        assert dec["n_channels"] == 2
        assert np.array_equal(dec["samples"], np.asarray(vals, np.int32)), mode


def test_flac_matches_wav_decode_exactly():
    """Same PCM through build_wav/decode_wav_samples and
    build_flac/decode_flac_samples — identical interleaved samples
    including the whole-frame zero padding both builders apply."""
    raw = "cross-container audio twin éü".encode("utf-8") * 40
    for nch, rate in ((1, 8000), (2, 12000)):
        wav = build_wav(nch, rate, 16, raw)
        flac = build_flac(nch, rate, 16, raw)
        dw = decode_wav_samples(wav)
        df = decode_flac_samples(flac)
        assert dw is not None and df is not None
        assert dw["n_channels"] == df["n_channels"] == nch
        assert dw["sample_rate_hz"] == df["sample_rate_hz"] == rate
        assert np.array_equal(dw["samples"], df["samples"])


def test_audio_fp56_container_invariant():
    raw = ("the same song in two containers " * 60).encode()
    fp_wav = audio_fp56(decode_wav_samples(build_wav(1, 8000, 16, raw))["samples"])
    fp_flac = audio_fp56(decode_flac_samples(build_flac(1, 8000, 16, raw))["samples"])
    assert fp_wav == fp_flac
    assert fp_wav > 0


def test_flac_compresses_structured_pcm():
    """The FIXED+Rice path must actually compress (prove it is not a
    verbatim store with extra steps): a smooth ramp compresses well
    below raw PCM size."""
    vals = [(i // 4) % 1000 for i in range(8192)]
    raw = _pcm(vals)
    blob = build_flac(1, 8000, 16, raw)
    assert len(blob) < len(raw) // 2
    dec = decode_flac_samples(blob)
    assert np.array_equal(dec["samples"], np.asarray(vals, np.int32))


def test_flac_empty_pcm():
    blob = build_flac(1, 8000, 16, b"")
    dec = decode_flac_samples(blob)
    assert dec is not None
    assert dec["samples"].size == 0


def test_flac_rejects_corruption():
    vals = [i % 100 for i in range(3000)]
    blob = bytearray(build_flac(1, 8000, 16, _pcm(vals)))
    assert decode_flac_samples(bytes(blob)) is not None
    # flip a residual byte deep in the first frame: CRC-16 must catch it
    blob[-3] ^= 0x40
    assert decode_flac_samples(bytes(blob)) is None
    # and garbage is None, not a crash
    assert decode_flac_samples(b"") is None
    assert decode_flac_samples(b"fLaC") is None
    assert decode_flac_samples(b"RIFF1234WAVE") is None


def test_flac_decodes_lpc_and_partitioned_rice():
    """Decoder coverage beyond what build_flac emits: hand-build a
    frame with an LPC subframe (order 2, quantized coefficients) and
    a partition-order-1 Rice residual, plus an escaped partition —
    the paths real encoders produce."""
    rate, blk = 8000, 16
    vals = [100, 102, 104, 106, 108, 110, 112, 114,
            116, 118, 120, 122, 124, 126, 128, 130]
    # LPC order 2, precision 4 (qlp=shift 1, coefs [3, -1]): pred =
    # (3*s[i-1] - s[i-2]) >> 1 — for the arithmetic ramp, s[i]+1.
    coefs, shift, prec = [3, -1], 1, 4
    res = []
    for i in range(2, blk):
        pred = (coefs[0] * vals[i - 1] + coefs[1] * vals[i - 2]) >> shift
        res.append(vals[i] - pred)
    bw = _BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(0b0110, 4)     # 8-bit blocksize-1 at end
    bw.write(0b0000, 4)     # rate from STREAMINFO
    bw.write(0, 4)          # 1 channel
    bw.write(0b100, 3)      # 16-bit
    bw.write(0, 1)
    head = bw.bytes() + _utf8_code(0) + bytes([blk - 1])
    head += bytes([_crc8(head)])
    sw = _BitWriter()
    sw.write(0, 1)
    sw.write(0b100000 | (2 - 1), 6)  # LPC order 2
    sw.write(0, 1)
    for s in vals[:2]:
        sw.write(s, 16)
    sw.write(prec - 1, 4)
    sw.write(shift, 5)
    for c in coefs:
        sw.write(c & ((1 << prec) - 1), prec)
    sw.write(0b00, 2)       # RICE
    sw.write(1, 4)          # partition order 1 → 2 partitions
    # partition 1: (blk>>1) - order = 6 residuals, rice p=1
    sw.write(1, 4)
    for r in res[:6]:
        z = (r << 1) if r >= 0 else ((-r) << 1) - 1
        sw.write_unary(z >> 1)
        sw.write(z, 1)
    # partition 2: escaped raw 5-bit residuals
    sw.write(0b1111, 4)
    sw.write(5, 5)
    for r in res[6:]:
        sw.write(r & 0x1F, 5)
    sw.align()
    body = head + sw.bytes()
    frame = body + struct.pack(">H", _crc16(body))
    info = _BitWriter()
    info.write(4096, 16)
    info.write(4096, 16)
    info.write(len(frame), 24)
    info.write(len(frame), 24)
    info.write(rate, 20)
    info.write(0, 3)
    info.write(15, 5)
    info.write(blk, 36)
    si = info.bytes() + b"\x00" * 16
    blob = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(si))[1:] + si + frame
    dec = decode_flac_samples(blob)
    assert dec is not None
    assert np.array_equal(dec["samples"], np.asarray(vals, np.int32))


def test_flac_wasted_bits_and_right_side():
    """Wasted-bits subframe + right/side stereo, hand-built: every
    sample even (1 wasted bit), right channel stored verbatim, side =
    left - right."""
    rate, blk = 8000, 8
    left = [20, 22, 24, 26, 28, 30, 32, 34]
    right = [10, 10, 10, 10, 10, 10, 10, 10]
    side = [left[i] - right[i] for i in range(blk)]
    bw = _BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(0b0110, 4)
    bw.write(0b0000, 4)
    bw.write(0b1001, 4)     # right/side
    bw.write(0b100, 3)
    bw.write(0, 1)
    head = bw.bytes() + _utf8_code(0) + bytes([blk - 1])
    head += bytes([_crc8(head)])
    sw = _BitWriter()
    # side subframe: 17-bit, VERBATIM with 1 wasted bit
    sw.write(0, 1)
    sw.write(0b000001, 6)
    sw.write(1, 1)          # wasted-bits flag
    sw.write(1, 1)          # unary 0 ⇒ k=1 wasted bit
    for s in side:
        sw.write(s >> 1, 16)  # 17-1 wasted
    # right subframe: CONSTANT
    sw.write(0, 1)
    sw.write(0b000000, 6)
    sw.write(0, 1)
    sw.write(right[0], 16)
    sw.align()
    body = head + sw.bytes()
    frame = body + struct.pack(">H", _crc16(body))
    info = _BitWriter()
    info.write(4096, 16)
    info.write(4096, 16)
    info.write(len(frame), 24)
    info.write(len(frame), 24)
    info.write(rate, 20)
    info.write(1, 3)        # 2 channels
    info.write(15, 5)
    info.write(blk, 36)
    si = info.bytes() + b"\x00" * 16
    blob = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(si))[1:] + si + frame
    dec = decode_flac_samples(blob)
    assert dec is not None
    exp = np.empty(blk * 2, np.int32)
    exp[0::2] = left
    exp[1::2] = right
    assert np.array_equal(dec["samples"], exp)


def test_utf8_code_roundtrip():
    for v in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF,
              (1 << 31) - 1, (1 << 36) - 1):
        enc = _utf8_code(v)
        br = _BitReader(enc)
        from logsdb_spark.operators.flac import _read_utf8_code
        assert _read_utf8_code(br) == v, v


def test_audio_dedup_finds_wav_flac_twins(spark):
    """The dedup consequence of container invariance: a corpus mixing
    WAV docs and FLAC copies of the same PCM must surface every
    (wav, flac) twin as a Hamming-0 near-dup pair through the
    standard audio pipeline (container-dispatching audio_fingerprint
    → banded Hamming ball), with zero container-specific logic."""
    import pyspark.sql.functions as F

    from logsdb_spark.operators.dedup import phash_near_dup_pairs
    from logsdb_spark.operators.multimodal import audio_fingerprint

    texts = [
        ("audio twin number %d with enough bytes to matter " % i) * 6
        for i in range(8)
    ]
    rows = []
    for i, t in enumerate(texts):
        pcm = t.encode()
        rows.append((i, bytearray(build_wav(1, 8000, 16, pcm))))
        rows.append((100 + i, bytearray(build_flac(1, 8000, 16, pcm))))
    blobs = spark.createDataFrame(rows, "doc_id long, payload binary")
    fps = audio_fingerprint(blobs)
    pairs = {(r.id_a, r.id_b, r.hamming)
             for r in phash_near_dup_pairs(
                 fps, max_hamming=3, hash_col="afp").collect()}
    for i in range(len(texts)):
        assert (i, 100 + i, 0) in pairs, f"twin {i} not found: {pairs}"


def test_flac_pathological_lpc_returns_none_not_crash():
    """A CRC-valid stream whose LPC subframe has huge coefficients and
    zero shift grows predicted samples past int32 within one block —
    the decoder must honor the fall-back-not-crash contract (None),
    not raise OverflowError out of the Arrow task."""
    rate, blk = 8000, 64
    bw = _BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(0b0110, 4)
    bw.write(0b0000, 4)
    bw.write(0, 4)
    bw.write(0b100, 3)
    bw.write(0, 1)
    head = bw.bytes() + _utf8_code(0) + bytes([blk - 1])
    head += bytes([_crc8(head)])
    sw = _BitWriter()
    sw.write(0, 1)
    sw.write(0b100000 | (1 - 1), 6)  # LPC order 1
    sw.write(0, 1)
    sw.write(2, 16)                  # warm-up sample
    sw.write(15 - 1, 4)              # precision 15
    sw.write(0, 5)                   # shift 0
    sw.write(16383, 15)              # coefficient 16383
    sw.write(0b00, 2)
    sw.write(0, 4)
    sw.write(0, 4)                   # rice p=0, residuals all zero
    for _ in range(blk - 1):
        sw.write_unary(0)
    sw.align()
    body = head + sw.bytes()
    frame = body + struct.pack(">H", _crc16(body))
    info = _BitWriter()
    info.write(4096, 16)
    info.write(4096, 16)
    info.write(len(frame), 24)
    info.write(len(frame), 24)
    info.write(rate, 20)
    info.write(0, 3)
    info.write(15, 5)
    info.write(blk, 36)
    si = info.bytes() + b"\x00" * 16
    blob = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(si))[1:] + si + frame
    assert decode_flac_samples(blob) is None


def test_flac_pathological_lpc_int32_wrap_zone_returns_none():
    """Round-12 advice regression: the SAME pathological LPC shape
    with a SHORT block, so the runaway samples land in (2^31, 2^63)
    — the zone numpy 1.x silently WRAPS on int32 conversion instead
    of raising OverflowError. Pre-fix this decoded to wrapped garbage
    (a silently wrong audio fingerprint); the explicit bit-depth
    range validation must return None. With warm-up 2 and
    coefficient 16383 at shift 0, samples run 2, 32766 (in int16
    range), ~5.4e8 (past the 16-bit stream bound), ~8.8e12 (the
    int32 silent-wrap zone)."""
    rate, blk = 8000, 4
    bw = _BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(0b0110, 4)
    bw.write(0b0000, 4)
    bw.write(0, 4)
    bw.write(0b100, 3)
    bw.write(0, 1)
    head = bw.bytes() + _utf8_code(0) + bytes([blk - 1])
    head += bytes([_crc8(head)])
    sw = _BitWriter()
    sw.write(0, 1)
    sw.write(0b100000 | (1 - 1), 6)  # LPC order 1
    sw.write(0, 1)
    sw.write(2, 16)                  # warm-up sample
    sw.write(15 - 1, 4)              # precision 15
    sw.write(0, 5)                   # shift 0
    sw.write(16383, 15)              # coefficient 16383
    sw.write(0b00, 2)
    sw.write(0, 4)
    sw.write(0, 4)                   # rice p=0, residuals all zero
    for _ in range(blk - 1):
        sw.write_unary(0)
    sw.align()
    body = head + sw.bytes()
    frame = body + struct.pack(">H", _crc16(body))
    info = _BitWriter()
    info.write(4096, 16)
    info.write(4096, 16)
    info.write(len(frame), 24)
    info.write(len(frame), 24)
    info.write(rate, 20)
    info.write(0, 3)
    info.write(15, 5)
    info.write(blk, 36)
    si = info.bytes() + b"\x00" * 16
    blob = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(si))[1:] + si + frame
    assert decode_flac_samples(blob) is None
