"""Round-13 optimization pins: the decode-kernel hot paths were
rewritten for speed (canonical T.81 Huffman DECODE + multi-bit reads
in the JPEG entropy decoder, memoized LZW init table + tracked length
in the GIF decoder, byte-wise unary/Rice reads + unrolled FIXED
predictors in the FLAC decoder, flattened-GEMM IDCT). Each rewrite
claims VALUE IDENTITY with the prior per-bit/dict/genexpr form — these
tests pin that claim against independent reference implementations on
randomized inputs, so a future edit that drifts a boundary case fails
here rather than at the oracle."""

from __future__ import annotations

import random

import pytest


# ---------------------------------------------------------------------------
# JPEG: canonical-table decode == (length, code)-dict decode
# ---------------------------------------------------------------------------

def _dict_table(bits, vals):
    """The pre-round-13 table form: (code_length, code_value) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _random_dht(rng):
    """A spec-valid random DHT: canonical code lengths via the Kraft
    budget, then arbitrary symbol values."""
    bits = [0] * 16
    budget = 1.0
    total = 0
    for length in range(1, 17):
        if budget <= 0 or total >= 255:
            break
        max_n = min(int(budget * (1 << length)), 255 - total,
                    1 << (length - 1))
        n = rng.randint(0, max(0, max_n))
        bits[length - 1] = n
        budget -= n / (1 << length)
        total += n
    if total == 0:
        bits[3] = 1
        total = 1
    vals = [rng.randrange(256) for _ in range(total)]
    return bits, vals


def test_huffman_canonical_matches_dict_decode():
    from logsdb_spark.operators.multimodal import _BitReader, _huffman_table

    rng = random.Random(13)
    for trial in range(200):
        bits, vals = _random_dht(rng)
        tbl = _huffman_table(bits, vals)
        ref = _dict_table(bits, vals)
        # random bitstream; decode with the canonical reader and
        # replay the same bits through the dict reference
        data = bytes(rng.randrange(255) for _ in range(64))  # no 0xFF
        br = _BitReader(data, 0)
        consumed_syms = []
        try:
            for _ in range(20):
                consumed_syms.append(br.decode_huffman(tbl))
        except ValueError:
            consumed_syms.append("ValueError")
        # reference: per-bit dict decode over the identical stream
        bitpos = 0

        def next_bit():
            nonlocal bitpos
            if bitpos >= len(data) * 8:
                raise ValueError("exhausted")
            b = (data[bitpos // 8] >> (7 - bitpos % 8)) & 1
            bitpos += 1
            return b

        ref_syms = []
        try:
            for _ in range(20):
                code = 0
                for length in range(1, 17):
                    code = (code << 1) | next_bit()
                    sym = ref.get((length, code))
                    if sym is not None:
                        ref_syms.append(sym)
                        break
                else:
                    raise ValueError("invalid Huffman code")
        except ValueError:
            ref_syms.append("ValueError")
        assert consumed_syms == ref_syms, f"trial {trial}"


def test_huffman_table_rejects_short_huffvals():
    """A corrupt DHT declaring more codes than HUFFVALs must raise
    IndexError at build time (the dict form indexed vals[k] there —
    decode_jpeg_pixels' fall-back contract depends on it)."""
    from logsdb_spark.operators.multimodal import _huffman_table

    bits = [0, 4, 0] + [0] * 13
    with pytest.raises(IndexError):
        _huffman_table(bits, [1, 2, 3])  # 4 declared, 3 provided


def test_bitreader_receive_matches_per_bit_reference():
    from logsdb_spark.operators.multimodal import _BitReader

    rng = random.Random(7)
    # streams with stuffed 0xFF 0x00 pairs and a trailing marker
    for trial in range(100):
        body = []
        for _ in range(rng.randint(1, 40)):
            b = rng.randrange(256)
            body.append(b)
            if b == 0xFF:
                body.append(0x00)
        data = bytes(body) + b"\xff\xd9"
        ops = [rng.randint(0, 16) for _ in range(200)]  # > stream bits
        br = _BitReader(data, 0)
        got = []
        try:
            for n in ops:
                got.append(br.receive(n))
        except ValueError as e:
            got.append(str(e))
        # reference: per-bit reader with identical stuffing rules
        pos, acc, nbits = 0, 0, 0

        def read_bit():
            nonlocal pos, acc, nbits
            if nbits == 0:
                if pos >= len(data):
                    raise ValueError("entropy stream exhausted")
                byte = data[pos]
                pos += 1
                if byte == 0xFF:
                    if pos < len(data) and data[pos] == 0x00:
                        pos += 1
                    else:
                        raise ValueError("marker inside entropy stream")
                acc = byte
                nbits = 8
            nbits -= 1
            return (acc >> nbits) & 1

        want = []
        try:
            for n in ops:
                v = 0
                for _ in range(n):
                    v = (v << 1) | read_bit()
                want.append(v)
        except ValueError as e:
            want.append(str(e))
        assert got == want, f"trial {trial}"


# ---------------------------------------------------------------------------
# GIF: memoized-init LZW == per-reset rebuild, and no shared-state leak
# ---------------------------------------------------------------------------

def _lzw_decode_reference(data: bytes, min_code_size: int) -> bytes:
    """The pre-round-13 LZW decoder (per-clear table rebuild)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []
    code_size = prev = None

    def reset():
        nonlocal table, code_size, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = min_code_size + 1
        prev = None

    reset()
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                reset()
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            prev = entry
            if len(table) == (1 << code_size) - 1 and code_size < 12:
                code_size += 1
    return bytes(out)


def test_lzw_decode_matches_reference_roundtrip():
    from logsdb_spark.operators.multimodal import _lzw_decode, _lzw_encode

    rng = random.Random(99)
    for trial in range(60):
        n = rng.choice([0, 1, 3, 50, 700, 5000])
        # low-entropy payloads force long table chains + clear codes
        pal = bytes(rng.randrange(rng.choice([2, 8, 256]))
                    for _ in range(max(1, n)))
        data = bytes(pal[i % len(pal)] for i in range(n))
        enc = _lzw_encode(data)
        assert _lzw_decode(enc, 8) == _lzw_decode_reference(enc, 8) == data
    # corrupt streams: same exception-or-value behavior
    enc = _lzw_encode(bytes(range(256)) * 4)
    for cut in (1, len(enc) // 2, len(enc) - 1):
        for blob in (enc[:cut], enc[:cut] + b"\xff\xff\xff"):
            try:
                got = ("ok", _lzw_decode(blob, 8))
            except Exception as e:
                got = ("exc", type(e).__name__)
            try:
                want = ("ok", _lzw_decode_reference(blob, 8))
            except Exception as e:
                want = ("exc", type(e).__name__)
            assert got == want


def test_lzw_init_table_not_mutated_across_calls():
    """The memoized init table is shared across decodes — a decode
    that grows its table must never leak entries into the shared
    prefix (bytes are immutable; the COPY is what's pinned here)."""
    from logsdb_spark.operators.multimodal import (
        _LZW_INIT,
        _lzw_decode,
        _lzw_encode,
    )

    data = bytes(i % 7 for i in range(4000))
    _lzw_decode(_lzw_encode(data), 8)
    init = _LZW_INIT.get(8)
    assert init is not None and len(init) == 258
    assert init[:4] == [b"\x00", b"\x01", b"\x02", b"\x03"]
    assert init[256] == b"" and init[257] == b""
    # a second decode sees a pristine table
    assert _lzw_decode(_lzw_encode(data), 8) == data


# ---------------------------------------------------------------------------
# FLAC: byte-wise unary/Rice == per-bit reference; unrolled FIXED
# predictors == coefficient-fold reference
# ---------------------------------------------------------------------------

def test_flac_unary_and_rice_match_per_bit_reference():
    from logsdb_spark.operators.flac import _BitReader

    rng = random.Random(21)
    for trial in range(120):
        data = bytes(rng.randrange(256) for _ in range(rng.randint(1, 30)))
        ops = [("u",) if rng.random() < 0.5 else
               ("r", rng.randint(0, 6)) if rng.random() < 0.7 else
               ("n", rng.randint(0, 20))
               for _ in range(12)]
        br = _BitReader(data, 0)
        got = []
        try:
            for op in ops:
                if op[0] == "u":
                    got.append(br.read_unary())
                elif op[0] == "r":
                    got.append(br.read_rice(op[1]))
                else:
                    got.append(br.read(op[1]))
        except EOFError:
            got.append("EOF")
        # per-bit reference
        bitpos = 0

        def rbit():
            nonlocal bitpos
            if bitpos >= len(data) * 8:
                raise EOFError
            v = (data[bitpos // 8] >> (7 - bitpos % 8)) & 1
            bitpos += 1
            return v

        def rread(n):
            v = 0
            for _ in range(n):
                v = (v << 1) | rbit()
            return v

        def runary():
            q = 0
            while rbit() == 0:
                q += 1
                if q > 1 << 24:
                    raise EOFError
            return q

        want = []
        try:
            for op in ops:
                if op[0] == "u":
                    want.append(runary())
                elif op[0] == "r":
                    q = runary()
                    z = (q << op[1]) | rread(op[1])
                    want.append((z >> 1) ^ -(z & 1))
                else:
                    want.append(rread(op[1]))
        except EOFError:
            want.append("EOF")
        assert got == want, f"trial {trial}"


def test_flac_fixed_predictors_match_fold_reference():
    from logsdb_spark.operators.flac import _FIXED_COEFS

    rng = random.Random(31)
    for order in range(5):
        coefs = _FIXED_COEFS[order]
        warm = [rng.randint(-(1 << 15), 1 << 15) for _ in range(order)]
        res = [rng.randint(-4000, 4000) for _ in range(64)]
        # reference: the pre-round-13 generator fold
        ref = list(warm)
        for i in range(order, order + len(res)):
            pred = sum(c * ref[i - 1 - j] for j, c in enumerate(coefs))
            ref.append(pred + res[i - order])
        # the unrolled forms now live inline in _decode_subframe;
        # replay them here exactly as written
        out = list(warm)
        append = out.append
        if order == 0:
            out.extend(res)
        elif order == 1:
            for r in res:
                append(out[-1] + r)
        elif order == 2:
            for r in res:
                append(2 * out[-1] - out[-2] + r)
        elif order == 3:
            for r in res:
                append(3 * out[-1] - 3 * out[-2] + out[-3] + r)
        else:
            for r in res:
                append(4 * out[-1] - 6 * out[-2] + 4 * out[-3]
                       - out[-4] + r)
        assert out == ref, f"order {order}"


# ---------------------------------------------------------------------------
# IDCT: flattened-GEMM == per-block matmul reference on integer-exact
# fixture blocks (the oracle-gated regime)
# ---------------------------------------------------------------------------

def test_idct_flat_gemm_exact_on_dc_only_blocks():
    import numpy as np

    from logsdb_spark.operators.multimodal import _idct_matrix

    a = _idct_matrix()
    rng = np.random.RandomState(5)
    # DC-only blocks (the fixture regime): IDCT must return the exact
    # constant after rint for every 8-bit value
    vals = rng.randint(0, 256, size=96)
    blocks = np.zeros((96, 64))
    blocks[:, 0] = 8.0 * (vals - 128.0)
    c = blocks.reshape(-1, 8) @ a
    c = c.reshape(-1, 8, 8).transpose(0, 2, 1).reshape(-1, 8) @ a
    px = c.reshape(-1, 8, 8).transpose(0, 2, 1) + 128.0
    got = np.clip(np.rint(px), 0, 255).astype(np.uint8)
    for i, v in enumerate(vals):
        assert (got[i] == v).all()
    # general blocks: flattened GEMM == per-block A^T S A within float
    # noise, and far from every rounding boundary used by the decoder
    blocks = rng.randint(-2000, 2000, size=(32, 64)).astype(np.float64)
    c = blocks.reshape(-1, 8) @ a
    c = c.reshape(-1, 8, 8).transpose(0, 2, 1).reshape(-1, 8) @ a
    flat = c.reshape(-1, 8, 8).transpose(0, 2, 1)
    per = np.stack([a.T @ b.reshape(8, 8) @ a for b in blocks])
    assert np.abs(flat - per).max() < 1e-9
