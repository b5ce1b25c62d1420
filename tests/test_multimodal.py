"""Multimodal plumbing pins (operators/multimodal.py): the Arrow
batch shapes and schema contracts a real decoder would plug into.
The metadata path's values are covered by the `multimodal_metadata`
oracle query; these cover the binary→binary resize stage and
composition between stages.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from logsdb_spark.catalog import load_table

from conftest import SF_DIR


def test_resize_media_roundtrip_matches_numpy(spark):
    """resize_media (round 8: real decode → box-downsample →
    re-encode) must satisfy decode(resize(blob)) == numpy box
    downsample of decode(blob), for PNG (all filter types via the
    real zlib path), sequential GIF, AND interlaced GIF (the resize
    decodes display order, so interlacing must be transparent)."""
    import numpy as np

    from logsdb_spark.operators.multimodal import (
        build_gif,
        build_png,
        decode_gif_pixels,
        decode_png_pixels,
        resize_media,
    )

    def expect(pixels: bytes, w: int, h: int, k: int, c: int = 1) -> bytes:
        a = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, c)
        ow, oh = w // k, h // k
        s = a[: oh * k, : ow * k, :].astype(np.uint32)
        return (s.reshape(oh, k, ow, k, c).sum(axis=(1, 3)) // (k * k)) \
            .astype(np.uint8).tobytes()

    content = bytes(range(37)) * 40
    cases = [
        (1, build_png(13, 9, content), decode_png_pixels),
        (2, build_gif(16, 11, content), decode_gif_pixels),
        (3, build_gif(15, 10, content, interlaced=True), decode_gif_pixels),
        (4, build_png(11, 7, content, n_channels=3), decode_png_pixels),
    ]
    blobs = spark.createDataFrame(
        [(i, p) for i, p, _ in cases], "doc_id long, payload binary"
    )
    got = {
        r.doc_id: bytes(r.payload)
        for r in resize_media(blobs, factor=2).collect()
    }
    for i, payload, dec in cases:
        src = dec(payload)
        out = dec(got[i])
        assert out is not None
        nc = src.get("n_channels", 1)
        want = expect(src["pixels"], src["width"], src["height"], 2, nc)
        assert out["width"] == src["width"] // 2
        assert out["height"] == src["height"] // 2
        assert out.get("n_channels", 1) == nc
        assert bytes(out["pixels"]) == want, f"case {i}"


def test_resize_media_fallback_contract(spark):
    """Non-resizable payloads must yield NULL, never crash the Arrow
    batch: sub-factor media (images AND audio), raw text bytes, NULL
    in. WAV with enough frames resamples (round 9) — the 50-frame
    control must round-trip."""
    from logsdb_spark.operators.multimodal import (
        build_png,
        build_wav,
        decode_wav_samples,
        resize_media,
    )

    blobs = spark.createDataFrame(
        [
            (1, build_wav(1, 8000, 16, b"\x01\x02")),  # 1 frame
            (2, build_png(1, 9, b"abc")),   # width // 2 == 0
            (3, b"not media at all"),
            (4, None),
            (5, build_png(4, 4, b"abcdef")),  # control: resizable
            (6, build_wav(1, 8000, 16, b"\x01\x02" * 50)),  # 50 frames
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r.payload for r in resize_media(blobs).collect()}
    assert got[1] is None and got[2] is None
    assert got[3] is None and got[4] is None
    assert got[5] is not None
    out = decode_wav_samples(bytes(got[6]))
    assert out is not None
    assert out["sample_rate_hz"] == 4000
    assert out["samples"].size == 25


def test_resize_is_deterministic(spark):
    from logsdb_spark.operators.multimodal import build_png, resize_media

    blobs = spark.createDataFrame(
        [(i, build_png(8 + i, 6 + i, bytes(range(11)) * 9))
         for i in range(10)],
        "doc_id long, payload binary",
    )
    a = resize_media(blobs).orderBy("doc_id").collect()
    b = resize_media(blobs).orderBy("doc_id").collect()
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


def test_parse_media_header_real_bytes():
    """The header parser must read REAL container structures: a
    spec-conformant PNG (zlib IDAT, CRC'd chunks), a canonical RIFF
    WAV, a hand-assembled baseline AND progressive JPEG (marker scan
    past APP0), a GIF89a screen descriptor — and reject junk and
    truncations without raising."""
    import struct

    from logsdb_spark.operators.multimodal import (
        build_png,
        build_wav,
        parse_media_header,
    )

    png = parse_media_header(build_png(17, 9, b"hello world"))
    assert (png["fmt"], png["width"], png["height"], png["n_channels"],
            png["bit_depth"]) == ("png", 17, 9, 1, 8)

    # zlib must actually round-trip the scanlines (it is a real PNG,
    # not just magic bytes): decompress the IDAT and check shape
    import zlib

    raw_png = build_png(5, 3, b"ab")
    idat_off = raw_png.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", raw_png[idat_off - 8: idat_off - 4])[0]
    scan = zlib.decompress(raw_png[idat_off: idat_off + idat_len])
    assert len(scan) == 3 * (1 + 5)  # height * (filter byte + width)

    wav = parse_media_header(build_wav(2, 16000, 16, b"abcdefg"))
    assert (wav["fmt"], wav["n_channels"], wav["sample_rate_hz"],
            wav["bit_depth"], wav["n_frames"]) == ("wav", 2, 16000, 16, 2)

    jpeg = (b"\xff\xd8\xff\xe0" + struct.pack(">H", 15) + b"JFIF\x00"
            + b"\x00" * 8
            + b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
            + struct.pack(">HH", 480, 640) + bytes([3]) + b"\x01\x11\x00"
            + b"\xff\xd9")
    j = parse_media_header(jpeg)
    assert (j["fmt"], j["width"], j["height"], j["n_channels"],
            j["bit_depth"]) == ("jpeg", 640, 480, 3, 8)

    progressive = (b"\xff\xd8\xff" + b"\xff\xc2" + struct.pack(">H", 11)
                   + bytes([8]) + struct.pack(">HH", 10, 20) + bytes([1])
                   + b"\x01\x11\x00")
    p = parse_media_header(progressive)
    assert (p["fmt"], p["width"], p["height"]) == ("jpeg", 20, 10)

    gif = (b"GIF89a" + (320).to_bytes(2, "little")
           + (200).to_bytes(2, "little") + b"\x00\x00\x00")
    g = parse_media_header(gif)
    assert (g["fmt"], g["width"], g["height"]) == ("gif", 320, 200)

    for junk in (b"", b"plain text", build_png(4, 4)[:20],
                 build_wav(1, 8000, 16, b"x")[:10]):
        assert parse_media_header(junk)["fmt"] == "unknown"


def test_decode_png_pixels_all_filters():
    """decode_png_pixels must invert EVERY spec filter type. A PNG is
    hand-assembled with one scanline per filter (None/Sub/Up/Average/
    Paeth) whose filtered bytes are computed forward here from known
    pixels; the decoder must return exactly those pixels — and agree
    with numpy on build_png's filter-0 images."""
    import struct
    import zlib

    import numpy as np

    from logsdb_spark.operators.multimodal import (
        _png_chunk,
        build_png,
        decode_png_pixels,
    )

    # --- forward-filter known grayscale pixels (w=4, one row per type)
    pixels = [
        [10, 20, 30, 40],      # filter 0: raw
        [5, 9, 14, 200],       # filter 1: Sub
        [7, 22, 250, 41],      # filter 2: Up
        [100, 50, 25, 12],     # filter 3: Average
        [90, 91, 92, 93],      # filter 4: Paeth
    ]
    w, h = 4, 5

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    for y, row in enumerate(pixels):
        ftype = y  # row y uses filter type y
        raw.append(ftype)
        for x, v in enumerate(row):
            left = row[x - 1] if x else 0
            up = pixels[y - 1][x] if y else 0
            ul = pixels[y - 1][x - 1] if y and x else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) // 2,
                    4: paeth(left, up, ul)}[ftype]
            raw.append((v - pred) % 256)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
           + _png_chunk(b"IEND", b""))
    dec = decode_png_pixels(png)
    assert dec is not None
    assert (dec["width"], dec["height"], dec["n_channels"]) == (w, h, 1)
    got = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(h, w)
    assert got.tolist() == pixels

    # --- build_png round trip: decoded pixels == the cycled content
    content = b"the quick brown fox"
    bp = decode_png_pixels(build_png(7, 5, content))
    want = bytes(content[i % len(content)] for i in range(35))
    assert bp["pixels"] == want

    # --- multi-IDAT stream: split the compressed bytes across chunks
    comp = zlib.compress(bytes(raw))
    png2 = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", comp[:7]) + _png_chunk(b"IDAT", comp[7:])
            + _png_chunk(b"IEND", b""))
    assert decode_png_pixels(png2)["pixels"] == dec["pixels"]

    # --- unsupported / junk → None, never raises
    rgb16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", rgb16))
    assert decode_png_pixels(bad) is None
    assert decode_png_pixels(b"not a png") is None
    assert decode_png_pixels(build_png(6, 4, b"zz")[:30]) is None


def test_decode_png_pixels_rgb():
    """RGB (color type 2) decode: 3 channels interleaved, Sub filter
    predicts from the same channel one PIXEL left (offset nch, not 1)."""
    import struct
    import zlib

    import numpy as np

    from logsdb_spark.operators.multimodal import _png_chunk, decode_png_pixels

    # 2x2 RGB image, row 0 filter 0, row 1 filter 1 (Sub)
    row0 = [255, 0, 0, 0, 255, 0]      # red, green
    row1 = [0, 0, 255, 10, 20, 30]     # blue, dark
    raw = bytearray([0]) + bytearray(row0) + bytearray([1])
    for x, v in enumerate(row1):
        left = row1[x - 3] if x >= 3 else 0
        raw.append((v - left) % 256)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
           + _png_chunk(b"IEND", b""))
    dec = decode_png_pixels(png)
    assert dec["n_channels"] == 3
    got = np.frombuffer(dec["pixels"], dtype=np.uint8).tolist()
    assert got == row0 + row1


def test_extract_features_histograms_decoded_pixels(spark):
    """For PNG payloads extract_features must histogram the DECODED
    pixel values, not the container bytes (zlib'd IDAT bytes would
    have a near-uniform histogram; the cycled-content pixels do not)."""
    import numpy as np

    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from logsdb_spark.operators.multimodal import build_png, extract_features

    content = b"aaaaaaabbbbbbbzz"
    png = build_png(16, 8, content)
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    blobs = spark.createDataFrame([(0, png)], schema)
    feats = extract_features(blobs).collect()[0].features
    want_pixels = np.frombuffer(
        bytes(content[i % len(content)] for i in range(16 * 8)), dtype=np.uint8
    )
    want, _ = np.histogram(want_pixels, bins=64, range=(0, 256))
    want = (want / want_pixels.size).astype("float32")
    assert np.allclose(np.array(feats, dtype="float32"), want)


def _enc_lzw(data: bytes, min_code: int = 8) -> bytes:
    """Canonical growing-table GIF-LZW encoder (the convention real
    encoders use: width bumps when next_code reaches 2^W, adds stop at
    4096) — exists only to cross-check the decoder's width/KwKwK/
    table-full handling against real-world streams, since build_gif's
    clear-per-symbol strategy never grows the table."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code + 1
    acc = nbits = 0
    out = bytearray()

    def emit(c: int) -> None:
        nonlocal acc, nbits
        acc |= c << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
        else:
            emit(table[w])
            if next_code < 4096:
                table[wc] = next_code
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
            w = bytes([ch])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_decode_against_canonical_encoder():
    """_lzw_decode must invert a canonical growing-table encoder across
    the hard cases: code-width growth through 9→12 bits, the KwKwK
    self-referencing code, table-full (4096) with continued input, and
    a small initial alphabet."""
    import random

    from logsdb_spark.operators.multimodal import _lzw_decode

    rng = random.Random(7)
    cases = [
        (bytes(rng.randrange(256) for _ in range(20000)), 8),  # width growth
        (b"abc" * 5000, 8),                                    # repetitive
        (bytes(rng.randrange(4) for _ in range(60000)), 2),    # table-full
        (b"a" * 1000, 8),                                      # KwKwK chain
        (bytes(range(256)) * 2, 8),                            # boundary
    ]
    for data, mc in cases:
        assert _lzw_decode(_enc_lzw(data, mc), mc) == data


def test_decode_gif_pixels_real_container():
    """decode_gif_pixels walks a real GIF89a (global color table,
    extensions skipped, sub-block reassembly) and returns the exact
    index stream build_gif encoded; junk and truncations → None."""
    from logsdb_spark.operators.multimodal import (
        build_gif,
        decode_gif_pixels,
        parse_media_header,
    )

    content = b"the quick brown fox jumps over"
    g = build_gif(11, 6, content)
    hdr = parse_media_header(g)
    assert (hdr["fmt"], hdr["width"], hdr["height"]) == ("gif", 11, 6)
    dec = decode_gif_pixels(g)
    assert (dec["width"], dec["height"]) == (11, 6)
    assert dec["pixels"] == bytes(content[i % len(content)] for i in range(66))

    # a graphic-control extension before the image must be skipped
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    with_ext = g[: 13 + 768] + gce + g[13 + 768:]
    assert decode_gif_pixels(with_ext)["pixels"] == dec["pixels"]

    # >255-pixel image exercises multi-sub-block reassembly
    big = build_gif(30, 20, b"xyz")
    assert len(decode_gif_pixels(big)["pixels"]) == 600

    assert decode_gif_pixels(b"GIF89a") is None
    assert decode_gif_pixels(b"not a gif") is None
    assert decode_gif_pixels(g[:40]) is None


def test_decode_gif_pixels_interlaced():
    """Interlaced GIFs decode to DISPLAY row order: build_gif emits
    the rows in the 4-pass Haeberli schedule with the interlace flag
    set, and decode_gif_pixels must hand back the same pixels as the
    non-interlaced encoding of the same content — byte-identical
    after de-interlacing. Heights crossing each pass boundary (1, 2,
    3, 5, 8, 9, 17) pin the row-schedule arithmetic."""
    from logsdb_spark.operators.multimodal import build_gif, decode_gif_pixels

    content = b"the quick brown fox jumps over the lazy dog"
    for w, h in ((11, 17), (7, 8), (5, 9), (3, 5), (4, 3), (6, 2), (9, 1)):
        plain = decode_gif_pixels(build_gif(w, h, content))
        inter = decode_gif_pixels(build_gif(w, h, content, interlaced=True))
        assert inter is not None, (w, h)
        assert inter["pixels"] == plain["pixels"], (w, h)
        assert (inter["width"], inter["height"]) == (w, h)


def test_decode_wav_samples_signed_and_padded():
    """decode_wav_samples must interpret PCM as SIGNED little-endian
    int16 (a high byte >= 0x80 is negative — byte arithmetic alone
    would get +32768 ranges wrong), honor build_wav's zero padding to
    whole frames, decode 8-bit PCM as unsigned per spec, and reject
    non-PCM/truncated containers."""
    import numpy as np

    from logsdb_spark.operators.multimodal import (
        build_wav,
        decode_wav_samples,
    )

    # known samples incl. negatives: -32768, -1, 0, 1, 32767
    pcm = np.array([-32768, -1, 0, 1, 32767], dtype="<i2").tobytes()
    dec = decode_wav_samples(build_wav(1, 8000, 16, pcm))
    assert dec["samples"].tolist() == [-32768, -1, 0, 1, 32767]
    assert (dec["n_channels"], dec["sample_rate_hz"], dec["bit_depth"]) == (
        1, 8000, 16,
    )

    # stereo + odd byte count: build_wav zero-pads to a whole frame
    dec2 = decode_wav_samples(build_wav(2, 16000, 16, b"abc"))
    # b'abc' -> pad to 4 bytes -> samples (0x6261, 0x0063)
    assert dec2["samples"].tolist() == [0x6261, 0x63]
    assert dec2["n_channels"] == 2

    # empty data chunk decodes to an empty sample array, not None
    assert decode_wav_samples(build_wav(1, 8000, 16, b""))["samples"].size == 0

    # 8-bit PCM is unsigned per spec
    import struct as _s

    raw8 = (b"RIFF" + _s.pack("<I", 36 + 3) + b"WAVE"
            + b"fmt " + _s.pack("<I", 16)
            + _s.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
            + b"data" + _s.pack("<I", 3) + bytes([0, 128, 255]))
    assert decode_wav_samples(raw8)["samples"].tolist() == [0, 128, 255]

    # non-PCM (format code 3 = float) and junk → None
    bad = (b"RIFF" + _s.pack("<I", 36) + b"WAVE"
           + b"fmt " + _s.pack("<I", 16)
           + _s.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
           + b"data" + _s.pack("<I", 0))
    assert decode_wav_samples(bad) is None
    assert decode_wav_samples(b"junk") is None
    assert decode_wav_samples(build_wav(1, 8000, 16, b"xy")[:20]) is None

    # a data chunk whose DECLARED size exceeds the remaining bytes is
    # a truncated container → None, never stats over partial PCM
    whole = build_wav(1, 8000, 16, pcm)
    assert decode_wav_samples(whole[:-2]) is None


def test_extract_media_headers_kernel_parity(spark):
    """The Arrow mapInPandas kernel must produce exactly what a
    direct Python parse_media_header of the same bytes produces."""
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from logsdb_spark.operators.multimodal import (
        build_png,
        build_wav,
        extract_media_headers,
        parse_media_header,
    )

    payloads = [
        (0, build_png(33, 21, b"pix")),
        (1, build_wav(1, 8000, 16, b"0123456789")),
        (2, b"not media at all"),
        (3, build_wav(2, 44100, 16, b"pcm" * 7)),
    ]
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    blobs = spark.createDataFrame(payloads, schema)
    got = {r.doc_id: r.asDict() for r in extract_media_headers(blobs).collect()}
    for doc_id, payload in payloads:
        want = parse_media_header(payload)
        row = got[doc_id]
        for k, v in want.items():
            assert row[k] == v, (doc_id, k, row[k], v)


def test_build_jpeg_roundtrip_block_exact():
    """build_jpeg -> decode_jpeg_pixels must reproduce the
    block-constant values exactly (the DC-exactness argument the SQL
    oracle relies on), including partial edge blocks and the 1x1
    degenerate image."""
    import numpy as np

    from logsdb_spark.operators.multimodal import (
        build_jpeg,
        decode_jpeg_pixels,
        parse_media_header,
    )

    for w, h, content in [
        (1, 1, b"A"), (8, 8, b""), (17, 9, b"hello world"),
        (40, 28, bytes(range(256))), (7, 25, b"x"),
        (39, 1, b"abc"), (16, 24, b"\x00\xff\x80"),
    ]:
        blob = build_jpeg(w, h, content)
        hdr = parse_media_header(blob)
        assert (hdr["fmt"], hdr["width"], hdr["height"]) == ("jpeg", w, h)
        dec = decode_jpeg_pixels(blob)
        got = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(h, w)
        vals = content or b"\x00"
        bw, bh = (w + 7) // 8, (h + 7) // 8
        want = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
        for i in range(bw * bh):
            by, bx = divmod(i, bw)
            want[by * 8: by * 8 + 8, bx * 8: bx * 8 + 8] = vals[i % len(vals)]
        assert (got == want[:h, :w]).all(), (w, h, content)


def _enc_jpeg_scan(blocks, dc_bits, dc_vals, ac_bits, ac_vals):
    """INDEPENDENT second implementation of the baseline-JPEG entropy
    encoder (the _enc_lzw build/verify pattern): given natural-order
    8x8 integer coefficient blocks and DHT specs, emit the entropy
    byte stream — canonical Huffman codes, DC prediction, AC run/size
    with ZRL and EOB, MSB-first packing, 0xFF stuffing. Written from
    the ITU T.81 text, NOT by calling the library's _BitWriter, so a
    shared misreading of the spec cannot cancel out."""
    zig = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]

    def canonical(bits, vals):
        codes, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                codes[vals[k]] = (ln, code)
                code += 1
                k += 1
            code <<= 1
        return codes

    dc_c, ac_c = canonical(dc_bits, dc_vals), canonical(ac_bits, ac_vals)
    out = bytearray()
    acc = nbits = 0

    def put(v, n):
        nonlocal acc, nbits
        for j in range(n - 1, -1, -1):
            acc = (acc << 1) | ((v >> j) & 1)
            nbits += 1
            if nbits == 8:
                out.append(acc)
                if acc == 0xFF:
                    out.append(0)
                acc = nbits = 0

    pred = 0
    for blk in blocks:
        zz = [blk[zig[k]] for k in range(64)]
        diff = zz[0] - pred
        pred = zz[0]
        t = abs(diff).bit_length()
        ln, code = dc_c[t]
        put(code, ln)
        if t:
            put(diff if diff > 0 else diff + (1 << t) - 1, t)
        run = 0
        last = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, 64):
            if k > last:
                ln, code = ac_c[0x00]  # EOB
                put(code, ln)
                break
            if zz[k] == 0:
                run += 1
                continue
            while run >= 16:
                ln, code = ac_c[0xF0]  # ZRL
                put(code, ln)
                run -= 16
            s = abs(zz[k]).bit_length()
            ln, code = ac_c[(run << 4) | s]
            put(code, ln)
            put(zz[k] if zz[k] > 0 else zz[k] + (1 << s) - 1, s)
            run = 0
        else:
            if last == 63:
                pass  # block ended exactly at 63: no EOB required
    if nbits:
        put((1 << (8 - nbits)) - 1, 8 - nbits)
    return bytes(out)


def test_decode_jpeg_against_independent_encoder_with_acs():
    """Drive the decoder with NONZERO AC coefficients through an
    independently written entropy encoder and richer Huffman tables:
    decoded pixels must equal numpy's own IDCT of the same dequantized
    blocks — Huffman decode, run/size, ZRL, EXTEND (negatives),
    dequantization, and IDCT all cross-checked against a second
    implementation."""
    import struct as _s

    import numpy as np

    from logsdb_spark.operators.multimodal import (
        _idct_matrix,
        decode_jpeg_pixels,
    )

    # Huffman specs covering every symbol the streams below use:
    # DC cats 0..11 at 4 bits; AC symbols at 8 bits (EOB, ZRL, and
    # run/size combos for sizes 1..7, runs 0..3).
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 8)
    ]
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_syms)  # all AC codes 8 bits (<= 256 slots)
    ac_vals = ac_syms

    rng = np.random.RandomState(7)
    w, h = 24, 16  # 3x2 blocks
    q = np.array([3, 2, 2, 2, 1, 1, 1, 1] * 8, dtype=np.int64)  # zigzag q
    blocks = []
    for _ in range(6):
        blk = np.zeros(64, dtype=np.int64)
        blk[0] = int(rng.randint(-200, 200))
        for pos in rng.choice(range(1, 64), size=9, replace=False):
            blk[pos] = int(rng.randint(-60, 60))
        blocks.append(blk)

    scan = _enc_jpeg_scan([b.tolist() for b in blocks],
                          dc_bits, dc_vals, ac_bits, ac_vals)

    def seg(marker, body):
        return bytes([0xFF, marker]) + _s.pack(">H", len(body) + 2) + body

    # quant table is stored in ZIGZAG order in DQT
    zig = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    qzz = bytes(int(q[k]) for k in range(64))  # q is zigzag-ordered
    blob = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + qzz)
        + seg(0xC0, _s.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
        + seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + scan + b"\xff\xd9"
    )
    dec = decode_jpeg_pixels(blob)
    assert dec is not None
    got = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(h, w)

    # reference: numpy IDCT of the dequantized blocks (dequant joins
    # coefficient k in ZIGZAG order with q[k], as T.81 specifies)
    a = _idct_matrix()
    want = np.zeros((h, w), dtype=np.uint8)
    bw = w // 8
    for i, blk in enumerate(blocks):
        by, bx = divmod(i, bw)
        zz = np.array([blk[zig[k]] for k in range(64)], dtype=np.float64)
        dq = zz * q
        nat = np.zeros(64)
        for k in range(64):
            nat[zig[k]] = dq[k]
        px = a.T @ nat.reshape(8, 8) @ a + 128.0
        want[by * 8: by * 8 + 8, bx * 8: bx * 8 + 8] = np.clip(
            np.rint(px), 0, 255
        ).astype(np.uint8)
    assert (got == want).all()


def test_build_jpeg_color_roundtrip_interleaved_exact():
    """3-component 4:4:4 round-trip: interleaved MCUs with three
    independent DC prediction chains must reproduce every channel's
    block-constant value exactly (stride-3 content mapping), including
    partial edge blocks."""
    import numpy as np

    from logsdb_spark.operators.multimodal import (
        build_jpeg_color,
        decode_jpeg_pixels,
        parse_media_header,
    )

    for w, h, content in [
        (1, 1, b"ABC"), (8, 8, b""), (17, 9, b"hello world"),
        (24, 20, bytes(range(256))), (9, 17, b"xy"),
    ]:
        blob = build_jpeg_color(w, h, content)
        hdr = parse_media_header(blob)
        assert (hdr["fmt"], hdr["width"], hdr["height"],
                hdr["n_channels"]) == ("jpeg", w, h, 3)
        dec = decode_jpeg_pixels(blob)
        assert dec is not None and dec["n_channels"] == 3
        got = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(h, w, 3)
        vals = content or b"\x00"
        bw, bh = (w + 7) // 8, (h + 7) // 8
        want = np.zeros((bh * 8, bw * 8, 3), dtype=np.uint8)
        for i in range(bw * bh):
            by, bx = divmod(i, bw)
            for c in range(3):
                want[by * 8: by * 8 + 8, bx * 8: bx * 8 + 8, c] = (
                    vals[(3 * i + c) % len(vals)]
                )
        assert (got == want[:h, :w, :]).all(), (w, h, content)


def test_decode_jpeg_rejects_unsupported_shapes():
    """The documented fall-back boundary (round 9 moved subsampling
    AND progressive inside it): sampling factors > 2, subsampled
    GRAYSCALE, a baseline stream MISLABELED progressive (its
    full-band interleaved scan is an invalid SOF2 progression), and
    a DRI that promises restart markers the stream doesn't contain
    return None (never raise)."""
    import struct as _s

    from logsdb_spark.operators.multimodal import (
        build_jpeg,
        build_jpeg_color,
        decode_jpeg_pixels,
    )

    blob = bytearray(build_jpeg_color(9, 9, b"q"))
    # SOF0 seg: find marker 0xFFC0; component 1 sampling byte sits at
    # offset +11 within the segment (len2 prec1 h2 w2 n1 id1 -> samp)
    i = bytes(blob).index(b"\xff\xc0")
    blob[i + 11] = 0x33  # 3x3 sampling factor -> out of range
    assert decode_jpeg_pixels(bytes(blob)) is None

    gray = bytearray(build_jpeg(9, 9, b"q"))
    g = bytes(gray).index(b"\xff\xc0")
    gray[g + 11] = 0x22  # subsampled single-component -> unsupported
    assert decode_jpeg_pixels(bytes(gray)) is None

    prog = bytearray(build_jpeg(9, 9, b"q"))
    j = bytes(prog).index(b"\xff\xc0")
    prog[j + 1] = 0xC2  # progressive SOF
    assert decode_jpeg_pixels(bytes(prog)) is None

    dri = bytearray(build_jpeg(9, 9, b"q"))
    k = bytes(dri).index(b"\xff\xda")
    dri[k:k] = b"\xff\xdd" + _s.pack(">H", 4) + _s.pack(">H", 2)
    assert decode_jpeg_pixels(bytes(dri)) is None


def test_resize_gif_nonidentity_palette_falls_back(spark):
    """A GIF whose global color table is NOT the identity grayscale
    ramp must resize to NULL (round 9): box-averaging palette INDEXES
    is only a pixel average under the identity palette — silently
    index-averaging an arbitrary color table would produce a wrong
    thumbnail, violating the fall-back-not-crash contract."""
    from logsdb_spark.operators.multimodal import (
        _gif_identity_grayscale,
        build_gif,
        decode_gif_pixels,
        resize_media,
    )

    good = build_gif(8, 6, bytes(range(48)))
    bad = bytearray(good)
    bad[13] = 255  # palette entry 0 becomes (255, 0, 0)
    bad = bytes(bad)
    # The decoder still reads the index stream fine — only resize
    # must refuse.
    assert decode_gif_pixels(bad) is not None
    assert _gif_identity_grayscale(good)
    assert not _gif_identity_grayscale(bad)
    assert not _gif_identity_grayscale(b"GIF89a")  # truncated

    blobs = spark.createDataFrame(
        [(1, good), (2, bad)], "doc_id long, payload binary"
    )
    got = {r.doc_id: r.payload for r in resize_media(blobs).collect()}
    assert got[1] is not None
    assert got[2] is None


def test_decode_jpeg_420_matches_closed_form():
    """4:2:0 decode (round 9): build_jpeg_420's six-block MCUs decode
    to the exact closed-form (Y, Cb, Cr) per pixel — Y from the
    pixel's 8x8 block, chroma constant per 16x16 MCU after the
    replication upsample — across edge shapes (widths <= 8 crop a
    whole Y-block column of the last MCU) and restart intervals."""
    import numpy as np

    from logsdb_spark.operators.multimodal import (
        build_jpeg_420,
        decode_jpeg_pixels,
    )

    content = b"The quick brown fox jumps over the lazy dog 0123456789"
    L = len(content)
    for (w, h, ri) in [(1, 1, 0), (7, 5, 0), (16, 16, 0), (17, 9, 0),
                       (33, 26, 2), (36, 26, 0), (9, 33, 3), (16, 1, 0),
                       (1, 16, 0), (31, 31, 1)]:
        dec = decode_jpeg_pixels(build_jpeg_420(w, h, content,
                                                restart_interval=ri))
        assert dec is not None and dec["n_channels"] == 3, (w, h)
        assert (dec["width"], dec["height"]) == (w, h)
        arr = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(h, w, 3)
        mcux = (w + 15) // 16
        ys, xs = np.mgrid[0:h, 0:w]
        m = (ys // 16) * mcux + xs // 16
        yb = 2 * ((ys % 16) // 8) + (xs % 16) // 8
        cbytes = np.frombuffer(content, dtype=np.uint8)
        want = np.stack(
            [cbytes[(6 * m + yb) % L], cbytes[(6 * m + 4) % L],
             cbytes[(6 * m + 5) % L]], axis=-1)
        assert (arr == want).all(), (w, h, ri)


def test_decode_jpeg_422_and_440():
    """Non-square sampling (4:2:2 / 4:4:0) goes through the same
    general MCU walk: an inline block-constant encoder with Y
    sampling 2x1 (and 1x2) must decode to Y per 8x8 block and chroma
    replicated along the subsampled axis only."""
    import struct as _s

    import numpy as np

    from logsdb_spark.operators.multimodal import (
        _JPEG_AC_BITS,
        _JPEG_AC_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _BitWriter,
        decode_jpeg_pixels,
    )

    def build_sub(width, height, content, hy, vy):
        vals = content
        mcux = (width + 8 * hy - 1) // (8 * hy)
        mcuy = (height + 8 * vy - 1) // (8 * vy)
        nyb = hy * vy
        wtr = _BitWriter()
        preds = [0, 0, 0]
        for m in range(mcux * mcuy):
            for j in range(nyb + 2):
                c = 0 if j < nyb else j - nyb + 1
                dc = 8 * (vals[((nyb + 2) * m + j) % len(vals)] - 128)
                diff = dc - preds[c]
                preds[c] = dc
                t = abs(diff).bit_length()
                wtr.write(t, 4)
                if t:
                    wtr.write(diff if diff > 0 else diff + (1 << t) - 1, t)
                wtr.write(0, 1)
        entropy = wtr.flush()

        def seg(marker, body):
            return (bytes([0xFF, marker]) + _s.pack(">H", len(body) + 2)
                    + body)

        samp = (hy << 4) | vy
        return (b"\xff\xd8"
                + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
                + seg(0xC0, _s.pack(">BHHB", 8, height, width, 3)
                      + bytes([1, samp, 0, 2, 0x11, 0, 3, 0x11, 0]))
                + seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS)
                      + bytes(_JPEG_DC_VALS))
                + seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS)
                      + bytes(_JPEG_AC_VALS))
                + seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
                + entropy + b"\xff\xd9")

    content = bytes(range(33, 120))
    L = len(content)
    cbytes = np.frombuffer(content, dtype=np.uint8)
    for hy, vy, w, h in [(2, 1, 21, 10), (2, 1, 8, 8), (1, 2, 10, 21)]:
        dec = decode_jpeg_pixels(build_sub(w, h, content, hy, vy))
        assert dec is not None and dec["n_channels"] == 3, (hy, vy)
        arr = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(h, w, 3)
        mw, mh = 8 * hy, 8 * vy
        mcux = (w + mw - 1) // mw
        nyb = hy * vy
        ys, xs = np.mgrid[0:h, 0:w]
        m = (ys // mh) * mcux + xs // mw
        ybk = ((ys % mh) // 8) * hy + (xs % mw) // 8
        want = np.stack(
            [cbytes[((nyb + 2) * m + ybk) % L],
             cbytes[((nyb + 2) * m + nyb) % L],
             cbytes[((nyb + 2) * m + nyb + 1) % L]], axis=-1)
        assert (arr == want).all(), (hy, vy)


def test_ycbcr_to_rgb_fixed_point():
    """The integer matrix matches the float JFIF conversion to within
    one count (the fixed-point quantization) and is exactly the
    documented multiply/bias/floor-shift — pinned on the full
    per-channel range sweep."""
    import numpy as np

    from logsdb_spark.operators.multimodal import ycbcr_to_rgb

    vals = np.arange(256, dtype=np.uint8)
    buf = np.stack([vals, vals[::-1], np.roll(vals, 64)], axis=-1).tobytes()
    r, g, b = ycbcr_to_rgb(buf, 256)
    y = vals.astype(np.int64)
    cb = vals[::-1].astype(np.int64) - 128
    cr = np.roll(vals, 64).astype(np.int64) - 128
    assert (r == np.clip(y + ((91881 * cr + 32768) >> 16), 0, 255)).all()
    assert (g == np.clip(
        y - ((22554 * cb + 46802 * cr + 32768) >> 16), 0, 255)).all()
    assert (b == np.clip(y + ((116130 * cb + 32768) >> 16), 0, 255)).all()
    rf = np.clip(np.round(y + 1.402 * cr), 0, 255)
    gf = np.clip(np.round(y - 0.344136 * cb - 0.714136 * cr), 0, 255)
    bf = np.clip(np.round(y + 1.772 * cb), 0, 255)
    assert np.abs(r - rf).max() <= 1
    assert np.abs(g - gf).max() <= 1
    assert np.abs(b - bf).max() <= 1


def test_resample_wav_matches_numpy(spark):
    """WAV box-resample (round 9): decode(resize(wav)) must equal the
    numpy per-channel pairwise frame mean (floor), at half the rate,
    for mono AND stereo, odd frame counts (trailing frame dropped),
    and 16-bit signed values including negatives."""
    import numpy as np

    from logsdb_spark.operators.multimodal import (
        build_wav,
        decode_wav_samples,
        resize_media,
    )

    cases = []
    rng = np.random.default_rng(7)
    for i, (nch, rate, frames) in enumerate(
            [(1, 8000, 9), (2, 16000, 50), (1, 12000, 2), (2, 8000, 7)]):
        pcm = rng.integers(-32768, 32768, size=frames * nch,
                           dtype=np.int64).astype("<i2").tobytes()
        cases.append((i, nch, rate, build_wav(nch, rate, 16, pcm)))
    blobs = spark.createDataFrame(
        [(i, p) for i, _, _, p in cases], "doc_id long, payload binary"
    )
    got = {r.doc_id: r.payload for r in resize_media(blobs).collect()}
    for i, nch, rate, payload in cases:
        src = decode_wav_samples(payload)
        out = decode_wav_samples(bytes(got[i]))
        assert out is not None
        assert out["sample_rate_hz"] == rate // 2
        assert out["n_channels"] == nch
        s = src["samples"].astype(np.int64)
        frames = s.size // nch
        of = frames // 2
        want = s[: of * 2 * nch].reshape(of, 2, nch).sum(axis=1) // 2
        assert (out["samples"].reshape(of, nch) == want).all(), i


def test_transcode_media_lossless_roundtrip(spark):
    """transcode_media (round 9) must re-encode the decoded pixel
    buffer LOSSLESSLY as PNG for every supported input — grayscale
    PNG (identity), RGB PNG, identity-palette GIF, grayscale JPEG,
    4:4:4 color JPEG, 4:2:0 subsampled JPEG — and NULL everything
    else (WAV, junk, non-identity-palette GIF)."""
    from logsdb_spark.operators.multimodal import (
        build_gif,
        build_jpeg,
        build_jpeg_420,
        build_jpeg_color,
        build_jpeg_progressive,
        build_png,
        build_wav,
        decode_gif_pixels,
        decode_jpeg_pixels,
        decode_png_pixels,
        transcode_media,
    )

    content = bytes(range(32, 110))
    bad_gif = bytearray(build_gif(8, 6, content))
    bad_gif[13] = 200
    cases = [
        (1, build_png(9, 7, content), decode_png_pixels, 1),
        (2, build_png(5, 4, content, n_channels=3), decode_png_pixels, 3),
        (3, build_gif(10, 6, content, interlaced=True),
         decode_gif_pixels, 1),
        (4, build_jpeg(17, 9, content), decode_jpeg_pixels, 1),
        (5, build_jpeg_color(9, 9, content), decode_jpeg_pixels, 3),
        (6, build_jpeg_420(33, 18, content, restart_interval=2),
         decode_jpeg_pixels, 3),
        (10, build_jpeg_progressive(21, 13, content),
         decode_jpeg_pixels, 1),
    ]
    nulls = [(7, build_wav(1, 8000, 16, content)),
             (8, b"junk"), (9, bytes(bad_gif))]
    blobs = spark.createDataFrame(
        [(i, p) for i, p, _, _ in cases] + nulls,
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r.payload for r in transcode_media(blobs).collect()}
    for i, payload, dec, nc in cases:
        src = dec(payload)
        out = decode_png_pixels(bytes(got[i]))
        assert out is not None, i
        assert (out["width"], out["height"]) == (src["width"], src["height"])
        assert out["n_channels"] == nc
        assert bytes(out["pixels"]) == bytes(src["pixels"]), i
    for i, _ in nulls:
        assert got[i] is None, i


def test_decode_jpeg_progressive_fixture_closed_form():
    """build_jpeg_progressive's seven-scan stream (DC first at Al=4,
    four DC refinements, two spectral-band AC EOB-run scans) must
    decode to the same block-constant closed form as the baseline
    fixture — across edge dims, including >15-block EOB runs."""
    import numpy as np

    from logsdb_spark.operators.multimodal import (
        build_jpeg,
        build_jpeg_progressive,
        decode_jpeg_pixels,
    )

    content = b"Progressive scans decode the very same pixels 0123456789"
    L = len(content)
    for w, h in [(1, 1), (17, 9), (40, 28), (44, 22), (7, 29),
                 (128, 1), (1, 128), (48, 40)]:
        d = decode_jpeg_pixels(build_jpeg_progressive(w, h, content))
        assert d is not None and (d["width"], d["height"]) == (w, h)
        arr = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w)
        bw = (w + 7) // 8
        ys, xs = np.mgrid[0:h, 0:w]
        want = np.frombuffer(content, dtype=np.uint8)[
            ((ys // 8) * bw + xs // 8) % L]
        assert (arr == want).all(), (w, h)
        # and the progression decodes IDENTICALLY to the baseline
        # encoding of the same content
        base = decode_jpeg_pixels(build_jpeg(w, h, content))
        assert d["pixels"] == base["pixels"], (w, h)


def _canonical_code_map(bits, vals):
    """(symbol -> (code, length)) for a canonical DHT table — the
    encoder-side mirror of _huffman_table."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def test_decode_jpeg_progressive_nonzero_ac_vs_numpy():
    """The progressive AC machinery against an INDEPENDENT encoder
    (written from T.81 G.1.2.2/G.1.2.3, not shared with the decoder):
    random sparse coefficient blocks streamed as DC first + DC refine
    + AC first at Al=1 + AC refinement at Al=0 — with newly-nonzero
    coefficients, sign bits, buffered correction bits, ZRL inside
    refinement, and EOB runs >= 2 spanning correction-only blocks.
    The decoded pixels must equal a straight numpy IDCT of the exact
    coefficients."""
    import math

    import numpy as np

    from logsdb_spark.operators.multimodal import (
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _ZIGZAG,
        _BitWriter,
        decode_jpeg_pixels,
    )

    # --- build random sparse blocks (values small; trailing two
    # blocks carry ONLY |c| in {2,3} so the refinement scan covers
    # them with an EOBRUN=2 + correction-bits-only path; one block
    # gets a lone high-k coefficient to force ZRL) ---
    rng = np.random.default_rng(11)
    W, H = 30, 20  # 4x3 blocks, edge-cropped
    bw, bh = (W + 7) // 8, (H + 7) // 8
    nb = bw * bh
    blocks = []
    for bi in range(nb):
        c = np.zeros(64, dtype=np.int64)
        if bi == 2:
            c[1 + 40] = 0  # keep band sparse…
            c[63] = 9      # …but force a >15 zero run before k=63
        elif bi >= nb - 2:
            picks = rng.choice(np.arange(1, 64), size=4, replace=False)
            c[picks] = rng.choice([2, 3, -2, -3], size=4)
        else:
            picks = rng.choice(np.arange(1, 64), size=6, replace=False)
            c[picks] = rng.integers(-15, 16, size=6)
            c[picks] = np.where(c[picks] == 0, 5, c[picks])
        c[0] = int(rng.integers(-100, 101))
        blocks.append(c)  # NATURAL order coefficients

    # --- independent encoder ---
    ac_syms = ([0x00, 0x10, 0x20, 0x30, 0xF0]
               + [(r << 4) | s for r in range(16) for s in range(1, 6)])
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_syms)  # all 8-bit canonical codes (85 < 256)
    ac_map = _canonical_code_map(ac_bits, ac_syms)
    dc_map = _canonical_code_map(_JPEG_DC_BITS, _JPEG_DC_VALS)

    def put(wtr, sym, cmap):
        code, length = cmap[sym]
        wtr.write(code, length)

    def put_mag(wtr, v):
        s = abs(v).bit_length()
        put(wtr, s, dc_map)
        if s:
            wtr.write(v if v > 0 else v + (1 << s) - 1, s)

    def zz(c, k):
        return int(c[_ZIGZAG[k]])

    # scan 1: DC first, Al=1
    w1 = _BitWriter()
    pred = 0
    for c in blocks:
        v = int(c[0]) >> 1
        put_mag(w1, v - pred)
        pred = v
    # scan 2: DC refine to Al=0
    w2 = _BitWriter()
    for c in blocks:
        w2.write(int(c[0]) & 1, 1)
    # scan 3: AC first, band 1..63, Al=1 (values abs>>1 with sign)
    w3 = _BitWriter()
    eob_group = 0

    def flush_eob(wtr, n):
        while n > 0:
            chunk = min(n, 15)
            r = chunk.bit_length() - 1
            put(wtr, r << 4, ac_map)
            if r:
                wtr.write(chunk - (1 << r), r)
            n -= chunk

    for c in blocks:
        vals = [(k, (abs(zz(c, k)) >> 1) * (1 if zz(c, k) > 0 else -1))
                for k in range(1, 64)]
        vals = [(k, v) for k, v in vals if v != 0]
        if not vals:
            eob_group += 1
            continue
        flush_eob(w3, eob_group)
        eob_group = 0
        prev = 0
        for k, v in vals:
            r = k - prev - 1
            while r > 15:
                put(w3, 0xF0, ac_map)
                r -= 16
            s = abs(v).bit_length()
            put(w3, (r << 4) | s, ac_map)
            w3.write(v if v > 0 else v + (1 << s) - 1, s)
            prev = k
        if prev < 63:
            put(w3, 0x00, ac_map)  # EOB (run of 1)
    flush_eob(w3, eob_group)
    # scan 4: AC refinement, Ah=1 -> Al=0 (T.81 G.1.2.3 encode)
    w4 = _BitWriter()
    i = 0
    while i < nb:
        c = blocks[i]
        temps = [abs(zz(c, k)) for k in range(1, 64)]
        has_new = any(t == 1 for t in temps)
        if not has_new:
            # group consecutive correction-only blocks into one EOBRUN
            j = i
            while (j < nb and not any(
                    abs(zz(blocks[j], k)) == 1 for k in range(1, 64))):
                j += 1
            g = j - i
            while g > 0:
                chunk = min(g, 15)
                r = chunk.bit_length() - 1
                put(w4, r << 4, ac_map)
                if r:
                    w4.write(chunk - (1 << r), r)
                for c2 in blocks[i: i + chunk]:
                    for k in range(1, 64):
                        t = abs(zz(c2, k))
                        if t > 1:
                            w4.write(t & 1, 1)
                i += chunk
                g -= chunk
            continue
        eobk = max(k for k in range(1, 64) if abs(zz(c, k)) == 1)
        r = 0
        buffered = []
        for k in range(1, 64):
            t = abs(zz(c, k))
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eobk:
                put(w4, 0xF0, ac_map)
                for bit in buffered:
                    w4.write(bit, 1)
                buffered = []
                r -= 16
            if t > 1:
                buffered.append(t & 1)
                continue
            put(w4, (r << 4) | 1, ac_map)
            r = 0
            w4.write(1 if zz(c, k) > 0 else 0, 1)
            for bit in buffered:
                w4.write(bit, 1)
            buffered = []
        if r > 0 or buffered:
            put(w4, 0x00, ac_map)
            for bit in buffered:
                w4.write(bit, 1)
        i += 1

    import struct as _s

    def seg(marker, body):
        return bytes([0xFF, marker]) + _s.pack(">H", len(body) + 2) + body

    def sos(ss, se, ah, al, entropy):
        return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al])) \
            + entropy

    blob = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(0xC2, _s.pack(">BHHB", 8, H, W, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS)
              + bytes(_JPEG_DC_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_syms))
        + sos(0, 0, 0, 1, w1.flush())
        + sos(0, 0, 1, 0, w2.flush())
        + sos(1, 63, 0, 1, w3.flush())
        + sos(1, 63, 1, 0, w4.flush())
        + b"\xff\xd9"
    )
    d = decode_jpeg_pixels(blob)
    assert d is not None and (d["width"], d["height"]) == (W, H)

    # ground truth: numpy IDCT of the exact coefficients
    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / math.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = cu / 2 * math.cos((2 * x + 1) * u * math.pi / 16)
    want = np.zeros((bh * 8, bw * 8))
    for bi, c in enumerate(blocks):
        by, bx = divmod(bi, bw)
        s = c.astype(np.float64).reshape(8, 8)
        want[by * 8: by * 8 + 8, bx * 8: bx * 8 + 8] = a.T @ s @ a + 128.0
    want = np.clip(np.rint(want), 0, 255).astype(np.uint8)[:H, :W]
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(H, W)
    assert (got == want).all()


def test_decode_png_adam7_interlaced():
    """Adam7 decode (round 9): the interlaced encoding of an image
    must decode identically to the sequential one (pinned across
    shapes where passes go empty), and per-pass FILTERING must be
    scoped to the pass — a hand-assembled interlaced PNG whose passes
    use Sub/Up/Average/Paeth (forward-filtered here against the
    pass's own previous scanline) must invert exactly."""
    import struct
    import zlib

    import numpy as np

    from logsdb_spark.operators.multimodal import (
        _ADAM7,
        _png_chunk,
        build_png,
        decode_png_pixels,
    )

    content = bytes(range(17, 230))
    for w, h, nc in [(1, 1, 1), (7, 5, 3), (9, 9, 1), (38, 26, 1),
                     (2, 2, 3), (1, 16, 1), (16, 1, 1)]:
        seq = decode_png_pixels(build_png(w, h, content, n_channels=nc))
        il = decode_png_pixels(
            build_png(w, h, content, n_channels=nc, interlaced=True))
        assert il is not None and il["pixels"] == seq["pixels"], (w, h, nc)

    # hand-assembled 9x9 grayscale Adam7 with a different filter per
    # pass (cycling 1..4), forward-filtered against pass-local rows
    w = h = 9
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(h, w), dtype=np.int64)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    for pi, (x0, y0, xs, ys) in enumerate(_ADAM7):
        if w <= x0 or h <= y0:
            continue
        sub = img[y0::ys, x0::xs]
        ftype = pi % 4 + 1  # Sub/Up/Average/Paeth across passes
        for y in range(sub.shape[0]):
            raw.append(ftype)
            for x in range(sub.shape[1]):
                v = int(sub[y, x])
                left = int(sub[y, x - 1]) if x else 0
                up = int(sub[y - 1, x]) if y else 0
                ul = int(sub[y - 1, x - 1]) if x and y else 0
                pred = {1: left, 2: up, 3: (left + up) // 2,
                        4: paeth(left, up, ul)}[ftype]
                raw.append((v - pred) % 256)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1)
    png = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
           + _png_chunk(b"IEND", b""))
    dec = decode_png_pixels(png)
    assert dec is not None
    got = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(h, w)
    assert (got == img).all()


def test_jpeg12_roundtrip_and_guards(spark):
    """12-bit SOF1 decode: block-constant values round-trip exactly
    through the 16-bit DQT + 16-category DC table + 2^11 level shift,
    restart intervals included; and every byte-sample consumer
    (8-bit stats, dhash) treats 12-bit frames as unsupported instead
    of misreading uint16 buffers."""
    import numpy as np

    from logsdb_spark.operators.multimodal import (
        build_jpeg_12bit,
        decode_jpeg_pixels,
        image_dhash,
        jpeg12_pixel_stats,
        jpeg_pixel_stats,
    )

    content = bytes((7 * i + 3) % 256 for i in range(40))
    for w, h, ri in ((17, 9, 0), (36, 20, 3), (1, 1, 0)):
        dec = decode_jpeg_pixels(build_jpeg_12bit(w, h, content, ri))
        assert dec is not None and dec["precision"] == 12
        arr = np.frombuffer(dec["pixels"], dtype=np.uint16).reshape(h, w)
        bw = (w + 7) // 8
        for y in range(0, h, 3):
            for x in range(0, w, 3):
                b = content[((y // 8) * bw + (x // 8)) % len(content)]
                assert arr[y, x] == b * 16 + b // 16

    # full-range: byte 255 -> 4095 (a truncating decoder caps at 255)
    top = decode_jpeg_pixels(build_jpeg_12bit(8, 8, bytes([255])))
    assert np.frombuffer(top["pixels"], np.uint16).max() == 4095

    blobs = spark.createDataFrame(
        [(0, build_jpeg_12bit(16, 8, bytes([255]) + content))],
        "doc_id long, payload binary",
    )
    r12 = jpeg12_pixel_stats(blobs).collect()[0]
    assert r12.px_max == 4095 and r12.n_pixels == 128
    # 8-bit consumers must refuse, not misread
    assert jpeg_pixel_stats(blobs).collect()[0].px_sum is None
    assert image_dhash(blobs).collect()[0].phash is None
