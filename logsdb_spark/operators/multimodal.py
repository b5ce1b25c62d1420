"""Multimodal-column plumbing — *[extension]* (SURVEY §2.12).

Images/audio/video are opaque ``binary`` columns plus typed metadata.
Two decode tiers live here:

- **Header decode is REAL**: ``parse_media_header`` reads the actual
  container structures — PNG IHDR, JPEG SOF marker scan, GIF logical
  screen descriptor, WAV RIFF/fmt chunk — with pure stdlib ``struct``
  parsing (no PIL/ffmpeg needed), which is exactly what a production
  pipeline's first metadata pass does before deciding what to decode
  fully. ``build_png``/``build_wav`` construct REAL, spec-conformant
  files (zlib'd IDAT, CRC'd chunks, canonical 44-byte RIFF header) so
  the parse path is exercised on genuine bytes end-to-end.
- **Pixel/sample decode is REAL too**: ``decode_png_pixels`` (zlib'd
  IDAT inflation + full per-scanline filter reversal for 8-bit
  gray/RGB, sequential or Adam7-interlaced since round 9),
  ``decode_gif_pixels`` (true LZW + 4-pass de-interlace),
  ``decode_wav_samples`` (RIFF walk + PCM), and
  ``decode_jpeg_pixels`` (canonical-Huffman entropy decode + float
  IDCT — grayscale, 4:4:4/4:2:2/4:2:0 color, baseline, progressive
  SOF2 since round 9, and 12-BIT extended-sequential SOF1 since
  round 10 — uint16 output, 16-bit DQTs), and ``decode_gif_frames``
  (round 10: REAL multi-frame animation decode, every image
  descriptor LZW-decompressed in stream order) — all pure
  stdlib+numpy, each oracle-gated on real decoded values.
  ``resize_media`` is a real decode → integer box-downsample →
  re-encode since round 8 (PNG gray/RGB, identity-palette GIF, WAV
  frame resample); ``transcode_media`` re-encodes any decodable
  image losslessly as PNG. Round 10 added CONTENT hashing over the
  decoded values: ``dhash56``/``image_dhash`` (format-sniffing
  perceptual image hash), ``audio_fp56``/``audio_fingerprint``
  (energy-envelope PCM hash), and ``video_frame_hashes``
  (stride-sampled per-frame hashes) — the evidence feeding the
  image/audio/video near-dup and the multimodal ensemble-keep
  queries. The remaining documented boundaries: 16-bit/paletted
  PNG, hierarchical/arithmetic-coded JPEG, compressed audio.

Design for 100 TB of blobs: mapInPandas streams Arrow record batches
through Python, so per-row overhead is amortized; blobs never pass
through the driver; partition sizing is controlled by
spark.sql.files.maxPartitionBytes at the scan. A real pipeline would
bound Arrow batch bytes with spark.sql.execution.arrow.maxRecordsPerBatch
to keep executor memory flat.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
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


# ---------------------------------------------------------------------------
# REAL header decode: container-structure parsing with stdlib struct.
# ---------------------------------------------------------------------------

_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # JPEG start-of-frame family (not DHT/JPG/DAC)


def parse_media_header(payload: bytes) -> dict:
    """Parse the REAL container header of a media blob: PNG IHDR,
    JPEG SOF marker scan, GIF logical screen descriptor, or WAV
    RIFF/fmt chunk. Returns a uniform dict — keys absent from a
    format are None; unrecognized/truncated bytes → fmt='unknown'.
    Pure stdlib; this is the header-level decode a production
    pipeline runs on every blob before any codec work."""
    out = {
        "fmt": "unknown", "width": None, "height": None,
        "n_channels": None, "sample_rate_hz": None, "bit_depth": None,
        "n_frames": None,
    }
    b = bytes(payload)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            # IHDR: width(4) height(4) bitdepth(1) colortype(1) ...
            w, h = struct.unpack(">II", b[16:24])
            depth, color = b[24], b[25]
            out.update(
                fmt="png", width=w, height=h, bit_depth=depth,
                n_channels={0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color),
            )
        elif b[:3] == b"\xff\xd8\xff":
            # marker scan to the first start-of-frame segment
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker == 0xFF:  # fill byte
                    i += 1
                    continue
                if marker in _SOF_MARKERS:
                    # SOFn: len(2) precision(1) height(2) width(2) ncomp(1)
                    prec = b[i + 4]
                    h, w = struct.unpack(">HH", b[i + 5: i + 9])
                    out.update(
                        fmt="jpeg", width=w, height=h, bit_depth=prec,
                        n_channels=b[i + 9],
                    )
                    break
                seglen = struct.unpack(">H", b[i + 2: i + 4])[0]
                i += 2 + seglen
        elif b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            out.update(fmt="gif", width=w, height=h, bit_depth=8)
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            # chunk walk: each chunk is id(4) size(4) data(size, padded)
            i = 12
            fmt_seen = data_size = None
            while i + 8 <= len(b):
                cid = b[i: i + 4]
                csz = struct.unpack("<I", b[i + 4: i + 8])[0]
                # a declared-short fmt chunk (csz < 16) must NOT be
                # parsed by reading into the NEXT chunk's bytes —
                # that would return confidently wrong format fields
                if cid == b"fmt " and csz >= 16 and i + 24 <= len(b):
                    (_, n_ch, rate, _, _, bits) = struct.unpack(
                        "<HHIIHH", b[i + 8: i + 24]
                    )
                    out.update(
                        fmt="wav", n_channels=n_ch, sample_rate_hz=rate,
                        bit_depth=bits,
                    )
                    fmt_seen = (n_ch, bits)
                elif cid == b"data":
                    data_size = csz
                i += 8 + csz + (csz & 1)
            if fmt_seen and data_size is not None:
                n_ch, bits = fmt_seen
                bpf = n_ch * max(bits // 8, 1)
                out["n_frames"] = data_size // bpf if bpf else None
    except (struct.error, IndexError):
        return {
            "fmt": "unknown", "width": None, "height": None,
            "n_channels": None, "sample_rate_hz": None, "bit_depth": None,
            "n_frames": None,
        }
    return out


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def build_png(width: int, height: int, content: bytes = b"",
              n_channels: int = 1, interlaced: bool = False) -> bytes:
    """A REAL spec-conformant 8-bit PNG — grayscale (color type 0) or,
    with ``n_channels=3`` (round 9), RGB (color type 2): IHDR + zlib'd
    IDAT (scanlines with filter byte 0, the channel-interleaved pixel
    stream cycled from ``content``) + IEND, all chunks CRC'd. Any PNG
    reader opens it. ``interlaced=True`` (round 9) emits the SAME
    image through the Adam7 seven-pass lattice — pixel (y, x) still
    carries content[((y*w + x)*nch + c) % L], so the interlaced and
    sequential encodings of one doc decode identically and share one
    oracle."""
    stride = width * n_channels
    pix = (content or b"\x00") * (
        (stride * height) // max(len(content), 1) + 1
    )
    if not interlaced:
        raw = b"".join(
            b"\x00" + pix[y * stride: (y + 1) * stride].ljust(stride, b"\x00")
            for y in range(height)
        )
    else:
        import numpy as np

        arr = np.frombuffer(
            pix[: stride * height].ljust(stride * height, b"\x00"),
            dtype=np.uint8,
        ).reshape(height, width, n_channels)
        parts = []
        for x0, y0, xs, ys in _ADAM7:
            if width <= x0 or height <= y0:
                continue
            sub = arr[y0::ys, x0::xs, :]
            for row in sub:
                parts.append(b"\x00" + row.tobytes())
        raw = b"".join(parts)
    color_type = 0 if n_channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0,
                       1 if interlaced else 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def build_wav(n_channels: int, sample_rate_hz: int, bit_depth: int,
              pcm: bytes) -> bytes:
    """A REAL canonical 44-byte-header RIFF/WAVE file wrapping ``pcm``
    (padded to whole frames). Any WAV reader opens it."""
    bpf = n_channels * (bit_depth // 8)
    if len(pcm) % bpf:
        pcm = pcm + b"\x00" * (bpf - len(pcm) % bpf)
    byte_rate = sample_rate_hz * bpf
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate_hz, byte_rate, bpf, bit_depth
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


MEDIA_HEADER_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fmt", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_channels", LongType()),
        StructField("sample_rate_hz", LongType()),
        StructField("bit_depth", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def extract_media_headers(blobs: DataFrame) -> DataFrame:
    """REAL header-level metadata over binary payloads: Arrow-batched
    mapInPandas running parse_media_header per blob (one Python
    round-trip per record batch, payloads never near the driver)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads classify as 'unknown' (bytes(None) would
            # raise and kill the whole task)
            rows = [
                parse_media_header(b"" if p is None else bytes(p))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    **{
                        k: [r[k] for r in rows]
                        for k in (
                            "fmt", "width", "height", "n_channels",
                            "sample_rate_hz", "bit_depth", "n_frames",
                        )
                    },
                }
            )

    return blobs.mapInPandas(extract, MEDIA_HEADER_SCHEMA)


def synthesize_media(docs: DataFrame, text_col: str = "text",
                     with_len: bool = False) -> DataFrame:
    """Deterministic real-media fixture generator: wraps each doc's
    utf-8 bytes into a REAL container — even doc_id → grayscale PNG
    (width = doc_id%64+1, height = doc_id%48+1), odd doc_id → PCM WAV
    (channels = (doc_id>>1)%2+1, rate = 8000 + doc_id%4*4000, 16-bit).
    The derivation rules are simple arithmetic on doc_id/text length
    so a SQL oracle can recompute every header field the parser
    extracts — that is what upgrades the header-decode path from
    rows-only to hash-gated (see plans/extensions.multimodal_real_headers).

    ``with_len=True`` adds a text_len column (source char count) so a
    MATERIALIZED blob layout can carry the stat queries' empty-doc
    filter without re-reading the documents table."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            lens = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                # NULL text is EMPTY text, not the 4-char string
                # "None": text_len must be 0 so the layouts' text_len
                # > 0 filter excludes the row exactly as the oracles'
                # length(text) > 0 does (length(NULL) is NULL ⇒ drop).
                s = "" if text is None else str(text)
                data = s.encode("utf-8")
                lens.append(len(s))
                if doc_id % 2 == 0:
                    payloads.append(
                        build_png(int(doc_id) % 64 + 1, int(doc_id) % 48 + 1, data)
                    )
                else:
                    payloads.append(
                        build_wav(
                            int(doc_id >> 1) % 2 + 1,
                            8000 + int(doc_id) % 4 * 4000,
                            16,
                            data,
                        )
                    )
            out = {"doc_id": pdf["doc_id"], "payload": payloads}
            if with_len:
                out["text_len"] = lens
            yield pd.DataFrame(out)

    fields = [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
    if with_len:
        fields.append(StructField("text_len", LongType()))
    return docs.select("doc_id", text_col).mapInPandas(
        synth, StructType(fields)
    )


# Adam7 pass lattice: (x_start, y_start, x_step, y_step) — PNG spec
# §8.2. Pass p holds pixels with y ≡ y0 (mod ystep), x ≡ x0 (mod
# xstep); each pass is filtered as an independent sub-image.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, pos: int, wpx: int, hpx: int, nch: int):
    """Reverse the per-scanline filters (None/Sub/Up/Average/Paeth —
    the full spec set) for one (sub-)image of ``wpx`` x ``hpx``
    pixels starting at ``pos`` in the inflated stream → ((hpx,
    wpx*nch) uint8 array, next pos). Filters reference the previous
    scanline of the SAME (sub-)image — which is what makes this the
    shared core of both the sequential path and each Adam7 pass."""
    import numpy as np

    stride = wpx * nch
    if len(raw) < pos + hpx * (1 + stride):
        raise ValueError("truncated PNG pixel stream")
    out = np.zeros((hpx, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(hpx):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=pos + 1)
        pos += 1 + stride
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 2:  # Up
            cur = ((line.astype(np.int32) + prev) % 256).astype(np.uint8)
        else:  # Sub / Average / Paeth need the running left pixel
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(cur[x - nch]) if x >= nch else 0
                up = int(prev[x])
                ul = int(prev[x - nch]) if x >= nch else 0
                if ftype == 1:  # Sub
                    pred = left
                elif ftype == 3:  # Average
                    pred = (left + up) // 2
                elif ftype == 4:  # Paeth
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (
                        up if pb <= pc else ul
                    )
                else:
                    raise ValueError("unknown PNG filter")
                cur[x] = (int(line[x]) + pred) % 256
        out[y] = cur
        prev = cur
    return out, pos


def decode_png_pixels(payload: bytes) -> dict | None:
    """REAL PNG pixel decode, pure stdlib+numpy: zlib-inflate the IDAT
    stream and reverse the per-scanline filters (None/Sub/Up/Average/
    Paeth — the full spec set) for 8-bit grayscale (color type 0) and
    RGB (color type 2) images, SEQUENTIAL or ADAM7-INTERLACED (round
    9 — the seven-pass lattice, each pass unfiltered as its own
    sub-image against its own previous scanline, then scattered into
    display order; empty passes contribute no scanlines, per spec).
    Returns ``{"width", "height", "n_channels", "pixels": bytes}``
    with pixels in row-major scanline order, or None when the payload
    is not a PNG this decoder supports (other color types, 16-bit,
    truncated) — callers fall back rather than crash the Arrow batch.

    This is the honest next increment past header decode
    (multimodal_real_headers): the bytes fed to feature extraction are
    genuine decompressed image pixels, not container bytes."""
    import numpy as np

    b = bytes(payload)
    if b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    try:
        w, h = struct.unpack(">II", b[16:24])
        depth, color, _comp, _filt, interlace = b[24:29]
        if (depth != 8 or color not in (0, 2) or interlace not in (0, 1)
                or not w or not h):
            return None
        nch = 1 if color == 0 else 3
        # concatenate every IDAT chunk in stream order
        idat = bytearray()
        i = 8
        while i + 8 <= len(b):
            clen = struct.unpack(">I", b[i: i + 4])[0]
            ctag = b[i + 4: i + 8]
            if ctag == b"IDAT":
                idat += b[i + 8: i + 8 + clen]
            elif ctag == b"IEND":
                break
            i += 12 + clen  # len + tag + body + crc
        raw = zlib.decompress(bytes(idat))
        if interlace == 0:
            out, _ = _png_unfilter(raw, 0, w, h, nch)
        else:
            out = np.zeros((h, w * nch), dtype=np.uint8)
            view = out.reshape(h, w, nch)
            pos = 0
            for x0, y0, xs, ys in _ADAM7:
                pw = (w - x0 + xs - 1) // xs if w > x0 else 0
                ph = (h - y0 + ys - 1) // ys if h > y0 else 0
                if pw == 0 or ph == 0:
                    continue
                sub, pos = _png_unfilter(raw, pos, pw, ph, nch)
                view[y0::ys, x0::xs, :] = sub.reshape(ph, pw, nch)
        return {
            "width": int(w), "height": int(h), "n_channels": nch,
            "pixels": out.tobytes(),
        }
    except (struct.error, IndexError, zlib.error, ValueError):
        return None


# initial LZW string table per min_code_size — the singleton-byte
# prefix is constant, so every clear code copies this instead of
# reconstructing 2^n bytes objects (profiled: the per-clear rebuild
# was ~1/3 of GIF decode CPU); bytes are immutable, sharing is safe
_LZW_INIT: dict[int, list[bytes]] = {}


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW decompression (LSB-first bit packing, dynamic
    code width, clear/EOI codes, table growth to 4096) — the actual
    decoder the GIF89a spec mandates, pure stdlib. ``tlen`` mirrors
    len(table) so the hot loop never re-measures the list; the
    decoder-lag width-bump rule is unchanged: the width bumps when
    the table reaches 2^W - 1 (the encoder bumped at 2^W before
    emitting the code we are about to read)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    init = _LZW_INIT.get(min_code_size)
    if init is None:
        init = [bytes([i]) for i in range(clear)] + [b"", b""]
        _LZW_INIT[min_code_size] = init
    table = init.copy()
    tlen = clear + 2
    code_size = min_code_size + 1
    width_bump = (1 << code_size) - 1
    prev = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = init.copy()
                tlen = clear + 2
                code_size = min_code_size + 1
                width_bump = (1 << code_size) - 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < tlen:
                entry = table[code]
                if tlen < 4096:  # table-full: stop adding (spec)
                    table.append(prev + entry[:1])
                    tlen += 1
            elif code == tlen and tlen < 4096:  # KwKwK
                entry = prev + prev[:1]
                table.append(entry)
                tlen += 1
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            prev = entry
            if tlen == width_bump and code_size < 12:
                code_size += 1
                width_bump = (1 << code_size) - 1
    return bytes(out)


def _deinterlace(pixels: bytes, w: int, h: int) -> bytes:
    """Undo GIF interlacing: the stream carries rows in the 4-pass
    Haeberli schedule (rows 0,8,16…, then 4,12…, then 2,6,10…, then
    the odd rows); map decoded row i back to its display position."""
    order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
             for r in range(start, h, step)]
    out = bytearray(w * h)
    for i, r in enumerate(order):
        out[r * w: (r + 1) * w] = pixels[i * w: (i + 1) * w]
    return bytes(out)


def _lzw_encode(data: bytes, min_code: int = 8) -> bytes:
    """Canonical growing-table GIF-LZW encoder (the convention real
    encoders use: width bumps when next_code reaches 2^W, adds stop
    at 4096, no mid-stream clears). Compresses text-like index
    streams ~4-5x over the old clear-per-symbol strategy, which is
    why build_gif uses it: the fixture GIFs carry realistic
    growing-table streams AND decode proportionally faster. The
    decoder's independent cross-check against a second copy of this
    convention lives in tests/test_multimodal._enc_lzw."""
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


def decode_gif_pixels(payload: bytes) -> dict | None:
    """REAL GIF pixel decode: logical-screen parse, global color
    table, first image descriptor, sub-block reassembly, then genuine
    LZW decompression (_lzw_decode) of the index stream; interlaced
    images are de-interlaced via the 4-pass row schedule
    (_deinterlace). Returns ``{"width", "height", "pixels": bytes}``
    (palette indexes, row-major display order) or None — the same
    fall-back-not-crash contract as decode_png_pixels."""
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        packed = b[10]
        i = 13
        if packed & 0x80:  # global color table present
            i += 3 * (2 << (packed & 0x07))
        while i < len(b):
            blk = b[i]
            if blk == 0x21:  # extension: label + sub-blocks
                i += 2
                while b[i] != 0:
                    i += 1 + b[i]
                i += 1
            elif blk == 0x2C:  # image descriptor
                w, h = struct.unpack("<HH", b[i + 5: i + 9])
                ipacked = b[i + 9]
                i += 10
                if ipacked & 0x80:  # local color table
                    i += 3 * (2 << (ipacked & 0x07))
                interlaced = bool(ipacked & 0x40)
                min_code = b[i]
                i += 1
                data = bytearray()
                while b[i] != 0:
                    n = b[i]
                    data += b[i + 1: i + 1 + n]
                    i += 1 + n
                pixels = _lzw_decode(bytes(data), min_code)[: w * h]
                if len(pixels) < w * h:
                    return None
                if interlaced:
                    pixels = _deinterlace(pixels, int(w), int(h))
                return {"width": int(w), "height": int(h), "pixels": pixels}
            elif blk == 0x3B:  # trailer
                return None
            else:
                return None
        return None
    except (struct.error, IndexError, ValueError):
        return None


def build_gif(width: int, height: int, content: bytes = b"",
              interlaced: bool = False) -> bytes:
    """A REAL spec-conformant GIF89a: 256-entry grayscale global
    color table, one image whose palette indexes are ``content``
    cycled to width*height, LZW-compressed by the canonical
    growing-table encoder (_lzw_encode — dynamic code widths, the
    stream shape every real encoder emits). With ``interlaced=True``
    the image descriptor sets the interlace flag and the rows are
    emitted in the 4-pass Haeberli schedule — the round-trip partner
    for decode_gif_pixels' _deinterlace. Any GIF reader opens it;
    decode_gif_pixels gets the exact index stream back in display
    order."""
    pix = (content or b"\x00") * ((width * height) // max(len(content), 1) + 1)
    idx = pix[: width * height]
    if interlaced:
        order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                 for r in range(start, height, step)]
        idx = b"".join(idx[r * width: (r + 1) * width] for r in order)
    header = b"GIF89a" + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    palette = bytes(v for g in range(256) for v in (g, g, g))
    descriptor = b"\x2C" + struct.pack(
        "<HHHHB", 0, 0, width, height, 0x40 if interlaced else 0
    )
    min_code = 8
    stream = _lzw_encode(bytes(idx), min_code)
    blocks = bytearray([min_code])
    for off in range(0, len(stream), 255):
        chunk = stream[off: off + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return header + palette + descriptor + bytes(blocks) + b"\x3B"


def decode_wav_samples(payload: bytes) -> dict | None:
    """REAL WAV sample decode: RIFF chunk walk to the fmt + data
    chunks, then the data chunk's PCM bytes interpreted as signed
    little-endian integer samples (16-bit, the canonical PCM format;
    8-bit WAV is unsigned per spec and also supported). Returns
    ``{"n_channels", "sample_rate_hz", "bit_depth", "samples":
    np.ndarray (int32, interleaved)}`` or None for non-PCM /
    unsupported depths / truncated containers — the same
    fall-back-not-crash contract as decode_png_pixels.

    This makes the audio tier symmetric with the image tier: header
    decode (parse_media_header) AND sample decode are real; only
    compressed codecs (MP3/AAC) remain out of scope here."""
    import numpy as np

    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    try:
        i = 12
        fmt = None
        data = None
        while i + 8 <= len(b):
            cid = b[i: i + 4]
            csz = struct.unpack("<I", b[i + 4: i + 8])[0]
            if cid == b"fmt " and csz >= 16 and i + 24 <= len(b):
                fmt = struct.unpack("<HHIIHH", b[i + 8: i + 24])
            elif cid == b"data":
                data = b[i + 8: i + 8 + csz]
                if len(data) < csz:
                    # declared size extends past the container: the
                    # documented fall-back-not-crash contract is None,
                    # not stats over silently truncated PCM
                    return None
            i += 8 + csz + (csz & 1)
        if fmt is None or data is None:
            return None
        audio_fmt, n_ch, rate, _br, _ba, bits = fmt
        if audio_fmt != 1 or bits not in (8, 16) or not n_ch:
            return None
        if bits == 16:
            samples = np.frombuffer(
                data[: len(data) - (len(data) % 2)], dtype="<i2"
            ).astype(np.int32)
        else:  # 8-bit PCM is unsigned, centered at 128 per spec
            samples = np.frombuffer(data, dtype=np.uint8).astype(np.int32)
        return {
            "n_channels": int(n_ch), "sample_rate_hz": int(rate),
            "bit_depth": int(bits), "samples": samples,
        }
    except (struct.error, IndexError, ValueError):
        return None


WAV_SAMPLE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_channels", LongType()),
        StructField("sample_rate_hz", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_sum", LongType()),
        StructField("sample_sumsq", LongType()),
        StructField("mean_sample_e4", LongType()),
    ]
)


def wav_sample_stats(blobs: DataFrame) -> DataFrame:
    """Per-WAV statistics from REAL decoded PCM samples
    (decode_wav_samples): interleaved sample count, exact sum and
    sum-of-squares (64-bit integer — the energy/RMS building blocks),
    and the integer-e4 mean (``(10000*sum) div n`` — exact arithmetic,
    no float rounding hazard, same contract as png_pixel_stats).
    Undecodable payloads yield NULL stats. Arrow-batched mapInPandas."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("n_channels", "sample_rate_hz", "n_samples",
                     "sample_sum", "sample_sumsq", "mean_sample_e4")}
            for p in pdf["payload"]:
                dec = decode_wav_samples(bytes(p) if p is not None else b"")
                if dec is None:
                    for k in rows:
                        rows[k].append(None)
                    continue
                s = dec["samples"].astype(np.int64)
                n = int(s.size)
                tot = int(s.sum())
                rows["n_channels"].append(dec["n_channels"])
                rows["sample_rate_hz"].append(dec["sample_rate_hz"])
                rows["n_samples"].append(n)
                rows["sample_sum"].append(tot)
                rows["sample_sumsq"].append(int((s * s).sum()))
                rows["mean_sample_e4"].append((10000 * tot) // n if n else None)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **rows})

    return blobs.mapInPandas(stats, WAV_SAMPLE_STATS_SCHEMA)


def synthesize_rgb_pngs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """RGB-PNG fixture generator (round 9, companion to
    synthesize_media's grayscale path): each doc's utf-8 bytes become
    the channel-interleaved pixel stream of a REAL color-type-2 PNG,
    width = doc_id%40+1, height = doc_id%30+1 — sample (y, x, c) is
    content[((y*w + x)*3 + c) % L], arithmetic a SQL oracle can
    recompute. Feeds the RGB resize gate."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                build_png(
                    int(doc_id) % 40 + 1,
                    int(doc_id) % 30 + 1,
                    ("" if text is None else str(text)).encode("utf-8"),
                    n_channels=3,
                )
                for doc_id, text in zip(pdf["doc_id"], pdf[text_col])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )
    return docs.select("doc_id", text_col).mapInPandas(synth, schema)


def synthesize_gifs(docs: DataFrame, text_col: str = "text",
                    interlace_odd: bool = False) -> DataFrame:
    """GIF fixture generator (companion to synthesize_media's PNG/WAV
    split): every doc's utf-8 bytes become the palette-index stream of
    a REAL LZW-encoded GIF89a, width = doc_id%32+1, height =
    doc_id%24+1 — arithmetic a SQL oracle can recompute, same contract
    as the PNG path. ``interlace_odd=True`` encodes odd-doc_id images
    INTERLACED (4-pass row schedule + descriptor flag) — the mixed
    corpus the de-interlace parity query reads; decoded display-order
    pixels are identical either way, which is exactly the property
    that query hash-gates."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                build_gif(
                    int(doc_id) % 32 + 1,
                    int(doc_id) % 24 + 1,
                    ("" if text is None else str(text)).encode("utf-8"),
                    interlaced=interlace_odd and int(doc_id) % 2 == 1,
                )
                for doc_id, text in zip(pdf["doc_id"], pdf[text_col])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )
    return docs.select("doc_id", text_col).mapInPandas(synth, schema)


GIF_PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("px_sum", LongType()),
        StructField("mean_pixel_e4", LongType()),
    ]
)


def gif_pixel_stats(blobs: DataFrame) -> DataFrame:
    """Per-GIF statistics from REAL LZW-decoded palette indexes
    (decode_gif_pixels) — same exact-integer contract as
    png_pixel_stats; undecodable payloads yield NULL stats."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("width", "height", "n_pixels", "px_sum", "mean_pixel_e4")}
            for p in pdf["payload"]:
                dec = decode_gif_pixels(bytes(p) if p is not None else b"")
                if dec is None:
                    for k in rows:
                        rows[k].append(None)
                    continue
                arr = np.frombuffer(dec["pixels"], dtype=np.uint8)
                n = dec["width"] * dec["height"]
                s = int(arr.sum())
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["n_pixels"].append(n)
                rows["px_sum"].append(s)
                rows["mean_pixel_e4"].append((10000 * s) // n if n else None)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **rows})

    return blobs.mapInPandas(stats, GIF_PIXEL_STATS_SCHEMA)


GIF_POSITION_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("px_sum", LongType()),
        StructField("px_wsum", LongType()),
    ]
)


def gif_pixel_position_stats(blobs: DataFrame) -> DataFrame:
    """Per-GIF POSITION-WEIGHTED pixel statistics: px_wsum =
    Σ (i+1)·px[i] over DISPLAY order. Unlike px_sum (permutation-
    invariant — blind to row order), px_wsum changes if the decoder
    hands back rows in stream order for an interlaced image, so an
    oracle recomputing it from the cycled source bytes hash-gates the
    _deinterlace row schedule end-to-end. Same Arrow kernel shape as
    gif_pixel_stats; undecodable payloads yield NULL stats."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("width", "height", "n_pixels", "px_sum", "px_wsum")}
            for p in pdf["payload"]:
                dec = decode_gif_pixels(bytes(p) if p is not None else b"")
                if dec is None:
                    for k in rows:
                        rows[k].append(None)
                    continue
                arr = np.frombuffer(dec["pixels"], dtype=np.uint8).astype(
                    np.int64
                )
                n = dec["width"] * dec["height"]
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["n_pixels"].append(n)
                rows["px_sum"].append(int(arr.sum()))
                rows["px_wsum"].append(
                    int((arr * np.arange(1, n + 1, dtype=np.int64)).sum())
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **rows})

    return blobs.mapInPandas(stats, GIF_POSITION_STATS_SCHEMA)


def synthesize_interlaced_pngs(docs: DataFrame,
                               text_col: str = "text") -> DataFrame:
    """Adam7 parity fixture generator (round 9, companion to
    synthesize_gifs' interlace_odd mix): grayscale PNGs with width =
    doc_id%38+1, height = doc_id%26+1, pixel (y, x) =
    content[(y*w + x) % L]; ODD doc_ids are encoded through the
    seven-pass Adam7 lattice, even ones sequentially — the decoded
    image is identical either way, which is exactly what the
    position-weighted gate checks."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                build_png(
                    int(doc_id) % 38 + 1,
                    int(doc_id) % 26 + 1,
                    ("" if text is None else str(text)).encode("utf-8"),
                    interlaced=bool(int(doc_id) % 2),
                )
                for doc_id, text in zip(pdf["doc_id"], pdf[text_col])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )
    return docs.select("doc_id", text_col).mapInPandas(synth, schema)


def png_pixel_position_stats(blobs: DataFrame) -> DataFrame:
    """Per-PNG POSITION-WEIGHTED pixel statistics — the Adam7
    counterpart of gif_pixel_position_stats: px_wsum = Σ (i+1)·px[i]
    over DISPLAY order, which changes if the decoder scatters any
    interlace pass to the wrong lattice positions (px_sum alone is
    permutation-invariant and cannot see that). Same Arrow kernel
    shape; undecodable payloads yield NULL stats."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("width", "height", "n_pixels", "px_sum", "px_wsum")}
            for p in pdf["payload"]:
                dec = decode_png_pixels(bytes(p) if p is not None else b"")
                if dec is None or dec["n_channels"] != 1:
                    for k in rows:
                        rows[k].append(None)
                    continue
                arr = np.frombuffer(dec["pixels"], dtype=np.uint8).astype(
                    np.int64
                )
                n = dec["width"] * dec["height"]
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["n_pixels"].append(n)
                rows["px_sum"].append(int(arr.sum()))
                rows["px_wsum"].append(
                    int((arr * np.arange(1, n + 1, dtype=np.int64)).sum())
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **rows})

    return blobs.mapInPandas(stats, GIF_POSITION_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Baseline JPEG: real entropy (Huffman) decode + dequantize + IDCT.
# ---------------------------------------------------------------------------

# JPEG zigzag scan order: zigzag index -> natural (row*8+col) position.
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_ZIGZAG_NP = None  # numpy mirror, built lazily by _zigzag_np()


def _zigzag_np():
    """numpy mirror of _ZIGZAG for the vectorized dezigzag scatter —
    memoized on first use (like _idct_matrix) so importing the module
    stays numpy-free per the file's lazy-import convention."""
    global _ZIGZAG_NP
    if _ZIGZAG_NP is None:
        import numpy as np

        _ZIGZAG_NP = np.array(_ZIGZAG, dtype=np.int64)
    return _ZIGZAG_NP


def _huffman_table(bits: list[int], vals: list[int]) -> tuple:
    """Canonical JPEG Huffman table from a DHT segment's BITS/HUFFVAL
    in the T.81 F.2.2.3 DECODE form: per code length 1..16 the
    (mincode, maxcode, valptr) triple over the canonical code
    assignment (increasing length then value order, Annex C), plus
    the HUFFVAL list — symbol of a length-L code c is
    ``huffval[valptr[L] + c - mincode[L]]`` when c <= maxcode[L].
    Index 0 of each array is padding so lookups index by length
    directly; maxcode = -1 marks lengths with no codes (no code
    matches, since candidate codes are non-negative)."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        n = bits[length - 1]
        if n:
            valptr[length] = k
            mincode[length] = code
            code += n
            k += n
            maxcode[length] = code - 1
        code <<= 1
    if k > len(vals):
        # a corrupt DHT declaring more codes than HUFFVALs must fail
        # at table build, exactly where the dict form indexed vals[k]
        raise IndexError("DHT declares more codes than HUFFVALs")
    return maxcode, mincode, valptr, list(vals)


_IDCT_MATRIX = None


def _idct_matrix():
    """8x8 DCT-III basis A with A[u, x] = C(u)/2 * cos((2x+1)uπ/16):
    pixels = A.T @ S @ A for a natural-order coefficient block S.
    The matrix is a constant — computed once per process and memoized
    (it was measurably rebuilt per decoded image: 64 cos() calls per
    blob across every JPEG-decoding kernel)."""
    global _IDCT_MATRIX
    if _IDCT_MATRIX is None:
        import math

        import numpy as np

        a = np.zeros((8, 8))
        for u in range(8):
            cu = (1 / math.sqrt(2)) if u == 0 else 1.0
            for x in range(8):
                a[u, x] = cu / 2 * math.cos((2 * x + 1) * u * math.pi / 16)
        a.setflags(write=False)
        _IDCT_MATRIX = a
    return _IDCT_MATRIX


class _BitReader:
    """MSB-first entropy-segment bit reader with JPEG byte unstuffing:
    0xFF 0x00 reads as a literal 0xFF byte; any other 0xFF <marker>
    inside bit reads is an error — restart markers are consumed only
    at the expected MCU boundaries via sync_restart."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise ValueError("marker inside entropy stream")
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def sync_restart(self, n: int) -> None:
        """Consume an expected RSTn marker: discard the pad bits of
        the current byte (encoders pad with 1s before a restart),
        then require the exact 0xFF 0xD0+n bytes — T.81's modulo-8
        restart sequence check, so a dropped/duplicated restart
        segment is detected, not silently mis-assembled."""
        self.acc = 0
        self.nbits = 0
        if (self.pos + 2 > len(self.data)
                or self.data[self.pos] != 0xFF
                or self.data[self.pos + 1] != 0xD0 + (n & 7)):
            raise ValueError("missing or out-of-sequence restart marker")
        self.pos += 2

    # receive/decode_huffman are the entropy-decode hot loop (profiled:
    # ~55% of decode_jpeg_pixels CPU went to per-BIT read_bit() calls).
    # Both now run on LOCAL copies of (pos, acc, nbits) and refill the
    # accumulator a byte at a time ON DEMAND — consuming exactly the
    # bytes the per-bit reader would (same exhaustion/marker errors at
    # the same byte), so the decode is value-identical; only the Python
    # call count changes. ``acc`` generalizes from "current byte" to
    # "low ``nbits`` bits are the unread bits, MSB first" (the refill
    # masks consumed high bits so acc stays a small int).

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        data, dlen = self.data, len(self.data)
        pos, acc, nbits = self.pos, self.acc, self.nbits
        while nbits < n:
            if pos >= dlen:
                self.pos, self.acc, self.nbits = pos, acc, nbits
                raise ValueError("entropy stream exhausted")
            byte = data[pos]
            pos += 1
            if byte == 0xFF:
                if pos < dlen and data[pos] == 0x00:
                    pos += 1  # stuffed
                else:
                    self.pos, self.acc, self.nbits = pos, acc, nbits
                    raise ValueError("marker inside entropy stream")
            acc = ((acc & ((1 << nbits) - 1)) << 8) | byte
            nbits += 8
        nbits -= n
        self.pos, self.acc, self.nbits = pos, acc, nbits
        return (acc >> nbits) & ((1 << n) - 1)

    def decode_huffman(self, table: tuple) -> int:
        maxcode, mincode, valptr, huffval = table
        data, dlen = self.data, len(self.data)
        pos, acc, nbits = self.pos, self.acc, self.nbits
        code = 0
        for length in range(1, 17):
            if nbits == 0:
                if pos >= dlen:
                    self.pos, self.acc, self.nbits = pos, acc, nbits
                    raise ValueError("entropy stream exhausted")
                byte = data[pos]
                pos += 1
                if byte == 0xFF:
                    if pos < dlen and data[pos] == 0x00:
                        pos += 1  # stuffed
                    else:
                        self.pos, self.acc, self.nbits = pos, acc, nbits
                        raise ValueError("marker inside entropy stream")
                acc = byte
                nbits = 8
            nbits -= 1
            code = (code << 1) | ((acc >> nbits) & 1)
            if code <= maxcode[length]:
                self.pos, self.acc, self.nbits = pos, acc, nbits
                return huffval[valptr[length] + code - mincode[length]]
        self.pos, self.acc, self.nbits = pos, acc, nbits
        raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """ITU T.81 EXTEND: map the t received magnitude bits to the
    signed coefficient value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _scan_sequential(reader, scan, sof_comps, coefs, grids,
                     mcux, mcuy, ri) -> None:
    """The single full-band interleaved SOF0 scan: per MCU, per
    component, DC predict + EXTEND then AC run/size with ZRL/EOB —
    raw (undequantized) coefficients land in natural order; the
    caller dequantizes and IDCTs once all scans are in."""
    preds = {e[0]: 0 for e in scan}
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu and mcu % ri == 0:
                reader.sync_restart(mcu // ri - 1)
                for key in preds:
                    preds[key] = 0
            mcu += 1
            for ci, dc_tab, ac_tab in scan:
                if dc_tab is None or ac_tab is None:
                    raise ValueError("missing Huffman table")
                _, _, hi, vi = sof_comps[ci]
                nbx = grids[ci][1]
                for v in range(vi):
                    for u in range(hi):
                        cf = coefs[ci][(my * vi + v) * nbx + (mx * hi + u)]
                        t = reader.decode_huffman(dc_tab)
                        preds[ci] += _extend(reader.receive(t), t)
                        cf[0] = preds[ci]
                        k = 0
                        while k < 63:
                            rs = reader.decode_huffman(ac_tab)
                            if rs == 0x00:  # EOB
                                break
                            r, s = rs >> 4, rs & 0x0F
                            if rs == 0xF0:  # ZRL: 16 zeros
                                k += 16
                                continue
                            k += r + 1
                            if k > 63 or s == 0:
                                raise ValueError("corrupt AC run")
                            cf[_ZIGZAG[k]] = _extend(reader.receive(s), s)


def _scan_dc(reader, scan, sof_comps, coefs, grids, mcux, mcuy, ri,
             ah, al, w, h, hmax, vmax) -> None:
    """Progressive DC scan (Ss=Se=0). First pass (Ah=0): Huffman
    diff-coded point-transformed DC, coefficient = pred << Al.
    Refinement (Ah>0, Al=Ah-1): one raw bit per block ORed in at Al —
    two's-complement OR, which reconstructs the lower magnitude bits
    for negative values exactly as the encoder's arithmetic-shift
    emitted them (T.81 G.1.2.1). Interleaved (multi-component, MCU
    walk) or single-component (ceil-grid data-unit walk)."""
    preds = {e[0]: 0 for e in scan}
    if len(scan) > 1:
        units = [
            [(ci, (my * vi + v) * grids[ci][1] + (mx * hi + u))
             for ci, _, _ in scan
             for _, _, hi, vi in (sof_comps[ci],)
             for v in range(vi) for u in range(hi)]
            for my in range(mcuy) for mx in range(mcux)
        ]
    else:
        ci = scan[0][0]
        _, _, hi, vi = sof_comps[ci]
        cbx = ((w * hi + hmax - 1) // hmax + 7) // 8
        cby = ((h * vi + vmax - 1) // vmax + 7) // 8
        nbx = grids[ci][1]
        units = [[(ci, by * nbx + bx)]
                 for by in range(cby) for bx in range(cbx)]
    dc_tabs = {e[0]: e[1] for e in scan}
    n = 0
    for unit in units:
        if ri and n and n % ri == 0:
            reader.sync_restart(n // ri - 1)
            for key in preds:
                preds[key] = 0
        n += 1
        for ci, blk in unit:
            cf = coefs[ci][blk]
            if ah == 0:
                dc_tab = dc_tabs[ci]
                if dc_tab is None:
                    raise ValueError("missing DC table")
                t = reader.decode_huffman(dc_tab)
                preds[ci] += _extend(reader.receive(t), t)
                cf[0] = preds[ci] << al
            else:
                if reader.read_bit():
                    cf[0] = int(cf[0]) | (1 << al)


def _ac_first(reader, cf, ss, se, al, ac_tab, eobrun) -> int:
    """Progressive AC first pass over the Ss..Se band (T.81 G.1.2.2):
    run/size with ZRL, values EXTENDed then shifted by Al, and
    EOB RUNS (symbol r<15, s=0 → 2^r - 1 + r extra bits of following
    all-zero-band blocks). Returns the remaining EOBRUN."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_huffman(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eob = (1 << r) - 1
                if r:
                    eob += reader.receive(r)
                return eob
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("corrupt AC run")
        cf[_ZIGZAG[k]] = _extend(reader.receive(s), s) << al
        k += 1
    return 0


def _ac_refine(reader, cf, ss, se, al, ac_tab, eobrun) -> int:
    """Progressive AC refinement (T.81 G.1.2.3): each newly nonzero
    coefficient arrives as ±1<<Al after skipping r ZERO-HISTORY
    positions, and every nonzero-history coefficient passed over (or
    covered by an EOB run) carries one correction bit — appended to
    the magnitude only when the Al bit is still clear. Returns the
    remaining EOBRUN."""
    p1, m1 = 1 << al, -1 << al

    def correct(z: int) -> None:
        if reader.read_bit() and (int(cf[z]) & p1) == 0:
            cf[z] += p1 if cf[z] > 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_huffman(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                # r == 15: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("corrupt refinement size")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                z = _ZIGZAG[k]
                if cf[z] != 0:
                    correct(z)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                cf[_ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            z = _ZIGZAG[k]
            if cf[z] != 0:
                correct(z)
            k += 1
        eobrun -= 1
    return eobrun


def _scan_ac(reader, entry, sof_comps, coefs, grids, ri, ss, se,
             ah, al, w, h, hmax, vmax) -> None:
    """Progressive AC scan — always single-component (T.81 B.2.3),
    walking the component's ceil-grid data units in raster order;
    restarts reset the EOB run."""
    ci, _, ac_tab = entry
    if ac_tab is None:
        raise ValueError("missing AC table")
    _, _, hi, vi = sof_comps[ci]
    cbx = ((w * hi + hmax - 1) // hmax + 7) // 8
    cby = ((h * vi + vmax - 1) // vmax + 7) // 8
    nbx = grids[ci][1]
    eobrun = 0
    n = 0
    for by in range(cby):
        for bx in range(cbx):
            if ri and n and n % ri == 0:
                reader.sync_restart(n // ri - 1)
                eobrun = 0
            n += 1
            cf = coefs[ci][by * nbx + bx]
            if ah == 0:
                eobrun = _ac_first(reader, cf, ss, se, al, ac_tab, eobrun)
            else:
                eobrun = _ac_refine(reader, cf, ss, se, al, ac_tab, eobrun)


def decode_jpeg_pixels(payload: bytes) -> dict | None:
    """REAL baseline-sequential JPEG pixel decode, pure stdlib+numpy —
    the decode boundary COVERAGE.md carried as out-of-scope until
    round 7: marker walk, DQT/DHT parsing (canonical Huffman
    construction per Annex C), SOF0, then per-MCU entropy decode
    (DC prediction + EXTEND, AC run/size with ZRL and EOB), dezigzag,
    dequantize, float IDCT, level shift, clamp, and edge-block crop
    — and, since round 9, multi-scan PROGRESSIVE (SOF2) progressions.

    Supported: 8-bit baseline (SOF0), grayscale OR 3-component color —
    interleaved MCUs with per-component quant/Huffman table selection,
    per-component DC predictors, AND chroma subsampling (round 9:
    sampling factors 1–2 per axis where every component's grid divides
    the max — 4:4:4, 4:2:2, 4:4:0, and the ubiquitous 4:2:0; the
    component planes are decoded at their stored resolution per T.81
    A.2.3 interleaved block ordering, cropped to ceil(dim·fi/fmax),
    and replication-upsampled to full resolution — sample (x, y)
    reads plane[y//ry][x//rx], the integer-exact nearest-neighbor
    upsample). With or without restart intervals (DRI/RSTn:
    byte-aligned modulo-8 marker sequence verified, DC predictors
    reset per T.81 E.1.4) — what build_jpeg / build_jpeg_color /
    build_jpeg_420 emit and the archival-thumbnail shapes. Round 9
    also closed PROGRESSIVE (SOF2) scans: coefficients accumulate
    across scans per T.81 G — DC first/refinement with the point
    transform and two's-complement bit OR, AC first/refinement over
    spectral bands with EOB runs, newly-nonzero ±1<<Al insertion and
    correction bits — then ONE batched dequantize + IDCT at EOI.
    Anything else (12-bit, hierarchical, arithmetic-coded frames,
    sampling factors > 2 or non-dividing ratios) returns None: the
    same fall-back-not-crash contract as decode_png_pixels.
    For ncomp=3 ``pixels`` is row-major channel-interleaved (like the
    PNG RGB path) and no color-space conversion is applied — the
    decoded component values are returned as stored (the YCbCr→RGB
    matrix is a presentation choice, not part of entropy decode —
    ycbcr_to_rgb applies the standard libjpeg fixed-point matrix when
    a pipeline wants RGB — and keeping raw components is what makes
    the stats oracle exact)."""
    import numpy as np

    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        return None
    try:
        qt: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], tuple] = {}
        w = h = None
        progressive = False
        sof_comps: list[tuple[int, int, int, int]] = []  # (id, q, hi, vi)
        restart_interval = 0
        coefs = None   # per-comp (n_blocks, 64) RAW coefficients, natural order
        grids = None   # per-comp (nby, nbx) MCU-padded block grid
        hmax = vmax = 1
        mcux = mcuy = 0
        got_scan = False
        i = 2
        while i + 2 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker == 0xD9:  # EOI: the progression (or single scan) ends
                break
            if 0xD0 <= marker <= 0xD8:  # stray RST/SOI between segments
                return None
            if i + 4 > len(b):
                return None
            seglen = struct.unpack(">H", b[i + 2: i + 4])[0]
            seg = b[i + 4: i + 2 + seglen]
            if marker == 0xDB:  # DQT (possibly several tables)
                j = 0
                while j < len(seg):
                    prec, tid = seg[j] >> 4, seg[j] & 0x0F
                    j += 1
                    if prec == 0:
                        qt[tid] = list(seg[j: j + 64])
                        j += 64
                    else:
                        # one unpack for the 64 contiguous big-endian
                        # u16 entries (was 64 two-byte unpacks); a short
                        # segment raises struct.error either way
                        qt[tid] = list(struct.unpack(">64H", seg[j: j + 128]))
                        j += 128
            elif marker == 0xC4:  # DHT (possibly several tables, any scan)
                j = 0
                while j < len(seg):
                    cls, tid = seg[j] >> 4, seg[j] & 0x0F
                    bits = list(seg[j + 1: j + 17])
                    n = sum(bits)
                    vals = list(seg[j + 17: j + 17 + n])
                    huff[(cls, tid)] = _huffman_table(bits, vals)
                    j += 17 + n
            elif marker in (0xC0, 0xC1, 0xC2):
                # SOF0 baseline / SOF1 extended sequential / SOF2
                # progressive. Baseline is 8-bit by definition (T.81
                # B.2.2); extended sequential and progressive also
                # admit 12-bit samples — round 10 closed that
                # boundary (level shift 2^(P-1), clamp to 2^P-1,
                # uint16 output; Huffman DC categories to 15 and the
                # 16-bit DQT form parse identically).
                if coefs is not None:
                    return None  # second frame header
                progressive = marker == 0xC2
                prec = seg[0]
                h, w = struct.unpack(">HH", seg[1:5])
                ncomp = seg[5]
                allowed = (8,) if marker == 0xC0 else (8, 12)
                if (prec not in allowed or ncomp not in (1, 3)
                        or not w or not h):
                    return None
                for c in range(ncomp):
                    cid, sampling, tq = seg[6 + 3 * c: 9 + 3 * c]
                    hi, vi = sampling >> 4, sampling & 0x0F
                    if not (1 <= hi <= 2 and 1 <= vi <= 2):
                        return None
                    sof_comps.append((cid, tq, hi, vi))
                # Grayscale keeps the 1x1 contract; color accepts any
                # mix of 1/2 factors whose grids divide the max
                # (replication upsample needs integer ratios): 4:4:4,
                # 4:2:2, 4:4:0, 4:2:0. Exotic ratios stay at None.
                hmax = max(c[2] for c in sof_comps)
                vmax = max(c[3] for c in sof_comps)
                if ncomp == 1 and (hmax, vmax) != (1, 1):
                    return None
                if any(hmax % c[2] or vmax % c[3] for c in sof_comps):
                    return None
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                coefs, grids = [], []
                for _, _, hi, vi in sof_comps:
                    nby, nbx = mcuy * vi, mcux * hi
                    grids.append((nby, nbx))
                    coefs.append(np.zeros((nby * nbx, 64), dtype=np.int64))
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # hierarchical / arithmetic-coded SOFs
            elif marker == 0xDD:  # DRI: restart every N MCUs/data units
                restart_interval = struct.unpack(">H", seg[:2])[0]
            elif marker == 0xDA:  # SOS — one of possibly many scans
                if coefs is None:
                    return None
                ns = seg[0]
                scan = []
                for c in range(ns):
                    cs, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                    ci = next((idx for idx, sc in enumerate(sof_comps)
                               if sc[0] == cs), None)
                    if ci is None:
                        return None
                    scan.append((ci, huff.get((0, tabs >> 4)),
                                 huff.get((1, tabs & 0x0F))))
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
                reader = _BitReader(b, i + 2 + seglen)
                if not progressive:
                    # baseline: exactly one full-band interleaved scan
                    if (ns != len(sof_comps) or ss != 0 or se != 63
                            or ah or al):
                        return None
                    _scan_sequential(reader, scan, sof_comps, coefs,
                                     grids, mcux, mcuy, restart_interval)
                elif ss == 0:  # progressive DC scan (first or refine)
                    if se != 0 or (ah and al != ah - 1):
                        return None
                    _scan_dc(reader, scan, sof_comps, coefs, grids,
                             mcux, mcuy, restart_interval, ah, al,
                             w, h, hmax, vmax)
                else:          # progressive AC scan: single component
                    if ns != 1 or se < ss or se > 63 \
                            or (ah and al != ah - 1):
                        return None
                    _scan_ac(reader, scan[0], sof_comps, coefs, grids,
                             restart_interval, ss, se, ah, al,
                             w, h, hmax, vmax)
                got_scan = True
                i = reader.pos
                if i >= len(b) or b[i] != 0xFF:
                    return None  # garbage after the entropy segment
                continue
            i += 2 + seglen
        if not got_scan or coefs is None:
            return None

        # All scans are in: dequantize (DQT is zigzag-ordered — remap
        # to natural, one vectorized scatter), one BATCHED IDCT per
        # component, level shift, clamp, assemble planes, upsample
        # subsampled components, crop. The IDCT A^T·S·A is computed as
        # two flattened (n·8, 8) @ (8, 8) GEMMs (round 13 — measured
        # 7-28x faster than the round-9 einsum, whose c_einsum path is
        # a naive 5-index loop); each output sample is the same 8-term
        # dot products either way, with last-ulp float differences
        # (~1e-13) far below any rounding boundary of the integer-exact
        # fixture pipeline (DC-only blocks IDCT to exact integers), and
        # the rich-AC decode is pinned against an independent matmul
        # reference in tests/test_multimodal.py.
        a = _idct_matrix()
        planes = []
        for ci, (_, tq, hi, vi) in enumerate(sof_comps):
            q = qt.get(tq)
            if q is None:
                return None
            qn = np.zeros(64, dtype=np.float64)
            qn[_zigzag_np()] = q
            nby, nbx = grids[ci]
            blocks = coefs[ci].astype(np.float64) * qn
            shift = float(1 << (prec - 1))
            vmax_px = (1 << prec) - 1
            dtype = np.uint8 if prec == 8 else np.uint16
            c = blocks.reshape(-1, 8) @ a                       # sum over v
            c = (c.reshape(-1, 8, 8).transpose(0, 2, 1)
                 .reshape(-1, 8) @ a)                           # sum over u
            px = c.reshape(-1, 8, 8).transpose(0, 2, 1) + shift
            px = np.clip(np.rint(px), 0, vmax_px).astype(dtype)
            planes.append(
                px.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3)
                .reshape(nby * 8, nbx * 8)
            )
        ncomp = len(sof_comps)
        full = []
        for ci, (_, _, hi, vi) in enumerate(sof_comps):
            cw = (w * hi + hmax - 1) // hmax
            ch = (h * vi + vmax - 1) // vmax
            p = planes[ci][:ch, :cw]
            if hi != hmax or vi != vmax:
                p = np.repeat(np.repeat(p, vmax // vi, axis=0),
                              hmax // hi, axis=1)
            full.append(p[:h, :w])
        if ncomp == 1:
            pixels = full[0].tobytes()
        else:
            pixels = np.stack(full, axis=-1).tobytes()
        # "precision" rides along (8 is the historical implicit value):
        # 12-bit pixels are uint16 little-endian, 2 bytes per sample —
        # consumers that assume byte samples must check this key.
        return {
            "width": int(w), "height": int(h), "n_channels": ncomp,
            "pixels": pixels, "precision": int(prec),
        }
    except (struct.error, IndexError, ValueError):
        return None


# Fixture Huffman tables (spec-valid canonical codes): DC categories
# 0..11 as twelve 4-bit codes; AC with the single EOB symbol as a
# 1-bit code (the block-constant fixtures emit no AC coefficients —
# the decoder handles arbitrary DHTs; tests/test_multimodal drive it
# with richer tables and nonzero ACs through an independent encoder).
_JPEG_DC_BITS = [0, 0, 0, 12] + [0] * 12
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [1] + [0] * 15
_JPEG_AC_VALS = [0x00]


class _BitWriter:
    """MSB-first entropy bit writer with 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)

    def restart(self, n: int) -> None:
        """Byte-align (1-padding) and emit the RSTn marker — markers
        are never byte-stuffed."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (n & 7)])


def build_jpeg(width: int, height: int, content: bytes = b"",
               restart_interval: int = 0) -> bytes:
    """A REAL spec-conformant baseline grayscale JPEG whose decoded
    pixels are EXACTLY predictable: each 8x8 block is constant, with
    block i (raster order, edge blocks included) carrying
    ``content[i % len(content)]``. DC-only blocks with a flat
    quantization table round-trip losslessly through the full
    DCT pipeline — FDCT of a constant block is a lone integer DC
    coefficient 8·(v-128), and the decoder's float IDCT returns
    exactly v — so a SQL oracle can recompute every decoded pixel
    from the source text while the decoder still performs the entire
    baseline path (Huffman, DC prediction, dequantize, IDCT) on a
    file any JPEG reader opens. This mirrors how build_gif pairs
    with the real LZW decoder: honest bytes, oracle-checkable
    content."""
    vals = content or b"\x00"
    bw, bh = (width + 7) // 8, (height + 7) // 8
    wtr = _BitWriter()
    pred = 0
    for i in range(bw * bh):
        if restart_interval and i and i % restart_interval == 0:
            # T.81 restart: byte-align, RSTn (n = modulo-8 sequence),
            # reset the DC predictor
            wtr.restart(i // restart_interval - 1)
            pred = 0
        dc = 8 * (vals[i % len(vals)] - 128)
        diff = dc - pred
        pred = dc
        t = abs(diff).bit_length()
        wtr.write(t, 4)  # DC category code (canonical 4-bit table)
        if t:
            wtr.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        wtr.write(0, 1)  # EOB (1-bit AC code)
    entropy = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, height, width, 1)
              + bytes([1, 0x11, 0]))
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS)
                 + bytes(_JPEG_DC_VALS))
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS)
                 + bytes(_JPEG_AC_VALS))
    dri = (seg(0xDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + dri + sos
            + entropy + b"\xff\xd9")


def build_jpeg_color(width: int, height: int, content: bytes = b"",
                     restart_interval: int = 0) -> bytes:
    """A REAL baseline 3-component (4:4:4, non-subsampled) JPEG with
    the same DC-exact block-constant contract as build_jpeg: MCU i's
    component c (Y=0, Cb=1, Cr=2) carries the constant value
    ``content[(3*i + c) % len(content)]``, so all three decoded
    channel planes are integer-recomputable from the source text.
    Exercises what the grayscale fixture cannot: interleaved MCUs and
    THREE independent DC prediction chains (component c's predictor
    sees only component c's blocks — a decoder that shares one
    predictor across components mis-decodes every block after the
    first and hash-mismatches)."""
    vals = content or b"\x00"
    bw, bh = (width + 7) // 8, (height + 7) // 8
    wtr = _BitWriter()
    preds = [0, 0, 0]
    for i in range(bw * bh):
        if restart_interval and i and i % restart_interval == 0:
            wtr.restart(i // restart_interval - 1)
            preds = [0, 0, 0]
        for c in range(3):
            dc = 8 * (vals[(3 * i + c) % len(vals)] - 128)
            diff = dc - preds[c]
            preds[c] = dc
            t = abs(diff).bit_length()
            wtr.write(t, 4)
            if t:
                wtr.write(diff if diff > 0 else diff + (1 << t) - 1, t)
            wtr.write(0, 1)  # EOB
    entropy = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, height, width, 3)
              + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS)
                 + bytes(_JPEG_DC_VALS))
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS)
                 + bytes(_JPEG_AC_VALS))
    dri = (seg(0xDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + dri + sos
            + entropy + b"\xff\xd9")


def build_jpeg_420(width: int, height: int, content: bytes = b"",
                   restart_interval: int = 0) -> bytes:
    """A REAL baseline 4:2:0 chroma-subsampled JPEG (Y sampling 2x2,
    Cb/Cr 1x1 — the sampling virtually every camera/web JPEG uses)
    with the DC-exact block-constant contract: MCU m covers a 16x16
    pixel area and carries SIX blocks in T.81 interleaved order —
    four Y blocks (raster within the MCU) then one Cb and one Cr —
    where block j of MCU m holds the constant value
    ``content[(6*m + j) % len(content)]``. The chroma blocks span the
    whole MCU at half resolution, so after the decoder's replication
    upsample every pixel (x, y) has a closed-form (Y, Cb, Cr):
      m  = (y // 16) * mcux + (x // 16)
      Yb = 2 * ((y % 16) // 8) + ((x % 16) // 8)
      Y  = content[(6m + Yb) % L],  Cb = content[(6m + 4) % L],
      Cr = content[(6m + 5) % L]
    — SQL-recomputable straight from the source text while the
    decoder runs the full subsampled path (6-block MCUs, three DC
    chains, per-component plane geometry, chroma upsample)."""
    vals = content or b"\x00"
    mcux, mcuy = (width + 15) // 16, (height + 15) // 16
    wtr = _BitWriter()
    preds = [0, 0, 0]
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            wtr.restart(m // restart_interval - 1)
            preds = [0, 0, 0]
        for j in range(6):
            c = 0 if j < 4 else j - 3  # component: Y Y Y Y Cb Cr
            dc = 8 * (vals[(6 * m + j) % len(vals)] - 128)
            diff = dc - preds[c]
            preds[c] = dc
            t = abs(diff).bit_length()
            wtr.write(t, 4)
            if t:
                wtr.write(diff if diff > 0 else diff + (1 << t) - 1, t)
            wtr.write(0, 1)  # EOB
    entropy = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, height, width, 3)
              + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS)
                 + bytes(_JPEG_DC_VALS))
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS)
                 + bytes(_JPEG_AC_VALS))
    dri = (seg(0xDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + dri + sos
            + entropy + b"\xff\xd9")


# Progressive-fixture AC table: the four EOB-run symbols 0x00..0x30
# as canonical 2-bit codes (EOBRUN up to 15 blocks per symbol — the
# block-constant fixtures emit no AC coefficients, so the AC scans
# are pure EOB-run streams; the decoder handles arbitrary tables and
# nonzero progressive ACs, pinned by the independent test encoder).
_JPEG_ACP_BITS = [0, 4] + [0] * 14
_JPEG_ACP_VALS = [0x00, 0x10, 0x20, 0x30]


def build_jpeg_progressive(width: int, height: int,
                           content: bytes = b"") -> bytes:
    """A REAL spec-conformant PROGRESSIVE (SOF2) grayscale JPEG with
    the DC-exact block-constant contract of build_jpeg — seven scans
    exercising the full successive-approximation + spectral-selection
    machinery any progressive reader runs:

      1. DC first scan at Al=4 (diff-coded point-transformed DC);
      2-5. four DC refinement scans (Ah=4→Al=3 … Ah=1→Al=0), one raw
         bit per block — dc = 8·(v-128) makes the Al=3 bit carry real
         data ((v-128) & 1) while the lower scans carry structural
         zeros, so refinement is exercised with both bit values;
      6-7. two AC first scans split over spectral bands 1-5 and 6-63,
         coded entirely as EOB RUNS (all ACs are zero for
         block-constant content) with genuine 2^r+extra run lengths.

    Because (dc>>4)<<4 OR the refined bits reconstructs dc exactly in
    two's complement, the decoded pixels equal build_jpeg's closed
    form: block i carries content[i % len(content)] — a SQL oracle
    recomputes every pixel while the decoder walks a real multi-scan
    progression."""
    vals = content or b"\x00"
    bw, bh = (width + 7) // 8, (height + 7) // 8
    nb = bw * bh
    dcs = [8 * (vals[i % len(vals)] - 128) for i in range(nb)]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos(ss: int, se: int, ah: int, al: int, entropy: bytes) -> bytes:
        return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
                   ) + entropy

    wtr = _BitWriter()
    pred = 0
    for dc in dcs:
        v = dc >> 4
        diff = v - pred
        pred = v
        t = abs(diff).bit_length()
        wtr.write(t, 4)
        if t:
            wtr.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    scans = sos(0, 0, 0, 4, wtr.flush())
    for al in (3, 2, 1, 0):
        wtr = _BitWriter()
        for dc in dcs:
            wtr.write((dc >> al) & 1, 1)
        scans += sos(0, 0, al + 1, al, wtr.flush())
    for ss, se in ((1, 5), (6, 63)):
        wtr = _BitWriter()
        left = nb
        while left > 0:
            chunk = min(left, 15)
            r = chunk.bit_length() - 1
            wtr.write(r, 2)           # canonical code for symbol (r<<4)|0
            if r:
                wtr.write(chunk - (1 << r), r)
            left -= chunk
        scans += sos(ss, se, 0, 0, wtr.flush())

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC2, struct.pack(">BHHB", 8, height, width, 1)
              + bytes([1, 0x11, 0]))
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS)
                 + bytes(_JPEG_DC_VALS))
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(_JPEG_ACP_BITS)
                 + bytes(_JPEG_ACP_VALS))
    return (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + scans
            + b"\xff\xd9")


# libjpeg's fixed-point YCbCr->RGB coefficients: round(c * 65536) for
# c in (1.402, 0.344136, 0.714136, 1.772), applied with a +32768
# rounding bias and an ARITHMETIC >> 16 (floor — Python, numpy, and
# DuckDB's >> all agree on negative operands, unlike their integer
# divisions, which is what makes the conversion oracle-exact).
_YCC_R_CR = 91881
_YCC_G_CB = 22554
_YCC_G_CR = 46802
_YCC_B_CB = 116130


def ycbcr_to_rgb(pixels: bytes, n_pixels: int):
    """Integer-exact JFIF YCbCr→RGB over a channel-interleaved uint8
    buffer (decode_jpeg_pixels' ncomp=3 output) → (r, g, b) int64
    numpy arrays, each value already clamped to 0..255. The matrix is
    the standard libjpeg fixed-point form — a deterministic pure
    function of (Y, Cb, Cr), so a SQL oracle reproduces it with the
    same multiply/bias/shift."""
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(n_pixels, 3)
    y = arr[:, 0].astype(np.int64)
    cb = arr[:, 1].astype(np.int64) - 128
    cr = arr[:, 2].astype(np.int64) - 128
    r = np.clip(y + ((_YCC_R_CR * cr + 32768) >> 16), 0, 255)
    g = np.clip(y - ((_YCC_G_CB * cb + _YCC_G_CR * cr + 32768) >> 16),
                0, 255)
    b = np.clip(y + ((_YCC_B_CB * cb + 32768) >> 16), 0, 255)
    return r, g, b


def synthesize_color_jpegs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Color-JPEG fixture generator: width = doc_id%24+1, height =
    doc_id%20+1, channel values from the text bytes at stride 3
    (build_jpeg_color's arithmetic — SQL-recomputable). Odd doc_ids
    carry a 2-MCU restart interval (see synthesize_jpegs)."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                build_jpeg_color(
                    int(doc_id) % 24 + 1,
                    int(doc_id) % 20 + 1,
                    ("" if text is None else str(text)).encode("utf-8"),
                    restart_interval=2 if int(doc_id) % 2 else 0,
                )
                for doc_id, text in zip(pdf["doc_id"], pdf[text_col])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )
    return docs.select("doc_id", text_col).mapInPandas(synth, schema)


JPEG_COLOR_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("y_sum", LongType()),
        StructField("cb_sum", LongType()),
        StructField("cr_sum", LongType()),
    ]
)


def jpeg_color_stats(blobs: DataFrame) -> DataFrame:
    """Per-channel sums from REAL interleaved-MCU color JPEG decode —
    three independent Huffman/DC-prediction chains verified in one
    hash; undecodable payloads yield NULL stats."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("width", "height", "n_pixels", "y_sum", "cb_sum",
                     "cr_sum")}
            for p in pdf["payload"]:
                dec = decode_jpeg_pixels(bytes(p) if p is not None else b"")
                if (dec is None or dec.get("n_channels") != 3
                        or dec.get("precision", 8) != 8):
                    for k in rows:
                        rows[k].append(None)
                    continue
                arr = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(
                    -1, 3
                ).astype(np.int64)
                sums = arr.sum(axis=0)
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["n_pixels"].append(dec["width"] * dec["height"])
                rows["y_sum"].append(int(sums[0]))
                rows["cb_sum"].append(int(sums[1]))
                rows["cr_sum"].append(int(sums[2]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **rows})

    return blobs.mapInPandas(stats, JPEG_COLOR_STATS_SCHEMA)


def synthesize_jpeg420s(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """4:2:0 JPEG fixture generator: width = doc_id%36+1, height =
    doc_id%26+1 (cycles that exercise every MCU edge shape, including
    widths <= 8 where a whole Y-block column of the rightmost MCU is
    cropped away), six block-constant values per MCU from the text
    bytes at stride 6 (build_jpeg_420's arithmetic — SQL-
    recomputable). Odd doc_ids carry a 2-MCU restart interval, so the
    mixed corpus hash-gates DRI under subsampled 6-block MCUs too."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                build_jpeg_420(
                    int(doc_id) % 36 + 1,
                    int(doc_id) % 26 + 1,
                    ("" if text is None else str(text)).encode("utf-8"),
                    restart_interval=2 if int(doc_id) % 2 else 0,
                )
                for doc_id, text in zip(pdf["doc_id"], pdf[text_col])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )
    return docs.select("doc_id", text_col).mapInPandas(synth, schema)


JPEG_RGB_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("r_sum", LongType()),
        StructField("g_sum", LongType()),
        StructField("b_sum", LongType()),
    ]
)


def jpeg_rgb_stats(blobs: DataFrame) -> DataFrame:
    """Per-channel RGB sums from REAL subsampled-JPEG decode —
    entropy decode of 6-block 4:2:0 MCUs, per-component plane
    geometry, chroma replication upsample, then the fixed-point
    YCbCr→RGB matrix (ycbcr_to_rgb) — one Arrow kernel, blobs never
    driver-side. Undecodable or non-color payloads yield NULL stats
    (fall-back contract)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("width", "height", "n_pixels", "r_sum", "g_sum",
                     "b_sum")}
            for p in pdf["payload"]:
                dec = decode_jpeg_pixels(bytes(p) if p is not None else b"")
                if (dec is None or dec.get("n_channels") != 3
                        or dec.get("precision", 8) != 8):
                    for k in rows:
                        rows[k].append(None)
                    continue
                n = dec["width"] * dec["height"]
                r, g, bch = ycbcr_to_rgb(dec["pixels"], n)
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["n_pixels"].append(n)
                rows["r_sum"].append(int(r.sum()))
                rows["g_sum"].append(int(g.sum()))
                rows["b_sum"].append(int(bch.sum()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **rows})

    return blobs.mapInPandas(stats, JPEG_RGB_STATS_SCHEMA)


def synthesize_jpegs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """JPEG fixture generator (companion to synthesize_gifs): each
    doc's utf-8 bytes become the block-constant values of a REAL
    baseline JPEG, width = doc_id%40+1, height = doc_id%28+1 —
    arithmetic a SQL oracle can recompute (see build_jpeg's
    losslessness argument). Odd doc_ids are encoded WITH a restart
    interval of 3 MCUs (DRI + modulo-8 RSTn markers + per-segment DC
    predictor resets): decoded pixels are identical either way, so
    the mixed corpus hash-gates the restart machinery end to end —
    the same mixed-encoding pattern as the interlaced GIF corpus."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                build_jpeg(
                    int(doc_id) % 40 + 1,
                    int(doc_id) % 28 + 1,
                    ("" if text is None else str(text)).encode("utf-8"),
                    restart_interval=3 if int(doc_id) % 2 else 0,
                )
                for doc_id, text in zip(pdf["doc_id"], pdf[text_col])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )
    return docs.select("doc_id", text_col).mapInPandas(synth, schema)


def synthesize_progressive_jpegs(docs: DataFrame,
                                 text_col: str = "text") -> DataFrame:
    """PROGRESSIVE-JPEG fixture generator (round 9): width =
    doc_id%44+1, height = doc_id%22+1, block values from the text
    bytes (build_jpeg_progressive's arithmetic — identical closed
    form to build_jpeg, but delivered through a seven-scan SOF2
    progression with successive approximation and spectral
    selection)."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                build_jpeg_progressive(
                    int(doc_id) % 44 + 1,
                    int(doc_id) % 22 + 1,
                    ("" if text is None else str(text)).encode("utf-8"),
                )
                for doc_id, text in zip(pdf["doc_id"], pdf[text_col])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )
    return docs.select("doc_id", text_col).mapInPandas(synth, schema)


def jpeg_pixel_stats(blobs: DataFrame) -> DataFrame:
    """Per-JPEG statistics from REAL entropy-decoded, IDCT'd pixels
    (decode_jpeg_pixels) — same exact-integer contract as
    gif_pixel_stats; undecodable payloads yield NULL stats."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("width", "height", "n_pixels", "px_sum", "mean_pixel_e4")}
            for p in pdf["payload"]:
                dec = decode_jpeg_pixels(bytes(p) if p is not None else b"")
                if dec is None or dec.get("precision", 8) != 8:
                    for k in rows:
                        rows[k].append(None)
                    continue
                arr = np.frombuffer(dec["pixels"], dtype=np.uint8)
                n = dec["width"] * dec["height"]
                s = int(arr.sum())
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["n_pixels"].append(n)
                rows["px_sum"].append(s)
                rows["mean_pixel_e4"].append((10000 * s) // n if n else None)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **rows})

    return blobs.mapInPandas(stats, GIF_PIXEL_STATS_SCHEMA)


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
    embedding — a normalized value histogram over the blob's DECODED
    PIXELS when the payload is a PNG this decoder supports
    (decode_png_pixels — real zlib+filter-reversal decode), falling
    back to the raw-byte histogram for other payloads (the
    deterministic stand-in for codec encoders not in this container:
    CLIP, wav2vec, …; the output shape matches either way — fixed-dim
    float vector per blob).

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
                raw = bytes(p) if p is not None else b""
                dec = decode_png_pixels(raw)
                src = dec["pixels"] if dec is not None else raw
                arr = np.frombuffer(src, dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * n_bins)
                    continue
                hist, _ = np.histogram(arr, bins=n_bins, range=(0, 256))
                feats.append((hist / arr.size).astype("float32").tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return blobs.mapInPandas(extract, schema)


PNG_PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_channels", LongType()),
        StructField("n_pixels", LongType()),
        StructField("px_sum", LongType()),
        StructField("mean_pixel_e4", LongType()),
    ]
)


def png_pixel_stats(blobs: DataFrame) -> DataFrame:
    """Per-PNG statistics computed from REAL decoded pixels
    (decode_png_pixels): dimensions, channel count, pixel count, exact
    pixel-value sum, and the mean pixel value in integer ten-thousandths
    (``(10000*sum) div n`` — integer arithmetic, so a SQL oracle can
    recompute it bit-exactly with no float-rounding hazard).
    Undecodable payloads yield NULL stats rather than failing the
    batch. Arrow-batched mapInPandas; blobs stay executor-side."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("width", "height", "n_channels", "n_pixels",
                     "px_sum", "mean_pixel_e4")}
            for p in pdf["payload"]:
                dec = decode_png_pixels(bytes(p) if p is not None else b"")
                if dec is None:
                    for k in rows:
                        rows[k].append(None)
                    continue
                arr = np.frombuffer(dec["pixels"], dtype=np.uint8)
                n = dec["width"] * dec["height"] * dec["n_channels"]
                s = int(arr.sum())
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["n_channels"].append(dec["n_channels"])
                rows["n_pixels"].append(n)
                rows["px_sum"].append(s)
                rows["mean_pixel_e4"].append((10000 * s) // n if n else None)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **rows})

    return blobs.mapInPandas(stats, PNG_PIXEL_STATS_SCHEMA)


def resize_pixels_box(pixels: bytes, w: int, h: int,
                      factor: int,
                      channels: int = 1) -> tuple[bytes, int, int] | None:
    """Integer box-downsample of a row-major (channel-interleaved when
    ``channels`` > 1) pixel buffer: output (w//factor, h//factor),
    each output sample the FLOOR of its channel's factor×factor
    source-block mean — pure integer arithmetic, so a SQL oracle can
    recompute the resized stream exactly. Trailing rows/columns that
    don't fill a block are dropped (the standard box contract). None
    when either output dimension would be zero."""
    import numpy as np

    ow, oh = w // factor, h // factor
    if ow < 1 or oh < 1:
        return None
    arr = np.frombuffer(pixels, dtype=np.uint8,
                        count=w * h * channels).reshape(h, w, channels)
    blocks = arr[: oh * factor, : ow * factor, :].astype(np.uint32)
    sums = blocks.reshape(oh, factor, ow, factor, channels).sum(axis=(1, 3))
    out = (sums // (factor * factor)).astype(np.uint8)
    return out.tobytes(), ow, oh


def _gif_identity_grayscale(b: bytes) -> bool:
    """True iff a GIF's palette INDEXES are its pixel VALUES: the
    global color table is the identity grayscale ramp (entry j ==
    (j, j, j)) and the first image descriptor carries no local color
    table. resize_media box-averages indexes, which is only
    semantically a pixel average under this palette — build_gif's
    output qualifies; an arbitrary real-world color table must fall
    back to NULL instead of being silently index-averaged into a
    wrong thumbnail (round-9 guard)."""
    try:
        packed = b[10]
        if not packed & 0x80:
            return False
        n = 2 << (packed & 0x07)
        gct = b[13: 13 + 3 * n]
        if len(gct) < 3 * n:
            return False
        for j in range(n):
            if gct[3 * j] != j or gct[3 * j + 1] != j or gct[3 * j + 2] != j:
                return False
        i = 13 + 3 * n
        while i < len(b):
            blk = b[i]
            if blk == 0x21:
                i += 2
                while b[i] != 0:
                    i += 1 + b[i]
                i += 1
            elif blk == 0x2C:
                return not (b[i + 9] & 0x80)
            else:
                return False
        return False
    except IndexError:
        return False


def _resample_wav(wav: dict, factor: int) -> bytes | None:
    """Integer box-resample of decoded PCM (round 9 — the audio leg
    of resize_media): every ``factor`` consecutive FRAMES collapse to
    one whose per-channel sample is floor(frame_sum / factor), and
    the result is re-encoded at rate//factor in the source bit depth
    — the 1-D analogue of the image box-downsample, same pure-integer
    contract so a SQL oracle recomputes every output sample. None
    when fewer than ``factor`` frames or the rate would hit zero."""
    import numpy as np

    s = wav["samples"]
    nch = wav["n_channels"]
    bits = wav["bit_depth"]
    rate = wav["sample_rate_hz"] // factor
    frames = s.size // nch
    of = frames // factor
    if of < 1 or rate < 1:
        return None
    a = s[: of * factor * nch].astype(np.int64).reshape(of, factor, nch)
    out = a.sum(axis=1) // factor
    if bits == 16:
        pcm = out.astype("<i2").tobytes()
    else:
        pcm = out.astype(np.uint8).tobytes()
    return build_wav(nch, rate, bits, pcm)


def transcode_media(blobs: DataFrame, to: str = "png") -> DataFrame:
    """Format-converting re-encode (round 9 — the transcode half of
    the thumbnail pipeline): decode any supported still image —
    PNG (gray/RGB), identity-palette GIF, baseline JPEG including
    4:2:0 chroma-subsampled color — and re-encode the decoded pixel
    buffer as a lossless PNG of the same dimensions/channel count.
    Binary→binary Arrow pandas UDF like resize_media (payloads stay
    executor-side); non-image, unsupported-shape, or
    non-identity-palette-GIF payloads yield NULL. JPEG components are
    carried RAW (no color matrix — decode_jpeg_pixels' contract), so
    the transcoded PNG is a lossless container for the decoded
    planes and every byte is oracle-recomputable."""
    if to != "png":
        raise ValueError("transcode_media supports to='png'")
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    @pandas_udf(BinaryType())
    def _trans(payloads: pd.Series) -> pd.Series:
        def one(p) -> bytes | None:
            if p is None:
                return None
            b = bytes(p)
            dec = decode_png_pixels(b)
            if dec is None:
                g = decode_gif_pixels(b)
                if g is not None:
                    if not _gif_identity_grayscale(b):
                        return None
                    dec = {"width": g["width"], "height": g["height"],
                           "n_channels": 1, "pixels": g["pixels"]}
                else:
                    dec = decode_jpeg_pixels(b)
                    if dec is not None and dec.get("precision", 8) != 8:
                        dec = None  # PNG re-encode is 8-bit only here
            if dec is None or dec["n_channels"] not in (1, 3):
                return None
            return build_png(dec["width"], dec["height"], dec["pixels"],
                             n_channels=dec["n_channels"])

        return payloads.map(one)

    return blobs.withColumn("payload", _trans(F.col("payload")))


def resize_media(blobs: DataFrame, factor: int = 2) -> DataFrame:
    """REAL thumbnail transform — round 8 replaced the r4 byte-stub
    (defensible when no codecs existed; the repo now ships genuine
    PNG and GIF codecs in BOTH directions): decode → integer
    box-downsample by ``factor`` → re-encode, inside an Arrow-batched
    pandas UDF (payloads stay executor-side, one Arrow batch per
    ~10k rows, binary in → binary out so downstream stages compose).

    Formats: 8-bit grayscale PNG (decode_png_pixels → block mean →
    build_png) and GIF (decode_gif_pixels, de-interlacing if needed →
    block mean over palette indexes — VERIFIED first to be a real
    pixel average via _gif_identity_grayscale; a GIF with an
    arbitrary color table falls back to NULL rather than being
    index-averaged wrong → sequential re-encode). Each output
    pixel is floor(block_sum / factor²) — integer math end to end,
    which is what lets the multimodal_resize_stats oracle recompute
    the resized stream from the source text. RGB PNG (color type 2)
    resizes per channel over the interleaved stream, and WAV audio
    box-resamples frames at rate//factor (round 9 — gated by
    multimodal_resize_rgb_stats / multimodal_resample_stats).
    Anything else (JPEG, non-identity-palette GIF, media smaller
    than ``factor``) yields a NULL payload: the same
    fall-back-not-crash contract as the decoders.
    tests/test_multimodal.py pins round-trip parity against a
    straight numpy downsample of the decoded source pixels."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    @pandas_udf(BinaryType())
    def _resize(payloads: pd.Series) -> pd.Series:
        def one(p) -> bytes | None:
            if p is None:
                return None
            b = bytes(p)
            dec = decode_png_pixels(b)
            if dec is not None and dec["n_channels"] in (1, 3):
                r = resize_pixels_box(
                    dec["pixels"], dec["width"], dec["height"], factor,
                    channels=dec["n_channels"],
                )
                if r is None:
                    return None
                out, ow, oh = r
                return build_png(ow, oh, out,
                                 n_channels=dec["n_channels"])
            gif = decode_gif_pixels(b)
            if gif is not None and _gif_identity_grayscale(b):
                r = resize_pixels_box(
                    gif["pixels"], gif["width"], gif["height"], factor
                )
                if r is None:
                    return None
                out, ow, oh = r
                return build_gif(ow, oh, out)
            wav = decode_wav_samples(b)
            if wav is not None:
                return _resample_wav(wav, factor)
            return None

        return payloads.map(one)

    return blobs.withColumn("payload", _resize(F.col("payload")))


# ---------------------------------------------------------------------------
# Perceptual image hashing (round 10): the pipeline endpoint the real
# decoders enable — image-CONTENT near-dup evidence, format-agnostic.
# ---------------------------------------------------------------------------

IMAGE_DHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("phash", LongType())]
)


def dhash56(pixels: bytes, w: int, h: int, nch: int = 1) -> int:
    """56-bit difference hash over an 8x8 center-sampled luminance
    grid — the classic dHash (public technique: compare adjacent
    cells of a small resample, one bit per comparison), specified
    here in EXACT integer arithmetic so a SQL oracle can recompute
    it from the closed-form fixtures:

      gray(y, x)  = sum(channels) // nch            (identity for 1ch)
      rr[r]       = ((2r+1) * h) // 16,  r in 0..7  (row centers)
      cc[c]       = ((2c+1) * w) // 16,  c in 0..7  (col centers)
      bit(r, c)   = gray(rr[r], cc[c]) > gray(rr[r], cc[c+1]),
                    c in 0..6
      phash       = sum over set bits of 2^(r*7 + c)   (< 2^56)

    Center SAMPLING (not box averaging) keeps every cell well-defined
    for images smaller than the grid (w or h < 8 just resamples the
    same pixels) and keeps the oracle a flat 64-term expression.
    56 bits (8 rows x 7 horizontal diffs) stay strictly positive in a
    signed BIGINT on every engine. Returns the hash as int."""
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w * nch)
    if nch > 1:
        arr = arr.reshape(h, w, nch).sum(axis=2, dtype=np.int64) // nch
    rr = ((2 * np.arange(8) + 1) * h) // 16
    cc = ((2 * np.arange(8) + 1) * w) // 16
    g = arr[np.ix_(rr, cc)].astype(np.int64)
    bits = (g[:, :7] > g[:, 1:]).astype(np.uint64).ravel()
    return int((bits << np.arange(56, dtype=np.uint64)).sum())


def image_dhash(blobs: DataFrame) -> DataFrame:
    """(doc_id, phash) perceptual hashes for an image-blob relation —
    format-SNIFFING: each payload is routed by magic bytes to the real
    PNG / GIF / baseline+progressive-JPEG decoder and the decoded
    display-order pixels feed dhash56, so the SAME content hashes to
    the SAME value regardless of container (pinned by
    tests/test_image_phash.py::test_cross_format_same_hash).
    Undecodable payloads yield NULL. Arrow-batched mapInPandas, scan
    local — the dedup shuffle happens downstream on the hash bands
    (operators/dedup.phash_near_dup_pairs)."""
    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                b = bytes(p) if p is not None else b""
                dec = None
                if b[:8] == b"\x89PNG\r\n\x1a\n":
                    dec = decode_png_pixels(b)
                elif b[:6] in (b"GIF87a", b"GIF89a"):
                    dec = decode_gif_pixels(b)
                elif b[:2] == b"\xff\xd8":
                    dec = decode_jpeg_pixels(b)
                    if dec is not None and dec.get("precision", 8) != 8:
                        dec = None  # dhash56 reads byte samples
                if dec is None:
                    out.append(None)
                    continue
                out.append(dhash56(
                    dec["pixels"], dec["width"], dec["height"],
                    dec.get("n_channels", 1),
                ))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": out})

    return blobs.mapInPandas(hashes, IMAGE_DHASH_SCHEMA)


# ---------------------------------------------------------------------------
# 12-bit JPEG (round 10): extended-sequential SOF1 frames — the last
# sequential-decode boundary, closed. Fixture tables: 16 DC
# categories (12-bit DC diffs reach category 15) as sixteen 5-bit
# canonical codes; AC stays the 1-bit EOB (DC-exact blocks).
# ---------------------------------------------------------------------------

_JPEG12_DC_BITS = [0, 0, 0, 0, 16] + [0] * 11
_JPEG12_DC_VALS = list(range(16))


def build_jpeg_12bit(width: int, height: int, content: bytes = b"",
                     restart_interval: int = 0) -> bytes:
    """A REAL 12-bit extended-sequential (SOF1) grayscale JPEG with
    the same DC-exact block-constant contract as build_jpeg: block i
    carries the 12-bit value ``v12 = b*16 + b//16`` of byte
    b = content[i % len(content)] (b=255 → 4095, spanning the full
    12-bit range so a truncating decoder can't pass). FDCT of a
    constant block is the lone DC coefficient 8*(v - 2048) (level
    shift 2^11 per T.81 A.3.1), round-tripped losslessly through the
    flat quant table and float IDCT. The DQT is written in its 16-BIT
    form (Pq=1) so the two-byte-entry parse path is exercised, and
    the DC table carries 16 categories (diffs reach ±32760 →
    category 15)."""
    vals = content or b"\x00"
    bw, bh = (width + 7) // 8, (height + 7) // 8
    wtr = _BitWriter()
    pred = 0
    for i in range(bw * bh):
        if restart_interval and i and i % restart_interval == 0:
            wtr.restart(i // restart_interval - 1)
            pred = 0
        b = vals[i % len(vals)]
        v12 = b * 16 + b // 16
        dc = 8 * (v12 - 2048)
        diff = dc - pred
        pred = dc
        t = abs(diff).bit_length()
        wtr.write(t, 5)  # DC category (canonical 5-bit table, 0..15)
        if t:
            wtr.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        wtr.write(0, 1)  # EOB
    entropy = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x10]) + b"".join(
        struct.pack(">H", 1) for _ in range(64)))
    sof = seg(0xC1, struct.pack(">BHHB", 12, height, width, 1)
              + bytes([1, 0x11, 0]))
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(_JPEG12_DC_BITS)
                 + bytes(_JPEG12_DC_VALS))
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS)
                 + bytes(_JPEG_AC_VALS))
    dri = (seg(0xDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + dri + sos
            + entropy + b"\xff\xd9")


def synthesize_jpegs_12bit(docs: DataFrame,
                           text_col: str = "text") -> DataFrame:
    """12-bit JPEG fixture corpus: width = doc_id%36+1, height =
    doc_id%20+1, block values v12 = b*16 + b//16 from the doc's
    bytes; odd doc_ids carry a 3-MCU restart interval (same mixed
    pattern as the 8-bit corpus, so DC-predictor resets are gated in
    the 12-bit range too)."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                build_jpeg_12bit(
                    int(doc_id) % 36 + 1,
                    int(doc_id) % 20 + 1,
                    ("" if text is None else str(text)).encode("utf-8"),
                    restart_interval=3 if int(doc_id) % 2 else 0,
                )
                for doc_id, text in zip(pdf["doc_id"], pdf[text_col])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )
    return docs.select("doc_id", text_col).mapInPandas(synth, schema)


JPEG12_PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("px_sum", LongType()),
        StructField("px_max", LongType()),
        StructField("mean_pixel_e4", LongType()),
    ]
)


def jpeg12_pixel_stats(blobs: DataFrame) -> DataFrame:
    """Per-image statistics from REAL 12-bit entropy-decoded pixels:
    uint16 little-endian samples (decode_jpeg_pixels precision=12),
    exact integer sum, the sample MAX (proves values genuinely
    exceed the 8-bit range — a truncating decoder caps at 255 and
    hash-mismatches), and the integer-e4 mean. 8-bit or undecodable
    payloads yield NULL stats."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("width", "height", "n_pixels",
                                    "px_sum", "px_max", "mean_pixel_e4")}
            for p in pdf["payload"]:
                dec = decode_jpeg_pixels(bytes(p) if p is not None else b"")
                if dec is None or dec.get("precision", 8) != 12:
                    for k in rows:
                        rows[k].append(None)
                    continue
                arr = np.frombuffer(dec["pixels"], dtype=np.uint16)
                n = dec["width"] * dec["height"]
                s = int(arr.sum(dtype=np.int64))
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["n_pixels"].append(n)
                rows["px_sum"].append(s)
                rows["px_max"].append(int(arr.max()) if n else None)
                rows["mean_pixel_e4"].append((10000 * s) // n if n else None)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **rows})

    return blobs.mapInPandas(stats, JPEG12_PIXEL_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Audio content fingerprint (round 10): the WAV analogue of the image
# dHash — energy-envelope difference hash over REAL decoded PCM.
# ---------------------------------------------------------------------------

AUDIO_FP_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("afp", LongType())]
)


def audio_fp56(samples, n_windows: int = 57) -> int:
    """56-bit energy-envelope difference hash over decoded PCM (the
    audio twin of dhash56, same exact-integer contract): split the
    interleaved sample stream into ``n_windows`` integer-boundary
    windows (window b covers [b*n//57, (b+1)*n//57)), per-window
    energy E_b = sum |s_i| (exact int), bit b = E_b > E_{b+1} for
    b in 0..55, hash = sum of 2^b — strictly positive in a signed
    BIGINT. Robust to small sample perturbations (a changed byte
    moves one window's energy, flipping at most two adjacent bits)
    and trivially SQL-recomputable; empty windows (streams shorter
    than 57 samples) contribute energy 0 on both engines."""
    import numpy as np

    s = np.abs(np.asarray(samples, dtype=np.int64))
    n = s.size
    bounds = (np.arange(n_windows + 1) * n) // n_windows
    cs = np.concatenate(([0], np.cumsum(s)))
    e = cs[bounds[1:]] - cs[bounds[:-1]]
    bits = (e[:-1] > e[1:]).astype(np.uint64)
    return int((bits << np.arange(n_windows - 1, dtype=np.uint64)).sum())


def audio_fingerprint(blobs: DataFrame) -> DataFrame:
    """(doc_id, afp) content fingerprints for an audio-blob relation:
    container-dispatching PCM decode (decode_audio_samples — WAV or
    FLAC since round 11, magic-byte routed) feeding audio_fp56 inside
    one Arrow mapInPandas kernel — scan-local; the dedup shuffle
    happens downstream on the hash bands (the SAME
    operators/dedup.phash_near_dup_pairs operator the image pipeline
    uses — the banding is modality-agnostic). Same PCM in either
    container ⇒ same fingerprint, so WAV↔FLAC copies surface as
    Hamming-0 near-dups with zero extra logic (the image tier's
    cross-format property, now true for audio). Undecodable payloads
    yield NULL."""
    def fps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                dec = decode_audio_samples(bytes(p) if p is not None else b"")
                out.append(None if dec is None
                           else audio_fp56(dec["samples"]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "afp": out})

    return blobs.mapInPandas(fps, AUDIO_FP_SCHEMA)


# ---------------------------------------------------------------------------
# Animated GIF (round 10): multi-frame decode — the video modality's
# decode + frame-sample path made REAL (previously only the offset
# lattice was; frames now come from a genuine animation container).
# ---------------------------------------------------------------------------

def build_gif_animated(width: int, height: int,
                       frames: list) -> bytes:
    """A REAL animated GIF89a: NETSCAPE2.0 looping application
    extension, then per frame a graphic-control extension (2
    centiseconds, no disposal) and a full-canvas image descriptor
    whose palette indexes are that frame's content cycled to
    width*height, LZW-encoded by the canonical growing-table encoder.
    Any GIF reader animates it; decode_gif_frames returns exactly the
    per-frame index streams."""
    header = b"GIF89a" + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    palette = bytes(v for g in range(256) for v in (g, g, g))
    netscape = (b"\x21\xFF\x0BNETSCAPE2.0"
                b"\x03\x01\x00\x00\x00")
    out = bytearray(header + palette + netscape)
    for content in frames:
        pix = (content or b"\x00") * (
            (width * height) // max(len(content), 1) + 1)
        idx = pix[: width * height]
        out += b"\x21\xF9\x04\x00\x02\x00\x00\x00"  # GCE: 2cs delay
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        stream = _lzw_encode(bytes(idx), 8)
        out += bytes([8])
        for off in range(0, len(stream), 255):
            chunk = stream[off: off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def decode_gif_frames(payload: bytes) -> dict | None:
    """REAL multi-frame GIF decode: the round-6 single-image walker
    generalized over the whole data stream — every image descriptor's
    sub-blocks are reassembled and LZW-decompressed in order,
    extensions (graphic control, application, comment) are skipped by
    their sub-block framing. Full-canvas, non-interlaced frames with
    the global color table (what build_gif_animated emits and the
    common screen-capture shape); sub-rectangle or per-frame-palette
    animations return None — the documented fall-back-not-crash
    contract. Returns ``{"width", "height", "n_frames",
    "frames": [bytes, ...]}`` (palette indexes, row-major)."""
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        sw, sh = struct.unpack("<HH", b[6:10])
        packed = b[10]
        i = 13
        if packed & 0x80:
            i += 3 * (2 << (packed & 0x07))
        frames = []
        while i < len(b):
            blk = b[i]
            if blk == 0x21:  # extension
                i += 2
                while b[i] != 0:
                    i += 1 + b[i]
                i += 1
            elif blk == 0x2C:  # image descriptor
                x0, y0, w, h = struct.unpack("<HHHH", b[i + 1: i + 9])
                ipacked = b[i + 9]
                i += 10
                if (x0, y0, w, h) != (0, 0, sw, sh):
                    return None  # sub-rect frame: unsupported shape
                if ipacked & 0x80 or ipacked & 0x40:
                    return None  # local palette / interlaced frame
                min_code = b[i]
                i += 1
                data = bytearray()
                while b[i] != 0:
                    n = b[i]
                    data += b[i + 1: i + 1 + n]
                    i += 1 + n
                i += 1
                pixels = _lzw_decode(bytes(data), min_code)[: w * h]
                if len(pixels) < w * h:
                    return None
                frames.append(bytes(pixels))
            elif blk == 0x3B:
                break
            else:
                return None
        if not frames:
            return None
        return {"width": int(sw), "height": int(sh),
                "n_frames": len(frames), "frames": frames}
    except (struct.error, IndexError, ValueError):
        return None


GIF_FRAMES_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("px_sum", LongType()),
        StructField("weighted_sum", LongType()),
    ]
)


def gif_frames_stats(blobs: DataFrame) -> DataFrame:
    """Per-animation statistics from REAL multi-frame decode: frame
    count, exact total index sum, and the FRAME-ORDER-SENSITIVE
    checksum sum((f+1) * frame_sum) — a decoder that drops, repeats,
    or reorders frames hash-mismatches even when the totals agree."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("width", "height", "n_frames",
                                    "px_sum", "weighted_sum")}
            for p in pdf["payload"]:
                dec = decode_gif_frames(bytes(p) if p is not None else b"")
                if dec is None:
                    for k in rows:
                        rows[k].append(None)
                    continue
                sums = [int(np.frombuffer(f, np.uint8)
                            .sum(dtype=np.int64))
                        for f in dec["frames"]]
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["n_frames"].append(dec["n_frames"])
                rows["px_sum"].append(sum(sums))
                rows["weighted_sum"].append(
                    sum((f + 1) * s for f, s in enumerate(sums)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **rows})

    return blobs.mapInPandas(stats, GIF_FRAMES_STATS_SCHEMA)


def decode_video_frames(payload: bytes) -> dict | None:
    """Container-dispatching VIDEO decode (round 12): GIF87a/89a →
    decode_gif_frames, RIFF('AVI ') → MJPEG decode_avi_frames
    (operators/avi), anything else None — the video twin of
    decode_audio_samples' WAV/FLAC dispatch. Both decoders return the
    same ``{"width", "height", "n_frames", "frames"}`` dict (AVI adds
    "n_channels"), so the same frame content hashes identically
    whichever container it arrived in (pinned by
    tests/test_avi.py::test_gif_mjpeg_twins_hash_hamming_zero)."""
    b = bytes(payload)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_frames(b)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        from .avi import decode_avi_frames

        return decode_avi_frames(b)
    return None


VIDEO_FRAME_HASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("fhash", LongType()),
    ]
)


def video_frame_hashes(blobs: DataFrame, stride: int = 2) -> DataFrame:
    """Frame-SAMPLED perceptual hashes for an animation corpus: every
    ``stride``-th decoded frame (the frame-sampling knob a video
    pipeline turns — decode cost scales with sampled frames, not
    stored frames) through dhash56. One row per (doc, sampled frame);
    undecodable payloads contribute no rows. Container-SNIFFING since
    round 12 (decode_video_frames: GIF89a or MJPEG/AVI through one
    kernel), so cross-container duplicates pair at identical hashes.
    The video near-dup decision buckets on the frame hash downstream
    (plans/extensions.dedup_video_frames) — the winnowing shape with
    frames in place of k-gram fingerprints."""
    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hs = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                dec = decode_video_frames(bytes(p) if p is not None else b"")
                if dec is None:
                    continue
                nch = dec.get("n_channels", 1)
                for f in range(0, dec["n_frames"], stride):
                    ids.append(doc_id)
                    idxs.append(f)
                    hs.append(dhash56(dec["frames"][f], dec["width"],
                                      dec["height"], nch))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "fhash": hs})

    return blobs.mapInPandas(hashes, VIDEO_FRAME_HASH_SCHEMA)


def synthesize_animated_gifs(docs: DataFrame,
                             text_col: str = "text") -> DataFrame:
    """Animated-GIF fixture corpus: width = doc_id%32+1, height =
    doc_id%16+1, n_frames = doc_id%6+2; the doc's bytes cycle
    CONTINUOUSLY through the whole animation (frame f pixel i is byte
    (f*w*h + i) % L), so every frame — and every frame-sampled hash —
    is a closed-form function of the text."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                w = int(doc_id) % 32 + 1
                h = int(doc_id) % 16 + 1
                nf = int(doc_id) % 6 + 2
                data = ("" if text is None else str(text)).encode("utf-8")
                n = w * h
                stream = (data or b"\x00") * (nf * n // max(len(data), 1) + 1)
                frames = [stream[f * n: (f + 1) * n] for f in range(nf)]
                payloads.append(build_gif_animated(w, h, frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )
    return docs.select("doc_id", text_col).mapInPandas(synth, schema)


def decode_audio_samples(payload: bytes) -> dict | None:
    """Container-dispatching audio decode (round 11): RIFF/WAVE →
    decode_wav_samples, fLaC → decode_flac_samples (operators/flac),
    anything else None — the audio twin of the image tier's
    magic-byte dispatch, and what makes the audio fingerprint
    CONTAINER-INVARIANT: both decoders return the same
    samples-int32-interleaved dict, so the same PCM hashes
    identically whichever container it arrived in (pinned by
    tests/test_flac.py)."""
    b = bytes(payload)
    if b[:4] == b"fLaC":
        from .flac import decode_flac_samples

        return decode_flac_samples(b)
    return decode_wav_samples(b)


def flac_sample_stats(blobs: DataFrame) -> DataFrame:
    """wav_sample_stats' FLAC twin: the same exact-integer stats
    (count, sum, sum-of-squares, integer-e4 mean) over REAL
    FLAC-decoded PCM — Rice/fixed-predictor entropy decode per blob
    inside one Arrow mapInPandas kernel. Because build_flac wraps the
    identical PCM bytes build_wav does (same zero-padding), the query
    over the FLAC corpus shares the WAV query's oracle verbatim — a
    decoder that misreads a subframe, a Rice partition, or the
    channel interleave hash-mismatches."""
    import numpy as np

    from .flac import decode_flac_samples

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("n_channels", "sample_rate_hz", "n_samples",
                     "sample_sum", "sample_sumsq", "mean_sample_e4")}
            for p in pdf["payload"]:
                dec = decode_flac_samples(bytes(p) if p is not None else b"")
                if dec is None:
                    for k in rows:
                        rows[k].append(None)
                    continue
                s = dec["samples"].astype(np.int64)
                n = int(s.size)
                tot = int(s.sum())
                rows["n_channels"].append(dec["n_channels"])
                rows["sample_rate_hz"].append(dec["sample_rate_hz"])
                rows["n_samples"].append(n)
                rows["sample_sum"].append(tot)
                rows["sample_sumsq"].append(int((s * s).sum()))
                rows["mean_sample_e4"].append((10000 * tot) // n if n else None)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **rows})

    return blobs.mapInPandas(stats, WAV_SAMPLE_STATS_SCHEMA)


def synthesize_flac_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """FLAC fixture corpus for the odd-doc_id audio population: the
    SAME channel/rate derivation and PCM bytes as synthesize_media's
    WAV branch (channels = (doc_id>>1)%2+1, rate = 8000 + doc_id%4*
    4000, 16-bit, utf-8 text as little-endian PCM) wrapped by
    build_flac instead of build_wav — so every (WAV doc, FLAC doc)
    pair with the same doc_id is a true cross-container twin and the
    WAV stats oracle gates the FLAC decode verbatim."""
    from .flac import build_flac

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            lens = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                s = "" if text is None else str(text)
                data = s.encode("utf-8")
                lens.append(len(s))
                payloads.append(
                    build_flac(
                        int(doc_id >> 1) % 2 + 1,
                        8000 + int(doc_id) % 4 * 4000,
                        16,
                        data,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads,
                                "text_len": lens})

    return docs.select("doc_id", text_col).mapInPandas(
        synth,
        StructType([
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("text_len", LongType()),
        ]),
    )
