"""Perceptual image-hash dedup (round 10): planted near-identical
image recall, cross-format hash invariance, and the Hamming-ball
banding guarantee."""

from __future__ import annotations

import random

from logsdb_spark.operators.dedup import phash_near_dup_pairs
from logsdb_spark.operators.multimodal import (
    build_gif,
    build_png,
    decode_png_pixels,
    dhash56,
    image_dhash,
)


def _image(w: int, h: int, seed: int) -> bytes:
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h))


def _perturb(px: bytes, w: int, h: int, n_cells: int, seed: int) -> bytes:
    """Flip the luminance of ``n_cells`` pixels that the dHash grid
    actually samples — the worst case for the hash (a perturbation
    off the sampled lattice flips zero bits)."""
    rng = random.Random(seed)
    out = bytearray(px)
    rr = [((2 * r + 1) * h) // 16 for r in range(8)]
    cc = [((2 * c + 1) * w) // 16 for c in range(8)]
    spots = sorted({(r, c) for r in rr for c in cc})
    for r, c in rng.sample(spots, min(n_cells, len(spots))):
        out[r * w + c] = 255 - out[r * w + c]
    return bytes(out)


def test_planted_twin_recall(spark):
    """Every planted perturbed twin (<= 2 sampled-cell flips, each
    flipping at most 2 hash bits -> Hamming <= 4... bounded by radius
    via n_cells=1, Hamming <= 2 <= 3) must surface as a pair; distinct
    random images must not."""
    w, h = 40, 32
    rows = []
    for i in range(30):
        base = _image(w, h, seed=i)
        rows.append((2 * i, build_png(w, h, base)))
        # twin: one sampled cell flipped -> at most 2 dHash bits move
        rows.append((2 * i + 1,
                     build_png(w, h, _perturb(base, w, h, 1, seed=100 + i))))
    blobs = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {(r.id_a, r.id_b)
             for r in phash_near_dup_pairs(image_dhash(blobs),
                                           max_hamming=3).collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(30)}
    missed = planted - pairs
    assert not missed, f"planted twins missed: {sorted(missed)[:5]}"
    # distinct random 40x32 images: expected Hamming ~28; none within 3
    strangers = {p for p in pairs if p not in planted}
    assert not strangers, f"false pairs: {sorted(strangers)[:5]}"


def test_cross_format_same_hash(spark):
    """The SAME content in a PNG and a GIF container must produce the
    SAME perceptual hash (both builders cycle content into identical
    display-order pixel streams; the hash is over decoded pixels, not
    container bytes)."""
    w, h = 25, 13
    content = _image(w, h, seed=7)
    blobs = spark.createDataFrame(
        [(0, build_png(w, h, content)), (1, build_gif(w, h, content)),
         (2, build_gif(w, h, content, interlaced=True))],
        "doc_id long, payload binary",
    )
    hashes = {r.doc_id: r.phash for r in image_dhash(blobs).collect()}
    assert hashes[0] == hashes[1] == hashes[2]
    assert hashes[0] is not None


def test_banding_exact_at_radius_3(spark):
    """Pigeonhole guarantee: with 4 bands, EVERY pair within Hamming 3
    shares a band. Construct hashes at controlled distances straight
    through tiny images and compare the banded pipeline against the
    brute-force pair set."""
    base = _image(16, 16, seed=42)
    variants = [base]
    for k in (1, 2, 3):  # k sampled cells flipped
        variants.append(_perturb(base, 16, 16, k, seed=k))
    blobs = spark.createDataFrame(
        [(i, build_png(16, 16, v)) for i, v in enumerate(variants)],
        "doc_id long, payload binary",
    )
    hashes = {r.doc_id: r.phash for r in image_dhash(blobs).collect()}
    got = {(r.id_a, r.id_b, r.hamming)
           for r in phash_near_dup_pairs(image_dhash(blobs),
                                         max_hamming=3).collect()}
    want = set()
    ids = sorted(hashes)
    for i in ids:
        for j in ids:
            if i < j:
                d = bin(hashes[i] ^ hashes[j]).count("1")
                if d <= 3:
                    want.add((i, j, d))
    assert got == want


def test_dhash_undecodable_yields_null(spark):
    blobs = spark.createDataFrame(
        [(0, b"not an image"), (1, build_png(8, 8, _image(8, 8, 1)))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r.phash for r in image_dhash(blobs).collect()}
    assert rows[0] is None and rows[1] is not None
    # and the pair operator drops the null instead of failing
    assert phash_near_dup_pairs(image_dhash(blobs)).count() == 0


def test_dhash_rgb_luminance():
    """3-channel pixels hash via integer mean luminance — an RGB gray
    image equals its grayscale twin."""
    w, h = 20, 12
    gray = _image(w, h, seed=3)
    rgb = bytes(v for g in gray for v in (g, g, g))
    assert dhash56(rgb, w, h, 3) == dhash56(gray, w, h, 1)
    png_rgb = build_png(w, h, rgb, n_channels=3)
    dec = decode_png_pixels(png_rgb)
    assert dhash56(dec["pixels"], w, h, dec["n_channels"]) == dhash56(
        gray, w, h, 1
    )


def test_audio_planted_twin_recall(spark):
    """Audio twins: perturbing ONE sample moves one window's energy,
    flipping at most two adjacent fingerprint bits — every planted
    twin surfaces within the radius-3 ball; unrelated streams don't."""
    import random

    from logsdb_spark.operators.dedup import phash_near_dup_pairs
    from logsdb_spark.operators.multimodal import (
        audio_fingerprint,
        build_wav,
    )

    rng = random.Random(11)
    rows = []
    for i in range(25):
        pcm = bytes(rng.randrange(256) for _ in range(400))
        rows.append((2 * i, build_wav(1, 8000, 16, pcm)))
        tw = bytearray(pcm)
        tw[100] ^= 0x40  # one sample nudged
        rows.append((2 * i + 1, build_wav(1, 8000, 16, bytes(tw))))
    blobs = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {(r.id_a, r.id_b)
             for r in phash_near_dup_pairs(audio_fingerprint(blobs),
                                           max_hamming=3,
                                           hash_col="afp").collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(25)}
    assert planted <= pairs, sorted(planted - pairs)[:5]
    assert not (pairs - planted), sorted(pairs - planted)[:5]


def test_audio_fp_undecodable_yields_null(spark):
    from logsdb_spark.operators.multimodal import (
        audio_fingerprint,
        build_wav,
    )

    blobs = spark.createDataFrame(
        [(0, b"not audio"), (1, build_wav(1, 8000, 16, b"x" * 100))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r.afp for r in audio_fingerprint(blobs).collect()}
    assert rows[0] is None and rows[1] is not None


def test_video_planted_shared_frames(spark):
    """Two animations sharing >= 2 sampled frames must pair; disjoint
    animations must not — and the frame hashes must be the SAME
    values the single-image pipeline computes for those frames."""
    import random

    from logsdb_spark.operators.multimodal import (
        build_gif_animated,
        decode_gif_frames,
        video_frame_hashes,
    )
    from logsdb_spark.plans.extensions import _winnow_pairs_from_index
    from pyspark.sql import functions as F

    rng = random.Random(21)
    w, h = 12, 9
    shared = [bytes(rng.randrange(256) for _ in range(w * h))
              for _ in range(4)]
    uniq = lambda: bytes(rng.randrange(256) for _ in range(w * h))
    # docs 0 and 1 share sampled frames 0 and 2; doc 2 is disjoint
    rows = [
        (0, build_gif_animated(w, h, [shared[0], uniq(), shared[1],
                                      uniq()])),
        (1, build_gif_animated(w, h, [shared[0], uniq(), shared[1]])),
        (2, build_gif_animated(w, h, [uniq(), uniq(), uniq(), uniq()])),
    ]
    blobs = spark.createDataFrame(rows, "doc_id long, payload binary")
    ex = (video_frame_hashes(blobs, stride=2)
          .select("doc_id", F.col("fhash").alias("fp")).distinct())
    pairs = {(r.id_a, r.id_b, r.n_shared_fps)
             for r in _winnow_pairs_from_index(ex).collect()}
    assert pairs == {(0, 1, 2)}, pairs
    # frame round-trip sanity
    dec = decode_gif_frames(rows[0][1])
    assert dec["n_frames"] == 4 and dec["frames"][2] == shared[1]


def test_streaming_image_probe_matches_batch(spark, tmp_path):
    """The streaming image-dedup probe's flags must equal the batch
    operator's CROSS pairs (corpus x shard) — the same parity
    contract as the text ensemble stream — and a replayed batch must
    be idempotent (same batch_id directory, same rows)."""
    import random

    from logsdb_spark.operators.dedup import phash_near_dup_pairs
    from logsdb_spark.operators.multimodal import build_png, image_dhash
    from logsdb_spark.streaming.dedup import start_image_neardup_stream
    from logsdb_spark.streaming.ingest import run_until_drained

    rng = random.Random(31)
    w, h = 24, 16
    blobs = []
    for i in range(40):
        base = bytes(rng.randrange(256) for _ in range(w * h))
        blobs.append((2 * i, build_png(w, h, base)))
        tw = bytearray(base)
        rr = ((2 * 3 + 1) * h) // 16
        cc = ((2 * 4 + 1) * w) // 16
        tw[rr * w + cc] = 255 - tw[rr * w + cc]
        blobs.append((2 * i + 1, build_png(w, h, bytes(tw))))
    corpus = spark.createDataFrame(
        [b for b in blobs if b[0] % 10 != 0], "doc_id long, payload binary"
    )
    shard = spark.createDataFrame(
        [b for b in blobs if b[0] % 10 == 0], "doc_id long, payload binary"
    )
    src = str(tmp_path / "img_src")
    shard.coalesce(1).write.parquet(src)
    out = str(tmp_path / "img_out")
    run_until_drained(
        start_image_neardup_stream(spark, corpus, src, out)
    )
    got = {(r.corpus_id, r.new_id, r.hamming)
           for r in spark.read.parquet(out + "/image_flags").collect()}

    allpairs = phash_near_dup_pairs(
        image_dhash(corpus.unionByName(shard)), max_hamming=3
    ).collect()
    want = set()
    for r in allpairs:
        a_in = r.id_a % 10 != 0
        b_in = r.id_b % 10 != 0
        if a_in != b_in:  # exactly one side in the corpus
            c, n = (r.id_a, r.id_b) if a_in else (r.id_b, r.id_a)
            want.add((c, n, r.hamming))
    assert got == want and want, (len(got), len(want))


def test_component_edges_equal_full_graph(spark):
    """phash_component_edges (rep-collapsed ball + member stars) must
    produce the SAME connected components as the full pair graph,
    including identical-hash groups and cross-group near-dups."""
    import random

    from logsdb_spark.operators.dedup import (
        connected_components,
        phash_component_edges,
        phash_near_dup_pairs,
    )
    from logsdb_spark.operators.multimodal import build_png, image_dhash
    from pyspark.sql import functions as F

    rng = random.Random(17)
    w, h = 20, 12
    base = bytes(rng.randrange(256) for _ in range(w * h))
    tw = bytearray(base)
    rr, cc = ((2 * 2 + 1) * h) // 16, ((2 * 5 + 1) * w) // 16
    tw[rr * w + cc] = 255 - tw[rr * w + cc]
    rows = [
        # identical-hash group of 4 (same content)
        (0, build_png(w, h, base)), (1, build_png(w, h, base)),
        (2, build_png(w, h, base)), (3, build_png(w, h, base)),
        # near-dup of the group (one sampled cell flipped)
        (4, build_png(w, h, bytes(tw))),
        # unrelated
        (5, build_png(w, h, bytes(rng.randrange(256)
                                  for _ in range(w * h)))),
        # two trivial 1x1 images — degenerate hash-0 group
        (6, build_png(1, 1, b"a")), (7, build_png(1, 1, b"z")),
    ]
    blobs = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = image_dhash(blobs)

    def comps(edges):
        labeled = (
            hashes.select("doc_id")
            .join(connected_components(edges), "doc_id", "left")
            .select("doc_id",
                    F.coalesce("cluster", "doc_id").alias("cluster"))
        )
        return sorted(map(tuple, labeled.collect()))

    full = comps(phash_near_dup_pairs(hashes).select("id_a", "id_b"))
    lin = comps(phash_component_edges(hashes))
    assert full == lin
    # and the expected structure: {0,1,2,3,4} one cluster, {6,7} one
    got = dict(full)
    assert got[0] == got[1] == got[2] == got[3] == got[4] == 0
    assert got[6] == got[7] == 6 and got[5] == 5


def test_media_evidence_index_parity(spark):
    """The materialized perceptual-fingerprint index
    (operators/silver.media_evidence_layout) is row-for-row the
    kernels' output: each kind-partition equals the corresponding
    in-plan decode+hash relation, and the index-fed ensemble keep
    equals the from-raw form — the contract that lets the keep
    endpoints share the in-plan oracles."""
    from pyspark.sql import functions as F

    from logsdb_spark.operators.multimodal import (
        audio_fingerprint,
        video_frame_hashes,
    )
    from logsdb_spark.operators.silver import (
        gif_anim_blob_layout,
        media_blob_layout,
        media_evidence_layout,
    )
    from logsdb_spark.plans.extensions import (
        dedup_media_ensemble_keep,
        dedup_media_ensemble_keep_inplan,
    )
    from conftest import SF_DIR

    idx = media_evidence_layout(spark, SF_DIR)
    media = media_blob_layout(spark, SF_DIR).filter(F.col("text_len") > 0)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    ih = image_dhash(
        media.filter(F.col("doc_id") % 2 == 0).select("doc_id", "payload")
    ).filter(F.col("phash").isNotNull())
    assert rows(idx.filter(F.col("kind") == "phash")
                .select("doc_id", "hv")) == rows(ih)

    ah = audio_fingerprint(
        media.filter(F.col("doc_id") % 2 == 1).select("doc_id", "payload")
    ).filter(F.col("afp").isNotNull())
    assert rows(idx.filter(F.col("kind") == "afp")
                .select("doc_id", "hv")) == rows(ah)

    vh = (
        video_frame_hashes(gif_anim_blob_layout(spark, SF_DIR), stride=2)
        .select("doc_id", F.col("fhash").alias("hv"))
        .distinct()
    )
    assert rows(idx.filter(F.col("kind") == "vframe")
                .select("doc_id", "hv")) == rows(vh)

    fed = dedup_media_ensemble_keep(spark, SF_DIR)
    raw = dedup_media_ensemble_keep_inplan(spark, SF_DIR)
    assert rows(fed) == rows(raw)


def test_giant_bucket_streams_and_matches_bruteforce(spark):
    """A band bucket larger than the in-row emit bound (256) routes
    through the streamed bucket-key self-join and produces exactly
    the brute-force pair set — the regime the 100x media probe OOM'd
    before the two-regime emit. 300 hashes share band 0 (low 14 bits
    zero) so ALL of them land in one 300-member bucket; expected
    pairs computed brute-force in python."""
    from pyspark.sql import functions as F

    # low 14 bits zero -> band 0 value 0 for all; vary bits above so
    # hashes are distinct, with planted near-pairs at hamming <= 3
    hashes = []
    for i in range(300):
        base = (i // 2) << 20
        hv = base | ((i % 2) << 14)  # adjacent ids differ in one bit
        hashes.append((i, hv))
    df = spark.createDataFrame(hashes, "doc_id long, phash long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_near_dup_pairs(df, max_hamming=3).collect()
    }
    exp = set()
    for i in range(300):
        for j in range(i + 1, 300):
            h = bin(hashes[i][1] ^ hashes[j][1]).count("1")
            if h <= 3:
                exp.add((i, j, h))
    # every id pairs with its one-bit twin, plus whatever nearby
    # bases fall inside the radius-3 ball — the python brute force is
    # the ground truth, the 150 twin pairs a subset sanity check
    assert got == exp
    assert {(2 * t, 2 * t + 1, 1) for t in range(150)} <= got
