"""Streaming EDGE-STATE maintenance (round 12; partitioned store
round 13) — the delta operators wired into the ingest path, making
the edge layout's "maintained at ingest" contract literal: each
arriving micro-batch of documents fingerprints itself (the batched
Arrow winnow kernel), derives the SIGNED count delta against the
stored state (operators/dedup.winnow_count_delta — touched
fingerprint buckets only), and commits ONLY the touched key-bucket
partitions of the count relation plus its own partition of the
growing inverted index.

Partitioned MVCC (round 13 — the r12 verdict's "state-sized rewrite"
fix): the count relation is hash-partitioned into ``nb`` key buckets
(kb = pmod(xxhash64(id_a, id_b), nb)). A batch's version directory
``v{batch_id:09d}`` holds kb=... subdirectories for ONLY the buckets
its delta touched, plus a ``_TOUCHED`` manifest (the commit point —
written after the data job, listing the touched buckets and whether
the version is a FULL snapshot). Readers resolve each bucket to the
NEWEST committed version whose manifest claims it, walking back at
most to the newest full snapshot; a touched bucket with no data
directory means the bucket became empty (total retraction), never a
fall-through to stale rows. Every ``compact_every`` batches the
maintained state is rewritten as a full snapshot, which bounds the
reader's version walk and enables GC (``gc_store`` retains the last
``keep_full`` snapshots and everything newer — a grace window for
in-flight readers pinned to the previous snapshot).

Per-batch state I/O is therefore O(touched partitions), not
O(|count relation|): the full-outer merge's stored side enumerates
only the touched buckets' paths (path-level pruning — stronger than
a pushed filter), and the write rewrites only those partitions.
Untouched buckets cannot change (every delta row's bucket is touched
by construction), so skipping them is exact, not approximate.

Exactly-once contract (the same at-least-once-replay reality every
foreachBatch sink here handles): all writes are keyed by batch_id —
the index partition is a per-batch overwrite, and a version is
computed from committed versions ``< batch_id``, so replaying a
crashed micro-batch recomputes and overwrites ITS version from its
unchanged predecessors instead of double-applying the delta. A
version without its manifest is invisible; the manifest lands last.

Filesystem access goes through the Hadoop FileSystem API
(``spark._jvm``), not driver-local glob/os.path — the protocol works
on any Hadoop-supported store (HDFS, S3A, local). Per read it costs
at most (versions-since-snapshot + touched-bucket) metadata calls.

Scale: per micro-batch the work is the shard's Arrow fingerprint
kernel + the fused touched-bucket delta (one corpus-index scan
map-side reduced by the broadcast touched set, one bucket shuffle
bounded by the shard footprint) + a touched-partition outer merge —
never a corpus rebuild, never a state-sized rewrite outside the
periodic snapshot. Parity with the batch rebuild is pinned by
tests/test_streaming.py (final streamed state == winnow_edge_counts
over the whole corpus, and == the one-shot delta pipeline)."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .dedup import DOCS_SCHEMA

_COUNTS_SCHEMA = "id_a LONG, id_b LONG, n LONG"
_MH_COUNTS_SCHEMA = "id_a LONG, id_b LONG, n_pair LONG, n_star LONG"
_INDEX_SCHEMA = "doc_id LONG, fp LONG"

DEFAULT_NB = 64
DEFAULT_COMPACT_EVERY = 16
DEFAULT_KEEP_FULL = 2


# ---------------------------------------------------------------------------
# Hadoop FileSystem helpers (portable across HDFS/S3A/local)
# ---------------------------------------------------------------------------

def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def _fs_exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs(spark, path)
    return bool(fs.exists(hpath))


def _fs_list(spark: SparkSession, path: str) -> list:
    """Child names of ``path`` (empty when the dir doesn't exist)."""
    fs, hpath = _fs(spark, path)
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]


def _fs_delete(spark: SparkSession, path: str) -> None:
    fs, hpath = _fs(spark, path)
    if fs.exists(hpath):
        fs.delete(hpath, True)


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    fs, hpath = _fs(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark: SparkSession, path: str) -> str:
    fs, hpath = _fs(spark, path)
    stream = fs.open(hpath)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()


# ---------------------------------------------------------------------------
# Partitioned versioned count store
# ---------------------------------------------------------------------------

def _kb_col(nb: int) -> F.Column:
    """Deterministic pair-key bucket — the store's partition key."""
    return F.pmod(F.xxhash64("id_a", "id_b"), F.lit(nb)).cast("int")


def _vdir(root: str, v: int) -> str:
    return f"{root}/v{v:09d}"


def _store_versions(spark: SparkSession, root: str,
                    before: int | None = None) -> list:
    """Committed (manifest present) versions ascending, as
    (version, manifest) pairs; optionally only those < ``before`` (a
    replaying batch must read its predecessors, never its own partial
    write)."""
    out = []
    for name in _fs_list(spark, root):
        if not name.startswith("v"):
            continue
        try:
            v = int(name[1:])
        except ValueError:
            continue
        if before is not None and v >= before:
            continue
        mpath = f"{root}/{name}/_TOUCHED"
        if not _fs_exists(spark, mpath):
            continue
        out.append((v, json.loads(_read_text(spark, mpath))))
    return sorted(out)


def _read_store(spark: SparkSession, root: str, schema: str,
                before: int | None = None) -> DataFrame:
    """The CURRENT maintained relation: per bucket, the newest
    committed version claiming it (walking back at most to the newest
    full snapshot); a claimed bucket without a data directory is
    empty by contract."""
    cols = [c.split()[0] for c in schema.split(",")]
    vs = _store_versions(spark, root, before)
    if not vs:
        return spark.createDataFrame([], schema)
    sel: dict = {}
    for v, man in reversed(vs):
        for kb in man["kbs"]:
            sel.setdefault(kb, v)
        if man.get("full"):
            break
    by_v: dict = {}
    for kb, v in sel.items():
        by_v.setdefault(v, []).append(kb)
    parts = []
    for v, kbs in by_v.items():
        vdir = _vdir(root, v)
        paths = [f"{vdir}/kb={kb}" for kb in sorted(kbs)
                 if _fs_exists(spark, f"{vdir}/kb={kb}")]
        if paths:
            parts.append(
                spark.read.option("basePath", vdir).parquet(*paths)
                .select(*cols)
            )
    if not parts:
        return spark.createDataFrame([], schema)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def _read_store_buckets(spark: SparkSession, root: str, schema: str,
                        kbs: list, before: int | None = None) -> DataFrame:
    """_read_store restricted to the given buckets — the stored side
    of a touched-partition merge. Only the touched buckets' paths are
    ever enumerated or read."""
    cols = [c.split()[0] for c in schema.split(",")]
    want = set(kbs)
    vs = _store_versions(spark, root, before)
    if not vs or not want:
        return spark.createDataFrame([], schema)
    sel: dict = {}
    for v, man in reversed(vs):
        for kb in man["kbs"]:
            if kb in want:
                sel.setdefault(kb, v)
        if man.get("full"):
            break
    by_v: dict = {}
    for kb, v in sel.items():
        by_v.setdefault(v, []).append(kb)
    parts = []
    for v, vkbs in by_v.items():
        vdir = _vdir(root, v)
        paths = [f"{vdir}/kb={kb}" for kb in sorted(vkbs)
                 if _fs_exists(spark, f"{vdir}/kb={kb}")]
        if paths:
            parts.append(
                spark.read.option("basePath", vdir).parquet(*paths)
                .select(*cols)
            )
    if not parts:
        return spark.createDataFrame([], schema)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def _commit_store_version(spark: SparkSession, root: str, df: DataFrame,
                          batch_id: int, touched_kbs: list,
                          full: bool) -> None:
    """Write ``df`` (which must carry the ``kb`` column) as version
    ``batch_id`` and publish its manifest — the manifest landing last
    is the commit point."""
    vdir = _vdir(root, batch_id)
    df.write.mode("overwrite").partitionBy("kb").parquet(vdir)
    _write_text(spark, f"{vdir}/_TOUCHED",
                json.dumps({"kbs": sorted(touched_kbs), "full": full}))


def gc_store(spark: SparkSession, root: str,
             keep_full: int = DEFAULT_KEEP_FULL) -> list:
    """Garbage-collect store versions strictly older than the
    ``keep_full``-th newest full snapshot (readers resolve against
    the newest snapshot, so retaining an extra one is a grace window
    for readers pinned mid-walk). Returns the deleted version ids.
    Never deletes anything until ``keep_full`` snapshots exist, so a
    reader can always resolve every bucket."""
    vs = _store_versions(spark, root)
    fulls = [v for v, man in vs if man.get("full")]
    if len(fulls) < keep_full:
        return []
    horizon = fulls[-keep_full]
    doomed = [v for v, _ in vs if v < horizon]
    for v in doomed:
        _fs_delete(spark, _vdir(root, v))
    return doomed


def _apply_count_delta(spark: SparkSession, root: str, schema: str,
                       delta: DataFrame, merge_fn, batch_id: int,
                       nb: int, compact_every: int,
                       keep_full: int) -> None:
    """One batch of the partitioned store protocol: derive touched
    buckets from the (cached) delta, merge against ONLY those
    buckets' stored rows, commit the touched partitions — or, on a
    snapshot batch, merge against the full state and commit a full
    version, then GC."""
    full = compact_every > 0 and batch_id % compact_every == 0
    delta = delta.persist()
    try:
        if full:
            stored = _read_store(spark, root, schema, before=batch_id)
            merged = merge_fn(stored, delta)
            touched = list(range(nb))
        else:
            touched = [
                r[0] for r in delta.select(_kb_col(nb).alias("kb"))
                .distinct().collect()
            ]
            stored = _read_store_buckets(spark, root, schema, touched,
                                         before=batch_id)
            merged = merge_fn(stored, delta)
        _commit_store_version(
            spark, root, merged.withColumn("kb", _kb_col(nb)),
            batch_id, touched, full,
        )
    finally:
        delta.unpersist()
    if full:
        gc_store(spark, root, keep_full)


# ---------------------------------------------------------------------------
# Winnow signal
# ---------------------------------------------------------------------------

def _batch_winnow_index(batch: DataFrame, k: int, w: int) -> DataFrame:
    """The arriving shard's exploded (doc_id, fp) winnow index — the
    same derivation as operators/silver.winnow_fp_layout (explode +
    null filter over the Arrow kernel's per-doc fingerprint sets), so
    streamed state is value-comparable with the batch layouts."""
    from ..functions.text import winnow_fingerprints

    fps = winnow_fingerprints(batch.dropDuplicates(), "doc_id", "text",
                              k=k, w=w)
    return (
        fps.select("doc_id", F.explode_outer("fps").alias("fp"))
        .filter(F.col("fp").isNotNull())
    )


def read_edge_counts(spark: SparkSession, state_dir: str,
                     before: int | None = None) -> DataFrame:
    """The current committed view of the maintained winnow count
    relation (empty frame before the first commit)."""
    return _read_store(spark, f"{state_dir}/counts", _COUNTS_SCHEMA,
                       before)


def _stored_index(spark: SparkSession, state_dir: str,
                  before: int) -> DataFrame:
    """Index partitions committed by batches < ``before`` (the corpus
    as of this batch's predecessors)."""
    idx_dir = f"{state_dir}/winnow_idx"
    if not _fs_list(spark, idx_dir):
        return spark.createDataFrame([], _INDEX_SCHEMA)
    return (
        spark.read.option("basePath", idx_dir).parquet(idx_dir)
        .filter(F.col("batch_id") < before)
        .select("doc_id", "fp")
    )


def apply_maintenance_batch(spark: SparkSession, batch: DataFrame,
                            batch_id: int, state_dir: str,
                            k: int = 20, w: int = 8,
                            nb: int = DEFAULT_NB,
                            compact_every: int = DEFAULT_COMPACT_EVERY,
                            keep_full: int = DEFAULT_KEEP_FULL) -> None:
    """One micro-batch of streamed edge maintenance — versioned,
    replay-idempotent, and touched-partition-only (module docstring
    has the commit protocol)."""
    from ..operators.dedup import (
        winnow_count_delta,
        winnow_counts_merge_delta,
    )

    new_ex = _batch_winnow_index(batch, k, w)
    old_ex = _stored_index(spark, state_dir, batch_id)
    delta = winnow_count_delta(old_ex, new_ex)
    _apply_count_delta(
        spark, f"{state_dir}/counts", _COUNTS_SCHEMA, delta,
        winnow_counts_merge_delta, batch_id, nb, compact_every, keep_full,
    )
    new_ex.write.mode("overwrite").parquet(
        f"{state_dir}/winnow_idx/batch_id={batch_id}")


def start_edge_maintenance_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    k: int = 20,
    w: int = 8,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-stream documents from ``source_dir`` and maintain the
    winnow edge-count state under ``state_dir`` batch by batch."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def step(batch: DataFrame, batch_id: int) -> None:
        apply_maintenance_batch(spark, batch, batch_id, state_dir, k, w)

    return (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", f"{state_dir}/_ckpt/maint")
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# MinHash signal
# ---------------------------------------------------------------------------

def read_mh_counts(spark: SparkSession, state_dir: str,
                   before: int | None = None) -> DataFrame:
    """The current committed view of the maintained MinHash emission
    counts (empty frame before the first commit)."""
    return _read_store(spark, f"{state_dir}/mh_counts", _MH_COUNTS_SCHEMA,
                       before)


def _stored_signatures(spark: SparkSession, state_dir: str,
                       before: int) -> DataFrame:
    """Signature partitions committed by batches < ``before``."""
    idx_dir = f"{state_dir}/mh_idx"
    if not _fs_list(spark, idx_dir):
        from pyspark.sql.types import (
            ArrayType, LongType, StructField, StructType,
        )

        return spark.createDataFrame([], StructType([
            StructField("doc_id", LongType()),
            StructField("sig", ArrayType(LongType())),
        ]))
    return (
        spark.read.option("basePath", idx_dir).parquet(idx_dir)
        .filter(F.col("batch_id") < before)
        .select("doc_id", "sig")
    )


def apply_mh_maintenance_batch(spark: SparkSession, batch: DataFrame,
                               batch_id: int, state_dir: str,
                               nb: int = DEFAULT_NB,
                               compact_every: int = DEFAULT_COMPACT_EVERY,
                               keep_full: int = DEFAULT_KEEP_FULL) -> None:
    """One micro-batch of streamed MINHASH candidate maintenance —
    the second text signal riding the identical partitioned commit
    protocol: the shard signs itself (the same shuffle-free signature
    derivation the batch index layout uses), lsh_count_delta folds
    its touched banded buckets into a signed delta, and ONLY the
    touched key-bucket partitions of the stored (n_pair, n_star)
    relation are merged and committed, batch-id-keyed, alongside the
    shard's signature partition."""
    from ..operators.dedup import (
        lsh_count_delta,
        lsh_counts_merge_delta,
        minhash_signatures,
        shingle_sets,
    )

    new_sig = minhash_signatures(
        shingle_sets(batch.dropDuplicates())
    ).select("doc_id", "sig")
    old_sig = _stored_signatures(spark, state_dir, batch_id)
    delta = lsh_count_delta(old_sig, new_sig)
    _apply_count_delta(
        spark, f"{state_dir}/mh_counts", _MH_COUNTS_SCHEMA, delta,
        lsh_counts_merge_delta, batch_id, nb, compact_every, keep_full,
    )
    new_sig.write.mode("overwrite").parquet(
        f"{state_dir}/mh_idx/batch_id={batch_id}")


def start_mh_maintenance_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-stream documents and maintain the MinHash candidate-count
    state under ``state_dir`` batch by batch."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def step(batch: DataFrame, batch_id: int) -> None:
        apply_mh_maintenance_batch(spark, batch, batch_id, state_dir)

    return (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", f"{state_dir}/_ckpt/mh_maint")
        .trigger(availableNow=True)
        .start()
    )
