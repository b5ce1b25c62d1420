"""Scale techniques: bucketed co-located joins and skew salting.

These are the two shuffle-control tools the query library leans on when
the driver testdata becomes a 100 TB deployment:

- **Bucketing** (``write_bucketed`` / ``bucketed_join``): persist both
  fact tables hash-bucketed (and sorted) by their join key. A
  subsequent equi-join on that key reads co-located buckets and plans a
  sort-merge join with NO Exchange on either side — the orderkey
  shuffle that dominates lineitem⋈orders simply disappears, traded for
  one-time layout cost at write. This is the Spark-native analogue of
  the reference delegating join locality to PostgreSQL's storage
  (SURVEY §4 — the reference has no layout control at all).

- **Salting** (``salted_join``): when one join key carries a
  disproportionate share of rows, hash-partitioning sends the whole hot
  key to one task. Salting splits the big side's hot rows across
  ``n_salts`` sub-keys (deterministically, from full-row content) and
  replicates the small side per salt, so the hot key's work spreads
  over n_salts tasks. AQE's skew-join split handles *moderate* skew at
  runtime; explicit salting is for the pathological case where a single
  key exceeds what one task can hold at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str | list[str],
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed and sorted by ``key`` (a column
    name or list of names — composite keys bucket on the tuple hash).
    Bucket count should be sized so one bucket of the LARGEST
    co-bucketed table fits a task comfortably (at 100 TB lineitem and
    32 GB target splits, that's thousands of buckets — the catalog
    cost is trivial)."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on ``key``: planned as an exchange-free
    sort-merge join (both scans report the same HashPartitioning)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def widen_for_compute(df: DataFrame, spark: SparkSession,
                      min_parts: int | None = None,
                      cache_key: tuple | None = None) -> DataFrame:
    """Round-robin repartition a COMPUTE-heavy frame up to cluster
    parallelism — only when the scan yielded fewer splits than cores.

    Why it exists: per-row CPU-bound transforms (the winnowing md5
    k-gram array is ~10 µs/gram) inherit the SCAN's partitioning, and
    a small parquet file is one split — so a 32-core executor pool
    runs the whole hash stage on one thread. At 100 TB the same scan
    yields thousands of maxPartitionBytes-sized splits and this helper
    is a structural NO-OP (the partition count check short-circuits,
    no Exchange is added); it only fires in the small-file regime,
    where the round-robin shuffle moves kilobytes. This is the
    compute-side dual of compact_parquet's scan-side sizing.

    ``cache_key``: the split-count probe (``df.rdd.getNumPartitions()``)
    forces an analyzed-plan→RDD conversion — cheap once, but the query
    library builds ~15 widened frames per run. Callers that know their
    frame's scan identity (source dir + table + mtime) pass it here and
    the probe runs once per (session, key), stored in the same
    session-LRU as catalog._TABLE_CACHE so it is evicted with the
    session and self-invalidates when the mtime component changes.
    Narrow transforms on top of the scan (select/filter/withColumn)
    preserve the split count, so one probe is valid for every frame
    built over the same files."""
    target = min_parts or spark.sparkContext.defaultParallelism
    n = None
    cache = None
    if cache_key is not None:
        from ..catalog import _session_cache

        cache = _session_cache(spark)
        n = cache.get(("_nsplits",) + cache_key)
    if n is None:
        n = df.rdd.getNumPartitions()
        if cache is not None:
            cache[("_nsplits",) + cache_key] = n
    if n >= target:
        return df
    return df.repartition(target)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the big side's rows get a deterministic
    content-derived salt in [0, n_salts); the small side is replicated
    once per salt; the join key becomes (key, salt), spreading any hot
    key over n_salts tasks. Output equals ``big.join(small, key)``
    row-for-row (the salt columns never leave this function).

    The salt derives from xxhash64 over ALL big-side columns — rows of
    the same hot key differ somewhere, so they spread; identical
    duplicate rows co-locate, which is harmless (duplicates carry the
    same join result). Replication cost: |small| × n_salts rows — keep
    n_salts at the skew factor you need to flatten, not higher."""
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)
    ).cast("int")
    big_salted = big.withColumn("_salt", salt)
    small_salted = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_salted.join(small_salted, [key, "_salt"], how).drop("_salt")


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files
    sized for scan efficiency. Streaming ingest (one sink write per
    micro-batch partition) inevitably accretes small files; scans then
    pay per-file open/footer costs and lose row-group-sized reads.

    The target partition count derives from the SOURCE's on-disk bytes
    (footer-inclusive listing via the filesystem, no data read), so the
    rewrite is one shuffle-free coalesce when shrinking, or a
    round-robin repartition when the source is a single oversized file.
    Returns the file count written. At 100 TB run per partition
    directory (event_date=...) so compaction parallelizes across
    partitions and never rewrites the whole table at once."""
    import glob as _glob
    import os as _os

    files = [
        f
        for f in _glob.glob(_os.path.join(src_dir, "**", "*.parquet"),
                            recursive=True)
        if _os.path.isfile(f)
    ]
    total = sum(_os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(src_dir)
    writer = (
        df.coalesce(n_out) if n_out < max(1, len(files)) else df.repartition(n_out)
    )
    writer.write.mode("overwrite").parquet(dst_dir)
    return len(
        [
            f
            for f in _glob.glob(_os.path.join(dst_dir, "*.parquet"))
            if _os.path.isfile(f)
        ]
    )


def snapshot_diff(old: DataFrame, new: DataFrame, key: str,
                  fingerprint: F.Column) -> DataFrame:
    """Row-level diff between two table snapshots → (key, status) with
    status ∈ added / removed / changed / unchanged — the change-data
    audit run between pipeline versions (did the backfill touch only
    what it should?), and the row-level companion of the aggregate
    table_checksum gate.

    ``fingerprint`` is a Column computed on each side's payload
    columns (pass a canonical-string hash — see the registered
    snapshot_diff_events for the pattern). Shape: each side reduces to
    (key, fingerprint) in its scan — the full-outer join shuffles two
    NARROW columns per row, not the payload; at 100 TB co-locate both
    snapshots with write_bucketed(key) and the exchange disappears
    entirely (see bucketed_join).

    Presence is tracked with explicit marker columns, NOT fingerprint
    nullness: a null-propagating fingerprint expression (concat over a
    nullable payload column) would otherwise misreport a
    present-both-sides row as added/removed; the changed/unchanged
    split uses the null-safe comparison so two NULL fingerprints read
    as equal."""
    o = old.select(
        F.col(key).alias(key),
        fingerprint.alias("_fp_old"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(key).alias(key),
        fingerprint.alias("_fp_new"),
        F.lit(True).alias("_in_new"),
    )
    return o.join(n, key, "full_outer").select(
        key,
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~F.col("_fp_old").eqNullSafe(F.col("_fp_new")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
