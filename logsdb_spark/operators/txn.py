"""Optimistic-concurrency table transactions for the contact upsert —
the executable answer to the single-writer caveat (reference:
src/logsdb/maillog.py:66-78 runs get-or-insert inside a database
transaction; plain parquet directories have no such protection).

Mechanics (a deliberately minimal Delta-style log):

- A table is a directory holding immutable snapshot subdirs
  (``snap-<version>-<token>``) plus a ``_txn/`` log of version files
  ``v<version>.json``, each naming the snapshot dir it commits.
- Readers resolve the highest committed version file → snapshot dir →
  ordinary parquet scan. Uncommitted/abandoned snapshot dirs are
  invisible (never referenced by a version file).
- Writers stage a full new snapshot, then COMMIT by creating
  ``v<n+1>.json`` with O_CREAT|O_EXCL — the filesystem's atomic
  create arbitrates racing writers: exactly one wins a given version,
  the loser gets ``ConcurrentWriteError`` and must re-read + retry
  (``merge_contacts`` does this loop). This is optimistic concurrency
  control, the same protocol Delta Lake runs against its _delta_log.

Scale notes: the CONTACT DIM is snapshot-small (the reference's
contacts table), so full-snapshot rewrites are the honest shape —
MERGE on a fact-sized table wants copy-on-write at file granularity
(Delta/Iceberg), which this log's manifest indirection is the seed of.
O_EXCL-as-arbiter requires a filesystem with atomic create (any POSIX
fs; on S3 use a DynamoDB-style lock service, which is exactly what
delta-rs does).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentWriteError(Exception):
    """Another writer committed this version first; re-read and retry."""


def _txn_dir(path: str) -> str:
    return os.path.join(path, "_txn")


def current_version(path: str) -> int:
    """Highest committed version, or -1 for an empty/new table.
    Only strict ``v<digits>.json`` names count — stray files in _txn/
    (editor artifacts, a future vacuum marker) are ignored, not a
    crash for every reader."""
    import re

    d = _txn_dir(path)
    if not os.path.isdir(d):
        return -1
    versions = [
        int(m.group(1))
        for f in os.listdir(d)
        if (m := re.fullmatch(r"v(\d+)\.json", f))
    ]
    return max(versions, default=-1)


def read_snapshot(spark: SparkSession, path: str,
                  version: int | None = None) -> DataFrame | None:
    """Latest (or pinned-version) committed snapshot as a DataFrame;
    None when nothing is committed yet. Time travel comes free: every
    version file permanently names its snapshot dir."""
    v = current_version(path) if version is None else version
    if v < 0:
        return None
    with open(os.path.join(_txn_dir(path), f"v{v}.json")) as fh:
        manifest = json.load(fh)
    return spark.read.parquet(os.path.join(path, manifest["snapshot"]))


def commit_snapshot(df: DataFrame, path: str, expected_version: int) -> int:
    """Write ``df`` as the snapshot for ``expected_version + 1``.

    Stages the parquet snapshot first (invisible until committed),
    then atomically creates the version file. Raises
    ConcurrentWriteError if any other writer committed that version
    first — the staged snapshot is then abandoned (harmless garbage; a
    VACUUM would sweep unreferenced snapshot dirs)."""
    new_version = expected_version + 1
    snap = f"snap-{new_version:06d}-{uuid.uuid4().hex[:8]}"
    df.write.parquet(os.path.join(path, snap))
    os.makedirs(_txn_dir(path), exist_ok=True)
    vfile = os.path.join(_txn_dir(path), f"v{new_version}.json")
    # Publish the manifest ATOMICALLY: write + fsync a private temp
    # file, then hard-link it to the version name. link() both
    # arbitrates racing writers (fails with EEXIST if someone else
    # committed this version) and guarantees a reader never observes
    # a half-written manifest — creating the version file first and
    # writing into it afterwards would expose an empty v<N>.json to
    # any concurrently retrying reader.
    tmp = os.path.join(_txn_dir(path), f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        fh.write(json.dumps({"version": new_version, "snapshot": snap}))
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, vfile)
    except FileExistsError as ex:
        raise ConcurrentWriteError(
            f"version {new_version} already committed at {path}"
        ) from ex
    finally:
        os.unlink(tmp)
    return new_version


def merge_contacts(spark: SparkSession, path: str, batch_contacts: DataFrame,
                   max_retries: int = 5) -> int:
    """Transactional get-or-insert of a contact batch (maillog.py:66-78
    parity): read the committed dim, anti-join-append the batch's new
    contacts, commit optimistically; on a concurrency loss, re-read
    the WINNER's snapshot and retry — so both writers' contacts land
    exactly once regardless of interleaving (content-addressed ids
    make the merge idempotent and order-independent)."""
    from .upsert import upsert_contacts

    for _ in range(max_retries):
        v = current_version(path)
        existing = read_snapshot(spark, path, v)
        merged = upsert_contacts(existing, batch_contacts)
        try:
            return commit_snapshot(merged, path, v)
        except ConcurrentWriteError:
            continue
    raise ConcurrentWriteError(
        f"gave up after {max_retries} retries at {path}"
    )
