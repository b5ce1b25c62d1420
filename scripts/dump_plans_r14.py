#!/usr/bin/env python
"""Dump .explain('formatted') before/after plans for the round-14
touched queries into plans/r14/. 'before' replays the r13 form by
forcing the old code path (fold_blocks=False for the two-level encode);
'after' is the shipped default. Usage:
    python scripts/dump_plans_r14.py <query> [<query> ...] [--before-only|--after-only]
The fold monkeypatch only affects the two-level queries; other queries
should be dumped before/after by running this script at the matching
git state instead.
"""
import functools
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logsdb_spark.registry import all_queries
from logsdb_spark.session import get_spark
from logsdb_spark.operators import similarity

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r14")

TWO_LEVEL = {"ann_ivf_kmeans", "ann_index_maintenance_ivf",
             "ann_ivf_pq_lazy"}
# queries whose r13 'before' form is the JVM minhash signature fold
MH_ENGINE = {"dedup_minhash_lsh", "dedup_minhash_clusters"}


def dump(name: str, suffix: str, fold: bool | None) -> None:
    from logsdb_spark.operators import dedup as _dedup

    spark = get_spark("dump-plans-r14")
    spark.sparkContext.setLogLevel("ERROR")
    orig = similarity.ivf_assign_with_model
    orig_mh = _dedup.minhash_signatures
    if fold is not None:
        similarity.ivf_assign_with_model = functools.partial(
            orig, fold_blocks=fold)
    if name in MH_ENGINE and suffix == "before":
        _dedup.minhash_signatures = functools.partial(
            orig_mh, engine="jvm")
    try:
        df = all_queries()[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        os.makedirs(OUT, exist_ok=True)
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt "
              f"({buf.getvalue().count('Exchange')} Exchange mentions)")
    finally:
        similarity.ivf_assign_with_model = orig
        _dedup.minhash_signatures = orig_mh


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    before_only = "--before-only" in sys.argv
    after_only = "--after-only" in sys.argv
    for q in args:
        fold_b, fold_a = (False, True) if q in TWO_LEVEL else (None, None)
        if not after_only:
            dump(q, "before", fold_b)
        if not before_only:
            dump(q, "after", fold_a)
