import os, sys, time, json, gc
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from logsdb_spark.session import get_spark
SF_DIR = "/root/testdata/sf0.1"
spark = get_spark("mh-engine-ab")
spark.sparkContext.setLogLevel("ERROR")
import bench
bench.warm_up(spark, SF_DIR)
from logsdb_spark.operators.dedup import (shingle_sets, minhash_signatures,
    lsh_candidate_pairs, estimate_jaccard, verify_pairs, DEFAULT_MAX_BUCKET)
from logsdb_spark.plans.extensions import _widened

docs = _widened(spark, SF_DIR, "documents")

def full(engine):
    sh = shingle_sets(docs, "text").persist()
    sg = minhash_signatures(sh, engine=engine).persist()
    cands = estimate_jaccard(lsh_candidate_pairs(sg, max_bucket=DEFAULT_MAX_BUCKET), sg).filter(F.col("est_jac") >= 0.4)
    return verify_pairs(cands, sh, 0.6).orderBy("id_a","id_b")

a = [tuple(r) for r in full("jvm").collect()]
spark.catalog.clearCache(); gc.collect()
b = [tuple(r) for r in full("arrow").collect()]
spark.catalog.clearCache(); gc.collect()
assert a == b, "engine results differ"
print(json.dumps({"parity_rows": len(a)}), flush=True)

res={}
for rep in range(4):
    for eng in ("jvm","arrow"):
        t0=time.perf_counter(); full(eng).count(); el=round(time.perf_counter()-t0,3)
        res.setdefault(eng,[]).append(el)
        spark.catalog.clearCache(); gc.collect()
print(json.dumps({k: {"reps":v,"min":min(v)} for k,v in res.items()}, indent=1))
