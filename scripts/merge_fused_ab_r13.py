import os, sys, time, json, gc
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from logsdb_spark.session import get_spark
SF_DIR = "/root/testdata/sf0.1"
spark = get_spark("merge-ab2")
spark.sparkContext.setLogLevel("ERROR")
import bench
bench.warm_up(spark, SF_DIR)
from logsdb_spark.operators.dedup import (winnow_count_delta, winnow_pairs_from_counts,
    _capped_bucket_emit_delta)
from logsdb_spark.operators.silver import winnow_fp_layout, winnow_edge_count_layout

idx = winnow_fp_layout(spark, SF_DIR)
old_ex = idx.filter(F.col("doc_id") % 10 != 0)
new_ex = idx.filter(F.col("doc_id") % 10 == 0)
stored = winnow_edge_count_layout(spark, SF_DIR)

def emissions():
    touched = F.broadcast(new_ex.select("fp").distinct())
    tagged = (old_ex.join(touched, "fp").select("doc_id","fp").withColumn("is_new", F.lit(False))
              .unionByName(new_ex.select("doc_id","fp").withColumn("is_new", F.lit(True))))
    return _capped_bucket_emit_delta(tagged)

def wn_join():
    delta = winnow_count_delta(old_ex, new_ex)
    m = (stored.join(delta, ["id_a","id_b"], "full")
        .select("id_a","id_b",(F.coalesce(F.col("n"),F.lit(0))+F.coalesce(F.col("dn"),F.lit(0))).alias("n"))
        .filter(F.col("n") > 0))
    return winnow_pairs_from_counts(m).orderBy("id_a","id_b")

def wn_fused():
    em = emissions()
    m = (stored.select("id_a","id_b","n")
        .unionByName(em.filter(~F.col("is_star"))
                     .select("id_a","id_b", F.col("s").cast("long").alias("n")))
        .groupBy("id_a","id_b").agg(F.sum("n").alias("n"))
        .filter(F.col("n") > 0))
    return winnow_pairs_from_counts(m).orderBy("id_a","id_b")

a = [tuple(r) for r in wn_join().collect()]; spark.catalog.clearCache(); gc.collect()
b = [tuple(r) for r in wn_fused().collect()]; spark.catalog.clearCache(); gc.collect()
assert a == b
print(json.dumps({"parity_rows": len(a)}), flush=True)

res={}
for rep in range(5):
    for form, fn in (("join", wn_join), ("fused", wn_fused)):
        t0=time.perf_counter(); fn().count(); el=round(time.perf_counter()-t0,3)
        res.setdefault(form,[]).append(el)
        spark.catalog.clearCache(); gc.collect()
print(json.dumps({k: {"reps":v,"min":min(v)} for k,v in res.items()}, indent=1), flush=True)
