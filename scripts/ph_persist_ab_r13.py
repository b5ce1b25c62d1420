import os, sys, time, json, gc
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from logsdb_spark.session import get_spark
SF_DIR = "/root/testdata/sf0.1"
spark = get_spark("ph-persist-ab")
spark.sparkContext.setLogLevel("ERROR")
import bench
bench.warm_up(spark, SF_DIR)
from logsdb_spark.operators import dedup as D
from logsdb_spark.operators.multimodal import image_dhash
from logsdb_spark.operators.silver import media_blob_layout
from logsdb_spark.plans.extensions import _widened_layout

def build(persist):
    blobs = _widened_layout(
        spark, SF_DIR,
        media_blob_layout(spark, SF_DIR)
        .filter((F.col("doc_id") % 2 == 0) & (F.col("text_len") > 0))
        .select("doc_id", "payload"),
        "media_png_ph",
    )
    hashes = image_dhash(blobs)
    buckets = D._hamming_buckets(hashes, 3, "doc_id", "phash")
    if persist:
        buckets = buckets.persist()
    in_row_bucket = 256
    def verified(cand):
        return (cand.withColumn("hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).cast("long"))
                .filter(F.col("hamming") <= 3).select("bk","id_a","id_b","hamming"))
    small = verified(buckets.filter(F.size("ms") <= in_row_bucket)
        .select("bk", F.explode(F.expr(
            "flatten(transform(ms, (a, i) -> transform(slice(ms, i + 2, size(ms)), "
            "b -> struct(a._id AS id_a, b._id AS id_b, a._ph AS ph_a, b._ph AS ph_b))))" )).alias("p"))
        .select("bk","p.id_a","p.id_b","p.ph_a","p.ph_b"))
    bigm = buckets.filter(F.size("ms") > in_row_bucket).select("bk", F.explode("ms").alias("m"))
    big = verified(bigm.select("bk", F.col("m._id").alias("id_a"), F.col("m._ph").alias("ph_a"))
        .join(bigm.select("bk", F.col("m._id").alias("id_b"), F.col("m._ph").alias("ph_b")), "bk")
        .filter(F.col("id_a") < F.col("id_b")))
    return small.unionByName(big).select("id_a","id_b","hamming").distinct().orderBy("id_a","id_b")

res={}
for rep in range(4):
    for key, p in (("persist", True), ("plain", False)):
        t0=time.perf_counter(); build(p).count(); el=round(time.perf_counter()-t0,3)
        res.setdefault(key,[]).append(el)
        spark.catalog.clearCache(); gc.collect()
print(json.dumps({k: {"reps":v,"min":min(v)} for k,v in res.items()}, indent=1))
