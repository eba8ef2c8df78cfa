import sys, time, tempfile, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from prod_recommendation_pyspark_spark.operators.dedup import (
    dedup_store_compact, incremental_lsh_candidates, minhash_band_keys,
)
from prod_recommendation_pyspark_spark.session import get_spark
from prod_recommendation_pyspark_spark.sources.writers import write_bucketed

spark = get_spark(app_name="dedup_large_lifecycle")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/tmp/docs2m")
corpus = docs.filter(F.col("doc_id") % 97 != 4)
batch = docs.filter(F.col("doc_id") % 97 == 4).localCheckpoint()
base = tempfile.mkdtemp(prefix="dedup_large_")
out = {}

t0 = time.time()
write_bucketed(minhash_band_keys(corpus, "doc_id", "text"),
               "dedup_large_store", 64, ["band", "key"], path=f"{base}/store")
out["build_write_wall_s"] = round(time.time() - t0, 1)
store = spark.table("dedup_large_store")
out["store_rows"] = store.count()

# warm + timed plain probe
for tag in ("warm", "timed"):
    t0 = time.time()
    n = incremental_lsh_candidates(store, batch, "doc_id", "text").count()
    out[f"probe_{tag}_wall_s"] = round(time.time() - t0, 1)
out["candidate_pairs"] = n

# tombstones: a takedown of 1% of corpus docs
tombs = corpus.filter(F.col("doc_id") % 100 == 7).select("doc_id").localCheckpoint()
out["tombstone_rows"] = tombs.count()
t0 = time.time()
nt = incremental_lsh_candidates(store, batch, "doc_id", "text", tombstones=tombs).count()
out["tombstone_probe_wall_s"] = round(time.time() - t0, 1)
out["tombstone_candidates"] = nt

# compact: anti-join + bucketed rewrite, then probe the compacted store
t0 = time.time()
write_bucketed(dedup_store_compact(store, tombs, "doc_id"),
               "dedup_large_store_c", 64, ["band", "key"], path=f"{base}/store_c")
out["compact_write_wall_s"] = round(time.time() - t0, 1)
comp = spark.table("dedup_large_store_c")
out["compacted_rows"] = comp.count()
t0 = time.time()
nc = incremental_lsh_candidates(comp, batch, "doc_id", "text").count()
out["compacted_probe_wall_s"] = round(time.time() - t0, 1)
out["compacted_equals_tombstone_probe"] = (nc == nt)

# append: a new day's docs ride in as band keys appended to the store
newday = docs.filter(F.col("doc_id") % 97 == 11)
t0 = time.time()
write_bucketed(minhash_band_keys(newday, "doc_id", "text"),
               "dedup_large_store_c", 64, ["band", "key"],
               mode="append", path=f"{base}/store_c")
out["append_wall_s"] = round(time.time() - t0, 1)
out["appended_rows"] = spark.table("dedup_large_store_c").count()
spark.sql("DROP TABLE IF EXISTS dedup_large_store")
spark.sql("DROP TABLE IF EXISTS dedup_large_store_c")
print("RESULT " + json.dumps(out), flush=True)
