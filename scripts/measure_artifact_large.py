"""Round-13 verdict #2: ONE GENUINELY LARGE artifact round-trip,
measured — the 100 TB story gets a two-decade-up local data point
instead of plan-shape argument alone.

ANN leg (corpus from scripts/gen_ann_large.py, default 10M × 64-d):
build the IVF artifact at the sqrt(N) density (blocked-kernel
assignment), WRITE it list-partitioned, reload COLD, then measure the
intraday lifecycle against the reloaded artifact:
  * probe wall for a fixed ~1k serving batch (n_probe=16, kernel
    scoring) + recall vs the exact blocked kernel on a 64-query
    sub-batch (full-batch brute force at 10M is the quadratic job
    this artifact exists to avoid);
  * tombstone-probe wall (takedown concentrated in one Gaussian
    cluster — the realistic shape: deletes land in FEW lists);
  * ivf_compact_rewrite wall + how many of the lists it actually
    rewrote (partial compaction is the point being measured).

DEDUP leg (corpus from scripts/gen_docs_large.py, default 2M docs →
~32M band-key store rows): nightly bucketed store build+write wall,
then the intraday probe (incremental_lsh_candidates + exact-Jaccard
verify) for a ~20k-doc arrival batch off the RELOADED store.

Prints one JSON line for SCALE.md's round-13 appendix.

Usage: python scripts/measure_artifact_large.py [ANN_DIR] [DOCS_DIR] [WORK_DIR]
       (defaults /tmp/ann10m /tmp/docs2m /tmp/artifact_large)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.dedup import (
    incremental_lsh_candidates,
    minhash_band_keys,
    ngram_jaccard_pairs,
)
from prod_recommendation_pyspark_spark.operators.similarity import (
    cosine_topk,
    ivf_compact_rewrite,
    ivf_index,
    ivf_probe,
    l2_normalize,
)
from prod_recommendation_pyspark_spark.session import get_spark
from prod_recommendation_pyspark_spark.sources.writers import write_bucketed

K = 5
QMOD = 9767  # ~1k serving batch at 10M
SUBQ = 4     # recall ground truth on batch ids % (QMOD*SUBQ) == 3


def ann_leg(spark, ann_dir: str, work: str) -> dict:
    res: dict = {}
    emb = spark.read.parquet(ann_dir)
    n = emb.count()
    res["n_corpus"] = n
    mod = max(1, n // max(1, int(math.ceil(math.sqrt(n)))))
    centroids = emb.filter(F.col("vec_id") % mod == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("vec")
    ).localCheckpoint()
    res["n_lists"] = centroids.count()
    corpus = emb.select(F.col("vec_id").alias("nbr_id"), "embedding")
    out_dir = f"{work}/ivf"

    t0 = time.time()
    ivf_index(
        corpus, "nbr_id", "embedding", centroids, blocked=True
    ).repartition("ivf_list").write.mode("overwrite").partitionBy(
        "ivf_list"
    ).parquet(out_dir)
    res["build_write_wall_s"] = round(time.time() - t0, 1)

    artifact = spark.read.parquet(out_dir)
    res["index_rows"] = artifact.count()
    qs = emb.filter(F.col("vec_id") % QMOD == 3).select(
        F.col("vec_id").alias("tgt_id"), "embedding"
    ).localCheckpoint()
    res["batch_rows"] = qs.count()

    # warm + timed probe (serving pays the timed one per intraday batch)
    for tag in ("warm", "timed"):
        t0 = time.time()
        served = ivf_probe(
            qs, artifact, "tgt_id", "nbr_id", centroids,
            vec_col="embedding", k=K, n_probe=16, use_kernel=True,
        )
        got = {(r[0], r[1]) for r in served.select("tgt_id", "nbr_id").collect()}
        res[f"probe16_{tag}_wall_s"] = round(time.time() - t0, 1)
    res["served_pairs"] = len(got)

    # recall vs exact kernel on the sub-batch
    sub = emb.filter(F.col("vec_id") % (QMOD * SUBQ) == 3)
    norm = l2_normalize(emb, "embedding", "vec")
    left = l2_normalize(sub, "embedding", "vec").select(
        F.col("vec_id").alias("tgt_id"), "vec"
    )
    right = norm.select(F.col("vec_id").alias("nbr_id"), "vec")
    t0 = time.time()
    exact = cosine_topk(
        left, right, "tgt_id", "nbr_id", "vec", k=K, exclude_self=True
    )
    want = {(r[0], r[1]) for r in exact.select("tgt_id", "nbr_id").collect()}
    res["exact_subbatch_wall_s"] = round(time.time() - t0, 1)
    sub_ids = {t for t, _ in want}
    got_sub = {(t, c) for t, c in got if t in sub_ids}
    res["probe16_recall_subbatch"] = (
        round(len(got_sub & want) / len(want), 4) if want else None
    )

    # takedown concentrated in one cluster: tombstone-probe, compact
    tombs = emb.filter(
        (F.col("label") == 3) & (F.col("vec_id") % 10 == 0)
    ).select(F.col("vec_id").alias("nbr_id")).localCheckpoint()
    res["tombstone_rows"] = tombs.count()
    # warm + timed, like the plain probe: the first execution of ANY
    # probe plan shape in a session pays codegen + Arrow-worker +
    # page-cache warmup (~90s extra at 10M — round-13 isolated
    # sequence: tomb 127.6 cold → 31.6s warm vs plain 36.0 → 33.1),
    # which single-shot timing misreads as a tombstone penalty
    for tag in ("warm", "timed"):
        t0 = time.time()
        served_t = ivf_probe(
            qs, artifact, "tgt_id", "nbr_id", centroids,
            vec_col="embedding", k=K, n_probe=16, use_kernel=True,
            tombstones=tombs,
        )
        got_t = {
            (r[0], r[1])
            for r in served_t.select("tgt_id", "nbr_id").collect()
        }
        res[f"tombstone_probe_{tag}_wall_s"] = round(time.time() - t0, 1)
    res["tombstoned_served_clean"] = not (
        {c for _, c in got_t}
        & {r[0] for r in tombs.collect()}
    )

    t0 = time.time()
    n_affected = ivf_compact_rewrite(spark, out_dir, tombs, "nbr_id")
    res["compact_wall_s"] = round(time.time() - t0, 1)
    res["compact_affected_lists"] = n_affected
    res["compacted_rows"] = spark.read.parquet(out_dir).count()
    return res


def dedup_leg(spark, docs_dir: str, work: str) -> dict:
    res: dict = {}
    docs = spark.read.parquet(docs_dir)
    res["n_docs"] = docs.count()
    corpus = docs.filter(F.col("doc_id") % 97 != 4)
    batch = docs.filter(F.col("doc_id") % 97 == 4).localCheckpoint()
    res["batch_rows"] = batch.count()

    t0 = time.time()
    store = minhash_band_keys(corpus, "doc_id", "text")
    write_bucketed(
        store, "dedup_idx_large", 64, ["band", "key"],
        path=f"{work}/dedup_store",
    )
    res["build_write_wall_s"] = round(time.time() - t0, 1)
    reloaded = spark.table("dedup_idx_large")
    res["store_rows"] = reloaded.count()

    t0 = time.time()
    cands = incremental_lsh_candidates(
        reloaded, batch, "doc_id", "text"
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
    )
    verified = ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_words=3, threshold=0.8,
        candidates=cands,
    )
    res["verified_pairs"] = verified.count()
    res["probe_verify_wall_s"] = round(time.time() - t0, 1)
    spark.sql("DROP TABLE IF EXISTS dedup_idx_large")
    return res


if __name__ == "__main__":
    ann_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ann10m"
    docs_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/docs2m"
    work = sys.argv[3] if len(sys.argv) > 3 else "/tmp/artifact_large"
    spark = get_spark(app_name="artifact_large_measure")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    try:
        if os.path.isdir(ann_dir):
            out["ann"] = ann_leg(spark, ann_dir, work)
        if os.path.isdir(docs_dir):
            out["dedup"] = dedup_leg(spark, docs_dir, work)
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
