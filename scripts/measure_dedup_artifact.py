"""Round-11 sf1 evidence for the DEDUP nightly-artifact story (third
leg of the serving-split trilogy): build the corpus MinHash band-key
store, WRITE it as a (band, key)-bucketed external parquet table,
reload it through the catalog, probe the arrival batch
(``incremental_lsh_candidates`` — only the batch is shingled/hashed;
the store joins from bucket files with no store-side Exchange), and
verify candidates with exact trigram Jaccard.  Compares against the
all-in-session path (store rebuilt per run — what a deployment
WITHOUT the artifact pays every day).

Registered `dedup_index_nightly_e2e` pins the values at driver scale;
this script records the sf1 walls for SCALE.md.

Usage: python scripts/measure_dedup_artifact.py [SF_DIR]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.dedup import (
    incremental_lsh_candidates,
    minhash_band_keys,
    ngram_jaccard_pairs,
)
from prod_recommendation_pyspark_spark.session import get_spark
from prod_recommendation_pyspark_spark.sources.writers import write_bucketed


def run(spark, sf_dir: str) -> dict:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").localCheckpoint()
    out: dict = {"sf_dir": sf_dir, "n_docs": docs.count()}
    corpus = docs.filter(F.col("doc_id") % 5 != 4)
    batch = docs.filter(F.col("doc_id") % 5 == 4)
    out["batch_rows"] = batch.count()
    base = tempfile.mkdtemp(prefix="dedup_artifact_sf1_")

    # 1. nightly BUILD: hash the corpus once, write the bucketed store
    t0 = time.time()
    store = minhash_band_keys(corpus, "doc_id", "text")
    write_bucketed(
        store, "dedup_idx_sf1", 16, ["band", "key"], path=f"{base}/store"
    )
    out["build_write_wall_s"] = round(time.time() - t0, 1)

    # 2. intraday PROBE off the reloaded store (+ exact verify)
    reloaded = spark.table("dedup_idx_sf1")
    out["store_rows"] = reloaded.count()
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
    got = {(r[0], r[1]) for r in verified.select("id_a", "id_b").collect()}
    out["probe_verify_wall_s"] = round(time.time() - t0, 1)
    out["verified_pairs"] = len(got)

    # 3. the no-artifact baseline: rebuild the store in-session and
    #    run the same probe+verify (what every day costs WITHOUT the
    #    nightly write)
    t0 = time.time()
    store2 = minhash_band_keys(corpus, "doc_id", "text")
    cands2 = incremental_lsh_candidates(
        store2, batch, "doc_id", "text"
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
    )
    verified2 = ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_words=3, threshold=0.8,
        candidates=cands2,
    )
    got2 = {(r[0], r[1]) for r in verified2.select("id_a", "id_b").collect()}
    out["insession_wall_s"] = round(time.time() - t0, 1)
    out["matches_insession"] = got == got2
    spark.sql("DROP TABLE IF EXISTS dedup_idx_sf1")
    shutil.rmtree(base, ignore_errors=True)
    return out


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = get_spark(app_name="dedup_artifact_measure")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run(spark, sf_dir)), flush=True)
