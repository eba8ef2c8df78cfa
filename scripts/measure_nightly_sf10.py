"""Round-12 fourth-decade evidence for the rank-window NIGHTLY
ARTIFACT (+ its round-12 delete lifecycle): at sf10 (1.35M clients /
150k prospects — 100 key-shifted sf0.1 customer replicas, the same
construction as scripts/measure_rank_window_sf10.py), build the index
at the sf10-derived window 1024 (round-11 measured: sampled max-need
364 → ladder 1024; re-deriving here would re-pay the 731s calibration
the round-11 appendix already recorded), WRITE it partitioned by
``__lvl``, reload cold, and serve a ~1k-prospect batch window-lessly
(the probe reads ``__w`` off the artifact).

What the decade-up run must show (round-11 verdict #6):

* the PROBE wall rides window × batch, not corpus — sf1 measured
  7.6s at window 256; at sf10 the corpus is 10× and the window 4×,
  so a healthy probe lands ~2-4× the sf1 wall (fetch rows ≈
  arms × 2·window × batch), nowhere near 10×.  If it rides the
  corpus, the block summary (|R|·(code_len+1)/window broadcast rows)
  is the first suspect.
* recall vs the exact blocked kernel on a 100-prospect subsample of
  the batch stays 1.0000 at window 1024 (the derived value).
* the round-12 DELETE lifecycle holds at scale: tombstone 1% of
  clients → ``rank_window_compact`` (re-rank from stored ``__v1n``,
  no corpus rescan) → rewrite → probe the compacted artifact; the
  compaction wall should ride the INDEX size (slim rows), and the
  compacted probe must serve no deleted client.

Generate the input first (one-time, ~1 min, pure DuckDB):
    python scripts/gen_sf10_customers.py  [/tmp/sf10]
Usage:
    python scripts/measure_nightly_sf10.py [SF_DIR] [OUT_DIR] [WINDOW]
Prints one JSON line for SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.hybrid import (
    hybrid_topk,
    hybrid_topk_pruned,
    rank_window_compact,
    rank_window_index,
    rank_window_probe,
)
from prod_recommendation_pyspark_spark.queries.similarity import (
    THRESHOLD,
    TOPK_PEERS,
    W_HAVS,
    W_HOPS,
    _rank_sides,
)
from prod_recommendation_pyspark_spark.session import get_spark


def run(spark, sf_dir: str, out_dir: str, window: int) -> dict:
    pros, clis = _rank_sides(spark, sf_dir)
    out: dict = {
        "sf_dir": sf_dir,
        "window": window,
        "n_pros": pros.count(),
        "n_clis": clis.count(),
    }
    kw = dict(k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS)

    # 1. nightly BUILD at the (already-derived) window, written out
    t0 = time.time()
    rank_window_index(clis, "src_custkey", window=window).write.mode(
        "overwrite"
    ).partitionBy("__lvl").parquet(out_dir)
    out["build_write_wall_s"] = round(time.time() - t0, 1)
    artifact = spark.read.parquet(out_dir)
    out["index_rows"] = artifact.count()

    # 2. window-less 1k probe off the cold artifact
    mod = max(1, out["n_pros"] // 1000)
    batch = pros.filter(
        F.col("tgt_custkey") % (10 * mod) == 0
    ).localCheckpoint()
    out["probe_batch_rows"] = batch.count()

    def serve(idx, clients):
        cand = rank_window_probe(batch, idx, "tgt_custkey", "src_custkey")
        served = hybrid_topk_pruned(
            batch, clients, "tgt_custkey", "src_custkey",
            candidates=cand, dim=2, **kw,
        )
        return {
            (r[0], r[1])
            for r in served.select("tgt_custkey", "src_custkey").collect()
        }

    t0 = time.time()
    got = serve(artifact, clis)
    out["probe_wall_s"] = round(time.time() - t0, 1)
    out["served_pairs"] = len(got)

    # 3. recall vs the exact kernel on a 100-prospect subsample (the
    #    full-batch kernel is ~1.35e9 pairs — the subsample protocol
    #    of measure_rank_window_sf10.py)
    sub = batch.filter(F.col("tgt_custkey") % (100 * mod) == 0).localCheckpoint()
    out["subsample_rows"] = sub.count()
    t0 = time.time()
    exact = hybrid_topk(sub, clis, "tgt_custkey", "src_custkey", **kw)
    want = {
        (r[0], r[1])
        for r in exact.select("tgt_custkey", "src_custkey").collect()
    }
    out["exact_subsample_wall_s"] = round(time.time() - t0, 1)
    sub_ids = {r[0] for r in sub.select("tgt_custkey").collect()}
    sub_got = {p for p in got if p[0] in sub_ids}
    out["recall"] = round(len(sub_got & want) / len(want), 4) if want else None

    # 4. round-12 delete lifecycle at scale: tombstone ~1% of clients,
    #    compact from the artifact alone, rewrite, probe compacted
    tombs = clis.filter(F.col("src_custkey") % 100 == 7).select(
        "src_custkey"
    ).localCheckpoint()
    out["tombstone_rows"] = tombs.count()
    t0 = time.time()
    rank_window_compact(artifact, tombs).write.mode("overwrite").partitionBy(
        "__lvl"
    ).parquet(out_dir + "_compacted")
    out["compact_write_wall_s"] = round(time.time() - t0, 1)
    compacted = spark.read.parquet(out_dir + "_compacted")
    out["compacted_rows"] = compacted.count()
    kept = clis.join(F.broadcast(tombs), "src_custkey", "left_anti")
    t0 = time.time()
    got_c = serve(compacted, kept)
    out["compacted_probe_wall_s"] = round(time.time() - t0, 1)
    deleted = {r[0] for r in tombs.collect()}
    out["compacted_serves_deleted"] = len(
        {p[1] for p in got_c} & deleted
    )  # MUST be 0
    return out


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/nightly_index_sf10"
    window = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    spark = get_spark(app_name="nightly_artifact_sf10")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        print(json.dumps(run(spark, sf_dir, out_dir, window)), flush=True)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(out_dir + "_compacted", ignore_errors=True)
