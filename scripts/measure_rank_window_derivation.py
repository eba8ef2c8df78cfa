"""Round-11 evidence run for the window=None rank-window derivation
and the serving-path probe at scale (SCALE.md round-11 appendix).

Per sf dir:
  1. derive_rank_window_stats on the registered firmographics split
     (prospects = c_custkey % 10 == 0) — records the sampled max-need,
     the widened sample_mod, and the derived window (floor 64);
  2. rank_window_candidates(window=None) end-to-end recall vs the
     exact blocked kernel's top-15 (the number the docstring cites);
  3. index build wall (rank_window_index at the derived window,
     localCheckpointed = the nightly artifact stand-in) and the wall
     of probing a ~1k-prospect batch against it + exact-scoring the
     probed candidates — the serving-path number to compare with the
     one-shot batch wall.

Usage: python scripts/measure_rank_window_derivation.py SF_DIR [...]
Prints one JSON line per sf dir.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.hybrid import (
    derive_rank_window_stats,
    hybrid_topk,
    hybrid_topk_pruned,
    rank_window_candidates,
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


def run(spark, sf_dir: str) -> dict:
    # the REGISTERED queries' own prospect/client split — measuring
    # anything else would let the evidence drift from what production
    # runs (code-review r11)
    pros, clis = _rank_sides(spark, sf_dir)
    out: dict = {"sf_dir": sf_dir, "n_pros": pros.count(), "n_clis": clis.count()}

    t0 = time.time()
    stats = derive_rank_window_stats(
        pros, clis, "tgt_custkey", "src_custkey",
        k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
    )
    out["derive_stats"] = stats
    out["derive_wall_s"] = round(time.time() - t0, 1)

    kw = dict(
        k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
    )
    t0 = time.time()
    cand = rank_window_candidates(
        pros, clis, "tgt_custkey", "src_custkey", window=None, **kw
    )
    derived = hybrid_topk_pruned(
        pros, clis, "tgt_custkey", "src_custkey",
        candidates=cand, dim=2, **kw,
    )
    got = {(r[0], r[1]) for r in
           derived.select("tgt_custkey", "src_custkey").collect()}
    out["derived_path_wall_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    exact = hybrid_topk(pros, clis, "tgt_custkey", "src_custkey", **kw)
    want = {(r[0], r[1]) for r in
            exact.select("tgt_custkey", "src_custkey").collect()}
    out["exact_wall_s"] = round(time.time() - t0, 1)
    out["recall"] = round(len(got & want) / len(want), 4) if want else None
    out["n_exact_pairs"] = len(want)

    # serving path: nightly index build + ~1k-prospect probe batch
    w = stats["window"]
    t0 = time.time()
    index = rank_window_index(
        clis, "src_custkey", window=w
    ).localCheckpoint()
    n_index = index.count()
    out["index_rows"] = n_index
    out["index_build_wall_s"] = round(time.time() - t0, 1)
    n_pros = out["n_pros"]
    mod = max(1, n_pros // 1000)  # ~1k-prospect serving batch
    batch = pros.filter(F.col("tgt_custkey") % (10 * mod) == 0)
    out["probe_batch_rows"] = batch.count()
    t0 = time.time()
    probed = rank_window_probe(
        batch, index, "tgt_custkey", "src_custkey"
    )
    served = hybrid_topk_pruned(
        batch, clis, "tgt_custkey", "src_custkey",
        candidates=probed, dim=2, **kw,
    )
    out["probe_topk_rows"] = served.count()
    out["probe_wall_s"] = round(time.time() - t0, 1)
    return out


if __name__ == "__main__":
    spark = get_spark(app_name="rank_window_derivation_measure")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.01"]:
        print(json.dumps(run(spark, sf_dir)), flush=True)
