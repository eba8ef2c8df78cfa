"""Round-11 third-decade evidence for the rank-window derivation: at
sf10 (1.5M customers → 1.35M clients / 150k prospects, built from 100
key-shifted sf0.1 replicas so the NAICS/angle tie structure scales
with the corpus), does the data-derived window leave the
measured-exact-at-sf1 constant 256 behind — i.e. was pinning 256 a
scale landmine the derivation defuses?

Protocol (exact kernel on the full 150k-prospect side would be
~10⁴ s, so recall is verified on a SUBSAMPLE):

1. derive the window from the standard calibration
   (``derive_rank_window_stats`` — sample widens from mod 500);
2. build the index at the derived window, probe a 1k-prospect batch;
3. ground truth: the blocked exact kernel on a ~100-prospect
   subsample of that batch vs the full corpus; recall = served ∩
   exact on the subsample;
4. for contrast, the same subsample recall with the window PINNED at
   the sf1 constant 256 — if the derived window is larger and the
   pinned recall is < 1.0, the round's derive-don't-pin thesis is
   measured, not argued.

Usage: python scripts/measure_rank_window_sf10.py [SF_DIR]
Prints one JSON line.  Needs only ``customer.parquet`` in SF_DIR.
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
)
from prod_recommendation_pyspark_spark.queries.similarity import (
    THRESHOLD,
    TOPK_PEERS,
    W_HAVS,
    W_HOPS,
    _rank_sides,
)
from prod_recommendation_pyspark_spark.session import get_spark

KW = dict(k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS)


def topk_pairs(pros, clis, window):
    cand = rank_window_candidates(
        pros, clis, "tgt_custkey", "src_custkey", window=window, **KW
    )
    served = hybrid_topk_pruned(
        pros, clis, "tgt_custkey", "src_custkey",
        candidates=cand, dim=2, **KW,
    )
    return {
        (r[0], r[1])
        for r in served.select("tgt_custkey", "src_custkey").collect()
    }


def run(spark, sf_dir: str) -> dict:
    pros, clis = _rank_sides(spark, sf_dir)
    out: dict = {
        "sf_dir": sf_dir, "n_pros": pros.count(), "n_clis": clis.count()
    }

    t0 = time.time()
    stats = derive_rank_window_stats(
        pros, clis, "tgt_custkey", "src_custkey", **KW
    )
    out["derive_wall_s"] = round(time.time() - t0, 1)
    out.update({k: stats[k] for k in
                ("n_sampled", "n_pairs", "max_needed", "window",
                 "sample_mod")})

    # serving batch + exact-kernel subsample ground truth
    batch = pros.filter(F.col("tgt_custkey") % 1500 == 0).localCheckpoint()
    out["batch_rows"] = batch.count()
    sub = batch.filter(F.col("tgt_custkey") % 15000 == 0).localCheckpoint()
    out["subsample_rows"] = sub.count()
    t0 = time.time()
    exact = hybrid_topk(sub, clis, "tgt_custkey", "src_custkey", **KW)
    want = {
        (r[0], r[1])
        for r in exact.select("tgt_custkey", "src_custkey").collect()
    }
    out["exact_subsample_wall_s"] = round(time.time() - t0, 1)

    for label, window in (("derived", stats["window"]), ("pinned256", 256)):
        t0 = time.time()
        got = topk_pairs(batch, clis, window)
        sub_got = {p for p in got if p[0] % 15000 == 0}
        out[f"{label}_batch_wall_s"] = round(time.time() - t0, 1)
        out[f"{label}_recall"] = (
            round(len(sub_got & want) / len(want), 4) if want else None
        )
    return out


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    spark = get_spark(app_name="rank_window_sf10")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run(spark, sf_dir)), flush=True)
