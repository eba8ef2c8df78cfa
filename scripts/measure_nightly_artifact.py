"""Round-11 sf1 evidence for the NIGHTLY-ARTIFACT story end to end:
``rank_window_index(window=None)`` derives the build window from a
calibration prospect frame at index time, the artifact is WRITTEN to
parquet (partitioned by ``__lvl``, the layout the index docstring
prescribes), a fresh read of that artifact serves a ~1k-prospect batch
with NO window passed anywhere (the probe reads ``__w`` off the
artifact), and the served top-15 is checked for recall against the
exact blocked kernel on the same batch.

This is the deployment contract a nightly build actually exercises —
the pytest (`test_index_parquet_roundtrip_probe_parity`) pins it at
fixture scale and the registered `rank_window_nightly_e2e` query pins
it under the full value oracle at driver scale; this script records
the sf1 walls for SCALE.md.

Usage: python scripts/measure_nightly_artifact.py [SF_DIR] [OUT_DIR]
Prints one JSON line.
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


def run(spark, sf_dir: str, out_dir: str) -> dict:
    pros, clis = _rank_sides(spark, sf_dir)
    out: dict = {"sf_dir": sf_dir, "n_pros": pros.count(), "n_clis": clis.count()}
    kw = dict(k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS)

    # 1. nightly BUILD: derive the window from the calibration frame,
    #    stamp __w, write the artifact partitioned by __lvl
    t0 = time.time()
    index = rank_window_index(
        clis, "src_custkey", window=None,
        calibration=pros, calibration_id="tgt_custkey", **kw,
    )
    index.write.mode("overwrite").partitionBy("__lvl").parquet(out_dir)
    out["build_write_wall_s"] = round(time.time() - t0, 1)

    # 2. fresh read of the artifact — the ONLY thing serving sees
    artifact = spark.read.parquet(out_dir)
    out["index_rows"] = artifact.count()
    out["derived_w"] = int(artifact.agg(F.max("__w")).first()[0])

    # 3. window-less probe of a ~1k-prospect serving batch
    mod = max(1, out["n_pros"] // 1000)
    batch = pros.filter(F.col("tgt_custkey") % (10 * mod) == 0).localCheckpoint()
    out["probe_batch_rows"] = batch.count()
    t0 = time.time()
    cand = rank_window_probe(batch, artifact, "tgt_custkey", "src_custkey")
    served = hybrid_topk_pruned(
        batch, clis, "tgt_custkey", "src_custkey",
        candidates=cand, dim=2, **kw,
    )
    got = {(r[0], r[1]) for r in
           served.select("tgt_custkey", "src_custkey").collect()}
    out["probe_wall_s"] = round(time.time() - t0, 1)
    out["served_pairs"] = len(got)

    # 4. recall vs the exact blocked kernel on the SAME batch
    t0 = time.time()
    exact = hybrid_topk(batch, clis, "tgt_custkey", "src_custkey", **kw)
    want = {(r[0], r[1]) for r in
            exact.select("tgt_custkey", "src_custkey").collect()}
    out["exact_batch_wall_s"] = round(time.time() - t0, 1)
    out["recall"] = round(len(got & want) / len(want), 4) if want else None
    return out


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/nightly_index_artifact"
    spark = get_spark(app_name="nightly_artifact_measure")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        print(json.dumps(run(spark, sf_dir, out_dir)), flush=True)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
