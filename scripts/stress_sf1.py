"""Scale-stability stress: run the heaviest queries at an sf dir and
record wall time + the AQE-final physical join/exchange mix.

Purpose (SCALE.md appendix): prove the heavy plans are SHAPE-stable
across a decade of scale — at sf1 the plans should keep the same
bounded-bucket structure, with AQE degrading broadcasts to shuffle
joins where the build side outgrew the threshold, and nothing
collapsing onto the driver.

Usage:
    python scripts/stress_sf1.py /root/testdata/sf0.1
    PYSPARK_SUBMIT_ARGS="--driver-memory 16g pyspark-shell" \
        python scripts/stress_sf1.py /tmp/sf1
    python scripts/stress_sf1.py /tmp/sf1 query_a query_b  # override set

Prints one JSON line per query: wall seconds, result rows, and counts
of BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin /
BroadcastNestedLoopJoin / Exchange nodes in the executed (post-AQE)
plan.
"""

from __future__ import annotations

import json
import re
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prod_recommendation_pyspark_spark.queries import QUERIES
from prod_recommendation_pyspark_spark.session import get_spark

HEAVY = [
    "als_recommend_topn",
    "minhash_lsh_dedup_candidates",
    "ann_lsh_topk_embeddings",
    "peer_search_hybrid_topk",
    "peer_search_rank_window_topk",
    "pagerank_trade_graph",
]

PLAN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "Exchange",
)


def main() -> None:
    sf_dir = sys.argv[1]
    heavy = sys.argv[2:] or HEAVY
    spark = get_spark(app_name="stress_sf1")
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4, numPartitions=par).mapInPandas(
        lambda it: it, "id long"
    ).count()
    for name in heavy:
        spark.catalog.clearCache()
        t0 = time.monotonic()
        df = QUERIES[name](spark, sf_dir)
        n = df.count()
        wall = round(time.monotonic() - t0, 2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        mix = {
            node: len(re.findall(rf"\b{node}\b", plan)) for node in PLAN_NODES
        }
        print(
            json.dumps(
                {"query": name, "sf_dir": sf_dir, "sec": wall, "rows": n, **mix}
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
