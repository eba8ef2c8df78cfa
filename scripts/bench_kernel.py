"""Kernel-regime microbench: expression fold vs Arrow kernel pairwise
cosine at controlled candidate-pair volumes.

The engine documents a crossover (operators/similarity.py:89-118): the
interpreted ``aggregate(zip_with(...))`` expression path wins at the
ANN queries' ~10^5-10^6 candidate volumes, while the Arrow-batched
``seq_cosine_kernel`` wins at >=10^7 pairs.  This script MEASURES both
paths at ~1e6 and ~1.6e7 pairs on the sf0.1 embeddings (dim 64) so the
claim is a recorded number, not prose.  Results land in BENCH.md.

Method: amplify the 2000-row embedding table x2 per side (distinct
synthetic ids), build the pair set with a modulus filter to hit the
target volume, then time a full ``sum(score)`` materialization of the
SAME pair plan scored both ways.  The pair set is materialized
(localCheckpoint) before timing so the scored stage — not the pair
generation — is what the clock sees.  Each (volume, path) runs
``repeats`` times; the MEDIAN is reported.

Usage: python scripts/bench_kernel.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.similarity import (
    seq_cosine_kernel,
)
from prod_recommendation_pyspark_spark.session import get_spark
from prod_recommendation_pyspark_spark.sources.catalog import Catalog


def expr_cosine(qc: str, cc: str) -> F.Column:
    qn = F.sqrt(F.aggregate(qc, F.lit(0.0), lambda a, x: a + x * x))
    cn = F.sqrt(F.aggregate(cc, F.lit(0.0), lambda a, x: a + x * x))
    dot = F.aggregate(
        F.zip_with(qc, cc, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    return dot / (qn * cn)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(os.environ.get("BENCH_KERNEL_REPEATS", "3"))
    spark = get_spark(app_name="bench_kernel")
    par = spark.sparkContext.defaultParallelism
    # warm the Python worker pool so the kernel path's first Arrow batch
    # doesn't pay 32 one-time worker spawns inside the timed section
    spark.range(par * 4, numPartitions=par).mapInPandas(
        lambda it: it, "id long"
    ).count()

    emb = Catalog(spark, sf_dir).table("embeddings")
    # x2 amplification per side -> 4000 x 4000 = 1.6e7 full cross
    amp = (
        emb.crossJoin(spark.range(2).select(F.col("id").alias("__rep")))
        .select(
            (F.col("vec_id") * 2 + F.col("__rep")).alias("id"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
    )
    a = amp.select(F.col("id").alias("qid"), F.col("v").alias("qv"))
    b = amp.select(F.col("id").alias("cid"), F.col("v").alias("cv"))

    results = {}
    for label, modulus in (("1e6_pairs", 16), ("1.6e7_pairs", 1)):
        pairs = (
            a.crossJoin(b)
            .filter(((F.col("qid") * 31 + F.col("cid")) % modulus) == 0)
            .repartition(par, "qid")
            .localCheckpoint()  # pin the pair set; time only the scoring
        )
        n_pairs = pairs.count()
        for path, score in (
            ("expr", expr_cosine("qv", "cv")),
            ("kernel", seq_cosine_kernel("qv", "cv")),
        ):
            times = []
            for _ in range(repeats):
                t0 = time.monotonic()
                pairs.select(score.alias("s")).agg(F.sum("s")).collect()
                times.append(round(time.monotonic() - t0, 3))
            results[f"{label}:{path}"] = {
                "n_pairs": n_pairs,
                "median_sec": statistics.median(times),
                "runs": times,
            }
        pairs.unpersist()
    print(json.dumps({"metric": "kernel_crossover", "dim": 64, **results}))
    spark.stop()


if __name__ == "__main__":
    main()
