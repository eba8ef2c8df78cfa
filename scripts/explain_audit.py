"""Plan audit: print a physical-plan summary for every registered query.

For each query: parquet scans (with PushedFilters / ReadSchema), join
strategies, exchange (shuffle) count, and whole-stage-codegen span
count.  The review loop for 100 TB readiness — a scan reading all
columns for a narrow projection, a sort-merge join where a broadcast
was expected, or an unexpected extra Exchange shows up here first.

Usage: python scripts/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from prod_recommendation_pyspark_spark.queries.registry import QUERIES  # noqa: E402

KEEP = (
    "Scan parquet",
    "PushedFilters",
    "ReadSchema",
    "Join",
    "Exchange",
    "WholeStageCodegen",
    "InMemoryTableScan",
)


def summarize(plan: str) -> list[str]:
    out = []
    for line in plan.splitlines():
        ls = line.strip(" :+-*")
        if any(k in ls for k in KEEP):
            out.append(ls[:160])
    return out


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(QUERIES)
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        try:
            plan = QUERIES[name](spark, sf)._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # pragma: no cover - audit tool
            print(f"== {name}: ERROR {exc}")
            continue
        shuffles = sum("Exchange" in l and "Broadcast" not in l for l in plan.splitlines())
        print(f"== {name} (shuffle exchanges: {shuffles})")
        for line in summarize(plan):
            print("   ", line)
    spark.stop()


if __name__ == "__main__":
    main()
