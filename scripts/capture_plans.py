"""Capture `.explain("formatted")` output for named queries into
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence
files (the judge reads these instead of running Spark).

Usage:
  python scripts/capture_plans.py <tag> <suffix> [query ...]
Defaults: all bench HEADLINE queries, sf dir from $SPARK_GRAFT_SF_DIR
(plan shape is sf-independent; default sf0.01 keeps any plan-build-time
probes cheap).
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import SparkSession  # noqa: E402

from prod_recommendation_pyspark_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    if len(sys.argv) > 3:
        names = sys.argv[3:]
    else:
        import bench

        names = [n for n in bench.HEADLINE if n in QUERIES]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(ROOT, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        try:
            plan = (
                QUERIES[name](spark, sf)._jdf.queryExecution().explainString(mode)
            )
        except Exception as exc:
            plan = f"ERROR building {name}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf} ({suffix})\n")
            f.write(plan)
        shuffles = sum(
            "Exchange" in ln and "Broadcast" not in ln
            for ln in plan.splitlines()
        )
        print(f"{name}: wrote {path} (non-broadcast exchanges: {shuffles})")
    spark.stop()


if __name__ == "__main__":
    main()
