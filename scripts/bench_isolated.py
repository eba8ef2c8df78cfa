"""Isolated per-query benchmark: one fresh JVM per headline query,
warmup (worker pool + sf0.001 pass), then N timed runs; the per-query
MEDIAN is the number that goes to BENCH.md.  Process isolation keeps
one query's GC/codegen/cache state from polluting the next — the
shared-session bench (bench.py) is the driver's contract, this is the
diagnostic that separates code regressions from sandbox noise.

Usage:
  python scripts/bench_isolated.py                # all headline queries
  python scripts/bench_isolated.py --child NAME   # internal: one query
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), BENCH_RUNS (3).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

WARMUP_DIR = "/root/testdata/sf0.001"


def child(name: str, sf_dir: str, n_runs: int) -> None:
    from prod_recommendation_pyspark_spark.queries import QUERIES
    from prod_recommendation_pyspark_spark.session import get_spark

    spark = get_spark(app_name=f"bench_iso_{name}")
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4, numPartitions=par).mapInPandas(
        lambda it: it, "id long"
    ).count()
    try:
        QUERIES[name](spark, WARMUP_DIR).count()
    except Exception:
        pass
    runs = []
    for _ in range(n_runs):
        t0 = time.monotonic()
        QUERIES[name](spark, sf_dir).count()
        runs.append(round(time.monotonic() - t0, 3))
    print(json.dumps({"name": name, "runs": runs,
                      "median": round(statistics.median(runs), 3)}))
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("BENCH_RUNS", "3"))
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(sys.argv[2], sf_dir, n_runs)
        return
    from bench import HEADLINE

    results = {}
    for name in HEADLINE:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", name],
            capture_output=True, text=True, cwd=ROOT, timeout=1800,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if line:
            rec = json.loads(line[-1])
            results[name] = rec
            print(json.dumps(rec), flush=True)
        else:
            results[name] = {"name": name, "error": proc.stderr[-500:]}
            print(json.dumps(results[name]), flush=True)
    medians = {n: r.get("median") for n, r in results.items()}
    print(json.dumps({"metric": "isolated_median_wall_clock",
                      "sf_dir": sf_dir, "n_runs": n_runs,
                      "medians": medians}))


if __name__ == "__main__":
    main()
