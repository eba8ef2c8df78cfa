"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``prod_recommendation_pyspark_spark``; this
file only exposes the query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prod_recommendation_pyspark_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["topk_segments_by_nation"](spark, "/root/testdata/sf0.001")


def _driver_verified_names() -> set[str]:
    """Query names already hash-verified by the driver in a previous
    round (union over all committed CORRECTNESS_r*.json files)."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    seen: set[str] = set()
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rec.items():
            if isinstance(row, dict) and (
                row.get("hash_match") or row.get("err") == "no_oracle"
            ):
                seen.add(name)
    return seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Sample rotation: the driver's per-round correctness check covers a
    prefix of this dict, so a frozen registration order would verify
    the same early-round 50 queries forever and newest operators would
    never get driver-verified.  Order queries that NO previous round's
    CORRECTNESS file has hash-verified FIRST (stable registration
    order within each group) — each round the driver's sample covers
    the yet-unverified tail, converging to full driver coverage."""
    seen = _driver_verified_names()
    ordered = [n for n in QUERIES if n not in seen]
    ordered += [n for n in QUERIES if n in seen]
    return {n: QUERIES[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every SQL-expressible query."""
    return dict(ORACLES)
