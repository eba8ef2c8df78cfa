from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def release_session_caches(spark: SparkSession) -> None:
    """Drop every DataFrame cache this session holds.

    Cache lifecycle for registered queries: several query bodies
    ``persist()`` an intermediate that backs the plan they RETURN
    (triangle/link-prediction co-occurrence, association-rule baskets,
    simhash signatures, dense-id key sets …), so they cannot unpersist
    before returning — the caller has not collected yet and would lose
    the reuse the persist exists for.  Instead the lifecycle is owned
    here: every registered query releases the PREVIOUS query's blocks
    on entry, so a 147-query single-session sweep holds at most one
    query's caches at a time instead of accumulating MEMORY_AND_DISK
    blocks until LRU pressure (the round-6 review finding).
    ``localCheckpoint`` blocks are not in the CacheManager; those are
    reclaimed by Spark's ContextCleaner once the result DataFrame is
    garbage-collected."""
    spark.catalog.clearCache()


def register(name: str, sql: str | None = None):
    """Register a query; ``sql`` is the DuckDB oracle (omit for
    non-SQL-expressible operators — the driver then records a weaker
    rows-only check).

    The registered callable is wrapped to call
    ``release_session_caches`` on entry — see that function's
    docstring for why the lifecycle lives here and not in the query
    bodies.  Registered queries never invoke one another (they share
    only plain helpers), so the clear can never drop a cache the
    in-flight query still needs."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_session_caches(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if sql is not None:
            ORACLES[name] = sql
        # return the UNwrapped fn: direct imports (tests, composition)
        # keep plain semantics; only registry-dispatched runs clear
        return fn

    return deco
