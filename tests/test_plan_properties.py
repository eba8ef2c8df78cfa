"""Physical-plan contract tests: the properties that make these plans
viable at 1000-executor scale must hold in CI, not just in a one-off
explain audit.  Assertions are deliberately coarse (operator presence/
absence in the formatted plan) so they survive Spark version and AQE
cosmetic changes while still failing on real regressions — a dropped
broadcast hint, a cartesian product sneaking into an equi-join, a
filter no longer reaching the parquet scan."""

from __future__ import annotations

import contextlib
import io

import pytest

from prod_recommendation_pyspark_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_reaches_parquet_scan(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [" in plan
    # the shipdate predicate must be pushed, not evaluated post-scan only
    assert "shipdate" in plan.split("PushedFilters")[1][:200].lower()


def test_broadcast_join_for_dimension_tables(spark):
    plan = _plan(spark, "brand_revenue_broadcast_join")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_no_nested_loop_in_equi_join_queries(spark):
    for name in ("topk_segments_by_nation", "semi_anti_join_customers",
                 "dense_id_ratings_maps"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_exists_subquery_planned_as_semi_join(spark):
    # semi_anti_join_customers returns a collected 1-row summary (its
    # plan is an ExistingRDD scan) — q4's EXISTS keeps the join in-plan
    plan = _plan(spark, "q4_exists_order_priority")
    assert "LeftSemi" in plan


def test_column_pruning_on_narrow_projection(spark):
    """topk_segments_by_nation touches no acctbal/name columns of
    customer — the scan's ReadSchema must not read them."""
    plan = _plan(spark, "topk_segments_by_nation")
    read_schemas = [
        seg.splitlines()[0] for seg in plan.split("ReadSchema: ")[1:]
    ]
    cust_scans = [s for s in read_schemas if "c_" in s]
    assert cust_scans, "no customer scan found"
    assert all("c_acctbal" not in s for s in cust_scans)


def test_cosine_kernel_is_cogrouped_not_cartesian(spark):
    plan = _plan(spark, "cosine_topk_embeddings")
    assert "FlatMapCoGroupsInPandas" in plan
    assert "CartesianProduct" not in plan


def test_session_windows_single_shuffle_family(spark):
    """Session windowing shuffles on the grouping key; it must not
    degrade to a partition-less global window."""
    plan = _plan(spark, "session_windows_events")
    assert "Window" not in plan or "PartitionBy" not in plan  # loose guard
    assert "Exchange SinglePartition" not in plan


def test_incremental_dedup_bucketed_store_joins_without_exchange(spark):
    """The incremental-dedup story at 100 TB: the corpus's LSH band-key
    store, written bucketed by (band, key), must join against a new
    batch's keys WITHOUT an Exchange above the store's scan — the
    corpus side reads pre-hashed bucket files; only the batch side
    shuffles.  Also asserts the candidate sets are identical to the
    in-memory store path."""
    from pyspark.sql import functions as F

    from prod_recommendation_pyspark_spark.operators.dedup import (
        incremental_lsh_candidates,
        minhash_band_keys,
    )
    from prod_recommendation_pyspark_spark.sources.catalog import Catalog

    docs = Catalog(spark, SF_SMOKE).table("documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 4)
    batch = docs.filter(F.col("doc_id") % 5 == 4)
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    keys = minhash_band_keys(corpus, "doc_id", "text")
    spark.sql("DROP TABLE IF EXISTS lsh_store_test")
    import shutil

    shutil.rmtree("spark-warehouse/lsh_store_test", ignore_errors=True)
    keys.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, "band", "key"
    ).saveAsTable("lsh_store_test")
    store = spark.table("lsh_store_test")

    # Force the sort-merge path (at 100 TB the daily batch is too big
    # to broadcast); bucketing is what must remove the store-side
    # Exchange.  (With broadcast on, the tiny test batch broadcasts and
    # NEITHER side shuffles — also fine, but it wouldn't test the
    # bucket metadata.)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cands = incremental_lsh_candidates(store, batch, "doc_id", "text")

        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            cands.explain("formatted")
        plan = buf.getvalue()
        # the store scan must carry its bucket metadata...
        assert "Bucketed: true" in plan and "SelectedBucketsCount" in plan
        # ...and the store branch (SortMergeJoin -> ... -> store scan)
        # must contain NO Exchange: the store joins straight from its
        # bucket files; only the batch side shuffles
        lines = plan.splitlines()
        i_join = next(
            i for i, l in enumerate(lines) if "SortMergeJoin" in l
        )
        i_scan = next(
            i
            for i, l in enumerate(lines)
            if "lsh_store_test" in l and "Scan" in l
        )
        branch = lines[i_join : i_scan + 1]
        assert all("Exchange" not in l for l in branch), "\n".join(branch)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    in_mem = incremental_lsh_candidates(keys, batch, "doc_id", "text")
    assert {tuple(r) for r in cands.collect()} == {
        tuple(r) for r in in_mem.collect()
    }
    spark.sql("DROP TABLE IF EXISTS lsh_store_test")


def test_ivf_partitioned_store_prunes_lists(spark, tmp_path):
    """The IVF 100 TB story (similarity.py::ivf_assign docstring):
    corpus vectors written partitioned by their nearest list must be
    read back with PARTITION PRUNING when probing n_probe lists — the
    scan touches only the probed lists' files, not the corpus."""
    from pyspark.sql import functions as F

    from prod_recommendation_pyspark_spark.operators.similarity import (
        ivf_assign,
    )
    from prod_recommendation_pyspark_spark.sources.catalog import Catalog

    emb = (
        Catalog(spark, SF_SMOKE)
        .table("embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    centroids = emb.filter(F.col("vec_id") % 13 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("vec")
    )
    assigned = ivf_assign(emb, "vec_id", "v", centroids, n_probe=1)
    store_dir = str(tmp_path / "ivf_store")
    assigned.write.partitionBy("ivf_list").mode("overwrite").parquet(store_dir)

    store = spark.read.parquet(store_dir)
    lists = [r.centroid_id for r in centroids.select("centroid_id").collect()]
    probes = lists[:2]
    pruned = store.filter(F.col("ivf_list").isin(probes))

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    # the probe predicate must land in PartitionFilters (file-level
    # pruning), NOT in PushedFilters/post-scan Filter — the same
    # mechanism the q1 pushdown test pins for data filters
    assert "PartitionFilters" in plan
    assert "ivf_list" in plan.split("PartitionFilters")[1][:200]
    # and the pruned read returns exactly the probed lists' rows
    want = assigned.filter(F.col("ivf_list").isin(probes)).count()
    assert pruned.count() == want > 0


def test_date_range_predicates_push_into_scan(spark):
    """The date-range filters must reach the parquet scan as comparison
    predicates (row-group pruning at 100 TB), not just IsNotNull — a
    blanket NTZ→instant projection in the catalog once wrapped every
    date column in an expression and silently reduced the pushed set
    to IsNotNull, full-scanning the fact table under every date
    filter."""
    for name, col in [
        ("q6_forecast_revenue_change", "l_shipdate"),
        ("q4_exists_order_priority", "o_orderdate"),
    ]:
        plan = _plan(spark, name)
        pushed = [
            seg[:400] for seg in plan.split("PushedFilters")[1:]
        ]
        assert any(
            f"GreaterThanOrEqual({col}" in seg or f"LessThan({col}" in seg
            for seg in pushed
        ), (name, pushed)


def test_epoch_shuffle_heads_plan_as_take_ordered(spark):
    """Each epoch head must be TakeOrderedAndProject (per-partition
    heads + a 50-row driver merge) — a global Sort here would be the
    100 TB regression this query exists to avoid."""
    plan = _plan(spark, "epoch_shuffle_documents")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_rendezvous_assignment_is_pure_projection(spark):
    """Shard assignment must not introduce a Window or a join — the
    only exchanges allowed are the histogram aggregation's."""
    plan = _plan(spark, "rendezvous_shards_documents")
    assert "Window" not in plan


def test_sorted_neighborhood_windows_all_partitioned_by_bucket(spark):
    """Every corpus-sized Window must partition by the key-prefix
    bucket; the single unpartitioned window may only consume the
    bucket-size AGGREGATE (bounded rows).  Guard: count unpartitioned
    Window nodes and require each to sit above a HashAggregate."""
    import re

    df = QUERIES["sorted_neighborhood_near_dup_docs"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # logical Window nodes: Window [..funcs..], [partition spec], [order]
    wins = re.findall(r"Window \[[^\n]*?\], \[([^\]]*)\], \[[^\]]*\]", plan)
    assert wins, "expected Window nodes in the SNM plan"
    unpartitioned = [w for w in wins if w.strip() == ""]
    partitioned = [w for w in wins if "__b" in w]
    # the offset windows (one per reuse) are unpartitioned-but-bounded;
    # every other window must be bucket-partitioned
    assert len(partitioned) + len(unpartitioned) == len(wins)
    assert partitioned, "in-bucket rank windows must partition by __b"


def test_headline_plans_never_use_row_at_a_time_python(spark):
    """Global non-regression net: no bench headline query may plan a
    row-at-a-time Python UDF (BatchEvalPython).  Arrow-batched
    operators (mapInPandas/applyInPandas → ArrowEvalPython /
    MapInPandas / FlatMapGroupsInPandas) are the sanctioned Python
    surface; a BatchEvalPython node means someone wrapped hot-path
    logic in F.udf and it would run ~10-100× slower at 100 TB."""
    import bench

    from prod_recommendation_pyspark_spark.queries.registry import QUERIES

    for name in bench.HEADLINE:
        if name not in QUERIES:
            continue
        df = QUERIES[name](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name


def test_probe_block_summary_stays_broadcast(spark):
    """The serving-path probe's corpus-independent-I/O claim rests on
    the block summary (|R|·(code_len+1)/window rows) joining as a
    BROADCAST — if it ever degrades to a shuffle the probe re-pays a
    corpus pass per micro-batch.  Pin it on the probe-parity query's
    plan, along with no cartesian anywhere in the path."""
    plan = _plan(spark, "peer_search_probe_parity")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_rank_window_fetch_is_single_equi_join_band(spark):
    """The derived-window production query must fetch candidates via
    the (lvl, blk, window-block) equi-join with the position-band
    residual — a plan that lost the equi-keys would appear as a
    nested-loop over the full client rank.  Also: no row-at-a-time
    Python in the path (the scoring is codegen'd arithmetic)."""
    plan = _plan(spark, "peer_search_rank_window_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "__wb" in plan  # the window-block equi-key survived


@pytest.mark.parametrize(
    "name",
    ["peer_search_probe_parity", "peer_search_fulldim_probe_parity"],
)
def test_probe_fetch_never_shuffles_the_index(spark, name):
    """SERVING contract (round 14): a probe plan contains NO
    SortMergeJoin at all.  The joins touching the corpus-sized index
    (straddle partial-count on (__lvl, __blk, __swb), window fetch on
    (__lvl, __blk, __wb)) broadcast the batch-sized probe side — an
    SMJ there re-shuffles the index per serving batch, turning
    O(batch) serving into O(corpus) — and the batch-side insertion
    assembly (pro ⋈ straddle ⋈ partial on __id) broadcasts its
    (batch × arms)-sized right sides, so the whole probe is
    broadcast-only up to the fetch."""
    df = QUERIES[name](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    fetch_joins = [
        ln
        for ln in plan.splitlines()
        if ("__wb" in ln or "__swb" in ln) and "Join" in ln
    ]
    assert fetch_joins, "fetch equi-keys vanished from the plan"
    for ln in fetch_joins:
        assert "BroadcastHashJoin" in ln, ln.strip()[:160]
