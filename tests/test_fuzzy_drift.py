"""Tests for the round-7 late additions: edit-distance verify stage,
PSI drift monitor, and the HLL distinct-count contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.dedup import (
    edit_distance_verify,
)
from prod_recommendation_pyspark_spark.queries.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_edit_distance_verify_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox"),
            (2, "the quick brown fax"),  # 1 edit after normalization
            (3, "completely different text here"),
            (4, "THE QUICK!!! BROWN--fox"),  # normalizes equal to doc 1
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    out = edit_distance_verify(
        pairs, docs, "doc_id", "text", max_edits=5, prefix_chars=200
    )
    got = {(r.id_a, r.id_b): r.edit_distance for r in out.collect()}
    # (1,3) is beyond max_edits: dropped, not emitted with -1
    assert got == {(1, 2): 1, (1, 4): 0}


def test_edit_distance_verify_prefix_cap(spark):
    # identical 30-char prefix, divergence beyond it is invisible at
    # prefix_chars=30 but visible (and over threshold) at 200
    base = "a" * 30
    docs = spark.createDataFrame(
        [(1, base + "x" * 50), (2, base + "z" * 50)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    capped = edit_distance_verify(
        pairs, docs, "doc_id", "text", max_edits=5, prefix_chars=30
    )
    assert [r.edit_distance for r in capped.collect()] == [0]
    full = edit_distance_verify(
        pairs, docs, "doc_id", "text", max_edits=5, prefix_chars=200
    )
    assert full.count() == 0


def test_edit_distance_query_pairs_subset_of_candidates(spark):
    verified = QUERIES["edit_distance_near_dup_docs"](spark, SF)
    cands = QUERIES["winnow_dedup_candidates"](spark, SF)
    v = {(r.id_a, r.id_b) for r in verified.collect()}
    c = {(r.id_a, r.id_b) for r in cands.collect()}
    assert v and v <= c


def test_psi_drift_terms_nonnegative_and_total_consistent(spark):
    rows = QUERIES["psi_drift_events"](spark, SF).collect()
    assert rows
    totals = {r.psi_total for r in rows}
    assert len(totals) == 1
    total = totals.pop()
    # (p-q)·ln(p/q) ≥ 0 termwise; smoothing keeps everything finite
    for r in rows:
        assert r.psi_term >= 0.0
        assert r.share_before > 0.0 and r.share_after > 0.0
    assert abs(total - sum(r.psi_term for r in rows)) < 1e-5
    assert total >= 0.0


def test_psi_drift_one_sided_type_is_finite(spark):
    # a type present in only one half must yield finite smoothed shares
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "early_only"),
            (2, "2024-01-01 00:00:01", "both"),
            (3, "2024-12-31 23:59:58", "both"),
            (4, "2024-12-31 23:59:59", "late_only"),
        ],
        "event_id long, ts string, event_type string",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    import prod_recommendation_pyspark_spark.queries.events as ev_mod

    class FakeCatalog:
        def __init__(self, *a, **k):
            pass

        def table(self, name):
            assert name == "events"
            return ev

    orig = ev_mod.Catalog
    ev_mod.Catalog = FakeCatalog
    try:
        rows = ev_mod.psi_drift_events(spark, SF)
        got = {r.event_type: r for r in rows.collect()}
    finally:
        ev_mod.Catalog = orig
    assert set(got) == {"early_only", "both", "late_only"}
    import math

    for r in got.values():
        assert math.isfinite(r.psi_term) and math.isfinite(r.psi_total)
    assert got["early_only"].n_after == 0
    assert got["late_only"].n_before == 0


def test_approx_distinct_contract_holds(spark):
    rows = QUERIES["approx_distinct_contract_orders"](spark, SF).collect()
    assert len(rows) == 3
    assert all(r.rel_err_ok for r in rows)
    by_col = {r.col_name: r.n_exact for r in rows}
    assert by_col["o_orderstatus"] <= 3
    assert by_col["o_custkey"] > by_col["o_orderstatus"]


def test_correlation_matrix_bounds_and_pairs(spark):
    rows = QUERIES["correlation_matrix_lineitem"](spark, SF).collect()
    pairs = {(r.var_a, r.var_b) for r in rows}
    assert pairs == {
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_extendedprice", "l_discount"),
    }
    for r in rows:
        assert -1.0 <= r.corr <= 1.0


def test_correlation_matrix_matches_spark_corr(spark):
    # the exact-moment formula must agree with Spark's own corr to
    # well beyond the emitted 6-digit rounding
    from prod_recommendation_pyspark_spark.sources.catalog import Catalog

    li = Catalog(spark, SF).table("lineitem")
    ref = li.agg(F.corr("l_quantity", "l_extendedprice")).first()[0]
    got = {
        (r.var_a, r.var_b): r.corr
        for r in QUERIES["correlation_matrix_lineitem"](spark, SF).collect()
    }
    assert abs(got[("l_quantity", "l_extendedprice")] - ref) < 1e-5


def test_skew_profile_invariants(spark):
    rows = QUERIES["skew_profile_lineitem_suppkey"](spark, SF).collect()
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    # counts nonincreasing; cum_share consistent with shares
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert abs(rows[-1].cum_share - sum(r.share for r in rows)) < 1e-5
    for r in rows:
        assert r.skew_x > 0
        assert 0 < r.share <= r.cum_share <= 1


def test_count_min_never_underestimates_any_item(spark):
    """CMS guarantee on EVERY item (not just the query's top-10
    probes): min-of-cells >= exact count, and the cell table is
    bounded by depth x width regardless of vocabulary size."""
    from prod_recommendation_pyspark_spark.operators.text import (
        count_min_cells,
        count_min_estimate,
    )

    items = spark.createDataFrame(
        [(f"w{i % 37}",) for i in range(500)] + [("hot",)] * 300,
        "term string",
    )
    cells = count_min_cells(items, "term", width=32, depth=3)
    assert cells.count() <= 32 * 3
    exact = items.groupBy("term").agg(F.count(F.lit(1)).alias("n_exact"))
    est = count_min_estimate(
        cells, exact.select("term"), "term", width=32, depth=3
    )
    joined = exact.join(est, "term").collect()
    assert len(joined) == 38
    for r in joined:
        assert r.n_est >= r.n_exact, r
    # the hot item dominates its cells: estimate should be exact-ish
    hot = {r.term: (r.n_exact, r.n_est) for r in joined}["hot"]
    assert hot[0] == 300 and hot[1] >= 300


def test_cms_join_estimate_never_underestimates(spark):
    """CMS inner-product join-size estimate on a hand-built join:
    exact = sum of per-key count products; the sketch estimate is
    >= exact and == exact when width >> keys (no collisions)."""
    from prod_recommendation_pyspark_spark.operators.text import (
        count_min_cells,
    )

    a = spark.createDataFrame([(k,) for k in [1, 1, 1, 2, 3]], "k int")
    b = spark.createDataFrame([(k,) for k in [1, 2, 2, 4]], "k int")
    exact = a.join(b, "k").count()
    assert exact == 3 * 1 + 1 * 2  # key1: 3x1, key2: 1x2
    ca = count_min_cells(a, "k", width=64, depth=3).selectExpr(
        "j", "bucket", "cnt AS ca"
    )
    cb = count_min_cells(b, "k", width=64, depth=3).selectExpr(
        "j", "bucket", "cnt AS cb"
    )
    from pyspark.sql import functions as F2

    est = (
        ca.join(cb, ["j", "bucket"])
        .groupBy("j")
        .agg(F2.sum(F2.col("ca") * F2.col("cb")).alias("e"))
        .agg(F2.min("e").alias("n_est"))
        .first()
        .n_est
    )
    assert est >= exact
    assert est == exact  # width 64 >> 4 keys: collision-free
