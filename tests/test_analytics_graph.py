"""Round-6 analytic additions: TPC-H Q21 analog, graph analytics
(triangles, link prediction), time-series diagnostics (autocorrelation,
CUSUM changepoint), attribution, and mixture balancing — sf0.001 oracle
compares plus hand-built property checks on known-answer graphs/series."""

from __future__ import annotations

from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.queries import ORACLES, QUERIES
from tests.oracle_util import assert_matches_oracle

SF = "/root/testdata/sf0.001"

NEW = [
    "q21_waiting_suppliers",
    "triangle_count_parts",
    "link_prediction_parts",
    "autocorr_daily_revenue",
    "cusum_changepoint_revenue",
    "attribution_touch_events",
    "mixture_balance_weights",
]


def test_new_queries_match_oracle(spark, duck):
    for name in NEW:
        assert_matches_oracle(
            QUERIES[name](spark, SF), duck, ORACLES[name]
        )


def test_triangle_orientation_counts_each_triangle_once(spark):
    """K4 built by hand: every vertex sits on C(3,2)=3 triangles.  The
    degree-ordered wedge enumeration must count each exactly once —
    double counting (the naive all-wedges bug) would report 6."""
    # K4 over parts 1..4: each edge needs >= 2 shared orders, so two
    # orders per pair; distinct order ids per pair.
    rows = []
    oid = 0
    parts = [1, 2, 3, 4]
    for i in range(4):
        for j in range(i + 1, 4):
            for _ in range(2):
                rows += [(oid, parts[i]), (oid, parts[j])]
                oid += 1
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
        out = {
            r.part: r.n_triangles
            for r in QUERIES["triangle_count_parts"](spark, d).collect()
        }
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_link_prediction_path_graph(spark):
    """Path 1-2-3 (edges only 1-2, 2-3): the sole predicted link is
    (1,3) with one common neighbor and Jaccard 1/(1+1-1)=1.0, and the
    adjacent pairs must NOT appear."""
    rows = []
    oid = 0
    for u, v in [(1, 2), (2, 3)]:
        for _ in range(2):
            rows += [(oid, u), (oid, v)]
            oid += 1
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
        got = QUERIES["link_prediction_parts"](spark, d).collect()
    assert [(r.u, r.v, r.common_neighbors, r.jaccard) for r in got] == [
        (1, 3, 1, 1.0)
    ]


def test_cusum_is_exact_integer_and_sums_to_zero(spark, duck):
    """The scaled CUSUM is bigint (no float anywhere) and the FULL
    series' final cumulative deviation is identically zero — the
    algebraic identity sum(n*x_i - total) == 0 holds exactly only
    because the statistic never leaves integer space."""
    df = QUERIES["cusum_changepoint_revenue"](spark, SF)
    assert dict(df.dtypes)["cusum_n_cents"] == "bigint"
    # Recompute the identity over the whole series via the oracle's CTE.
    total = duck.execute(
        """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2)
                        * 100 AS BIGINT) AS rev_cents
            FROM orders GROUP BY 1),
        t AS (SELECT sum(rev_cents) AS tc, count(*) AS n FROM daily)
        SELECT sum(daily.rev_cents * t.n - t.tc)
        FROM daily CROSS JOIN t
        """
    ).fetchone()[0]
    assert total == 0


def test_attribution_tie_break_and_frames(spark):
    """Hand-built history: view@1, click@2, purchase@3, view@4,
    purchase@5.  First-touch credits both purchases to the view@1;
    last-touch credits purchase@3 to click@2 and purchase@5 to view@4.
    Same-timestamp touch+purchase (ts=3) must NOT self-attribute (the
    frame ends at 1 PRECEDING, ordered by (ts, event_id))."""
    rows = [
        (1, 1_000_000, 7, "view", 0.0, "{}"),
        (2, 2_000_000, 7, "click", 0.0, "{}"),
        (3, 3_000_000, 7, "purchase", 10.0, "{}"),
        (4, 4_000_000, 7, "view", 0.0, "{}"),
        (5, 5_000_000, 7, "purchase", 5.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        # NTZ µs on disk — the Catalog's NTZ→instant events path
        # (Spark 4 writes plain TIMESTAMP as parquet ns, which it
        # reads back natively, skipping the path under test)
        F.timestamp_micros(F.col("ts")).cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            (r.attribution_model, r.channel): (
                r.n_purchases,
                r.attributed_revenue,
            )
            for r in QUERIES["attribution_touch_events"](spark, d).collect()
        }
    assert got == {
        ("first_touch", "view"): (2, 15.0),
        ("last_touch", "click"): (1, 10.0),
        ("last_touch", "view"): (1, 5.0),
    }


def test_mixture_balanced_share_uniform_when_uncapped(spark):
    """Two equal-size domains: weights are exactly 1.0 and the
    balanced share is exactly 0.5 — the uniform target is reached
    without touching the 8x cap."""
    rows = [(i, "t", "en" if i % 2 == 0 else "fr", "web", 1) for i in range(100)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = QUERIES["mixture_balance_weights"](spark, d).collect()
    assert [(r.lang, r.weight, r.balanced_share) for r in got] == [
        ("en", 1.0, 0.5),
        ("fr", 1.0, 0.5),
    ]


def test_label_propagation_two_triangles(spark):
    """Hand-computed LPA on two triangles joined by one bridge edge:
    after 3 synchronous steps the communities are exactly the
    triangles, labeled by deterministic tie-break dynamics (derived by
    hand: {1,2,3}->1, {4,5,6}->3)."""
    from prod_recommendation_pyspark_spark.operators.graph import (
        label_propagation,
    )

    und = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {
        r.node: r.label
        for r in label_propagation(edges, iterations=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_label_propagation_dangling_in_keeps_label(spark):
    """A node with no in-edges never receives neighbor labels and must
    keep its own across every iteration (the left-join coalesce)."""
    from prod_recommendation_pyspark_spark.operators.graph import (
        label_propagation,
    )

    und = [(1, 2), (2, 3), (1, 3)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und] + [(7, 1)], "src long, dst long"
    )
    got = {
        r.node: r.label
        for r in label_propagation(edges, iterations=3).collect()
    }
    assert got[7] == 7
    assert got[1] == got[2] == got[3] == 1


def test_label_propagation_oracle(spark, duck):
    name = "label_propagation_communities"
    assert_matches_oracle(QUERIES[name](spark, SF), duck, ORACLES[name])


def test_ndcg_bounds_and_perfect_case(spark):
    """NDCG invariants on the registered query: every ndcg in [0,1],
    dcg <= idcg, and items whose top-5 recs exactly match the
    held-out ideal ordering (if any) score 1.0."""
    rows = QUERIES["ndcg_item_item_cf"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.0001, r
        assert r.dcg <= r.idcg + 1e-9, r
    # sanity: the metric discriminates (not all 0, not all 1)
    vals = {r.ndcg for r in rows}
    assert len(vals) > 1


def test_holt_forecast_hand_computed(spark):
    """3-point series 10, 12, 14 through the flat recurrence:
    l = [10, 11, 12.75], b = [0, 0.5, 1.125] — forecasts follow."""
    import datetime as dt
    import tempfile

    rows = [
        (1, "P", dt.datetime(2024, 1, 1), 10.0),
        (2, "P", dt.datetime(2024, 1, 2), 12.0),
        (3, "P", dt.datetime(2024, 1, 3), 14.0),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp,"
        " o_totalprice double",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz"))
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
        got = QUERIES["holt_forecast_daily_revenue"](spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_days, r.level, r.trend) == (3, 12.75, 1.125)
    assert r.forecast_1d == 13.875
    assert r.forecast_7d == 12.75 + 7 * 1.125


def test_ab_test_z_is_finite_and_counts_partition(spark):
    r = QUERIES["ab_test_conversion_events"](spark, SF).first()
    assert r.n_a > 0 and r.n_b > 0
    assert 0 < r.conv_a < r.n_a or 0 < r.conv_b < r.n_b
    assert r.z_stat == r.z_stat  # not NaN (pooled rate strictly inside (0,1))
    assert 0.0 <= r.rate_a <= 1.0 and 0.0 <= r.rate_b <= 1.0


def test_entity_resolution_entities_are_disjoint(spark):
    rows = QUERIES["entity_resolution_pipeline_docs"](spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        members = [int(m) for m in r.members.split(",")]
        assert r.n_members == len(members) >= 2
        assert r.entity_id == min(members)  # canonical = min id
        for m in members:
            assert m not in seen  # entities partition the matched docs
            seen.add(m)


def test_personalized_pagerank_mass_stays_near_seeds(spark):
    """Star graph: seed at the hub — the hub must outrank every leaf,
    leaves (symmetric) tie, and a disconnected node gets rank 0."""
    from prod_recommendation_pyspark_spark.operators.graph import (
        personalized_pagerank,
    )

    und = [(1, 2), (1, 3), (1, 4), (8, 9)]  # star at 1 + separate pair
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.rank
        for r in personalized_pagerank(
            edges, seeds, iterations=3, damping=0.5
        ).collect()
    }
    assert got[1] > got[2] == got[3] == got[4] > 0
    assert got[8] == got[9] == 0.0  # unreachable from the seed
