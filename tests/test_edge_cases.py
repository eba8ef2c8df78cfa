"""Edge-case behavior of the operator library: empty inputs, no-match
joins, single rows — the shapes that appear at partition boundaries in
production but never in happy-path fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_windowed_topk_empty(spark):
    from prod_recommendation_pyspark_spark.operators.relational import windowed_topk

    df = spark.createDataFrame([], "g string, s double")
    out = windowed_topk(df, "g", [F.col("s").desc()], 5)
    assert out.count() == 0 and set(out.columns) == {"g", "s"}


def test_dense_ids_single_key(spark):
    from prod_recommendation_pyspark_spark.operators.relational import dense_ids

    df = spark.createDataFrame([("only",), ("only",)], "k string")
    rows = dense_ids(df, "k", "idx").collect()
    assert [(r.k, r.idx) for r in rows] == [("only", 0)]


def test_asof_join_no_prior_right_rows(spark):
    """Left rows earlier than every right row get NULL matches; later
    rows match the latest prior right row."""
    from prod_recommendation_pyspark_spark.operators.events import asof_join

    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 300)], "event_id long, user_id long, ts long"
    )
    right = spark.createDataFrame(
        [(10, 1, 200)], "event_id long, user_id long, ts long"
    )
    out = {
        r.event_id: r.asof_event_id
        for r in asof_join(
            left, right, "user_id", "ts", "ts", ["event_id", "ts"]
        ).collect()
    }
    assert out == {1: None, 2: 10}


def test_asof_join_equal_timestamp_inclusive(spark):
    from prod_recommendation_pyspark_spark.operators.events import asof_join

    left = spark.createDataFrame([(1, 7, 500)], "event_id long, user_id long, ts long")
    right = spark.createDataFrame([(9, 7, 500)], "event_id long, user_id long, ts long")
    (row,) = asof_join(left, right, "user_id", "ts", "ts", ["event_id"]).collect()
    assert row.asof_event_id == 9  # right row at equal ts counts (<=)


def test_exact_dedup_all_unique_is_identity(spark):
    from prod_recommendation_pyspark_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    assert exact_dedup(df, "text", "doc_id").count() == 3


def test_ngram_jaccard_short_text(spark):
    """Documents shorter than the shingle width still produce one
    (padded) shingle and never crash."""
    from prod_recommendation_pyspark_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(1, "one"), (2, "one"), (3, "different words here")],
        "doc_id long, text string",
    )
    rows = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.8).collect()
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 2)}


def test_cosine_kernel_empty_right(spark):
    from prod_recommendation_pyspark_spark.operators.similarity import cosine_topk

    left = spark.createDataFrame([(1, [1.0, 0.0])], "tgt_id long, vec array<double>")
    right = spark.createDataFrame([], "nbr_id long, vec array<double>")
    assert cosine_topk(left, right, "tgt_id", "nbr_id", "vec", k=3).count() == 0


def test_salted_agg_empty(spark):
    from prod_recommendation_pyspark_spark.operators.relational import salted_agg

    df = spark.createDataFrame([], "k string, v double")
    out = salted_agg(
        df,
        ["k"],
        [F.sum("v").alias("pv")],
        [F.sum("pv").alias("v")],
    )
    assert out.count() == 0


def test_range_join_bucketed_equals_naive(spark):
    """Granule-bucketed range join must equal the naive conditional
    join, including intervals spanning many granules and boundary
    points (start inclusive, end exclusive)."""
    from prod_recommendation_pyspark_spark.operators.events import (
        range_join_bucketed,
    )

    intervals = spark.createDataFrame(
        [
            (1, 0, 10),        # short
            (1, 5, 7200),      # spans 2 granules (granule=3600)
            (2, 3600, 3601),   # exactly one second on a boundary
            (2, 100, 100),     # empty (start == end)
        ],
        "k long, s long, e long",
    )
    points = spark.createDataFrame(
        [(i, k, p) for i, (k, p) in enumerate(
            [(1, 0), (1, 9), (1, 10), (1, 5), (1, 7199), (1, 7200),
             (2, 3600), (2, 3601), (2, 100), (9, 5)]
        )],
        "pid long, k long, p long",
    )
    bucketed = {
        (r.pid, r.s, r.e)
        for r in range_join_bucketed(points, intervals, "k", "p", "s", "e").collect()
    }
    naive = {
        (r.pid, r.s, r.e)
        for r in points.join(
            intervals, on=[points.k == intervals.k], how="inner"
        )
        .filter((F.col("p") >= F.col("s")) & (F.col("p") < F.col("e")))
        .select("pid", "s", "e")
        .collect()
    }
    assert bucketed == naive and len(bucketed) > 0
