"""Scaler operator properties: the agg+broadcast-join rewrite must keep
``Window.partitionBy`` semantics — including null group keys forming
their OWN group (a plain equi-join would drop them) — and constant
columns must map to 0.0."""

from __future__ import annotations

from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.features.scaling import (
    min_max_scale,
    standard_scale,
)


def test_minmax_null_group_keys_scale_within_their_group(spark):
    rows = [
        ("a", 0.0), ("a", 10.0),
        (None, 5.0), (None, 15.0),
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    out = {
        (r["g"], r["x"]): r["x_scaled"]
        for r in min_max_scale(df, ["x"], partition_by=["g"]).collect()
    }
    assert out[("a", 0.0)] == 0.0 and out[("a", 10.0)] == 1.0
    # null keys are ONE group (window semantics), not dropped/NaN
    assert out[(None, 5.0)] == 0.0 and out[(None, 15.0)] == 1.0


def test_minmax_constant_column_is_zero(spark):
    df = spark.createDataFrame([(1, 7.0), (2, 7.0)], "id long, x double")
    vals = [r["x_scaled"] for r in min_max_scale(df, ["x"]).collect()]
    assert vals == [0.0, 0.0]


def test_standard_scale_global_matches_manual(spark):
    import statistics

    xs = [1.0, 2.0, 3.0, 4.0, 10.0]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = sorted(r["x_z"] for r in standard_scale(df, ["x"]).collect())
    mu, sd = statistics.mean(xs), statistics.stdev(xs)
    want = sorted((x - mu) / sd for x in xs)
    assert all(abs(a - b) < 1e-9 for a, b in zip(got, want))


def test_no_global_window_in_scaler_plan(spark):
    """The round-1 regression: the scaler must NOT plan a
    no-partition WindowExec (single-partitions the fact table)."""
    df = spark.range(1000).select(F.col("id").cast("double").alias("x"))
    plan = min_max_scale(df, ["x"])._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_winsorize_clips_at_exact_quantiles(spark):
    from prod_recommendation_pyspark_spark.features.scaling import winsorize

    vals = list(range(1, 100)) + [10_000]  # one wild outlier
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    out = winsorize(df, ["x"], lower=0.05, upper=0.95).collect()
    lo = df.agg(F.percentile("x", F.lit(0.05))).first()[0]
    hi = df.agg(F.percentile("x", F.lit(0.95))).first()[0]
    for r in out:
        assert lo <= r.x_w <= hi
    # interior values untouched, the outlier clipped to hi exactly
    by_x = {r.x: r.x_w for r in out}
    assert by_x[50.0] == 50.0
    assert by_x[10_000.0] == hi


def test_epoch_shuffle_reproducible_and_epoch_varying(spark):
    from prod_recommendation_pyspark_spark.operators.text import epoch_shuffle

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    e1a = [r.doc_id for r in epoch_shuffle(df, "doc_id", 1)
           .orderBy("shuffle_key", "doc_id").collect()]
    e1b = [r.doc_id for r in epoch_shuffle(df, "doc_id", 1)
           .orderBy("shuffle_key", "doc_id").collect()]
    e2 = [r.doc_id for r in epoch_shuffle(df, "doc_id", 2)
          .orderBy("shuffle_key", "doc_id").collect()]
    assert e1a == e1b          # same epoch: identical order
    assert e1a != e2           # different epoch: different order
    assert sorted(e1a) == sorted(e2) == list(range(100))  # a permutation


def test_quantile_normalize_aligns_group_marginals(spark):
    """Two groups with very different scales must come out with
    near-identical normalized distributions (both mapped onto the
    global quantile grid), and ranks must be preserved within each
    group."""
    from prod_recommendation_pyspark_spark.features.scaling import (
        quantile_normalize,
    )

    rows = [("a", float(i)) for i in range(100)] + [
        ("b", 1000.0 + 10 * i) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    out = quantile_normalize(df, "x", "g").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append((r.x, r.x_qn))
    for g in ("a", "b"):
        vals = sorted(by_g[g])
        qns = [q for _, q in vals]
        assert qns == sorted(qns)  # rank-preserving
    a_sorted = sorted(q for _, q in by_g["a"])
    b_sorted = sorted(q for _, q in by_g["b"])
    # same marginal after normalization (grid resolution tolerance)
    diffs = [abs(x - y) for x, y in zip(a_sorted, b_sorted)]
    assert max(diffs) < 30  # global range is 0..1990; groups align
