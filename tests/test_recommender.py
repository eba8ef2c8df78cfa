"""ALS model properties (the model is not oracle-checkable — SURVEY §5:
property-check the model, oracle-check the pipeline around it)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.queries.recommender import (
    als_recommend_topn,
    _usage,
)
from prod_recommendation_pyspark_spark.recommender.als import (
    ALSConfig,
    evaluate_rmse,
    load_model,
    recommend_topn,
    save_model,
    train_als,
)
from prod_recommendation_pyspark_spark.recommender.ratings import (
    accumulated_volume,
    dense_id_ratings,
    percent_rank_ratings,
)
from tests.conftest import SF_SMOKE


def _als_input(spark):
    usage = _usage(spark, SF_SMOKE)
    rated = percent_rank_ratings(usage, "custkey", "partkey", "quantity")
    acc = accumulated_volume(rated, "custkey", "partkey", "rating", out_col="acc")
    als_input, user_map, item_map = dense_id_ratings(acc, "custkey", "partkey", "acc")
    return als_input.cache(), user_map, item_map


def test_recommend_topn_shape_and_nonnegative(spark):
    recs = als_recommend_topn(spark, SF_SMOKE)
    per_user = recs.groupBy("custkey").count()
    assert per_user.agg(F.max("count")).first()[0] <= 10
    assert recs.filter(F.col("rating") < 0).count() == 0  # nonnegative=True


def test_als_input_count_equals_acc_count(spark):
    """Pins the round-16 prep overlap's equality claim: the ALS query
    feeds ``train_als`` the COUNT OF acc (computed on a concurrent
    driver thread) in place of the auto-sizer's count of als_input —
    valid only because the dense-id map joins match every acc row
    exactly once (keys na.drop'd upstream, maps built from acc's own
    distinct keys), so |als_input| == |acc| and the derived block
    count (hence the fitted model) is bit-identical."""
    usage = _usage(spark, SF_SMOKE)
    rated = percent_rank_ratings(usage, "custkey", "partkey", "quantity")
    acc = accumulated_volume(
        rated, "custkey", "partkey", "rating", out_col="acc"
    ).cache()
    als_input, _, _ = dense_id_ratings(acc, "custkey", "partkey", "acc")
    assert als_input.count() == acc.count()


def test_rmse_reasonable(spark):
    als_input, _, _ = _als_input(spark)
    model = train_als(als_input, ALSConfig(max_iter=3))
    rmse = evaluate_rmse(model, als_input)
    # implicit ALS reconstructs preference ~1 for observed pairs;
    # ratings here are percent-rank sums — just assert it learned
    # something finite and sane.
    assert 0.0 <= rmse < 10.0


def test_save_load_recommend_parity(spark, tmp_path):
    """The Stage-2 → Stage-3 operational handoff: a model saved by the
    training job and reloaded by a separate inference job must emit
    byte-identical recommendations (factors round-trip exactly through
    parquet; no re-fit on load)."""
    als_input, user_map, item_map = _als_input(spark)
    model = train_als(als_input, ALSConfig(max_iter=3))
    path = str(tmp_path / "als_model")
    save_model(model, path)
    loaded = load_model(path)
    assert loaded.rank == model.rank

    def flat(m):
        return sorted(
            recommend_topn(m, 5, user_map, item_map).collect(),
            key=lambda r: (r["custkey"], -r["rating"], r["partkey"]),
        )

    a, b = flat(model), flat(loaded)
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra["custkey"] == rb["custkey"]
        assert ra["partkey"] == rb["partkey"]
        assert ra["rating"] == rb["rating"]  # exact, not approx

    # a LOADED model re-saves to a fresh path (its factor frames are
    # lazily backed by the load path — see save_model docstring) ...
    path2 = str(tmp_path / "als_model_copy")
    save_model(loaded, path2)
    assert load_model(path2).rank == model.rank
    # ... and overwrite semantics let a re-train clobber the original
    # artifact path (this also invalidates `loaded`'s backing files —
    # the documented reason a loaded model must not overwrite itself)
    save_model(model, path)
    assert load_model(path).rank == model.rank
