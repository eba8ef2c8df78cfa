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


def test_rmse_reasonable(spark):
    als_input, _, _ = _als_input(spark)
    model = train_als(als_input, ALSConfig(max_iter=3))
    rmse = evaluate_rmse(model, als_input)
    # implicit ALS reconstructs preference ~1 for observed pairs;
    # ratings here are percent-rank sums — just assert it learned
    # something finite and sane.
    assert 0.0 <= rmse < 10.0
