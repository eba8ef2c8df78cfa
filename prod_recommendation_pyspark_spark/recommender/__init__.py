from prod_recommendation_pyspark_spark.recommender.ratings import (  # noqa: F401
    key_remap,
    percent_rank_ratings,
    accumulated_volume,
    dense_id_ratings,
)
from prod_recommendation_pyspark_spark.recommender.als import (  # noqa: F401
    train_als,
    evaluate_rmse,
    grid_search,
    recommend_topn,
)
from prod_recommendation_pyspark_spark.recommender.reports import (  # noqa: F401
    confidence_table,
    penetration_table,
)
