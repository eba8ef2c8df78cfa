from prod_recommendation_pyspark_spark.features.scaling import (  # noqa: F401
    min_max_scale,
    standard_scale,
    log10_floor,
)
from prod_recommendation_pyspark_spark.features.impute import impute_median  # noqa: F401
from prod_recommendation_pyspark_spark.features.encode import (  # noqa: F401
    bucketize,
    string_index,
    one_hot,
    assemble_features,
)
