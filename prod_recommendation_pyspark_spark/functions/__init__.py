from prod_recommendation_pyspark_spark.functions.exact import (  # noqa: F401
    davg,
    dstd,
    dsum,
)
