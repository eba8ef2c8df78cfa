from prod_recommendation_pyspark_spark.operators.relational import (  # noqa: F401
    dedup_first_by_key,
    dense_ids,
    windowed_topk,
    topk_by_threshold,
    trim_normalized_join,
    rename_with_prefix,
    cast_columns,
)
