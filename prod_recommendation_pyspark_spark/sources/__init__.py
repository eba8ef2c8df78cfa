from prod_recommendation_pyspark_spark.sources.readers import (  # noqa: F401
    read_table,
    read_csv,
    read_pipe_csv,
    read_parquet,
    read_json,
    latest_snapshot,
    literal_rows,
)
from prod_recommendation_pyspark_spark.sources.writers import (  # noqa: F401
    write_csv,
    write_parquet,
    write_json,
)
from prod_recommendation_pyspark_spark.sources.catalog import Catalog  # noqa: F401
