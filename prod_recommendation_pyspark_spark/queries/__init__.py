"""Query registry — the driver-facing surface of the engine.

Each implemented operator from SURVEY.md §2 registers a named query
(``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible, a DuckDB
oracle SQL string computing the same result on the same parquet tables.
``__spark_entry__.py`` exposes the registry to the correctness driver.
"""

from prod_recommendation_pyspark_spark.queries.registry import (  # noqa: F401
    QUERIES,
    ORACLES,
    register,
)

# Import for registration side effects.
from prod_recommendation_pyspark_spark.queries import relational  # noqa: F401,E402
from prod_recommendation_pyspark_spark.queries import features  # noqa: F401,E402
from prod_recommendation_pyspark_spark.queries import similarity  # noqa: F401,E402
from prod_recommendation_pyspark_spark.queries import recommender  # noqa: F401,E402
from prod_recommendation_pyspark_spark.queries import llm_pipeline  # noqa: F401,E402
from prod_recommendation_pyspark_spark.queries import events  # noqa: F401,E402
from prod_recommendation_pyspark_spark.queries import analytic  # noqa: F401,E402
from prod_recommendation_pyspark_spark.queries import pipeline_e2e  # noqa: F401,E402
from prod_recommendation_pyspark_spark.queries import curation  # noqa: F401,E402
from prod_recommendation_pyspark_spark.queries import sketches  # noqa: F401,E402
