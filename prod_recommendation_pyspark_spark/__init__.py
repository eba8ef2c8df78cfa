"""prod_recommendation_pyspark_spark — a PySpark-native analytics engine.

A brand-new, idiomatic DataFrame/SQL-first engine with the query and
data-processing capabilities of the reference pipeline
(``jasoncchsiao/prod-recommendation-pyspark``): scans/sinks, relational
operators, feature engineering, a blocked hybrid-score top-K similarity
join, ALS collaborative filtering with confidence/penetration report
tables — plus LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns, event windowing) designed for
100 TB scale.

Design stance (SURVEY.md §7): DataFrame-only (no RDD API), native
``pyspark.sql.functions`` expressions over Python UDFs, Arrow-batched
``mapInPandas`` only for the NumPy mat-mul kernel, every operator a pure
``DataFrame -> DataFrame`` function with an explicit schema contract,
and all scale-sensitive choices (broadcast, batch size, coalesce)
parameterized.
"""

__version__ = "0.1.0"

from prod_recommendation_pyspark_spark.session import get_spark  # noqa: F401
