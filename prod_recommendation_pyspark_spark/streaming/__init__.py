from prod_recommendation_pyspark_spark.streaming.adapter import (  # noqa: F401
    read_events_stream,
    streaming_windowed_counts,
    run_stream_to_memory,
)
