"""Structured Streaming adapter (SURVEY.md §2.12; §7 Phase F stretch).

The batch windowing operators (operators/events.py) use exactly the
expressions Structured Streaming accepts, so the streaming surface is
the same logical plan behind ``readStream``: file source → watermark →
windowed aggregate → sink.  For tests, a parquet directory drives the
stream and a memory sink collects results synchronously
(``processAllAvailable``) — batch/stream parity is asserted on the
same data.

Production notes (100 TB / real streams): swap the file source for
Kafka, keep the watermark ≥ max expected lateness, and write with
``foreachBatch`` for exactly-once sinks; state store size is bounded
by (#groups × #open windows), which the watermark caps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(
    spark: SparkSession, path: str, ts_unit: str = "auto"
) -> DataFrame:
    """File-source stream over the events parquet, schema-matched to
    how the files actually store ``ts`` (same contract as the batch
    Catalog): TIMESTAMP(NANOS) parquet is read nanos-as-long and
    truncated to µs; µs parquet (NTZ) is read natively and converted
    with the Catalog's timezone-independent naive-as-UTC expression.

    ``ts_unit`` pins the producer format: ``"ns"`` / ``"us"`` skip the
    probe entirely (the right call in production, where the staging
    directory is empty at stream start and the path may not be
    driver-local).  ``"auto"`` probes the first parquet footer and
    raises if no file is probe-able — a stream's schema is fixed at
    start, so guessing wrong would poison every later micro-batch."""
    import os

    import pyarrow.parquet as pq

    if ts_unit not in ("auto", "ns", "us"):
        raise ValueError(f"ts_unit must be auto|ns|us, got {ts_unit!r}")
    if ts_unit == "auto":
        try:
            probe = path
            if os.path.isdir(path):
                files = [
                    f for f in sorted(os.listdir(path)) if f.endswith(".parquet")
                ]
                probe = os.path.join(path, files[0])
            ts_phys = str(pq.read_schema(probe).field("ts").type)
        except Exception as exc:
            raise ValueError(
                f"cannot probe ts unit of {path!r} (empty or non-local "
                "staging dir?) — pass ts_unit='ns' or 'us' explicitly"
            ) from exc
        ts_unit = "ns" if ts_phys == "timestamp[ns]" else "us"
    if ts_unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.readStream.schema(_events_schema(T.LongType())).parquet(path)
        # integer div: float /1000 on ns longs loses sub-µs precision
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    from prod_recommendation_pyspark_spark.sources.catalog import (
        _ntz_as_utc_instant,
    )

    raw = spark.readStream.schema(_events_schema(T.TimestampNTZType())).parquet(path)
    return raw.withColumn("ts", _ntz_as_utc_instant("ts"))


def streaming_windowed_counts(
    events: DataFrame, duration: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type — the
    streaming twin of ``tumbling_window_agg``.  ``total_value``
    accumulates in DECIMAL (associative — exact regardless of
    micro-batch arrival order) and is rounded before the double cast,
    so the incremental streaming sum is bit-identical to the batch
    twin and to a DuckDB oracle."""
    from prod_recommendation_pyspark_spark.functions.exact import dsum

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_stream_to_memory(
    agg: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drive a streaming aggregate to completion against a static
    source: memory sink + processAllAvailable (synchronous; test use)."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def rate_events_stream(
    spark: SparkSession, rows_per_second: int = 100
) -> DataFrame:
    """Synthetic-load streaming source: Spark's built-in ``rate``
    source (monotone ``timestamp, value`` rows at a configured rate)
    mapped to the events schema with DETERMINISTIC row-local
    arithmetic on ``value`` — so any downstream operator (the
    windowed aggs, stream-static joins, stateful sessionizers in
    this package) can be load-tested or demoed with no files, no
    Kafka, and reproducible per-row content (only arrival timing
    varies run to run).

    This is the smoke/load half of the source surface; the file
    adapter above is the replay half; a Kafka adapter is the same
    ``select`` over ``readStream.format("kafka")`` plus
    value-deserialization — environment-dependent, so not shipped
    (the mapping below is the part that carries over verbatim)."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return raw.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        F.pmod(F.col("value") * 31, F.lit(997)).alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.pmod(F.col("value"), F.lit(3)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.col("value") * 7, F.lit(1000)) / 10.0).alias("value"),
        F.lit("{}").alias("props"),
    )


def kafka_payload_to_events(raw: DataFrame) -> DataFrame:
    """Decode a Kafka-shaped (key, value, timestamp) frame into the
    events schema — the TRANSFORM half of a Kafka source, factored out
    so it is testable without a broker: `value` is a UTF-8 JSON blob
    carrying the event fields; malformed rows surface as nulls in a
    `_corrupt` flag column rather than killing the stream (a poison
    message must never crash a 100 TB ingest).

    The source half in production is just
    ``spark.readStream.format("kafka").option("kafka.bootstrap.servers",
    …).option("subscribe", "events").load()`` — environment-specific,
    so the engine ships THIS function plus the rate/file sources, and
    any Kafka deployment composes them."""
    parsed = raw.select(
        F.from_json(
            F.col("value").cast("string"),
            T.StructType(
                [
                    T.StructField("event_id", T.LongType()),
                    T.StructField("ts_us", T.LongType()),
                    T.StructField("user_id", T.LongType()),
                    T.StructField("event_type", T.StringType()),
                    T.StructField("value", T.DoubleType()),
                    T.StructField("props", T.StringType()),
                ]
            ),
        ).alias("e")
    )
    return parsed.select(
        F.col("e.event_id").alias("event_id"),
        F.timestamp_micros(F.col("e.ts_us")).alias("ts"),
        F.col("e.user_id").alias("user_id"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.value").alias("value"),
        F.col("e.props").alias("props"),
        # PERMISSIVE from_json yields an all-null struct (not a null
        # struct) for malformed input — corrupt = required key absent
        (F.col("e").isNull() | F.col("e.event_id").isNull()).alias(
            "_corrupt"
        ),
    )


def kafka_events_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str
) -> DataFrame:
    """Kafka source → events schema (source half + transform half).
    Requires a reachable broker and the spark-sql-kafka package —
    environment-specific by nature; the decode logic it mounts is
    :func:`kafka_payload_to_events`, which parity tests exercise on
    static frames."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .load()
    )
    return kafka_payload_to_events(raw).filter(~F.col("_corrupt")).drop(
        "_corrupt"
    )
