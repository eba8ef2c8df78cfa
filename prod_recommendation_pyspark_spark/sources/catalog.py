"""Thin table catalog (SURVEY.md §2.1 S9).

Replaces the reference's getter/setter DataFrame wrapper
(search_ranking_peers.py:47-85, recommender_prod_rec.py:43-83) with a
directory-backed catalog: one parquet file per table, lazily read and
cached per session.  ``register_all`` also publishes temp views so the
same tables are queryable through ``spark.sql``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# Tables whose timestamp columns carry INSTANT semantics (event time:
# windows, watermarks, epoch math) — NTZ columns here are converted to
# instants on read; everything else keeps NTZ for scan pushdown.
INSTANT_TABLES = frozenset({"events"})

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class Catalog:
    """Lazy parquet-directory catalog: ``Catalog(spark, dir).table(name)``."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir.rstrip("/")
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            path = f"{self.base_dir}/{name}.parquet"
            nanos = _nano_timestamp_cols(path)
            if nanos:
                # Spark rejects TIMESTAMP(NANOS) parquet outright; read
                # nanos as long and truncate to microseconds — the same
                # precision DuckDB/Arrow surface, so oracle-comparable.
                self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = self.spark.read.parquet(path)
            for c in nanos:
                # integer division: float `/ 1000` on ~1.7e18 ns values
                # loses precision past the 53-bit double mantissa and
                # lands up to ~hundreds of ns off
                df = df.withColumn(
                    c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
                )
            # Parquet µs timestamps with isAdjustedToUTC=false read as
            # TIMESTAMP_NTZ under Spark 4 and are KEPT as NTZ for the
            # relational tables — three reasons: (1) predicate
            # pushdown: a blanket naive→instant projection here
            # wrapped every date column in an expression, so
            # `o_orderdate >= lit` filters could not reach the parquet
            # scan (observed: all TPC-H date filters scanning full
            # tables); (2) NTZ comparisons/functions are
            # session-timezone-independent; (3) NTZ IS DuckDB's naive
            # TIMESTAMP — oracle parity with no conversion at all.
            # Query-side code compares NTZ columns against
            # `lit(...).cast("timestamp_ntz")` literals, which push
            # down as GreaterThanOrEqual/LessThan on the scan.
            #
            # The EVENTS table is the exception: its ts column feeds
            # instant-domain ops (time windows, watermark twins,
            # unix_micros epoch math, as-of joins), so NTZ columns are
            # converted to instants TZ-independently.  At SFs where
            # events.ts is stored as TIMESTAMP(NANOS) the nanos path
            # above already produced instants and this is a no-op.
            if name in INSTANT_TABLES:
                from pyspark.sql import types as T

                for f in df.schema.fields:
                    if isinstance(f.dataType, T.TimestampNTZType):
                        df = df.withColumn(f.name, _ntz_as_utc_instant(f.name))
            self._cache[name] = df
        return self._cache[name]

    def register_all(self, names=TESTDATA_TABLES) -> None:
        for name in names:
            self.table(name).createOrReplaceTempView(name)


def _ntz_as_utc_instant(col: str) -> F.Column:
    """TIMESTAMP_NTZ → TIMESTAMP holding the same wall-clock reading
    as a UTC instant, independent of ``spark.sql.session.timeZone``."""
    return F.timestamp_micros(
        F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`)"
        )
    )


def _nano_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) (one footer read —
    driver-side, O(1) regardless of table size)."""
    try:
        import pyarrow.parquet as pq

        probe = path
        if os.path.isdir(path):
            files = [f for f in sorted(os.listdir(path)) if f.endswith(".parquet")]
            if not files:
                return []
            probe = os.path.join(path, files[0])
        schema = pq.read_schema(probe)
        return [f.name for f in schema if str(f.type) == "timestamp[ns]"]
    except Exception:
        return []
