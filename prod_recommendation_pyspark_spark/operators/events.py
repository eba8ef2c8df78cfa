"""Batch event windowing (SURVEY.md §2.12; §7 Phase F).

The reference has no temporal operators at all; the engine ships the
full windowed-aggregation surface as *batch* operators (oracle-checkable
in DuckDB) with a Structured Streaming adapter layered on the same
expressions (streaming/adapter.py).

All outputs expose window bounds as **epoch seconds** (bigint): Spark
renders collected timestamps in the session timezone, so epoch values
keep the contract timezone-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame, ts_col: str, duration: str, group_cols: list[str], aggs: list
) -> DataFrame:
    """Non-overlapping fixed windows (``F.window`` aligns to the epoch)."""
    return (
        df.groupBy(F.window(ts_col, duration), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.unix_timestamp("window.start"))
        .withColumn("window_end", F.unix_timestamp("window.end"))
        .drop("window")
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str],
    aggs: list,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows.
    Spark plans this as a generator (explode of window instances) +
    hash aggregate — one shuffle on (window, groups)."""
    return (
        df.groupBy(F.window(ts_col, duration, slide), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.unix_timestamp("window.start"))
        .withColumn("window_end", F.unix_timestamp("window.end"))
        .drop("window")
    )


def session_window_agg(
    df: DataFrame, ts_col: str, gap: str, group_cols: list[str], aggs: list
) -> DataFrame:
    """Gap-based sessions per group (``F.session_window``): a session
    extends while consecutive events are < gap apart; window end =
    last event + gap.  Batch semantics match the classic
    gaps-and-islands SQL, which is the DuckDB oracle."""
    return (
        df.groupBy(F.session_window(ts_col, gap), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.unix_timestamp("session_window.start"))
        .withColumn("window_end", F.unix_timestamp("session_window.end"))
        .drop("session_window")
    )
