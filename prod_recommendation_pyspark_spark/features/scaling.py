"""Scaling transforms (SURVEY.md §2.11 M6-M7).

The reference min-max-scales one column at a time through a
VectorAssembler → MinMaxScaler Pipeline, then unwraps the vector with a
Python UDF (search_ranking_peers.py:418-441, inference_postprocess.py:
52-67 — with defect B18: an early ``return`` normalizes only the first
column).  A 1-column scale needs no vectors, no UDFs, and no pipeline
fit: it is two aggregates and one projection.  Implemented as a single
grouped/global aggregate for *all* requested columns at once — one pass
over the data instead of 2 fits per column, and the whole thing stays
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _stats_window(partition_by: list[str] | None) -> Window:
    if partition_by:
        return Window.partitionBy(*partition_by)
    return Window.partitionBy()  # global window — single exchange


def min_max_scale(
    df: DataFrame,
    cols: list[str],
    partition_by: list[str] | None = None,
    suffix: str = "_scaled",
) -> DataFrame:
    """``(x - min) / (max - min)`` per column; constant columns → 0.0
    (MinMaxScaler maps constant features to 0.5·(max+min) range middle;
    we pick 0.0 and document it — the reference never hits the case).

    Scale: the window-over-empty-partition plans one exchange shared by
    all columns; with ``partition_by`` it is a per-group shuffle, same
    as the groupBy it replaces.
    """
    w = _stats_window(partition_by)
    out = df
    for c in cols:
        mn, mx = F.min(c).over(w), F.max(c).over(w)
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(mx == mn, F.lit(0.0)).otherwise((F.col(c) - mn) / (mx - mn)),
        )
    return out


def standard_scale(
    df: DataFrame,
    cols: list[str],
    partition_by: list[str] | None = None,
    suffix: str = "_z",
) -> DataFrame:
    """z-score: ``(x - mean) / stddev_samp``; zero-variance → 0.0."""
    w = _stats_window(partition_by)
    out = df
    for c in cols:
        mu, sd = F.avg(c).over(w), F.stddev_samp(F.col(c)).over(w)
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(sd.isNull() | (sd == 0), F.lit(0.0)).otherwise((F.col(c) - mu) / sd),
        )
    return out


def log10_floor(df: DataFrame, col: str, out_col: str, floor: float = 1.0) -> DataFrame:
    """M7 — the reference's revenue transform
    (search_ranking_peers.py:419-422): nonpositive/null → ``floor``,
    then log10. Pure native expression."""
    guarded = F.when(
        F.col(col).isNull() | (F.col(col) <= 0), F.lit(floor)
    ).otherwise(F.col(col))
    return df.withColumn(out_col, F.log10(guarded))
