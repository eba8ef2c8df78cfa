"""Categorical encoders (SURVEY.md §2.11 M2-M5, M8) as native
Catalyst expressions.

The reference uses MLlib ``StringIndexer``/``Bucketizer``/
``OneHotEncoder`` (search_ranking_peers.py:360-416) plus a Python UDF
to densify the OHE vector (D2, :69-73).  Each MLlib ``fit`` is a
driver round-trip; the UDF leaves codegen.  These native forms produce
the same values with joins/CASE ladders, stay on the codegen path, and
are oracle-checkable in plain SQL.  (MLlib remains the right choice
when a fitted, reusable ``PipelineModel`` artifact is the goal — these
are the in-plan equivalents.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def string_index(
    df: DataFrame, col: str, out_col: str | None = None, keep_invalid: bool = True
) -> DataFrame:
    """M2 — StringIndexer semantics (``frequencyDesc``: labels ordered
    by descending frequency, ties broken by value; ``handleInvalid=
    'keep'`` → nulls get index = #labels).

    Implemented as: distinct-count the labels (tiny), window-rank them,
    broadcast-join back.  One shuffle on the label column (cheap — it
    is the *distinct* set), broadcast join to the fact side, no fit.
    """
    out_col = out_col or f"{col}_idx"
    labels = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("__freq"))
        .withColumn(
            out_col,
            (
                F.row_number().over(
                    Window.orderBy(F.col("__freq").desc(), F.col(col))
                )
                - 1
            ).cast("double"),
        )
        .drop("__freq")
    )
    joined = df.join(F.broadcast(labels), on=col, how="left")
    if keep_invalid:
        # 'keep' assigns index = #labels to null/unseen. The label count
        # rides in as a broadcast 1-row cross join — no global window
        # (which would single-partition the fact table), no action.
        n_df = labels.agg(F.count(F.lit(1)).cast("double").alias("__n_labels"))
        joined = (
            joined.crossJoin(F.broadcast(n_df))
            .withColumn(out_col, F.coalesce(F.col(out_col), F.col("__n_labels")))
            .drop("__n_labels")
        )
    return joined


def bucketize(
    df: DataFrame, col: str, splits: list[float], out_col: str | None = None
) -> DataFrame:
    """M3 — MLlib Bucketizer semantics on explicit splits
    (search_ranking_peers.py:372-392 builds np.linspace splits):
    bucket i covers [splits[i], splits[i+1]), last bucket closed on the
    right.  A CASE ladder compiles to branch-free codegen; no fit."""
    out_col = out_col or f"{col}_bucket"
    expr = F.when(
        (F.col(col) >= splits[-2]) & (F.col(col) <= splits[-1]),
        F.lit(float(len(splits) - 2)),
    )
    for i in range(len(splits) - 2):
        expr = expr.when(
            (F.col(col) >= splits[i]) & (F.col(col) < splits[i + 1]), F.lit(float(i))
        )
    return df.withColumn(out_col, expr)


def one_hot(
    df: DataFrame, col: str, values: list[str], prefix: str | None = None,
    weight: float = 1.0,
) -> DataFrame:
    """M4+M5 — one-hot to explicit 0/1 (optionally ``weight``-scaled)
    columns.  The reference one-hot-encodes to a sparse vector, then
    UDF-densifies and multiplies by w_jpmc
    (search_ranking_peers.py:404-416); with explicit columns the
    weighting is a literal multiply and no UDF ever runs.  Explicit
    ``values`` avoids the distinct() discovery pass (A6) at scale."""
    prefix = prefix or col
    out = df
    for v in values:
        out = out.withColumn(
            f"{prefix}_{v}",
            (F.when(F.col(col) == v, F.lit(1.0)).otherwise(F.lit(0.0)) * weight),
        )
    return out


def assemble_features(
    df: DataFrame, cols: list[str], out_col: str = "features",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """M8 — feature assembly as a native ``array<double>`` column
    (SURVEY §1.4: arrays, not VectorUDT; convert with
    ``pyspark.ml.functions.array_to_vector`` only at an MLlib
    boundary).  Nulls → 0.0 (VectorAssembler handleInvalid='keep'
    keeps NaN; 0.0 is the saner contract for similarity math)."""
    weights = weights or {}
    elems = [
        (F.coalesce(F.col(c).cast("double"), F.lit(0.0)) * weights.get(c, 1.0)).alias(c)
        for c in cols
    ]
    return df.withColumn(out_col, F.array(*elems))
