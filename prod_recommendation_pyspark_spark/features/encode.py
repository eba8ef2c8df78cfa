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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def string_index(
    df: DataFrame,
    col: str,
    out_col: str | None = None,
    keep_invalid: bool = True,
    max_labels: int = 100_000,
) -> DataFrame:
    """M2 — StringIndexer semantics (``frequencyDesc``: labels ordered
    by descending frequency, ties broken by value; ``handleInvalid=
    'keep'`` → nulls get index = #labels).

    Implemented as: distinct-count the labels (one shuffle on the
    *distinct* label set), rank the label dictionary DRIVER-SIDE —
    exactly what MLlib's ``StringIndexer.fit`` does, and the dictionary
    is broadcast-sized by contract since we broadcast-join it back —
    then broadcast-join indices onto the fact side.  No fit object, no
    global window (a single-partition sort, even of a tiny table,
    would trip the WindowExec fact-table alarm).

    ``max_labels`` (round-13 verdict #5) guards the driver-side
    dictionary: indexing is defined for CATEGORICAL columns (bounded
    label sets, same contract as ``StringIndexer``), but a caller who
    misapplies it to a high-cardinality key (an id column at 100 TB)
    would otherwise OOM the driver at the collect.  The label pull is
    ``limit(max_labels + 1)`` — the collect itself is bounded, so the
    guard costs nothing and the overflow raises LOUDLY before any
    driver memory is at risk."""
    out_col = out_col or f"{col}_idx"
    spark = df.sparkSession
    freq_rows = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("__freq"))
        .limit(max_labels + 1)
        .collect()
    )
    if len(freq_rows) > max_labels:
        raise ValueError(
            f"string_index: column '{col}' has more than "
            f"max_labels={max_labels} distinct labels — this operator "
            "is for categorical columns (the label dictionary is "
            "collected and broadcast); indexing a high-cardinality key "
            "would OOM the driver.  Use dense_ids (a distributed "
            "range-partitioned id map) for key columns, or raise "
            "max_labels if the cardinality is genuinely intended."
        )
    ordered = sorted(freq_rows, key=lambda r: (-r["__freq"], r[col]))
    label_rows = [(r[col], float(i)) for i, r in enumerate(ordered)]
    n_labels = float(len(label_rows))
    # schema mirrors the INPUT column's type — StringIndexer semantics
    # apply to any orderable label type, not just strings
    schema = T.StructType(
        [
            T.StructField(col, df.schema[col].dataType),
            T.StructField(out_col, T.DoubleType()),
        ]
    )
    labels = spark.createDataFrame(label_rows, schema=schema)
    joined = df.join(F.broadcast(labels), on=col, how="left")
    if keep_invalid:
        # 'keep' assigns index = #labels to null/unseen (known
        # driver-side now — no crossJoin needed)
        joined = joined.withColumn(
            out_col, F.coalesce(F.col(out_col), F.lit(n_labels))
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
