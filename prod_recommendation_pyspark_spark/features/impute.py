"""Median imputation (SURVEY.md §2.11 M1).

The reference loops ``pyspark.ml.feature.Imputer(strategy='median')``
over columns one at a time (search_ranking_peers.py:351-358, applied
:473-476; defect B9 returns the wrong variable).  One ``Imputer`` fit
per column is one approxQuantile job per column; here all medians come
from a single aggregate row that Catalyst computes in one pass, then a
single projection fills the nulls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def impute_median(
    df: DataFrame, cols: list[str], exact: bool = True, rel_err: float = 0.001
) -> DataFrame:
    """Fill nulls with the column median.

    ``exact=True`` uses the exact ``percentile`` aggregate (sort-based;
    fine up to huge-but-not-pathological cardinality since it
    aggregates per column, not per row).  At 100 TB prefer
    ``exact=False`` → ``approx_percentile`` (Greenwald-Khanna sketch,
    single pass, mergeable across partitions) — same contract as
    MLlib's Imputer which is itself approximate.
    """
    if exact:
        aggs = [F.expr(f"percentile({c}, 0.5)").alias(c) for c in cols]
    else:
        aggs = [
            F.expr(f"approx_percentile({c}, 0.5, {int(1 / rel_err)})").alias(c)
            for c in cols
        ]
    medians = df.agg(*aggs).first().asDict()
    return df.fillna({c: medians[c] for c in cols if medians[c] is not None})
