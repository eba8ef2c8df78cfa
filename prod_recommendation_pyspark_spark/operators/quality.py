"""Data-quality validation (the Deequ/Great-Expectations pattern,
engine-native): declarative checks compiled into ONE aggregation pass
over the table, plus referential checks as anti-join counts.

Why one pass matters at 100 TB: each metric is a conditional aggregate
(`avg(col IS NOT NULL)`, `count(DISTINCT key)`, `min(price)`), so N
checks cost one scan + one partial-aggregated shuffle of a single row —
not N scans.  The output is a tiny (check, metric, passed) table a
pipeline can gate publication on.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: check name → (metric aggregate, metric → pass predicate)
Check = tuple[Column, Callable[[Column], Column]]


def row_count() -> Check:
    return F.count(F.lit(1)).cast("double"), lambda m: m > 0


def completeness(col: str) -> Check:
    """Fraction of non-null values; passes at exactly 1.0."""
    return (
        F.avg(F.col(col).isNotNull().cast("double")),
        lambda m: m >= 1.0,
    )


def uniqueness(col: str) -> Check:
    """distinct/total ratio; passes at exactly 1.0 (a primary key).
    Exact countDistinct — the oracle-checkable form; swap in
    ``approx_count_distinct`` for a cheaper sketch at scale (the
    pass predicate then needs an error margin)."""
    return (
        F.countDistinct(F.col(col)) / F.count(F.lit(1)),
        lambda m: m >= 1.0,
    )


def non_negative(col: str) -> Check:
    """Minimum value; passes when >= 0."""
    return F.min(F.col(col)).cast("double"), lambda m: m >= 0


def in_set_fraction(col: str, allowed: list[str]) -> Check:
    """Fraction of ROWS whose value is inside the allowed set; passes
    at 1.0.  A NULL is not in any set, so it counts as a violation
    (``isin`` returns NULL for NULL input and ``avg`` would silently
    skip it — the coalesce keeps the metric aligned with SQL's
    ``CASE WHEN x IN (...) THEN 1 ELSE 0``)."""
    return (
        F.avg(
            F.coalesce(F.col(col).isin(allowed), F.lit(False)).cast("double")
        ),
        lambda m: m >= 1.0,
    )


def column_checks(df: DataFrame, checks: dict[str, Check]) -> DataFrame:
    """Run all column checks in ONE aggregation pass.  Returns
    ``(check, metric, passed)`` rows (metric rounded to 6 for
    cross-engine hash stability)."""
    agg = df.agg(
        *[metric.alias(name) for name, (metric, _) in checks.items()]
    )
    structs = [
        F.struct(
            F.lit(name).alias("check"),
            F.round(F.col(name).cast("double"), 6).alias("metric"),
            pred(F.col(name)).alias("passed"),
        )
        for name, (_, pred) in checks.items()
    ]
    return agg.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def fk_check(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str,
) -> DataFrame:
    """Referential integrity: count of child rows whose key has no
    parent (NULL child keys are orphans too — a dangling reference and
    a missing one both break the join contract downstream).  One
    anti-join shuffled on the key; with the parent bucketed/broadcast
    this is the cheapest possible containment proof.  Same output
    shape as ``column_checks`` rows."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    return orphans.agg(
        F.lit(name).alias("check"),
        F.count(F.lit(1)).cast("double").alias("metric"),
        (F.count(F.lit(1)) == 0).alias("passed"),
    )
