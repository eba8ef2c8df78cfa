"""Exact (decimal-accumulated) aggregate helpers — the ONE place the
cross-engine-deterministic summation idiom lives.

Why: a double SUM is summation-order-dependent; partial (map-side)
aggregation makes the order partitioning-dependent, so the same query
can round a 4-decimal output differently between two runs or two
engines (observed: ``confidence_table_products`` at sf0.1 — one ULP of
drift across 30k groups landed two values on the other side of their
rounding boundary).  Accumulating in DECIMAL is exact and associative:
any partitioning, any engine, the same digits.

When: money/value columns with bounded magnitude (|x| < ~3e15 for
scale 6; products x·y must also fit).  For generic feature columns of
unknown magnitude prefer the float aggregates — a DECIMAL(38,6) cast
quantizes tiny values to 1e-6 and NULLs (non-ANSI) on overflow; see
``features.scaling.standard_scale(exact_decimal=...)`` for the
documented trade-off.

The DuckDB oracle twin of ``dsum(c, 2)`` is
``CAST(round(sum(CAST(c AS DECIMAL(38,6))), 2) AS DOUBLE)`` — mirror
the op order exactly.  The round happens IN DECIMAL SPACE: rounding
the exact decimal sum is itself exact (HALF_UP in Spark, half-away-
from-zero in DuckDB — identical for every value), whereas rounding
after the double cast re-introduces the engine-divergent boundary the
decimal accumulation existed to kill (Spark rounds the double's
shortest decimal string, DuckDB rounds its binary value — a sum
landing exactly on .xx5, observed in the wild at sf0.01, splits
them).  Note DuckDB's decimal→decimal downcast TRUNCATES; only its
``round()`` matches Spark.

Negative-zero hazard (observed: ``random_projection_cosine_audit`` at
sf0.1): when a rounded DOUBLE column's TRUE value is exactly 0, the
two engines can compute opposite-signed 1e-17 noise, rounding to -0.0
on one side and +0.0 on the other — numerically equal, but the
driver's repr-sorted row compare treats them as different and
misaligns the whole sort.  Any emitted ``round(expr, k)`` whose expr
can be mathematically zero (differences of theoretically-equal
quantities, cosines of orthogonal vectors) must append ``+ 0.0`` in
BOTH the Spark projection and the oracle SQL (IEEE: -0.0 + 0.0 =
+0.0; every other value unchanged).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column, round_to: int | None = None, scale: int = 6) -> Column:
    """Exact decimal-accumulated sum, returned as double.  When
    ``round_to`` is given the round is applied to the DECIMAL sum
    (exact, engine-identical) before the double cast — see the module
    docstring for why double-space rounding is not equivalent."""
    s = F.sum(col.cast(f"decimal(38,{scale})"))
    if round_to is None:
        return s.cast("double")
    return F.round(s, round_to).cast("double")


def davg(col: Column, round_to: int | None = None, scale: int = 6) -> Column:
    """Exact-sum mean: decimal sum ÷ non-null count (one double
    division — deterministic)."""
    out = dsum(col, None, scale) / F.count(col)
    return F.round(out, round_to) if round_to is not None else out


def dstd(col: Column, round_to: int | None = None, scale: int = 6) -> Column:
    """Sample stddev from exact moment sums: ``sqrt(greatest((s2 -
    s1²/n)/(n-1), 0))``; NULL for n < 2 (matching ``stddev_samp``).
    With exact s1/s2 the naive formula's cancellation is one
    deterministic rounding, not an accumulated error — but for
    high-mean/low-variance data (mean² ≫ n·var·ULP⁻¹) prefer
    ``stddev_samp``; this helper is for the oracle-deterministic
    money-scale path."""
    s1 = dsum(col, None, scale)
    s2 = F.sum((col * col).cast(f"decimal(38,{scale})")).cast("double")
    n = F.count(col)
    sd = F.sqrt(F.greatest((s2 - s1 * s1 / n) / (n - 1), F.lit(0.0)))
    out = F.when(n >= 2, sd)
    return F.round(out, round_to) if round_to is not None else out
