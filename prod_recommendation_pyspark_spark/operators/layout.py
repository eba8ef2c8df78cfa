"""Multi-dimensional data layout: Z-order (Morton) clustering for
data-skipping writes — the plain-parquet equivalent of a lakehouse
``OPTIMIZE ZORDER BY (a, b)``.

Why it matters at 100 TB: parquet scans prune files and row groups by
min/max statistics.  A table sorted by ONE column has tight stats on
that column only — filters on a second column read everything.
Interleaving the bits of both columns' normalized ranks into one
Morton code and range-partitioning + sorting by it gives every file a
small rectangle of the (a, b) space, so min/max pruning works for
filters on EITHER column (and conjunctions).  The z-value is ordinary
integer arithmetic (shifts/masks/or) — codegen'd in Spark, replayable
in any SQL engine, and the layout survives as plain parquet: readers
need no library support, they just see tighter statistics.

Cost model: one range shuffle (sampling pass + exchange) + an in-
partition sort — the same cost as any global sort, paid once at write
time; every subsequent selective scan repays it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton code: bit ``b`` of ``cols[i]`` lands at output position
    ``b * len(cols) + i``.  Inputs must already be integers in
    ``[0, 2**bits)``; with ``len(cols) * bits <= 62`` the result fits
    a positive BIGINT.  Pure shift/mask/sum arithmetic — whole-stage
    codegen'd, no UDF."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a positive BIGINT")
    terms = []
    for i, c in enumerate(cols):
        x = c.cast("long")
        for b in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(x, b).bitwiseAND(F.lit(1)), b * n + i
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 16, z_col: str = "z"
) -> DataFrame:
    """Attach the Morton code of ``cols`` (each min-max normalized to
    ``[0, 2**bits)``) as ``z_col``.  The min/max pass is one tiny
    all-column aggregate broadcast back — at any scale the stats row
    is ``2 * len(cols)`` numbers.  A constant column (min == max)
    normalizes to 0 and contributes nothing to the ordering.  The
    normalization is plain double arithmetic, so any engine replays
    identical z-values (IEEE754 ops in the same order)."""
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__mx_{c}") for c in cols],
    )
    top = float(2**bits - 1)
    with_stats = df.crossJoin(F.broadcast(stats))
    ranks = []
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = mx - mn
        ranks.append(
            F.when(span > 0,
                   F.floor((F.col(c).cast("double") - mn) * F.lit(top) / span))
            .otherwise(F.lit(0))
            .cast("long")
        )
    return with_stats.withColumn(z_col, interleave_bits(ranks, bits)).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet laid out in Z-order over ``cols``:
    range-partition by the Morton code (``n_files`` contiguous z
    ranges → files), sort within partitions, drop the helper column.
    Each output file then covers a compact rectangle of the value
    space, so min/max pruning serves filters on any of ``cols``."""
    z = zorder_value(df, cols, bits, z_col="__z")
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
