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

from pyspark.sql import DataFrame, Window
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Backward as-of join: for every left row, attach the latest right
    row of the same ``key`` with ``right_ts <= left_ts`` (NULLs when no
    prior right row exists) — the temporal join Spark lacks natively
    (absent from the reference too; standard in time-series engines).

    Spark-first construction — ONE shuffle on ``key``, no range join,
    no per-key collect:

    1. union both sides tagged (right rows sort before left rows at
       equal timestamps ⇒ inclusive ``<=`` semantics);
    2. running ``last(right_payload, ignorenulls)`` over
       (key ORDER BY ts, tag) carries the most recent right payload
       forward to each left row;
    3. keep left rows, unpack the payload struct.

    The window is a running frame (unbounded preceding → current row),
    so executors stream each key's partition in ts order without
    buffering it.  Right rows should be unique per (key, ts) for
    deterministic ties — pre-dedupe if needed.
    """
    return _asof_impl(
        left, right, key, left_ts, right_ts, right_cols, forward=False
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Forward as-of join: for every left row, attach the EARLIEST
    right row of the same ``key`` with ``right_ts >= left_ts`` (NULLs
    when no later right row exists) — "time to next purchase"-style
    lookups.  Same one-shuffle union+running-window construction as
    ``asof_join``, with the window ordered by ts DESCENDING: in that
    order "most recently seen right row" IS the smallest following
    timestamp, and right rows still sort before left rows at equal
    timestamps so the match is inclusive."""
    return _asof_impl(
        left, right, key, left_ts, right_ts, right_cols, forward=True
    )


def _asof_impl(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    *,
    forward: bool,
) -> DataFrame:
    rp = F.struct(*[F.col(c) for c in right_cols]).alias("__rp")
    l_cols = left.columns
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ats"),
        F.lit(1).alias("__tag"),
        F.struct(*[F.col(c) for c in l_cols]).alias("__lp"),
        F.lit(None).cast(
            right.select(rp).schema["__rp"].dataType.simpleString()
        ).alias("__rp"),
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ats"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in l_cols]).alias("__lp"))
            .schema["__lp"].dataType.simpleString()
        ).alias("__lp"),
        rp,
    )
    order = (
        [F.col("__ats").desc(), F.col("__tag")]
        if forward
        else [F.col("__ats"), F.col("__tag")]
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l.unionByName(r)
        .withColumn("__match", F.last("__rp", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    out_cols = [F.col(f"__lp.{c}").alias(c) for c in l_cols] + [
        F.col(f"__match.{c}").alias(f"asof_{c}") for c in right_cols
    ]
    return filled.select(*out_cols)


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_col: str,
    start_col: str,
    end_col: str,
    granule: int = 3600,
) -> DataFrame:
    """Interval-containment join (``start <= point < end`` per key)
    WITHOUT a nested-loop join: intervals explode into the fixed-size
    time granules they cover, points map to their single granule, and
    the join is a plain equi-join on (key, granule) + a residual
    containment filter — the classic bucketed range join.

    Each (point, interval) pair can meet in at most one granule (the
    point's), so no dedup is needed.  Pick ``granule`` near the median
    interval length: too small explodes intervals into many rows, too
    large fills buckets with non-matching pairs for the residual
    filter.  One shuffle on (key, granule); at 100 TB both sides can be
    pre-bucketed on the same key to make it co-located.

    ``point_col``/``start_col``/``end_col`` are numeric (e.g. epoch
    seconds); ``end`` is exclusive.
    """
    g = F.lit(granule).cast("long")
    iv = intervals.withColumn(
        "__g",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / g),
                F.floor((F.col(end_col) - 1) / g),
            )
        ),
    )
    pt = points.withColumn("__g", F.floor(F.col(point_col) / g))
    return (
        pt.join(iv, [key, "__g"])
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__g")
    )


def utc_day(ts_col: str) -> F.Column:
    """Calendar day of a timestamp AS A UTC INSTANT, independent of
    ``spark.sql.session.timeZone`` (``to_date`` would shift rows near
    midnight by the session offset): days-since-epoch arithmetic on
    ``unix_micros``, then back to DATE.  Matches any engine's naive
    ``CAST(ts AS DATE)`` of the same wall-clock reading."""
    return F.date_from_unix_date(
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(86_400_000_000)).cast(
            "int"
        )
    )


def scd2_history(
    snapshots: DataFrame,
    key_cols: list[str],
    snap_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from periodic
    snapshots — the generalization of the reference's latest-snapshot
    model (search_ranking_peers.py:87-151 resolves only the newest
    date; this keeps the full change history): one output row per
    (key, attribute-state run) with ``valid_from`` / ``valid_to`` /
    ``is_current``.

    Change capture is ``lag`` over (key, snapshot order); runs
    collapse to their first snapshot; ``valid_to`` is the next
    change's ``lead`` (NULL = still current).  Two window passes over
    the SAME (key × snapshot-ordered) partitioning — one shuffle
    total, reused by both windows; state per task is one row.  NULL
    attribute values are change-compared via null-safe equality."""
    w = Window.partitionBy(*key_cols).orderBy(snap_col)
    changed = F.lit(False)
    for c in attr_cols:
        prev = F.lag(F.col(c)).over(w)
        changed = changed | ~F.col(c).eqNullSafe(prev)
    # the first snapshot of a key has lag NULL on every attr: eqNullSafe
    # against a non-null value is False -> changed; an all-NULL first
    # row still must open a run, so OR with lag(snap) IS NULL
    changed = changed | F.lag(F.col(snap_col)).over(w).isNull()
    runs = snapshots.withColumn("__chg", changed).filter(F.col("__chg"))
    return (
        runs.withColumn("valid_from", F.col(snap_col))
        .withColumn("valid_to", F.lead(F.col(snap_col)).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__chg", snap_col)
    )


def temporal_split(
    df: DataFrame,
    ts_col: str,
    train_frac: float = 0.7,
    gap_days: int = 3,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-guarded temporal train/test split: everything up to the
    exact ``train_frac`` day-quantile is train, then ``gap_days`` of
    EMBARGO rows that belong to neither side, then test — the
    time-series analog of the cluster-aware ``leakage_safe_split``
    (there near-dups must not straddle the split; here label windows
    and autocorrelated features must not: an event 1 hour after the
    cut shares its user's state with training, so a gap, not a knife
    edge).

    The cut is the exact interpolated percentile of the integer day
    index (cross-engine deterministic, the ``quantile_cont`` parity
    class) — one aggregate pass, broadcast back, then a row-local
    CASE: the fact table never shuffles.  Day indexing is pure
    epoch-microsecond arithmetic, timezone-free."""
    day = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        / F.lit(86_400_000_000)
    ).cast("long")
    cut = df.agg(
        F.floor(F.percentile(day, F.lit(train_frac)))
        .cast("long")
        .alias("__cut")
    )
    return (
        df.withColumn("__day", day)
        .crossJoin(F.broadcast(cut))
        .withColumn(
            split_col,
            F.when(F.col("__day") <= F.col("__cut"), F.lit("train"))
            .when(
                F.col("__day") <= F.col("__cut") + gap_days,
                F.lit("embargo"),
            )
            .otherwise(F.lit("test")),
        )
        .drop("__cut", "__day")
    )


def gap_fill_locf(
    daily: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Resample a keyed daily series onto the COMPLETE day spine and
    forward-fill gaps (LOCF — last observation carried forward): the
    time-series normalizer every feature pipeline needs before
    windowed models (a missing day must mean "unchanged", not "absent
    row").  Returns one row per (key, spine day) with ``value_col``
    filled and ``is_observed`` marking real measurements.

    Scale shape: the spine bounds come from ONE 2-value aggregate
    (broadcast cross join); the key list is the input's own distinct
    keys (never a driver collect); spine size = |keys| × days — the
    OUTPUT size, so nothing is amplified beyond what the result
    requires; the fill is a running ``last(ignorenulls)`` window per
    key, one shuffle.  Leading gaps (before a key's first
    observation) stay NULL — LOCF has nothing to carry."""
    bounds = daily.agg(
        F.min(day_col).alias("__d0"), F.max(day_col).alias("__d1")
    )
    spine = (
        daily.select(key_col)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("__d0"), F.col("__d1"))
            ).alias(day_col),
        )
    )
    joined = spine.join(daily, [key_col, day_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key_col,
        day_col,
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        F.col(value_col).isNotNull().alias("is_observed"),
    )
