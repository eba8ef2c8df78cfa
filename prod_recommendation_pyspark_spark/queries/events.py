"""Batch event-windowing query surface (SURVEY.md §2.12, §7 Phase F).

Window bounds are emitted as epoch seconds so results are
timezone-independent (Spark renders timestamps in session TZ; DuckDB
is TZ-naive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.events import (
    scd2_history,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
    utc_day,
)
from prod_recommendation_pyspark_spark.functions.exact import dsum
from prod_recommendation_pyspark_spark.queries.registry import register
from prod_recommendation_pyspark_spark.sources.catalog import Catalog


def _epoch_us(col: str) -> F.Column:
    """Epoch microseconds tolerant of TIMESTAMP_NTZ inputs.  Tables
    read through the Catalog already arrive as TIMESTAMP (it converts
    NTZ timezone-independently at scan time), making the cast here a
    no-op on that path; it stays as a guard for callers that hand
    these query bodies DataFrames built outside the Catalog (session
    TZ is UTC in our factory, so the cast is value-preserving there)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


@register(
    "tumbling_hourly_events",
    sql="""
    SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)        AS window_start,
           CAST(floor(epoch(ts) / 3600) * 3600 + 3600 AS BIGINT) AS window_end,
           event_type,
           count(*)             AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
)
def tumbling_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (epoch-aligned, exactly
    DuckDB's floor(epoch/3600))."""
    ev = Catalog(spark, sf_dir).table("events")
    return tumbling_window_agg(
        ev,
        "ts",
        "1 hour",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("total_value"),
        ],
    ).select(
        "window_start", "window_end", "event_type", "n_events", "total_value"
    ).orderBy("window_start", "event_type")


@register(
    "sliding_windows_events",
    sql="""
    WITH expanded AS (
        SELECT CAST(floor(epoch(ts) / 900) * 900 - 900 * k AS BIGINT) AS window_start,
               event_type, value
        FROM events, unnest([0, 1, 2, 3]) AS t(k))
    SELECT window_start, window_start + 3600 AS window_end, event_type,
           count(*) AS n_events, CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_value
    FROM expanded
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)
def sliding_windows_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 15 minutes: each event belongs to
    exactly 4 window instances; Spark plans the expansion + one hash
    aggregate, identical to the SQL unnest."""
    ev = Catalog(spark, sf_dir).table("events")
    return sliding_window_agg(
        ev,
        "ts",
        "1 hour",
        "15 minutes",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("total_value"),
        ],
    ).select(
        "window_start", "window_end", "event_type", "n_events", "total_value"
    ).orderBy("window_start", "event_type")


@register(
    "session_windows_events",
    sql="""
    WITH ordered AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM ordered)
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT)        AS window_start,
           CAST(floor(epoch(max(ts))) + 1800 AS BIGINT) AS window_end,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, window_start
    """,
)
def session_windows_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization per user — ``session_window``
    batch semantics == the classic gaps-and-islands SQL (a new session
    starts when the gap to the previous event is ≥ the gap duration;
    session end = last event + gap)."""
    ev = Catalog(spark, sf_dir).table("events")
    return session_window_agg(
        ev,
        "ts",
        "30 minutes",
        ["user_id"],
        [
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 2).alias("total_value"),
        ],
    ).select(
        "user_id", "window_start", "window_end", "n_events", "total_value"
    ).orderBy("user_id", "window_start")


@register(
    "asof_click_to_view",
    sql="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    views AS (
        SELECT event_id, user_id, ts, value FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view')
        WHERE rn = 1)
    SELECT c.event_id AS click_id, c.user_id,
           CAST(epoch_us(c.ts) AS BIGINT) AS click_us,
           v.event_id AS view_id,
           CAST(epoch_us(v.ts) AS BIGINT) AS view_us,
           round(v.value, 4) AS view_value
    FROM clicks c
    ASOF LEFT JOIN views v ON c.user_id = v.user_id AND v.ts <= c.ts
    ORDER BY click_id
    """,
)
def asof_click_to_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click is paired with the same user's
    most recent view at or before the click (the temporal-join
    pattern — attribution, point-in-time feature lookup).  Views are
    deduped to one per (user, ts) for deterministic ties; the oracle is
    DuckDB's native ASOF LEFT JOIN."""
    from prod_recommendation_pyspark_spark.operators.events import asof_join
    from prod_recommendation_pyspark_spark.operators.relational import (
        dedup_first_by_key,
    )

    ev = Catalog(spark, sf_dir).table("events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = dedup_first_by_key(
        ev.filter(F.col("event_type") == "view").select(
            "event_id", "user_id", "ts", "value"
        ),
        ["user_id", "ts"],
        order_by=[F.col("event_id").desc()],
    )
    joined = asof_join(clicks, views, "user_id", "ts", "ts", ["event_id", "ts", "value"])
    return joined.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        _epoch_us("ts").alias("click_us"),
        F.col("asof_event_id").alias("view_id"),
        _epoch_us("asof_ts").alias("view_us"),
        F.round("asof_value", 4).alias("view_value"),
    ).orderBy("click_id")


@register(
    "json_props_extract_events",
    sql="""
    SELECT event_type,
           count(*) AS n,
           CAST(min(CAST(json_extract(props, '$.k') AS INTEGER)) AS INT) AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS INT) AS max_k,
           round(avg(CAST(json_extract(props, '$.k') AS INTEGER)), 4) AS avg_k
    FROM events
    WHERE props IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_props_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column surface: parse the semi-structured ``props`` string
    with a declared schema (``from_json`` — schema'd parse beats
    per-path ``get_json_object`` re-parsing when extracting multiple
    fields) and aggregate the extracted field."""
    ev = Catalog(spark, sf_dir).table("events")
    parsed = ev.filter(F.col("props").isNotNull()).withColumn(
        "__p", F.from_json("props", "k int")
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__p.k").alias("min_k"),
            F.max("__p.k").alias("max_k"),
            F.round(F.avg("__p.k"), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@register(
    "range_join_purchases_sessions",
    sql="""
    WITH ordered AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM events WHERE event_type = 'click'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM ordered),
    iv AS (
        SELECT user_id,
               CAST(floor(epoch(min(ts))) AS BIGINT)        AS window_start,
               CAST(floor(epoch(max(ts))) + 1800 AS BIGINT) AS window_end
        FROM sess GROUP BY user_id, sid),
    p AS (
        SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM events WHERE event_type = 'purchase')
    SELECT p.event_id AS purchase_id, p.user_id, iv.window_start, iv.window_end
    FROM p JOIN iv ON p.user_id = iv.user_id
                  AND p.sec >= iv.window_start AND p.sec < iv.window_end
    ORDER BY purchase_id, window_start
    """,
)
def range_join_purchases_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join: purchases matched into the same user's
    click-session intervals (30-min gap sessions) via granule-explode +
    equi-join + residual containment — no nested-loop join.  Oracle is
    the plain inequality join over the gaps-and-islands sessions."""
    from prod_recommendation_pyspark_spark.operators.events import (
        range_join_bucketed,
        session_window_agg,
    )

    ev = Catalog(spark, sf_dir).table("events")
    clicks = ev.filter(F.col("event_type") == "click")
    sessions = session_window_agg(
        clicks, "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("__n")]
    ).select("user_id", "window_start", "window_end")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
    )
    return (
        range_join_bucketed(
            purchases, sessions, "user_id", "sec", "window_start", "window_end"
        )
        .select("purchase_id", "user_id", "window_start", "window_end")
        .orderBy("purchase_id", "window_start")
    )


@register(
    "click_view_interval_join",
    sql="""
    WITH clicks AS (
        SELECT event_id AS click_id, user_id AS click_user, ts AS click_ts
        FROM events WHERE event_type = 'click'),
    views AS (
        SELECT event_id AS view_id, user_id AS view_user, ts AS view_ts
        FROM events WHERE event_type = 'view')
    SELECT c.click_id, c.click_user,
           CAST(epoch_us(c.click_ts) AS BIGINT) AS click_us,
           v.view_id,
           CAST(epoch_us(v.view_ts) AS BIGINT) AS view_us
    FROM clicks c JOIN views v
      ON c.click_user = v.view_user
     AND v.view_ts <= c.click_ts
     AND v.view_ts >  c.click_ts - INTERVAL 1 HOUR
    ORDER BY click_id, view_id
    """,
)
def click_view_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked stream-stream attribution join
    (streaming/joins.py::streaming_click_attribution — the SAME
    function body runs here on batch inputs, so this oracle check
    covers the streaming operator's join semantics; the streaming
    pytest covers its incremental execution).  Each click matches every
    same-user view in the trailing 1-hour window."""
    from prod_recommendation_pyspark_spark.streaming.joins import (
        split_clicks_views,
        streaming_click_attribution,
    )

    ev = Catalog(spark, sf_dir).table("events")
    clicks, views = split_clicks_views(ev)
    return (
        streaming_click_attribution(clicks, views, horizon="1 hour")
        .select(
            "click_id",
            "click_user",
            _epoch_us("click_ts").alias("click_us"),
            "view_id",
            _epoch_us("view_ts").alias("view_us"),
        )
        .orderBy("click_id", "view_id")
    )


@register(
    "streaming_e2e_hourly_counts",
    sql="""
    WITH wm AS (SELECT epoch(max(ts)) - 7200 AS w FROM events),
    agg AS (
        SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
               event_type,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE)
                   AS total_value
        FROM events GROUP BY 1, 2)
    SELECT window_start, event_type, n_events, total_value
    FROM agg CROSS JOIN wm
    WHERE agg.window_start + 3600 <= wm.w
    ORDER BY window_start, event_type
    """,
)
def streaming_e2e_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONE end-to-end Structured Streaming pipeline, registered as
    a query (SURVEY §7 Phase F close-out): file landing dir →
    watermarked tumbling hourly counts (APPEND mode) → idempotent
    ``foreachBatch`` parquet sink, driven by ``availableNow`` — then
    the sink is read back as the result.

    The oracle replays the watermark contract itself: append mode
    emits exactly the windows whose end ≤ final watermark
    (``max(ts) − 2 hours``), so the driver hash-checks not just the
    aggregate values but WHICH windows a watermark finalizes.  The
    decimal-accumulated ``total_value`` makes the incremental sum
    bit-identical to the oracle's.  Restart/replay idempotence of the
    sink is pinned by the streaming pytests (a rerun on the same
    checkpoint processes nothing; a replayed batch_id overwrites its
    own partition)."""
    import tempfile

    from prod_recommendation_pyspark_spark.streaming.pipeline import (
        run_events_hourly_pipeline,
        stage_landing_dir,
    )

    base = tempfile.mkdtemp(prefix="spark_graft_stream_e2e_")
    landing = stage_landing_dir(
        f"{sf_dir}/events.parquet", f"{base}/landing"
    )
    res = run_events_hourly_pipeline(
        spark, landing, f"{base}/out", f"{base}/ckpt"
    )
    return res.select(
        "window_start", "event_type", "n_events", "total_value"
    ).orderBy("window_start", "event_type")


@register(
    "watermark_dedup_events",
    sql="""
    SELECT DISTINCT user_id, event_type
    FROM events
    ORDER BY user_id, event_type
    """,
)
def watermark_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked streaming dedup
    (streaming/joins.py::streaming_dedup_events — the SAME function
    body; withWatermark is a no-op in batch, so the semantics under
    check are 'exactly one survivor per key').  WHICH duplicate row
    survives is arrival-order-dependent in both modes, so the
    driver-checkable contract is the surviving KEY SET — projected to
    the dedup keys it must equal DISTINCT(keys) exactly.  The
    incremental/state-eviction behavior is covered by the streaming
    pytest."""
    from prod_recommendation_pyspark_spark.streaming.joins import (
        streaming_dedup_events,
    )

    ev = Catalog(spark, sf_dir).table("events")
    return (
        streaming_dedup_events(ev, keys=["user_id", "event_type"])
        .select("user_id", "event_type")
        .orderBy("user_id", "event_type")
    )


@register(
    "scd2_user_state_history",
    sql="""
    WITH d0 AS (
        SELECT user_id, CAST(ts AS DATE) AS snap_date, value,
               row_number() OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events),
    daily AS (
        SELECT user_id, snap_date,
               CASE WHEN value >= 50 THEN 'high' ELSE 'low' END AS state
        FROM d0 WHERE rn = 1),
    chg AS (
        SELECT user_id, snap_date, state,
               lag(state) OVER (PARTITION BY user_id ORDER BY snap_date)
                   AS prev,
               lag(snap_date) OVER (PARTITION BY user_id ORDER BY snap_date)
                   AS prev_d
        FROM daily),
    runs AS (
        SELECT user_id, snap_date, state FROM chg
        WHERE prev_d IS NULL OR state IS DISTINCT FROM prev)
    SELECT user_id, state, snap_date AS valid_from,
           lead(snap_date) OVER (PARTITION BY user_id ORDER BY snap_date)
               AS valid_to,
           lead(snap_date) OVER (PARTITION BY user_id ORDER BY snap_date)
               IS NULL AS is_current
    FROM runs ORDER BY user_id, valid_from
    """,
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history (operators/events.py::scd2_history) over a
    daily per-user activity state derived from events: each user-day's
    last event (ts/event_id-deterministic) is bucketed high/low, runs
    of the same state collapse to one row with valid_from/valid_to/
    is_current.  Day boundaries come from ``utc_day`` — pure epoch
    arithmetic, so the result is identical under any session timezone
    (the oracle's naive CAST(ts AS DATE) sees the same wall clock).
    One shuffle on (user, day) for the daily rollup, one on user for
    both SCD windows."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).table("events")
    snap = ev.withColumn("snap_date", utc_day("ts"))
    w = Window.partitionBy("user_id", "snap_date").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    daily = (
        snap.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "snap_date",
            F.when(F.col("value") >= 50, F.lit("high"))
            .otherwise(F.lit("low"))
            .alias("state"),
        )
    )
    hist = scd2_history(daily, ["user_id"], "snap_date", ["state"])
    return hist.select(
        "user_id", "state", "valid_from", "valid_to", "is_current"
    ).orderBy("user_id", "valid_from")


# --- Funnel analysis: ordered-step conversion per user ----------------------
@register(
    "funnel_conversion_events",
    sql="""
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t1
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t2
          GROUP BY e.user_id)
    SELECT v.user_id,
           CAST(epoch_us(v.t1) AS BIGINT) AS view_us,
           CAST(epoch_us(c.t2) AS BIGINT) AS click_us,
           CAST(epoch_us(p.t3) AS BIGINT) AS purchase_us,
           CAST(1 + CAST(c.user_id IS NOT NULL AS INT)
                  + CAST(p.user_id IS NOT NULL AS INT) AS INT) AS stage
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    ORDER BY v.user_id
    """,
)
def funnel_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step conversion funnel (view → click-after-view →
    purchase-after-click) per user — the product-analytics staple
    whose ORDER constraint a naive per-type min gets wrong (a click
    BEFORE the first view must not count).  Three chained conditional
    mins: each stage joins the previous stage's timestamp and keeps
    only later events.

    Scale: three passes over the (type-filtered, predicate-pushed)
    events scan, each one groupBy shuffle on user_id; stages 2-3 join
    on user_id against the prior stage's ONE-ROW-PER-USER table, so
    AQE broadcasts them as the funnel narrows.  Emitted timestamps are
    epoch µs — engine- and timezone-neutral."""
    ev = Catalog(spark, sf_dir).table("events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "t2"), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            _epoch_us("t1").alias("view_us"),
            _epoch_us("t2").alias("click_us"),
            _epoch_us("t3").alias("purchase_us"),
            (
                F.lit(1)
                + F.col("t2").isNotNull().cast("int")
                + F.col("t3").isNotNull().cast("int")
            ).alias("stage"),
        )
        .orderBy("user_id")
    )


# --- Cohort retention: signup week × activity week --------------------------
@register(
    "cohort_retention_events",
    sql="""
    WITH su AS (SELECT user_id,
                       CAST(floor(epoch(min(ts)) / 604800) AS BIGINT)
                           AS cohort_week
                FROM events WHERE event_type = 'signup'
                GROUP BY user_id),
    act AS (SELECT DISTINCT e.user_id, su.cohort_week,
                   CAST(floor(epoch(e.ts) / 604800) AS BIGINT) AS week
            FROM events e JOIN su ON e.user_id = su.user_id
            WHERE CAST(floor(epoch(e.ts) / 604800) AS BIGINT)
                  >= su.cohort_week)
    SELECT cohort_week,
           CAST(week - cohort_week AS BIGINT) AS weeks_since_signup,
           count(*) AS n_active
    FROM act
    GROUP BY cohort_week, weeks_since_signup
    ORDER BY cohort_week, weeks_since_signup
    """,
)
def cohort_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle — users bucketed by signup week
    (first 'signup' event), counted as active in each later week they
    emit ANY event: the companion analytic to the conversion funnel
    (one answers "do they convert", this answers "do they come
    back").  Weeks are epoch-aligned 7-day buckets (floor(epoch/604800)
    — engine-identical integer arithmetic, no calendar/TZ semantics to
    disagree on).

    Scale: one groupBy shuffle for the signup table (one row per
    user — AQE broadcasts it as the join side), one distinct shuffle
    on (user, cohort, week), one bounded-key aggregate.  Pre-signup
    activity is excluded (the cohort definition, and the guard that
    makes the triangle lower-triangular)."""
    ev = Catalog(spark, sf_dir).table("events")
    week = F.floor(_epoch_us("ts") / F.lit(604800000000)).cast("long")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
        .select(
            "user_id",
            F.floor(_epoch_us("t0") / F.lit(604800000000))
            .cast("long")
            .alias("cohort_week"),
        )
    )
    act = (
        ev.select("user_id", week.alias("week"))
        .join(su, "user_id")
        .filter(F.col("week") >= F.col("cohort_week"))
        .distinct()
    )
    return (
        act.groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias(
                "weeks_since_signup"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_week", "weeks_since_signup")
    )


# --- Exponentially weighted moving average per user (exact α = 0.5) ---------
@register(
    "ewma_user_value_events",
    sql="""
    WITH ordered AS (
        SELECT user_id,
               list(value ORDER BY ts, event_id) AS vals
        FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           round(list_reduce(CAST(vals AS DOUBLE[]),
                             (acc, x) -> 0.5 * x + 0.5 * acc), 6) AS ewma
    FROM ordered
    ORDER BY user_id
    """,
)
def ewma_user_value_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values (y₁ = x₁, yᵢ = α·xᵢ + (1−α)·yᵢ₋₁)
    — the sequential smoother behind rate limiting / anomaly baselines.
    α = 0.5 deliberately: every weight is a power of two, so the whole
    recursion is EXACT double arithmetic and any engine folding the
    same ordered list gets bit-identical results (a generic α would
    carry rounding at every step).  The fold is a Catalyst
    ``aggregate`` HOF over the per-user time-ordered value array —
    sequential per key but one expression, no Python; the oracle is
    DuckDB's ``list_reduce`` over the identically ordered list.

    Scale: one groupBy shuffle; per-user arrays are |events-per-user|
    — for genuinely unbounded keys switch to the
    ``applyInPandasWithState`` streaming form (same recursion,
    incremental)."""
    ev = Catalog(spark, sf_dir).table("events")
    ordered = (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        _epoch_us("ts").alias("us"),
                        F.col("event_id").alias("eid"),
                        F.col("value").alias("v"),
                    )
                )
            ).alias("rows")
        )
        .select(
            "user_id",
            F.transform(F.col("rows"), lambda r: r["v"]).alias("vals"),
        )
    )
    fold = F.aggregate(
        F.slice(
            F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0))
        ),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: F.lit(0.5) * x + F.lit(0.5) * acc,
    )
    return ordered.select(
        "user_id",
        F.size("vals").cast("long").alias("n_events"),
        F.round(fold, 6).alias("ewma"),
    ).orderBy("user_id")


# --- Rolling 7-day active users (sliding distinct count) --------------------
@register(
    "rolling_wau_events",
    sql="""
    WITH days AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
        FROM events),
    expanded AS (
        SELECT DISTINCT user_id, day + k AS window_day
        FROM days, unnest([0, 1, 2, 3, 4, 5, 6]) AS t(k)),
    bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM days)
    SELECT window_day, count(*) AS active_users
    FROM expanded CROSS JOIN bounds
    WHERE window_day BETWEEN bounds.lo AND bounds.hi
    GROUP BY window_day
    ORDER BY window_day
    """,
)
def rolling_wau_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (WAU) — the production
    engagement metric whose naive form is a per-day COUNT(DISTINCT)
    over a sliding range (re-scanning 7 days of events per output
    day).  Here each (user, active-day) pair is deduped once, then
    EXPANDED to the ≤7 window-days it contributes to — the sliding
    window becomes one distinct + one bounded aggregate, the same
    granule trick as ``sliding_windows_events``/``range_join``.
    Epoch-aligned integer days, truncated to days inside the observed
    range (leading/trailing partial windows at the edges are still
    emitted by both engines identically).

    Scale: the (user, day) distinct is the only user-cardinality
    shuffle; expansion is ×7 on the DEDUPED pairs, not raw events."""
    ev = Catalog(spark, sf_dir).table("events")
    days = ev.select(
        "user_id",
        F.floor(_epoch_us("ts") / F.lit(86400000000)).cast("long").alias(
            "day"
        ),
    ).distinct()
    expanded = (
        days.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + 6)
            ).alias("window_day"),
        )
        .distinct()
    )
    bounds = days.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    return (
        expanded.crossJoin(F.broadcast(bounds))
        .filter(F.col("window_day").between(F.col("lo"), F.col("hi")))
        .groupBy("window_day")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("window_day")
    )


# --- Frequent event-type trigram sequences ----------------------------------
@register(
    "event_trigram_sequences",
    sql="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type, 1) OVER w AS p1,
               lag(event_type, 2) OVER w AS p2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    tri AS (SELECT p2 AS step1, p1 AS step2, event_type AS step3
            FROM seq WHERE p2 IS NOT NULL),
    tot AS (SELECT count(*) AS n FROM tri)
    SELECT step1, step2, step3, count(*) AS n_occurrences
    FROM tri CROSS JOIN tot
    GROUP BY step1, step2, step3, tot.n
    HAVING count(*) >= tot.n * 0.005
    ORDER BY step1, step2, step3
    """,
)
def event_trigram_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-step behavioral sequences per user (consecutive
    event-type trigrams, deterministic tie order) — the sequence-mining
    companion to the first-order transition matrix: which PATHS, not
    just which hops, dominate.  Two lag windows over one per-user sort
    (Spark evaluates both in a single Window exec) + one ≤|types|³
    bounded aggregate with a RELATIVE min-support cut (0.5% of all
    trigrams — scale-invariant, non-empty at every SF)."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type", 2).over(w).alias("step1"),
        F.lag("event_type", 1).over(w).alias("step2"),
        F.col("event_type").alias("step3"),
    ).filter(F.col("step1").isNotNull())
    tot = seq.agg(F.count(F.lit(1)).alias("n"))
    return (
        seq.groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n_occurrences") >= F.col("n") * 0.005)
        .select("step1", "step2", "step3", "n_occurrences")
        .orderBy("step1", "step2", "step3")
    )


# --- Rolling z-score anomaly detection over hourly event volumes ------------
@register(
    "anomaly_zscore_events",
    sql="""
    WITH hourly AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
               count(*) AS cnt
        FROM events GROUP BY event_type, hour),
    win AS (
        SELECT event_type, hour, CAST(cnt AS BIGINT) AS cnt,
               count(*)        OVER w AS n,
               CAST(sum(cnt)   OVER w AS DOUBLE) AS s1,
               CAST(sum(cnt * cnt) OVER w AS DOUBLE) AS s2
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
    z AS (
        SELECT event_type, hour, cnt,
               CASE WHEN n = 24
                     AND (s2 - s1 * s1 / 24.0) / 23.0 > 0
                    THEN round((cnt - s1 / 24.0)
                               / sqrt((s2 - s1 * s1 / 24.0) / 23.0), 6)
                    END AS z_score
        FROM win)
    SELECT event_type, hour, cnt, z_score,
           CAST(CASE WHEN z_score IS NULL THEN NULL
                     ELSE abs(z_score) >= 3.0 END AS BOOLEAN) AS is_anomaly
    FROM z
    ORDER BY event_type, hour
    """,
)
def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: hourly event volume per
    type scored against the trailing 24 fully-observed hourly buckets
    (ROWS frame excludes the current row), |z| >= 3 flagged — the
    ops-monitoring staple for traffic spikes/drops.

    Floats: the window aggregates are exact integer sums (counts and
    squared counts); mean and variance derive from them via a FIXED
    shared expression order — (s2 - s1*s1/24)/23 — so both engines
    execute the identical double op sequence, and the gate tests the
    ROUNDED z (float-gate rule).  Warmup rows (fewer than 24 trailing
    buckets) and zero-variance windows emit NULL, not a guess.

    Scale: one shuffle to the hourly rollup (map-side combine does
    the heavy lifting — output is |types| x |hours|, tiny), then a
    per-type ordered window over the bucket series, never over raw
    events.  Hash-partitioned by event_type, so a 1000-executor run
    scores types independently; a skewed type costs only its own
    bucket count, which is time-bounded."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).table("events")
    hourly = (
        ev.select(
            "event_type",
            F.floor(_epoch_us("ts") / F.lit(3600000000))
            .cast("long")
            .alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-24, -1)
    )
    win = hourly.select(
        "event_type",
        "hour",
        F.col("cnt").cast("long").alias("cnt"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cnt").over(w).cast("double").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).cast("double").alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.lit(24.0)) / F.lit(
        23.0
    )
    z = F.when(
        (F.col("n") == 24) & (var > 0),
        F.round(
            (F.col("cnt") - F.col("s1") / F.lit(24.0)) / F.sqrt(var), 6
        ),
    )
    return (
        win.select("event_type", "hour", "cnt", z.alias("z_score"))
        .select(
            "*",
            F.when(
                F.col("z_score").isNotNull(),
                F.abs(F.col("z_score")) >= 3.0,
            )
            .cast("boolean")
            .alias("is_anomaly"),
        )
        .orderBy("event_type", "hour")
    )


# --- Multi-touch attribution ------------------------------------------------
@register(
    "attribution_touch_events",
    sql="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type, value,
               first_value(CASE WHEN event_type IN ('click', 'view')
                                THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS first_ch,
               last_value(CASE WHEN event_type IN ('click', 'view')
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS last_ch
        FROM events),
    attributed AS (
        SELECT 'first_touch' AS attribution_model, first_ch AS channel, value
        FROM seq WHERE event_type = 'purchase' AND first_ch IS NOT NULL
        UNION ALL
        SELECT 'last_touch' AS attribution_model, last_ch AS channel, value
        FROM seq WHERE event_type = 'purchase' AND last_ch IS NOT NULL)
    SELECT attribution_model, channel,
           count(*) AS n_purchases,
           CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE)
               AS attributed_revenue
    FROM attributed
    GROUP BY attribution_model, channel
    ORDER BY attribution_model, channel
    """,
)
def attribution_touch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch and last-touch purchase attribution: each purchase
    is credited to the first / most recent preceding touch event
    (click or view) in the same user's history, and revenue rolls up
    per (model, channel).

    Spark shape: ONE window pass per user computes both the first and
    the last preceding touch (``first``/``last`` with ``ignorenulls``
    over a rows-unbounded-preceding-to--1 frame, ordered by
    ``(ts, event_id)`` so same-timestamp ties are deterministic), and
    a ``stack`` unpivots the two models without re-evaluating the
    window — no self-join against the touch history, which is the
    naive attribution shape that explodes at scale.  The only shuffle
    is the user_id window partition plus the final 2x|channels|-row
    aggregate."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).table("events")
    touch = F.when(
        F.col("event_type").isin("click", "view"), F.col("event_type")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "event_type",
        "value",
        F.first(touch, ignorenulls=True).over(w).alias("first_ch"),
        F.last(touch, ignorenulls=True).over(w).alias("last_ch"),
    )
    attributed = (
        seq.filter(F.col("event_type") == "purchase")
        .selectExpr(
            "stack(2, 'first_touch', first_ch, 'last_touch', last_ch)"
            " AS (attribution_model, channel)",
            "value",
        )
        .filter(F.col("channel").isNotNull())
    )
    return (
        attributed.groupBy("attribution_model", "channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum(F.col("value"), 2).alias("attributed_revenue"),
        )
        .orderBy("attribution_model", "channel")
    )


# --- Forward as-of: click to NEXT purchase ------------------------------------
@register(
    "asof_click_to_next_purchase",
    sql="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    purchases AS (
        SELECT event_id, user_id, ts, value FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id, ts ORDER BY event_id) AS rn
            FROM events WHERE event_type = 'purchase')
        WHERE rn = 1)
    SELECT c.event_id AS click_id, c.user_id,
           CAST(epoch_us(c.ts) AS BIGINT) AS click_us,
           p.event_id AS purchase_id,
           CAST(epoch_us(p.ts) AS BIGINT) - CAST(epoch_us(c.ts) AS BIGINT)
               AS latency_us,
           round(p.value, 4) AS purchase_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
        ON c.user_id = p.user_id AND p.ts >= c.ts
    ORDER BY click_id
    """,
)
def asof_click_to_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click is paired with the same user's
    earliest purchase at or after the click — time-to-conversion per
    click, the mirror of ``asof_click_to_view``'s backward lookup.
    Purchases are deduped to one per (user, ts) (lowest event_id) for
    deterministic ties; the oracle is DuckDB's native forward ASOF
    (``p.ts >= c.ts`` matches the smallest following timestamp)."""
    from prod_recommendation_pyspark_spark.operators.events import (
        asof_join_forward,
    )
    from prod_recommendation_pyspark_spark.operators.relational import (
        dedup_first_by_key,
    )

    ev = Catalog(spark, sf_dir).table("events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = dedup_first_by_key(
        ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", "value"
        ),
        ["user_id", "ts"],
        order_by=[F.col("event_id")],
    )
    joined = asof_join_forward(
        clicks, purchases, "user_id", "ts", "ts", ["event_id", "ts", "value"]
    )
    return joined.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        _epoch_us("ts").alias("click_us"),
        F.col("asof_event_id").alias("purchase_id"),
        (_epoch_us("asof_ts") - _epoch_us("ts")).alias("latency_us"),
        F.round("asof_value", 4).alias("purchase_value"),
    ).orderBy("click_id")


# --- Distribution drift: population stability index -------------------------
@register(
    "psi_drift_events",
    sql="""
    WITH b AS (SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2
                           AS BIGINT) AS mid
               FROM events),
    cnt AS (SELECT event_type,
                   count(*) FILTER (WHERE epoch_us(ts) <= b.mid) AS c0,
                   count(*) FILTER (WHERE epoch_us(ts) >  b.mid) AS c1
            FROM events CROSS JOIN b GROUP BY event_type),
    tot AS (SELECT sum(c0) AS n0, sum(c1) AS n1, count(*) AS k FROM cnt),
    sh AS (SELECT event_type, c0, c1,
                  (c0 + 1.0) / (tot.n0 + tot.k) AS p0,
                  (c1 + 1.0) / (tot.n1 + tot.k) AS p1
           FROM cnt CROSS JOIN tot)
    SELECT event_type,
           CAST(c0 AS BIGINT) AS n_before,
           CAST(c1 AS BIGINT) AS n_after,
           round(p0, 6) AS share_before,
           round(p1, 6) AS share_after,
           round(round((p1 - p0) * ln(p1 / p0), 12), 6) AS psi_term,
           round(CAST(sum(CAST(round((p1 - p0) * ln(p1 / p0), 12)
                               AS DECIMAL(38,12))) OVER ()
                      AS DOUBLE), 6) AS psi_total
    FROM sh
    ORDER BY event_type
    """,
)
def psi_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event-type mix, earlier half
    of the time range vs later half — the standard drift monitor a
    production feature pipeline runs per ingest batch (PSI < 0.1
    stable, 0.1-0.25 moderate shift, > 0.25 investigate).  Split point
    is the integer midpoint of the observed epoch-microsecond range
    (exact in both engines); shares are Laplace-smoothed
    ``(c+1)/(n+k)`` so an event type absent from one half contributes
    a finite term instead of ±∞.  Per-type PSI terms are quantized to
    12 digits before the DECIMAL window-sum (order-independent total;
    residual = the 1-ULP ``ln`` class, as every entropy/KL query
    here).

    Scale shape: one scalar min/max agg (broadcast), one grouped
    count on the bounded event_type key, and a k-row window — the
    data passes exactly twice regardless of corpus size, nothing
    driver-side."""
    ev = Catalog(spark, sf_dir).table("events")
    us = _epoch_us("ts")
    b = ev.agg(
        F.floor((F.min(us) + F.max(us)) / 2).cast("long").alias("mid")
    )
    cnt = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("event_type")
        .agg(
            F.count(F.when(us <= F.col("mid"), 1)).alias("c0"),
            F.count(F.when(us > F.col("mid"), 1)).alias("c1"),
        )
    )
    tot = cnt.agg(
        F.sum("c0").alias("n0"),
        F.sum("c1").alias("n1"),
        F.count(F.lit(1)).alias("k"),
    )
    sh = cnt.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "c0",
        "c1",
        ((F.col("c0") + 1.0) / (F.col("n0") + F.col("k"))).alias("p0"),
        ((F.col("c1") + 1.0) / (F.col("n1") + F.col("k"))).alias("p1"),
    )
    term = F.round(
        (F.col("p1") - F.col("p0")) * F.log(F.col("p1") / F.col("p0")), 12
    )
    from pyspark.sql import Window

    return sh.select(
        "event_type",
        F.col("c0").alias("n_before"),
        F.col("c1").alias("n_after"),
        F.round("p0", 6).alias("share_before"),
        F.round("p1", 6).alias("share_after"),
        F.round(term, 6).alias("psi_term"),
        F.round(
            F.sum(term.cast("decimal(38,12)"))
            .over(Window.partitionBy())
            .cast("double"),
            6,
        ).alias("psi_total"),
    ).orderBy("event_type")


# --- Temporal split with embargo gap -----------------------------------------
@register(
    "temporal_split_events",
    sql="""
    WITH d AS (SELECT user_id,
                      CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
               FROM events),
    c AS (SELECT CAST(floor(quantile_cont(day, 0.7)) AS BIGINT) AS cut
          FROM d),
    s AS (SELECT user_id, day,
                 CASE WHEN day <= cut THEN 'train'
                      WHEN day <= cut + 3 THEN 'embargo'
                      ELSE 'test' END AS split
          FROM d CROSS JOIN c)
    SELECT split, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(min(day) AS BIGINT) AS min_day,
           CAST(max(day) AS BIGINT) AS max_day
    FROM s
    GROUP BY split
    ORDER BY split
    """,
)
def temporal_split_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series split with an embargo gap
    (operators/events.py::temporal_split): train ≤ the exact 70%
    day-quantile, 3 embargo days excluded from both sides, test
    after — the leakage guard for autocorrelated event features
    (the temporal analog of the cluster-aware
    `leakage_safe_split_documents`).  The rollup pins each split's
    row/user volume AND its day bounds, so the hash proves the gap:
    min_day(test) − max_day(train) > 3.  One aggregate pass for the
    cut, broadcast, row-local CASE — the fact table never shuffles
    for the assignment."""
    from prod_recommendation_pyspark_spark.operators.events import (
        temporal_split,
    )

    ev = Catalog(spark, sf_dir).table("events")
    s = temporal_split(ev, "ts", train_frac=0.7, gap_days=3)
    day = F.floor(_epoch_us("ts") / F.lit(86_400_000_000)).cast("long")
    return (
        s.withColumn("day", day)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("day").alias("min_day"),
            F.max("day").alias("max_day"),
        )
        .orderBy("split")
    )


# --- A/B test: two-proportion z-test ------------------------------------------
@register(
    "ab_test_conversion_events",
    sql="""
    WITH assign AS (
        SELECT DISTINCT user_id,
               CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
        FROM events),
    conv AS (SELECT user_id FROM events
             WHERE event_type = 'purchase'
             GROUP BY user_id HAVING count(*) >= 14),
    g AS (SELECT arm,
                 CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(CASE WHEN conv.user_id IS NOT NULL
                               THEN 1 ELSE 0 END) AS DOUBLE) AS x
          FROM assign LEFT JOIN conv USING (user_id)
          GROUP BY arm),
    w AS (SELECT
              max(CASE WHEN arm = 'A' THEN n END) AS na,
              max(CASE WHEN arm = 'A' THEN x END) AS xa,
              max(CASE WHEN arm = 'B' THEN n END) AS nb,
              max(CASE WHEN arm = 'B' THEN x END) AS xb
          FROM g)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(xa AS BIGINT) AS conv_a,
           CAST(nb AS BIGINT) AS n_b, CAST(xb AS BIGINT) AS conv_b,
           round(xa / na, 6) AS rate_a,
           round(xb / nb, 6) AS rate_b,
           round((xa / na - xb / nb)
                 / sqrt((xa + xb) / (na + nb)
                        * (1 - (xa + xb) / (na + nb))
                        * (1 / na + 1 / nb)), 4) AS z_stat
    FROM w
    """,
)
def ab_test_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B conversion analysis — the two-proportion pooled z-test an
    experimentation platform computes per metric: deterministic arm
    assignment (user_id parity — in production, `rendezvous_shard` or
    `modulo_split`), per-user conversion = a repeat buyer (≥14
    purchase events — the synthetic corpus has every user purchasing
    at least once, which would make the pooled rate 1 and the z
    denominator 0), then
    z = (p̂_a − p̂_b)/√(p̂(1−p̂)(1/n_a+1/n_b)) from exact integer
    counts (every division/sqrt is a fixed single-op chain of exact
    inputs — engine-identical).

    Scale: one distinct per table (users, converters), one keyed
    left join, a 2-row rollup pivoted by conditional max — the
    events table shuffles twice, both map-side combined."""
    ev = Catalog(spark, sf_dir).table("events")
    assign = ev.select("user_id").distinct().select(
        "user_id",
        F.when(F.col("user_id") % 2 == 0, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("arm"),
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("__np"))
        .filter(F.col("__np") >= 14)
        .select("user_id", F.lit(1).alias("__c"))
    )
    g = (
        assign.join(conv, "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.coalesce("__c", F.lit(0))).cast("double").alias("x"),
        )
    )
    w = g.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("x"))).alias("xa"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("x"))).alias("xb"),
    )
    na, xa, nb, xb = F.col("na"), F.col("xa"), F.col("nb"), F.col("xb")
    pooled = (xa + xb) / (na + nb)
    return w.select(
        na.cast("long").alias("n_a"),
        xa.cast("long").alias("conv_a"),
        nb.cast("long").alias("n_b"),
        xb.cast("long").alias("conv_b"),
        F.round(xa / na, 6).alias("rate_a"),
        F.round(xb / nb, 6).alias("rate_b"),
        F.round(
            (xa / na - xb / nb)
            / F.sqrt(pooled * (1 - pooled) * (1 / na + 1 / nb)),
            4,
        ).alias("z_stat"),
    )


# --- Gap-fill / LOCF resample --------------------------------------------------
@register(
    "gap_fill_locf_user_values",
    sql="""
    WITH d0 AS (
        SELECT user_id, CAST(ts AS DATE) AS day, value,
               row_number() OVER (
                   PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE user_id < 20),
    daily AS (SELECT user_id, day, value FROM d0 WHERE rn = 1),
    b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
    days AS (
        SELECT CAST(unnest(generate_series(
                   (SELECT d0 FROM b), (SELECT d1 FROM b),
                   INTERVAL 1 DAY)) AS DATE) AS day),
    spine AS (
        SELECT k.user_id, days.day
        FROM (SELECT DISTINCT user_id FROM daily) k CROSS JOIN days),
    j AS (
        SELECT s.user_id, s.day, d.value,
               d.value IS NOT NULL AS is_observed
        FROM spine s LEFT JOIN daily d USING (user_id, day))
    SELECT user_id, day,
           last_value(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           is_observed
    FROM j
    ORDER BY user_id, day
    """,
)
def gap_fill_locf_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-user series resampled onto the complete day spine
    with forward fill (operators/events.py::gap_fill_locf) — the
    time-series normalizer: a user's missing day carries the last
    observed value, marked ``is_observed=false``.  The per-day
    observation is the day's LAST event value ((ts, event_id)-argmax,
    deterministic); day boundaries via ``utc_day`` so any session
    timezone yields the oracle's naive CAST(ts AS DATE).

    Scale: one (user, day) rollup shuffle; the spine derives from a
    2-value broadcast aggregate × the input's own distinct keys (its
    size IS the output size); one running-window shuffle per key for
    the fill."""
    from prod_recommendation_pyspark_spark.operators.events import (
        gap_fill_locf,
    )

    ev = Catalog(spark, sf_dir).table("events").filter(F.col("user_id") < 20)
    daily = (
        ev.withColumn("day", utc_day("ts"))
        .groupBy("user_id", "day")
        .agg(
            F.max(F.struct("ts", "event_id", "value"))["value"].alias("value")
        )
    )
    return gap_fill_locf(daily, "user_id", "day", "value").orderBy(
        "user_id", "day"
    )


# --- Sequential next-event training examples ------------------------------------
@register(
    "next_event_training_examples",
    sql="""
    WITH ordered AS (
        SELECT user_id, event_id, event_type,
               array_to_string(
                   list(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING),
                   ',') AS context,
               count(*) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS ctx_len
        FROM events WHERE user_id < 10)
    SELECT user_id, event_id, context, event_type AS label
    FROM ordered WHERE ctx_len = 3
    ORDER BY user_id, event_id
    """,
)
def next_event_training_examples(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sequential-model training examples from the event log: for each
    event with ≥3 predecessors, (context = the previous 3 event types
    in time order, label = the current type) — the next-item /
    session-based-recommendation dataset builder (GRU4Rec/SASRec data
    prep).  Context windows come from a frame-bounded collect_list
    over the (ts, event_id)-deterministic per-user order, serialized
    to a comma-joined string (scalar cells for the driver hash); the
    oracle's windowed list() replays the same frames.

    Scale: ONE shuffle on user_id; the frame bound (3 preceding) caps
    per-row state regardless of user history length — no per-user
    collect, no self-join of the log."""
    ev = Catalog(spark, sf_dir).table("events").filter(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, -1)
    )
    ordered = ev.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("label"),
        F.array_join(F.collect_list("event_type").over(w), ",").alias(
            "context"
        ),
        F.count(F.lit(1)).over(w).alias("__ctx_len"),
    )
    return (
        ordered.filter(F.col("__ctx_len") == 3)
        .select("user_id", "event_id", "context", "label")
        .orderBy("user_id", "event_id")
    )
