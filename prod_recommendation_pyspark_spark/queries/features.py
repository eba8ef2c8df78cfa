"""Feature-engineering query surface (SURVEY.md §2.11 M1-M8) —
native-expression equivalents of the reference's MLlib pipeline, each
with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.features.encode import (
    bucketize,
    one_hot,
    string_index,
    assemble_features,
)
from prod_recommendation_pyspark_spark.features.impute import impute_median
from prod_recommendation_pyspark_spark.features.scaling import (
    log10_floor,
    min_max_scale,
    standard_scale,
)
from prod_recommendation_pyspark_spark.queries.registry import register
from prod_recommendation_pyspark_spark.sources.catalog import Catalog

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRICE_SPLITS = [0.0, 50_000.0, 100_000.0, 200_000.0, 300_000.0, 1_000_000.0]


@register(
    "minmax_scale_acctbal",
    sql="""
    SELECT c_custkey,
           c_mktsegment AS segment,
           round(CASE WHEN mx = mn THEN 0.0
                      ELSE (c_acctbal - mn) / (mx - mn) END, 6) AS acctbal_scaled
    FROM (SELECT c_custkey, c_mktsegment, c_acctbal,
                 min(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mn,
                 max(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mx
          FROM customer)
    ORDER BY c_custkey
    """,
)
def minmax_scale_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 — min-max scaling (search_ranking_peers.py:418-441,
    inference_postprocess.py:52-67 with the B18 fix): no
    VectorAssembler/MinMaxScaler fit per column, just windowed
    min/max + one projection."""
    cust = Catalog(spark, sf_dir).table("customer")
    return (
        min_max_scale(cust, ["c_acctbal"], partition_by=["c_mktsegment"])
        .select(
            "c_custkey",
            F.col("c_mktsegment").alias("segment"),
            F.round("c_acctbal_scaled", 6).alias("acctbal_scaled"),
        )
        .orderBy("c_custkey")
    )


@register(
    "zscore_price_by_status",
    sql="""
    WITH st AS (
        SELECT o_orderstatus,
               CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS s1,
               CAST(sum(CAST(o_totalprice * o_totalprice AS DECIMAL(38,6)))
                    AS DOUBLE) AS s2,
               count(o_totalprice) AS n
        FROM orders GROUP BY o_orderstatus)
    SELECT o_orderkey,
           round(CASE WHEN n < 2 OR sd IS NULL OR sd = 0 THEN 0.0
                      ELSE (o_totalprice - mu) / sd END, 6) AS price_z
    FROM (SELECT o.o_orderkey, o.o_totalprice, st.n,
                 s1 / n AS mu,
                 sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0.0)) AS sd
          FROM orders o JOIN st USING (o_orderstatus))
    ORDER BY o_orderkey
    """,
)
def zscore_price_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard scaling — engine-completeness sibling of M6."""
    orders = Catalog(spark, sf_dir).table("orders")
    return (
        standard_scale(
            orders,
            ["o_totalprice"],
            partition_by=["o_orderstatus"],
            exact_decimal=True,  # money-scale column; oracle-deterministic
        )
        .select(
            "o_orderkey", F.round("o_totalprice_z", 6).alias("price_z")
        )
        .orderBy("o_orderkey")
    )


@register(
    "log_floor_acctbal",
    sql="""
    SELECT c_custkey,
           round(log10(CASE WHEN c_acctbal IS NULL OR c_acctbal <= 0
                            THEN 1.0 ELSE c_acctbal END), 6) AS log_bal
    FROM customer
    ORDER BY c_custkey
    """,
)
def log_floor_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 — log10 with nonpositive/null floor
    (search_ranking_peers.py:419-422, defect-free form of P7)."""
    cust = Catalog(spark, sf_dir).table("customer")
    return (
        log10_floor(cust, "c_acctbal", "log_bal")
        .select("c_custkey", F.round("log_bal", 6).alias("log_bal"))
        .orderBy("c_custkey")
    )


@register(
    "median_impute_acctbal",
    sql="""
    WITH masked AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_acctbal END AS bal
        FROM customer),
    med AS (SELECT median(bal) AS m FROM masked)
    SELECT c_custkey, round(coalesce(bal, m), 2) AS bal_imputed
    FROM masked, med
    ORDER BY c_custkey
    """,
)
def median_impute_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 — median imputation (search_ranking_peers.py:351-358, B9
    fixed).  Nulls injected deterministically (every 10th key) so the
    operator has something to fill; exact ``percentile`` medians for
    oracle parity (``exact=False`` → approx sketch at 100 TB)."""
    cust = Catalog(spark, sf_dir).table("customer")
    masked = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 10 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    return (
        impute_median(masked, ["bal"], exact=True)
        .select("c_custkey", F.round("bal", 2).alias("bal_imputed"))
        .orderBy("c_custkey")
    )


@register(
    "bucketize_totalprice",
    sql="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000.0 AND o_totalprice <= 1000000.0 THEN 4.0
                WHEN o_totalprice >= 0.0      AND o_totalprice < 50000.0  THEN 0.0
                WHEN o_totalprice >= 50000.0  AND o_totalprice < 100000.0 THEN 1.0
                WHEN o_totalprice >= 100000.0 AND o_totalprice < 200000.0 THEN 2.0
                WHEN o_totalprice >= 200000.0 AND o_totalprice < 300000.0 THEN 3.0
           END AS price_bucket,
           count(*) OVER (PARTITION BY CASE
                WHEN o_totalprice >= 300000.0 AND o_totalprice <= 1000000.0 THEN 4.0
                WHEN o_totalprice >= 0.0      AND o_totalprice < 50000.0  THEN 0.0
                WHEN o_totalprice >= 50000.0  AND o_totalprice < 100000.0 THEN 1.0
                WHEN o_totalprice >= 100000.0 AND o_totalprice < 200000.0 THEN 2.0
                WHEN o_totalprice >= 200000.0 AND o_totalprice < 300000.0 THEN 3.0 END)
                AS bucket_size
    FROM orders
    ORDER BY o_orderkey
    """,
)
def bucketize_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 — Bucketizer semantics on explicit splits
    (search_ranking_peers.py:372-392 builds linspace splits; explicit
    splits skip the per-column max() collect A5)."""
    orders = Catalog(spark, sf_dir).table("orders")
    from pyspark.sql import Window

    bucketed = bucketize(orders, "o_totalprice", PRICE_SPLITS, out_col="price_bucket")
    return (
        bucketed.withColumn(
            "bucket_size",
            F.count(F.lit(1)).over(Window.partitionBy("price_bucket")),
        )
        .select("o_orderkey", "price_bucket", "bucket_size")
        .orderBy("o_orderkey")
    )


@register(
    "string_index_mktsegment",
    sql="""
    WITH labels AS (SELECT c_mktsegment, count(*) AS cnt FROM customer
                    WHERE c_mktsegment IS NOT NULL GROUP BY c_mktsegment),
         idx AS (SELECT c_mktsegment,
                        CAST(row_number() OVER (ORDER BY cnt DESC, c_mktsegment) - 1
                             AS DOUBLE) AS seg_idx
                 FROM labels)
    SELECT c.c_custkey, c.c_mktsegment AS segment, i.seg_idx
    FROM customer c JOIN idx i ON c.c_mktsegment = i.c_mktsegment
    ORDER BY c.c_custkey
    """,
)
def string_index_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 — StringIndexer frequencyDesc semantics
    (search_ranking_peers.py:360-370, B10 fixed) without a fit: the
    label→index map is a grouped count + rank, broadcast back."""
    cust = Catalog(spark, sf_dir).table("customer")
    return (
        string_index(cust, "c_mktsegment", out_col="seg_idx")
        .select("c_custkey", F.col("c_mktsegment").alias("segment"), "seg_idx")
        .orderBy("c_custkey")
    )


@register(
    "one_hot_segment_weighted",
    sql="""
    SELECT c_custkey,
           round(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1.0 ELSE 0.0 END * CAST(0.05 AS DOUBLE), 6) AS seg_AUTOMOBILE,
           round(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1.0 ELSE 0.0 END * CAST(0.05 AS DOUBLE), 6) AS seg_BUILDING,
           round(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1.0 ELSE 0.0 END * CAST(0.05 AS DOUBLE), 6) AS seg_FURNITURE,
           round(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1.0 ELSE 0.0 END * CAST(0.05 AS DOUBLE), 6) AS seg_HOUSEHOLD,
           round(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1.0 ELSE 0.0 END * CAST(0.05 AS DOUBLE), 6) AS seg_MACHINERY
    FROM customer
    ORDER BY c_custkey
    """,
)
def one_hot_segment_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4+M5 — one-hot with the reference's post-OHE weight multiply
    (w_jpmc=0.05, search_ranking_peers.py:404-416,608-611) fused into
    the encoding; no sparse vector, no densify UDF (D2)."""
    cust = Catalog(spark, sf_dir).table("customer")
    enc = one_hot(cust, "c_mktsegment", SEGMENTS, prefix="seg", weight=0.05)
    return enc.select(
        "c_custkey",
        *[F.round(f"seg_{v}", 6).alias(f"seg_{v}") for v in SEGMENTS],
    ).orderBy("c_custkey")


@register(
    "assemble_weighted_features",
    sql="""
    WITH scaled AS (
      SELECT c_custkey,
             CASE WHEN mx = mn THEN 0.0 ELSE (c_acctbal - mn) / (mx - mn) END AS bal_s,
             log10(CASE WHEN c_acctbal IS NULL OR c_acctbal <= 0 THEN 1.0
                        ELSE c_acctbal END) AS log_bal
      FROM (SELECT c_custkey, c_acctbal,
                   min(c_acctbal) OVER () AS mn, max(c_acctbal) OVER () AS mx
            FROM customer))
    SELECT c_custkey,
           round(coalesce(bal_s, 0.0) * 0.8, 6)   AS f0,
           round(coalesce(log_bal, 0.0) * 0.2, 6) AS f1
    FROM scaled
    ORDER BY c_custkey
    """,
)
def assemble_weighted_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 — weighted feature assembly into a native array<double>
    (VectorAssembler + per-feature weight multiplies,
    search_ranking_peers.py:442-455), the input contract of the
    similarity engine (§2.10).

    The array is built and then unpacked to scalar ``f0``/``f1`` output
    columns: the driver's pandas canonicalizer cannot hash Python
    lists (the round-1 red row), and element-wise scalars are the
    stronger check anyway — the assembly order is part of the value."""
    cust = Catalog(spark, sf_dir).table("customer")
    scaled = min_max_scale(cust, ["c_acctbal"], suffix="_s")
    scaled = log10_floor(scaled, "c_acctbal", "log_bal")
    assembled = assemble_features(
        scaled.select(
            "c_custkey",
            F.col("c_acctbal_s").alias("bal_s"),
            "log_bal",
        ),
        ["bal_s", "log_bal"],
        weights={"bal_s": 0.8, "log_bal": 0.2},
    )
    return assembled.select(
        "c_custkey",
        F.round(F.col("features")[0], 6).alias("f0"),
        F.round(F.col("features")[1], 6).alias("f1"),
    ).orderBy("c_custkey")
