"""End-to-end three-stage pipeline queries (SURVEY.md §3; the full
reference composition search_ranking_peers.py:457-571 →
recommender_prod_rec.py:58-269 → inference_postprocess.py:69-122).

One registered query per Stage-3 output table, each executing ALL
three stages through ``plans/pipeline.py``:

1. ``run_peer_search`` — firmographics (derived deterministically from
   ``customer``) → RST/international filters → dedup by cid → median
   impute → log-floor revenue → min-max scale → weighted vector →
   L2-normalize → blocked hybrid top-15 (cos+NAICS-hops+haversine) →
   attribute join-back;
2. ``run_prod_rec(freeze_ratings=True)`` — usage rows keyed by eci →
   cid remap → percent-rank normalization → accumulated volume.  The
   ratings hop is FROZEN (no ALS fit) so the whole composition is a
   pure function of the inputs and DuckDB-oracle-able; the ALS hop is
   covered by ``als_recommend_topn_contract`` / its property tests;
3. ``run_postprocess`` — peers ⨝ products → confidence / penetration
   top-20 per prospect.

The oracle SQL transliterates every stage; float-blind spots are
closed the same way as the per-stage queries (identical literals, a
custkey pair id so top-K tie-breaks are engine-independent, round(4)
on emitted scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.plans.pipeline import (
    PeerSearchConfig,
    PostprocessConfig,
    run_peer_search,
    run_postprocess,
    run_prod_rec,
)
from prod_recommendation_pyspark_spark.queries.registry import register
from prod_recommendation_pyspark_spark.queries.similarity import (
    _HAVS_SQL,
    _HOPS_SQL,
)
from prod_recommendation_pyspark_spark.sources.catalog import Catalog

# identical IEEE754 value on both sides: (1.0-0.8-0.05)/3
W_NUM = (1.0 - 0.8 - 0.05) / 3.0


def _firmo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic firmographics derivation from ``customer``
    (FIXTURES.md B1 shape): sentinel RST rows, international rows,
    duplicate cids, nulls in employees/lat — every Stage-1 filter and
    repair path is exercised."""
    cust = Catalog(spark, sf_dir).table("customer")
    k = F.col("c_custkey")
    return cust.select(
        k.alias("custkey"),
        F.concat(F.lit("E"), F.lpad(k.cast("string"), 7, "0")).alias("eci"),
        F.concat(
            F.lit("C"), F.lpad((k % 1400).cast("string"), 5, "0")
        ).alias("cid"),
        F.when(k % 97 == 0, F.lit("RST"))
        .otherwise(F.concat(F.lit("Co"), k.cast("string")))
        .alias("coname"),
        F.col("c_acctbal").cast("double").alias("annual_revenue"),
        ((k % 40) + F.lit(1.0)).alias("company_age"),
        F.when(k % 13 == 0, F.lit(None).cast("double"))
        .otherwise((k % 5000).cast("double"))
        .alias("employees"),
        (k % 3 == 0).cast("int").alias("public_flag"),
        (k % 89 == 0).cast("int").alias("international"),
        F.concat(
            F.lit("52"), F.lpad((k % 1000).cast("string"), 4, "0")
        ).alias("L6"),
        F.when(k % 17 == 0, F.lit(None).cast("double"))
        .otherwise(((k % 120) - 60 + F.lit(0.25)))
        .alias("lat"),
        (((k * 7) % 300) - 150 + F.lit(0.25)).alias("lon"),
    )


def _pipeline_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Run stages 1+2; return (confidence, penetration) from stage 3."""
    firmo = _firmo(spark, sf_dir)
    prospects = firmo.filter(F.col("custkey") % 10 == 0)
    clients = firmo.filter(F.col("custkey") % 10 != 0)
    cfg = PeerSearchConfig(id_col="custkey")
    peers_full = run_peer_search(spark, prospects, clients, cfg)
    peers = peers_full.select(
        F.col("tgt_eci").alias("prospect"),
        F.col("src_cid").alias("coname"),
        "score",
    )
    cat = Catalog(spark, sf_dir)
    pup = (
        cat.table("lineitem")
        .join(cat.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(cat.table("part")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.concat(
                F.lit("E"), F.lpad(F.col("o_custkey").cast("string"), 7, "0")
            ).alias("eci"),
            F.col("p_brand").alias("sku"),
            F.col("l_quantity").cast("double").alias("primary_intensity_value"),
        )
    )
    eci_map = firmo.select("eci", "cid")
    prod = run_prod_rec(spark, pup, eci_map, freeze_ratings=True)
    return run_postprocess(
        spark, peers, prod, cfg=PostprocessConfig(round_confidence=4)
    )


_STAGES_SQL = f"""
    firmo AS (
        SELECT c_custkey AS custkey,
               'E' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') AS eci,
               'C' || lpad(CAST(c_custkey % 1400 AS VARCHAR), 5, '0') AS cid,
               CASE WHEN c_custkey % 97 = 0 THEN 'RST'
                    ELSE 'Co' || CAST(c_custkey AS VARCHAR) END AS coname,
               CAST(c_acctbal AS DOUBLE) AS annual_revenue,
               CAST((c_custkey % 40) + 1.0 AS DOUBLE) AS company_age,
               CASE WHEN c_custkey % 13 = 0 THEN NULL
                    ELSE CAST(c_custkey % 5000 AS DOUBLE) END AS employees,
               CAST(c_custkey % 3 = 0 AS INT) AS public_flag,
               CAST(c_custkey % 89 = 0 AS INT) AS international,
               '52' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 4, '0') AS naics,
               CASE WHEN c_custkey % 17 = 0 THEN NULL
                    ELSE CAST((c_custkey % 120) - 60 + 0.25 AS DOUBLE) END AS lat,
               CAST(((c_custkey * 7) % 300) - 150 + 0.25 AS DOUBLE) AS lon
        FROM customer),
    filt AS (
        SELECT *, CASE WHEN custkey % 10 = 0 THEN 't' ELSE 's' END AS side
        FROM firmo WHERE coname <> 'RST' AND international = 0),
    dedup AS (
        SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY cid
                                                    ORDER BY eci) AS rn
                       FROM filt)
        WHERE rn = 1),
    med AS (SELECT median(employees) AS m_emp, median(company_age) AS m_age,
                   median(lat) AS m_lat, median(lon) AS m_lon
            FROM dedup),
    imp AS (
        SELECT custkey, eci, cid, side, naics, public_flag,
               coalesce(employees, m_emp) AS employees,
               coalesce(company_age, m_age) AS company_age,
               coalesce(lat, m_lat) AS lat,
               coalesce(lon, m_lon) AS lon,
               log10(CASE WHEN annual_revenue IS NULL OR annual_revenue <= 0
                          THEN 1.0 ELSE annual_revenue END) AS rev_log
        FROM dedup, med),
    mm AS (SELECT min(rev_log) mn0, max(rev_log) mx0,
                  min(company_age) mn1, max(company_age) mx1,
                  min(employees) mn2, max(employees) mx2,
                  min(public_flag) mn3, max(public_flag) mx3
           FROM imp),
    feat AS (
        SELECT custkey, eci, cid, side, naics, lat, lon,
               CASE WHEN mx0 = mn0 THEN CAST(0.0 AS DOUBLE)
                    ELSE (rev_log - mn0) / (mx0 - mn0) END
               * CAST(0.8 AS DOUBLE) AS f0,
               CASE WHEN mx1 = mn1 THEN CAST(0.0 AS DOUBLE)
                    ELSE (company_age - mn1) / (mx1 - mn1) END
               * CAST({W_NUM!r} AS DOUBLE) AS f1,
               CASE WHEN mx2 = mn2 THEN CAST(0.0 AS DOUBLE)
                    ELSE (employees - mn2) / (mx2 - mn2) END
               * CAST({W_NUM!r} AS DOUBLE) AS f2,
               CASE WHEN mx3 = mn3 THEN CAST(0.0 AS DOUBLE)
                    ELSE (public_flag - mn3) / (mx3 - mn3) END
               * CAST({W_NUM!r} AS DOUBLE) AS f3
        FROM imp, mm),
    vecs AS (
        SELECT custkey, eci, cid, side, naics, lat, lon,
               CASE WHEN nrm = 0 THEN f0 ELSE f0 / nrm END AS v0,
               CASE WHEN nrm = 0 THEN f1 ELSE f1 / nrm END AS v1,
               CASE WHEN nrm = 0 THEN f2 ELSE f2 / nrm END AS v2,
               CASE WHEN nrm = 0 THEN f3 ELSE f3 / nrm END AS v3
        FROM (SELECT *, sqrt(f0*f0 + f1*f1 + f2*f2 + f3*f3) AS nrm
              FROM feat)),
    tv AS (SELECT * FROM vecs WHERE side = 't'),
    sv AS (SELECT * FROM vecs WHERE side = 's'),
    pairs AS (
        SELECT l.custkey AS tgt, r.custkey AS src,
               l.eci AS tgt_eci, r.cid AS src_cid,
               CAST(0.6 AS DOUBLE)
               * (l.v0*r.v0 + l.v1*r.v1 + l.v2*r.v2 + l.v3*r.v3)
               + CAST(0.399 AS DOUBLE) * ({_HOPS_SQL})
               + CAST(0.001 AS DOUBLE) * ({_HAVS_SQL}) AS score
        FROM tv l CROSS JOIN sv r),
    peers AS (
        SELECT tgt_eci AS prospect, src_cid AS coname, score
        FROM (SELECT *, row_number() OVER (PARTITION BY tgt
                        ORDER BY score DESC, src) AS prn
              FROM pairs WHERE score >= 0.0)
        WHERE prn <= 15),
    pup AS (
        SELECT 'E' || lpad(CAST(o.o_custkey AS VARCHAR), 7, '0') AS eci,
               p.p_brand AS sku, CAST(l.l_quantity AS DOUBLE) AS val
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey),
    remap AS (
        SELECT f.cid, u.sku, u.val
        FROM pup u LEFT JOIN firmo f ON u.eci = f.eci),
    rated AS (
        SELECT cid, sku,
               percent_rank() OVER (PARTITION BY cid, sku ORDER BY val)
               + 1e-06 AS rating
        FROM remap
        WHERE cid IS NOT NULL AND sku IS NOT NULL AND val IS NOT NULL),
    prod AS (
        SELECT cid AS coname, sku AS product, sum(rating) AS rating
        FROM rated GROUP BY cid, sku)
"""


@register(
    "pipeline_e2e_confidence",
    sql=f"""
    WITH {_STAGES_SQL},
    scored AS (
        SELECT pe.prospect, pr.product,
               CAST(pe.score * pr.rating / CAST(30.0 AS DOUBLE)
                    AS DECIMAL(38,12)) AS confidence
        FROM peers pe RIGHT JOIN prod pr ON pe.coname = pr.coname
        WHERE pe.prospect IS NOT NULL
          AND pr.rating IS NOT NULL AND pr.rating <> 0),
    summed AS (SELECT prospect, product,
                      sum(confidence) AS confidence
               FROM scored GROUP BY prospect, product)
    SELECT prospect, product,
           CAST(round(confidence, 4) AS DOUBLE) AS confidence, rnk
    FROM (SELECT *, rank() OVER (PARTITION BY prospect
                                 ORDER BY confidence DESC, product) AS rnk
          FROM summed)
    WHERE rnk <= 20
    ORDER BY prospect, rnk
    """,
)
def pipeline_e2e_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-stage composition, confidence output: Stage-1 hybrid peer
    search feeds Stage-3's peer fan-out; Stage-2's frozen ratings feed
    its product side.  The single CORRECTNESS row that proves the
    stages compose (round-4 verdict item 2).  Rank and round both
    operate on the exact DECIMAL confidence sum (decimal-space
    rounding — functions/exact.py)."""
    conf, _ = _pipeline_tables(spark, sf_dir)
    return conf.select(
        "prospect",
        "product",
        "confidence",
        "rnk",
    ).orderBy("prospect", "rnk")


@register(
    "pipeline_e2e_penetration",
    sql=f"""
    WITH {_STAGES_SQL},
    filtered AS (
        SELECT pe.prospect, pr.product, pr.rating
        FROM peers pe RIGHT JOIN prod pr ON pe.coname = pr.coname
        WHERE pe.prospect IS NOT NULL
          AND pr.rating IS NOT NULL AND pr.rating <> 0),
    counted AS (SELECT prospect, product,
                       count(rating) / CAST(30.0 AS DOUBLE) AS penetration
                FROM filtered GROUP BY prospect, product)
    SELECT prospect, product, round(penetration, 4) AS penetration, rnk
    FROM (SELECT *, rank() OVER (PARTITION BY prospect
                                 ORDER BY penetration DESC, product) AS rnk
          FROM counted)
    WHERE rnk <= 20
    ORDER BY prospect, rnk
    """,
)
def pipeline_e2e_penetration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-stage composition, penetration output (B16 desc fix)."""
    _, pen = _pipeline_tables(spark, sf_dir)
    return pen.select(
        "prospect",
        "product",
        F.round("penetration", 4).alias("penetration"),
        "rnk",
    ).orderBy("prospect", "rnk")
