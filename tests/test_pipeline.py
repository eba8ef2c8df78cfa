"""End-to-end test of the three recomposed pipeline stages on a
synthetic firmographics corpus (FIXTURES.md B1-B6 shapes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.plans.pipeline import (
    PeerSearchConfig,
    run_peer_search,
    run_postprocess,
    run_prod_rec,
)


@pytest.fixture(scope="module")
def firmo(spark):
    """~300 deterministic companies; includes RST rows, international
    rows, duplicate cids, nulls in employees/lat."""
    df = spark.range(300).select(
        F.concat(F.lit("E"), F.col("id")).alias("eci"),
        F.concat(F.lit("C"), (F.col("id") % 290)).alias("cid"),
        F.when(F.col("id") % 97 == 0, "RST")
        .otherwise(F.concat(F.lit("Co"), F.col("id")))
        .alias("coname"),
        (F.col("id") * 1000.0 % 9999999).alias("annual_revenue"),
        (F.col("id") % 2).cast("int").alias("ult"),
        (F.col("id") % 3 == 0).cast("int").alias("public_flag"),
        (F.col("id") % 40 + 1.0).alias("company_age"),
        F.concat(F.lit("52"), F.lpad((F.col("id") % 40).cast("string"), 4, "0")).alias("L6"),
        (F.col("id") % 11 == 0).cast("int").alias("international"),
        F.when(F.col("id") % 13 == 0, None).otherwise(F.col("id") % 5000).cast("double").alias("employees"),
        F.lit("CITY").alias("city"),
        F.lit("ST").alias("state"),
        F.when(F.col("id") % 17 == 0, None).otherwise((F.col("id") % 120) - 60.0).alias("lat"),
        ((F.col("id") * 3) % 340 - 170.0).alias("lon"),
        F.concat(F.lit("D"), (F.col("id") % 4)).alias("jpmc_division"),
        F.lit("K").alias("jpmc_class"),
    )
    return df.cache()


def test_peer_search_stage(spark, firmo):
    prospects = firmo.filter(F.xxhash64("eci") % 10 == 0)
    clients = firmo.subtract(prospects)
    cfg = PeerSearchConfig(topk=5, jpmc_divisions=("D0", "D1", "D2", "D3"))
    peers = run_peer_search(spark, prospects, clients, cfg).cache()
    assert peers.count() > 0
    # topk bound per prospect
    assert peers.groupBy("tgt_eci").count().agg(F.max("count")).first()[0] <= 5
    # filters applied: no RST, no international on either side
    assert peers.filter(F.col("tgt_coname") == "RST").count() == 0
    assert peers.filter(F.col("src_international") != 0).count() == 0
    # attribute pairs present (J1/J2 join-back)
    for c in ["tgt_coname", "src_coname", "tgt_L6", "src_L6", "score"]:
        assert c in peers.columns
    # scores bounded by the weight envelope
    mx = peers.agg(F.max("score")).first()[0]
    assert mx <= 1.0 + 1e-9


def test_prod_rec_and_postprocess_stages(spark, firmo):
    pup = spark.range(2000).select(
        F.concat(F.lit("E"), F.col("id") % 250).alias("eci"),
        F.concat(F.lit("SKU"), F.col("id") % 40).alias("sku"),
        (F.col("id") % 17 + 1.0).alias("primary_intensity_value"),
    )
    eci_map = firmo.select("eci", "cid")
    recs = run_prod_rec(spark, pup, eci_map)
    assert recs.count() > 0
    assert {"cid", "sku", "rating"} <= set(recs.columns)

    peers = spark.range(50).select(
        F.concat(F.lit("P"), F.col("id") % 10).alias("prospect"),
        F.concat(F.lit("C"), F.col("id") % 25).alias("coname"),
        (0.5 + (F.col("id") % 5) / 10.0).alias("score"),
    )
    prod = recs.select(
        F.col("cid").alias("coname"),
        F.col("sku").alias("product"),
        F.col("rating").cast("double").alias("rating"),
    )
    item_map = spark.range(40).select(
        F.concat(F.lit("SKU"), F.col("id")).alias("product"),
        F.concat(F.lit(" name "), F.col("id")).alias("pup_measure_name"),
    )
    conf, pen = run_postprocess(spark, peers, prod, item_map)
    assert {"prospect", "product", "confidence", "rnk"} <= set(conf.columns)
    assert {"prospect", "product", "penetration", "rnk"} <= set(pen.columns)
    assert conf.groupBy("prospect").count().agg(F.max("count")).first()[0] <= 20
    # rank 1 is the max confidence within each prospect (B16 desc fix)
    top = conf.filter(F.col("rnk") == 1).select("prospect", "confidence")
    mx = conf.groupBy("prospect").agg(F.max("confidence").alias("m"))
    joined = top.join(mx, "prospect").filter(F.col("confidence") != F.col("m"))
    assert joined.count() == 0


def test_hybrid_blocked_equals_single_block(spark):
    """Blocked hybrid kernel (MIN_BATCH parity) must equal the
    single-block result exactly."""
    from prod_recommendation_pyspark_spark.operators.hybrid import hybrid_topk
    from prod_recommendation_pyspark_spark.operators.similarity import l2_normalize

    base = spark.range(120).select(
        F.col("id").alias("key"),
        F.array(
            (F.col("id") % 7).cast("double") + 1.0,
            (F.col("id") % 11).cast("double") + 0.5,
        ).alias("raw"),
        F.concat(F.lit("52"), F.lpad((F.col("id") % 40).cast("string"), 4, "0")).alias(
            "naics"
        ),
        ((F.col("id") % 90) - 45).cast("double").alias("lat"),
        ((F.col("id") * 3 % 180) - 90).cast("double").alias("lon"),
    )
    normed = l2_normalize(base, "raw", "vec")
    prospects = normed.filter(F.col("key") % 10 == 0).select(
        F.col("key").alias("tgt"), "vec", "naics", "lat", "lon"
    )
    clients = normed.filter(F.col("key") % 10 != 0).select(
        F.col("key").alias("src"), "vec", "naics", "lat", "lon"
    )

    def pairs(nb):
        df = hybrid_topk(
            prospects, clients, "tgt", "src", k=15, threshold=0.0, n_blocks=nb
        )
        return {(r.tgt, r.src, round(r.score, 9)) for r in df.collect()}

    assert pairs(1) == pairs(3) and len(pairs(1)) > 0


def test_peer_search_n_blocks_forwarded_over_signed_ids(spark, firmo):
    """cfg.n_blocks must actually reach hybrid_topk (round-1 advisory:
    it was a silent no-op) AND blocked slicing must survive the
    pipeline's SIGNED xxhash64 ids (pmod, not %) — blocked and
    single-block peer sets must be identical."""
    prospects = firmo.filter(F.xxhash64("eci") % 10 == 0)
    clients = firmo.subtract(prospects)

    def peers(nb):
        cfg = PeerSearchConfig(topk=5, n_blocks=nb)
        df = run_peer_search(spark, prospects, clients, cfg)
        return {
            (r.tgt_eci, r.src_eci, round(r.score, 9))
            for r in df.select("tgt_eci", "src_eci", "score").collect()
        }

    one, three = peers(1), peers(3)
    assert one == three and len(one) > 0
