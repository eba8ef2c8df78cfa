"""Stage-3 report tables (SURVEY.md §3.3; inference_postprocess.py).

``confidence``: how strongly a prospect's peer group uses a product,
weighted by peer similarity — ``sum(score · rating) / NUM_PEERS`` per
(prospect, product), top-K per prospect
(inference_postprocess.py:69-96).

``penetration``: what fraction of the peer group uses the product at
all — ``count(rating) / NUM_PEERS`` (:98-122).

Defect fixes baked in: B16 (penetration rank was ascending → bottom-K;
both tables rank DESC here), B17 (null-OR-nonzero filter kept nulls →
AND), B2 (the unparseable rank line).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.relational import windowed_topk

NUM_PEERS = 30  # inference_postprocess.py:164
TOPK_PRODUCTS = 20  # inference_postprocess.py:165


def _joined_peer_products(
    peers: DataFrame, products: DataFrame, peer_col: str
) -> DataFrame:
    """J8 — fan peers out to their products: right join on the peer
    company key (inference_postprocess.py:73-76).  At scale prefer a
    plain inner join unless unmatched products must survive; we keep
    the reference's right-join semantics."""
    return peers.join(products, on=peer_col, how="right")


def confidence_table(
    peers: DataFrame,
    products: DataFrame,
    prospect_col: str = "prospect",
    peer_col: str = "coname",
    product_col: str = "product",
    score_col: str = "score",
    rating_col: str = "rating",
    num_peers: int = NUM_PEERS,
    topk: int = TOPK_PRODUCTS,
    round_to: int | None = None,
) -> DataFrame:
    """Peer-similarity-weighted product confidence, top-K per prospect.

    Pipeline (inference_postprocess.py:69-96): right-join peers to
    products on the peer key → confidence = score·rating/num_peers →
    drop null prospects / sentinel rows → sum per (prospect, product)
    → windowed top-K desc.

    The sum stays DECIMAL through the ranking, and ``round_to`` (when
    given) rounds IN DECIMAL SPACE before the final double cast —
    rounding after the cast re-opens the engine-divergent boundary
    (Spark rounds the double's shortest decimal string, DuckDB its
    binary value; see functions/exact.py).  The returned ``confidence``
    column is double either way.
    """
    joined = _joined_peer_products(peers, products, peer_col)
    scored = (
        joined.withColumn(
            "confidence",
            # The per-row product is a deterministic double (row-local,
            # identical in any engine); the cast to DECIMAL(38,12)
            # makes the SUM exact and associative, so the aggregate is
            # bit-identical under ANY partitioning or engine.  Summing
            # raw doubles is order-dependent: at sf0.1 two (prospect,
            # product) sums drifted one ULP apart between Spark and
            # DuckDB and rounded to different 4-decimal values.
            (
                F.col(score_col) * F.col(rating_col) / F.lit(float(num_peers))
            ).cast("decimal(38,12)"),
        )
        .filter(F.col(prospect_col).isNotNull())
        .filter(F.col(rating_col).isNotNull() & (F.col(rating_col) != 0))  # B17: AND
    )
    summed = scored.groupBy(prospect_col, product_col).agg(
        # stays DECIMAL(38,12): exact ordering for the rank below, and
        # the optional round happens on the exact value
        F.sum("confidence").alias("confidence")
    )
    ranked = windowed_topk(
        summed,
        prospect_col,
        [F.col("confidence").desc(), F.col(product_col)],
        topk,
        rank_fn=F.rank,
        rank_col="rnk",
    )
    out = (
        F.round("confidence", round_to)
        if round_to is not None
        else F.col("confidence")
    )
    return ranked.withColumn("confidence", out.cast("double"))


def penetration_table(
    peers: DataFrame,
    products: DataFrame,
    prospect_col: str = "prospect",
    peer_col: str = "coname",
    product_col: str = "product",
    rating_col: str = "rating",
    num_peers: int = NUM_PEERS,
    topk: int = TOPK_PRODUCTS,
) -> DataFrame:
    """Peer-group product penetration, top-K per prospect
    (inference_postprocess.py:98-122 with B16's DESC fix)."""
    joined = _joined_peer_products(peers, products, peer_col)
    filtered = joined.filter(F.col(prospect_col).isNotNull()).filter(
        F.col(rating_col).isNotNull() & (F.col(rating_col) != 0)
    )
    counted = filtered.groupBy(prospect_col, product_col).agg(
        (F.count(rating_col) / F.lit(float(num_peers))).alias("penetration")
    )
    return windowed_topk(
        counted,
        prospect_col,
        [F.col("penetration").desc(), F.col(product_col)],
        topk,
        rank_fn=F.rank,
        rank_col="rnk",
    )
