"""Stage-2 ratings preparation (SURVEY.md §2.11 M9 inputs; §3.2).

Reference: recommender_prod_rec.py — eci→cid remap (J4 :164-168),
percent-rank usage normalization (W1 :170-179), per-key volume rollup
(A2 :181-185), dense-id assignment for ALS (J5 :193-206 via
``rdd.zipWithIndex``, defects B14/B20).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.relational import dense_ids

PERCENT_RANK_EPS = 1e-6  # recommender_prod_rec.py:176


def key_remap(
    df: DataFrame, mapping: DataFrame, old_key: str, new_key: str
) -> DataFrame:
    """J4 — remap an entity key through a mapping table
    (recommender_prod_rec.py:164-168): left join, drop old, keep new.
    The mapping side is broadcast — it is a key dimension."""
    return df.join(F.broadcast(mapping.select(old_key, new_key)), old_key, "left").drop(
        old_key
    )


def percent_rank_ratings(
    df: DataFrame,
    user_col: str,
    item_col: str,
    value_col: str,
    out_col: str = "rating",
    eps: float = PERCENT_RANK_EPS,
) -> DataFrame:
    """W1 — per-(user,item) percentile normalization of usage
    intensity + epsilon (recommender_prod_rec.py:171-176), after
    dropping null keys (P11 :174).  Epsilon keeps implicit-ALS
    confidence strictly positive for observed interactions."""
    w = Window.partitionBy(user_col, item_col).orderBy(value_col)
    return (
        df.na.drop(subset=[user_col, item_col])
        .filter(F.col(value_col).isNotNull())
        .withColumn(out_col, F.percent_rank().over(w) + F.lit(eps))
    )


def accumulated_volume(
    df: DataFrame, user_col: str, item_col: str, value_col: str,
    out_col: str = "acc_volume",
) -> DataFrame:
    """A2 — total usage per (user, item)
    (recommender_prod_rec.py:181-185)."""
    return df.groupBy(user_col, item_col).agg(F.sum(value_col).alias(out_col))


def dense_id_ratings(
    ratings: DataFrame, user_col: str, item_col: str, rating_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """J5/B20 — deterministic dense ids for ALS (which requires int
    user/item): window-ranked distinct-key maps joined back, replacing
    the reference's two zipWithIndex jobs + B14's broken renames.

    Returns ``(als_input(userId,itemId,rating), user_map, item_map)``.
    The maps are *distinct keys* — small relative to the fact table —
    and broadcast back onto it.

    The two map derivations are independent eager sub-jobs (each runs
    a distinct + range partition + counts collect), so they run on
    CONCURRENT driver threads (round 16, guide §2.6) — on a cached or
    checkpointed ``ratings`` the second map's work was pure added
    wall; uncached, the two passes race over the same persisted
    blocks, which Spark's block-level locking computes once.  The ids
    themselves are unchanged (each map is a pure function of its own
    key column).
    """
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_u = pool.submit(dense_ids, ratings, user_col, "userId")
        fut_i = pool.submit(dense_ids, ratings, item_col, "itemId")
        user_map, item_map = fut_u.result(), fut_i.result()
    als_input = (
        ratings.join(F.broadcast(user_map), user_col)
        .join(F.broadcast(item_map), item_col)
        .select(
            F.col("userId"),
            F.col("itemId"),
            F.col(rating_col).cast("float").alias("rating"),
        )
    )
    return als_input, user_map, item_map


def negative_sample(
    positives: DataFrame,
    items: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 5,
    oversample: int = 3,
) -> DataFrame:
    """Deterministic NEGATIVE SAMPLING for implicit-feedback training
    (the BPR/word2vec data prep): for each user, draw ``k`` items the
    user has NOT interacted with, by hashing (user, trial) into the
    dense item index — reproducible in ANSI SQL, unlike ``rand()``
    draws, so the sampled training set itself sits under a value hash.

    Draw protocol: ``oversample·k`` trials per user; each trial t maps
    ``uniform_hash_long(user·131 + t) % n_items`` to an item; positives
    and duplicate draws are removed (duplicates keep their EARLIEST
    trial); the first ``k`` survivors by trial order are the user's
    negatives with ``neg_rank`` 1..k.  Users whose trials collide too
    often may yield < k rows — raise ``oversample`` for dense users.

    Scale: the item index is :func:`dense_ids` over the item DIM
    (range-partitioned, no global window); trials are a row-local
    projection (users × oversample·k rows); the positive check is one
    anti-join on (user, item).  Nothing touches the fact table after
    the distinct-positives pass."""
    from prod_recommendation_pyspark_spark.operators.relational import (
        windowed_topk,
    )
    from prod_recommendation_pyspark_spark.operators.text import (
        HASH_MOD,
        uniform_hash_long,
    )

    # persisted: pos feeds the user list, the anti-join, and (via the
    # caller's fact derivation) would otherwise re-run the usage join
    # per consumer; registry clearCache owns the lifetime
    pos = positives.select(user_col, item_col).distinct().persist()
    idx = dense_ids(items.select(item_col).distinct(), item_col, id_col="idx")
    n_items = idx.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    trials = (
        pos.select(user_col)
        .distinct()
        .select(
            user_col,
            F.explode(
                F.sequence(F.lit(0), F.lit(oversample * k - 1))
            ).alias("__t"),
        )
    )
    # user id reduced mod 2^32 BEFORE the multiply (mirroring
    # uniform_hash_long's overflow-safe split): the pre-hash product is
    # then bounded by ~2^39, so the int64 arithmetic can never wrap for
    # any 64-bit user key — and because uniform_hash_long reduces its
    # input mod 2^32 anyway, the reduction changes no draw where the
    # unreduced product fit in int64 (mod distributes over ·131 + t).
    draws = trials.crossJoin(F.broadcast(n_items)).select(
        user_col,
        "__t",
        F.pmod(
            uniform_hash_long(
                F.pmod(F.col(user_col).cast("long"), F.lit(HASH_MOD)) * 131
                + F.col("__t")
            ),
            F.col("__n"),
        ).alias("idx"),
    )
    cand = draws.join(idx, "idx").select(user_col, "__t", item_col)
    neg = cand.join(pos, [user_col, item_col], "left_anti")
    dedup = neg.groupBy(user_col, item_col).agg(F.min("__t").alias("__t"))
    return windowed_topk(
        dedup, user_col, [F.col("__t"), F.col(item_col)], k, rank_col="neg_rank"
    ).select(user_col, item_col, "neg_rank")
