"""ALS collaborative filtering (SURVEY.md §2.11 M9-M12).

Reference: recommender_prod_rec.py:212-269 — implicit-feedback ALS
(rank=15, maxIter=5, regParam=0.001, nonnegative, coldStartStrategy=
'drop', seed=0 at :216-227,244-246), RMSE holdout evaluation
(:234-241), nested-loop grid search (:243-259), and
``recommendForAllUsers`` postprocessing through Python UDFs
(D3 :59-71,261-269).

MLlib's ALS is already the Spark-native distributed implementation
(blocked alternating least squares); the engine wraps it and replaces
every UDF around it with native struct/array access.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.recommendation import ALS, ALSModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ALSConfig:
    rank: int = 15
    max_iter: int = 5
    reg_param: float = 0.001
    implicit_prefs: bool = True
    nonnegative: bool = True
    cold_start: str = "drop"
    seed: int = 0
    # ALS user/item block count; None = auto-size from the ratings
    # count (see train_als).  MLlib's default (= default parallelism)
    # drowns small-to-medium problems in per-block task overhead:
    # 600k ratings on local[32] fit 2.3x faster at 8 blocks than 32.
    num_blocks: int | None = None
    # target ratings per ALS block for auto-sizing; each block should
    # be big enough that the normal-equation solves dominate the
    # per-task fixed cost
    ratings_per_block: int = 75_000


def _blocks_for(n: int, par: int, cfg: ALSConfig) -> int:
    """The auto-sizing rule alone, as a pure function of the ratings
    count — kept separate so a caller that already KNOWS the count
    (e.g. from an overlapped prep job) derives the identical block
    count without the extra count job (round 16, guide §2.6)."""
    return max(2, min(par, n // cfg.ratings_per_block or 1))


def _auto_blocks(ratings: DataFrame, cfg: ALSConfig) -> int:
    """blocks = clamp(n_ratings / ratings_per_block, 2, parallelism) —
    at 100 TB the parallelism cap keeps blocks ≈ cores (the right
    answer on a big cluster); locally small inputs get few, fat blocks.
    ``ratings.count()`` is cheap here: callers cache the ALS input
    (it is iterated over max_iter times regardless)."""
    par = ratings.sparkSession.sparkContext.defaultParallelism
    n = ratings.count()
    return _blocks_for(n, par, cfg)


def train_als(
    ratings: DataFrame,
    cfg: ALSConfig | None = None,
    n_ratings: int | None = None,
) -> ALSModel:
    """M9 — train on (userId, itemId, rating).

    Scale: ALS shuffles by user/item blocks; ``numUserBlocks``/
    ``numItemBlocks`` auto-size via ``_auto_blocks`` (at 100 TB that
    resolves to ~cores — override with ``cfg.num_blocks``), and MLlib
    checkpoints internally via ``setCheckpointInterval`` to cut
    lineage.

    ``n_ratings``: the exact ``ratings.count()`` when the caller
    already has it (an overlapped prep job) — skips the auto-sizer's
    count job and derives the IDENTICAL block count via the same
    rule, so the fitted model is bit-identical either way."""
    cfg = cfg or ALSConfig()
    if cfg.num_blocks:
        blocks = cfg.num_blocks
    elif n_ratings is not None:
        par = ratings.sparkSession.sparkContext.defaultParallelism
        blocks = _blocks_for(n_ratings, par, cfg)
    else:
        blocks = _auto_blocks(ratings, cfg)
    als = ALS(
        rank=cfg.rank,
        maxIter=cfg.max_iter,
        regParam=cfg.reg_param,
        implicitPrefs=cfg.implicit_prefs,
        nonnegative=cfg.nonnegative,
        coldStartStrategy=cfg.cold_start,
        seed=cfg.seed,
        numUserBlocks=blocks,
        numItemBlocks=blocks,
        userCol="userId",
        itemCol="itemId",
        ratingCol="rating",
    )
    return als.fit(ratings)


def evaluate_rmse(model: ALSModel, test: DataFrame) -> float:
    """M10 — RMSE on a holdout (recommender_prod_rec.py:234-241)."""
    preds = model.transform(test)
    evaluator = RegressionEvaluator(
        metricName="rmse", labelCol="rating", predictionCol="prediction"
    )
    return float(evaluator.evaluate(preds))


def grid_search_all(
    ratings: DataFrame,
    ranks: list[int] = (10, 15),
    max_iters: list[int] = (5,),
    reg_params: list[float] = (0.001, 0.01),
    train_fraction: float = 0.8,
    seed: int = 0,
) -> list[tuple[ALSConfig, float]]:
    """M11 core — fit × evaluate every grid point on one explicit
    holdout split; returns [(config, rmse)] in grid order.  The split
    is cached once: each fit iterates the train side max_iter times."""
    train, test = ratings.randomSplit([train_fraction, 1 - train_fraction], seed=seed)
    train = train.cache()
    test = test.cache()
    results = []
    for r in ranks:
        for mi in max_iters:
            for rp in reg_params:
                cfg = ALSConfig(rank=r, max_iter=mi, reg_param=rp, seed=seed)
                results.append((cfg, evaluate_rmse(train_als(train, cfg), test)))
    return results


def grid_search(
    ratings: DataFrame,
    ranks: list[int] = (10, 15),
    max_iters: list[int] = (5,),
    reg_params: list[float] = (0.001, 0.01),
    train_fraction: float = 0.8,
    seed: int = 0,
) -> tuple[ALSConfig, float]:
    """M11 — the reference's nested-loop search
    (recommender_prod_rec.py:243-259) with an explicit holdout
    (B21: its randomSplit([1.0, 0.0]) trains on everything).
    Returns (best config, best RMSE)."""
    results = grid_search_all(
        ratings, ranks, max_iters, reg_params, train_fraction, seed
    )
    # skip NaN RMSEs (cold_start='drop' can empty the predictions on a
    # degenerate split) — min() would otherwise keep a leading NaN;
    # all-NaN/empty grid → (None, inf), the pre-refactor contract
    valid = [(cfg, rmse) for cfg, rmse in results if rmse == rmse]
    if not valid:
        return None, float("inf")
    return min(valid, key=lambda cr: cr[1])


def save_model(model: ALSModel, path: str) -> None:
    """Persist the trained factorization for a SEPARATE inference job —
    the operational form of the reference's Stage-2 → Stage-3 handoff
    (recommender_prod_rec.py:261-269 writes recommendation FILES that
    inference_postprocess.py:37-38 re-reads).  Persisting the model
    instead moves the smaller artifact — the user/item factor matrices,
    rank·(n_users+n_items) floats as parquet part-files plus one small
    JSON metadata file — and lets the inference side pick its own top-N
    and join targets.

    Scale: ``ALSModel.write`` writes the factor frames distributed
    (no driver collect); overwrite semantics make RE-TRAINING
    idempotent against a fixed artifact path.  Caveat (standard Spark
    lazy-source rule): a model obtained from :func:`load_model` is
    backed by the parquet files at its load path — re-saving it OVER
    that same path deletes its own input mid-write; save a loaded
    model to a fresh path (the parity pytest pins both directions)."""
    model.write().overwrite().save(path)


def load_model(path: str) -> ALSModel:
    """Reload a :func:`save_model` artifact in a fresh job.  The loaded
    model recommends IDENTICALLY to the in-process one — the factor
    matrices round-trip exactly through parquet (float32 bit patterns,
    no re-fit) — pinned by the save→load→recommend parity pytest."""
    return ALSModel.load(path)


def hitrate_at_n(
    model: ALSModel,
    train: DataFrame,
    holdout: DataFrame,
    n: int = 10,
) -> tuple[int, int]:
    """Held-out HIT-RATE@N of a trained factorization — the ranking
    eval a recommender ships with beside RMSE (``evaluate_rmse``
    scores predicted VALUES; this scores whether the held-out item
    surfaces in the top-N the user would actually see).  ``train`` /
    ``holdout``: (userId, itemId) int frames; returns
    ``(hits, n_users)``.

    Seen items are EXCLUDED from each user's candidate ranking (the
    standard leave-one-out protocol): candidates are scored as the
    factor dot product over (model users × model items) minus the
    train pairs, top-N per user by (score desc, itemId).
    ``recommendForAllUsers`` cannot express the exclusion, so this
    scores the factor frames directly — one broadcast of the item
    factors (rank·|items| floats) against the user-factor frame, the
    same join geometry as the serving path.

    Scale: |users|·|items| dot products — an EVAL operator for a
    bounded holdout panel (cap users/items upstream), not a serving
    path; the registered contract bounds both sides by key."""
    uf = model.userFactors.select(
        F.col("id").alias("userId"), F.col("features").alias("__uf")
    )
    itf = model.itemFactors.select(
        F.col("id").alias("itemId"), F.col("features").alias("__if")
    )
    dot = F.aggregate(
        F.zip_with(
            "__uf", "__if", lambda a, b: a.cast("double") * b.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        uf.crossJoin(F.broadcast(itf))
        .join(train, ["userId", "itemId"], "left_anti")
        .select("userId", "itemId", dot.alias("__s"))
    )
    from prod_recommendation_pyspark_spark.operators.relational import (
        windowed_topk,
    )

    top = windowed_topk(
        scored, "userId", [F.col("__s").desc(), F.col("itemId")], n
    )
    hits = top.join(holdout, ["userId", "itemId"], "inner").count()
    n_users = holdout.count()
    return hits, n_users


def recommend_topn(
    model: ALSModel,
    n: int,
    user_map: DataFrame | None = None,
    item_map: DataFrame | None = None,
    user_col: str = "user",
    item_col: str = "item",
) -> DataFrame:
    """M12+D3 — top-N per user as flat rows.

    ``recommendForAllUsers`` returns ``array<struct<itemId,rating>>``;
    the reference unpacks it with two Python UDFs
    (recommender_prod_rec.py:59-71,263-264).  Native form:
    ``explode`` + struct-field access — stays JVM-side — then optional
    broadcast joins back to the original keys."""
    recs = (
        model.recommendForAllUsers(n)
        .select("userId", F.explode("recommendations").alias("rec"))
        .select(
            "userId",
            F.col("rec.itemId").alias("itemId"),
            F.col("rec.rating").alias("rating"),
        )
    )
    if user_map is not None:
        recs = recs.join(F.broadcast(user_map), "userId").drop("userId")
    if item_map is not None:
        recs = recs.join(F.broadcast(item_map), "itemId").drop("itemId")
    return recs
