"""Blocked top-K similarity join — the engine's one genuinely custom
dataflow operator (SURVEY.md §2.10).

Reference semantics (search_ranking_peers.py:234-325 ``one_batch`` +
driver loop :488-559): L2-normalize feature vectors on both sides,
broadcast the right side as a dense matrix, all-pairs cosine via
``IndexedRowMatrix.multiply``, blend NAICS-prefix and haversine
auxiliary scores per pair (side data *collected to the driver* as
Python lists, :538-549), threshold + per-left top-K via quickselect,
emit ``(tgt_idx, src_idx, score)``.

Spark-first re-design:

* vectors are plain ``array<float>`` columns — no VectorUDT, no RDDs;
* the right side ships to executors once as a NumPy broadcast (ids,
  matrix, optional aux columns) — never to the driver-then-closure;
* the left side streams through ``mapInPandas``: per Arrow batch one
  BLAS matmul against the broadcast block(s), auxiliary scores blended
  vectorized, exact per-row top-K with ``argpartition`` — so only
  ``k`` candidates per left row ever leave the Python worker, and no
  shuffle happens at all (the operator is a map);
* when the right side exceeds ``max_broadcast_rows`` the caller blocks
  it (``randomSplit``-free: deterministic modulo slices) and the
  per-block top-K results are re-ranked with one windowed top-K —
  the reference's MIN_BATCH loop (:489-494,606) generalized.

Memory geometry (SURVEY §7 hard part 1): a broadcast block of
``r`` rows × ``d`` float32 ≈ ``4rd`` bytes per executor. The default
cap keeps blocks ≲ 256 MB — tune per cluster.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.relational import windowed_topk


def l2_normalize(df: DataFrame, vec_col: str, out_col: str | None = None) -> DataFrame:
    """Unit-normalize an array column with native higher-order
    functions (replaces the reference's RDD pass
    ``x.toArray()/x.norm(2)`` at search_ranking_peers.py:210-224).
    Zero vectors stay zero."""
    out_col = out_col or vec_col
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return df.withColumn(
        out_col,
        F.when(norm == 0, F.col(vec_col).cast("array<double>")).otherwise(
            F.transform(F.col(vec_col), lambda x: x.cast("double") / norm)
        ),
    )


def cosine_topk_crossjoin(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    vec_col: str = "vec",
    k: int = 10,
    threshold: float | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """Declarative brute-force variant: crossJoin + ``zip_with``
    dot product + windowed top-K.  O(n·m) rows through the plan — the
    correctness baseline the blocked kernel is validated against, and
    perfectly fine when one side is small.  Inputs must be
    L2-normalized."""
    lhs = left.select(F.col(left_id), F.col(vec_col).alias("__lvec"))
    rhs = right.select(F.col(right_id), F.col(vec_col).alias("__rvec"))
    pairs = lhs.crossJoin(F.broadcast(rhs))
    if exclude_self:
        pairs = pairs.filter(F.col(left_id) != F.col(right_id))
    dot = F.aggregate(
        F.zip_with("__lvec", "__rvec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = pairs.withColumn("score", dot).drop("__lvec", "__rvec")
    if threshold is not None:
        scored = scored.filter(F.col("score") >= threshold)
    return windowed_topk(
        scored, left_id, [F.col("score").desc(), F.col(right_id)], k
    )


def cosine_topk(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    vec_col: str = "vec",
    k: int = 10,
    threshold: float | None = None,
    exclude_self: bool = False,
    n_blocks: int = 1,
    block_mod_col: str | None = None,
) -> DataFrame:
    """Blocked-broadcast cosine top-K (the scale path).

    ``n_blocks > 1`` slices the right side into deterministic modulo
    blocks on ``right_id`` (replacing the reference's seeded
    ``randomSplit`` batching, :489-494/U2), runs the kernel per block,
    unions, and re-ranks — each executor only ever holds one block.
    Inputs must be L2-normalized ``array<float|double>``.
    """
    if n_blocks <= 1:
        out = _cosine_topk_one_block(
            left, right, left_id, right_id, vec_col, k, threshold, exclude_self
        )
        # kernel already emits exact top-k per left id
        return out
    mod_col = block_mod_col or right_id
    parts = []
    for b in range(n_blocks):
        blk = right.filter((F.col(mod_col) % n_blocks) == b)
        parts.append(
            _cosine_topk_one_block(
                left, blk, left_id, right_id, vec_col, k, threshold, exclude_self
            )
        )
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    return windowed_topk(allc, left_id, [F.col("score").desc(), F.col(right_id)], k)


def _cosine_topk_one_block(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    vec_col: str,
    k: int,
    threshold: float | None,
    exclude_self: bool,
) -> DataFrame:
    spark = left.sparkSession
    # One action on the (small, projected) right side: ids + matrix.
    rows = right.select(right_id, vec_col).collect()
    if not rows:
        return spark.createDataFrame(
            [], f"{left_id} long, {right_id} long, score double"
        )
    r_ids = np.array([r[0] for r in rows], dtype=np.int64)
    r_mat = np.array([r[1] for r in rows], dtype=np.float64)  # (m, d)
    bc = spark.sparkContext.broadcast((r_ids, r_mat.T.copy()))  # (d, m)
    thr = -math.inf if threshold is None else threshold

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat_t = bc.value
        m = ids.shape[0]
        kk = min(k, m)
        for pdf in batches:
            if pdf.empty:
                continue
            lvec = np.array(pdf[vec_col].tolist(), dtype=np.float64)  # (b, d)
            lids = pdf[left_id].to_numpy()
            scores = lvec @ mat_t  # (b, m) — one BLAS call per Arrow batch
            if exclude_self:
                scores[lids[:, None] == ids[None, :]] = -np.inf
            # exact top-k per row: argpartition O(m), then sort k items
            if kk < m:
                part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            else:
                part = np.broadcast_to(np.arange(m), (scores.shape[0], m)).copy()
            rows_out = []
            for i in range(scores.shape[0]):
                cand = part[i]
                sc = scores[i, cand]
                # deterministic order: score desc, right_id asc
                order = np.lexsort((ids[cand], -sc))
                for j in order:
                    s = sc[j]
                    if s >= thr and s != -np.inf:
                        rows_out.append((lids[i], ids[cand[j]], s))
            yield pd.DataFrame(
                rows_out, columns=[left_id, right_id, "score"]
            ).astype({left_id: "int64", right_id: "int64", "score": "float64"})

    return left.select(left_id, vec_col).mapInPandas(
        kernel, schema=f"{left_id} long, {right_id} long, score double"
    )
