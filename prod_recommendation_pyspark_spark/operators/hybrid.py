"""Hybrid-score top-K peer search — Stage 1's core semantics
(SURVEY.md §2.10; search_ranking_peers.py:246-325).

``score = (1 - w_hops - w_havs)·cosine + w_hops·naics_hops +
w_havs·haversine`` blended over *all* pairs, then threshold + top-K per
left row (driver constants th=0.0, topK=15, w_hops=0.399, w_havs=0.001
at search_ranking_peers.py:606-613).

Two implementations with identical semantics:

* ``hybrid_topk_crossjoin`` — fully declarative: crossJoin + native
  dot-product/when-ladder/trig expressions + windowed top-K.  Exact,
  whole-stage-codegen, zero Python.  The right fit when one side is
  broadcastable and the pair count (n·m) is tolerable.
* ``hybrid_topk`` — the blocked kernel: right side (ids, vectors, aux
  columns) broadcast once as NumPy arrays, left side streamed through
  ``mapInPandas``; cosine is one BLAS matmul, hops/haversine are
  vectorized, and only k rows per left id leave the worker.  This is
  the 100 TB path: no shuffle, no driver-side closure lists
  (the reference collect()s naics/lat/lon to the driver at :538-549).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.geo import (
    EARTH_RADIUS_KM,
    HALF_EARTH_KM,
    haversine_score,
)
from prod_recommendation_pyspark_spark.operators.naics import naics_hops_score
from prod_recommendation_pyspark_spark.operators.relational import windowed_topk
from prod_recommendation_pyspark_spark.operators.similarity import (
    DEFAULT_MAX_BLOCK_BYTES,
    _auto_n_blocks,
    _block_slice,
)

DEFAULT_W_HOPS = 0.399  # search_ranking_peers.py:608
DEFAULT_W_HAVS = 0.001  # search_ranking_peers.py:609


def hybrid_score_expr(
    dot: Column,
    hops: Column,
    havs: Column,
    w_hops: float = DEFAULT_W_HOPS,
    w_havs: float = DEFAULT_W_HAVS,
) -> Column:
    return (1.0 - w_hops - w_havs) * dot + w_hops * hops + w_havs * havs


def hybrid_topk_crossjoin(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    vec_col: str = "vec",
    naics_col: str = "naics",
    lat_col: str = "lat",
    lon_col: str = "lon",
    k: int = 15,
    threshold: float = 0.0,
    w_hops: float = DEFAULT_W_HOPS,
    w_havs: float = DEFAULT_W_HAVS,
) -> DataFrame:
    lhs = left.select(
        F.col(left_id),
        F.col(vec_col).alias("__lvec"),
        F.col(naics_col).alias("__lnaics"),
        F.col(lat_col).alias("__llat"),
        F.col(lon_col).alias("__llon"),
    )
    rhs = right.select(
        F.col(right_id),
        F.col(vec_col).alias("__rvec"),
        F.col(naics_col).alias("__rnaics"),
        F.col(lat_col).alias("__rlat"),
        F.col(lon_col).alias("__rlon"),
    )
    dot = F.aggregate(
        F.zip_with("__lvec", "__rvec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        lhs.crossJoin(F.broadcast(rhs))
        .withColumn(
            "score",
            hybrid_score_expr(
                dot,
                naics_hops_score(F.col("__lnaics"), F.col("__rnaics")),
                haversine_score(
                    F.col("__llat"), F.col("__llon"), F.col("__rlat"), F.col("__rlon")
                ),
                w_hops,
                w_havs,
            ),
        )
        # NaN parity with the kernel (which drops NaN via >= threshold):
        # SQL would rank NaN first desc — drop it here too
        .filter(~F.isnan("score"))
        .filter(F.col("score") >= threshold)
        .select(left_id, right_id, "score")
    )
    return windowed_topk(scored, left_id, [F.col("score").desc(), F.col(right_id)], k)


def hybrid_topk(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    vec_col: str = "vec",
    naics_col: str = "naics",
    lat_col: str = "lat",
    lon_col: str = "lon",
    k: int = 15,
    threshold: float = 0.0,
    w_hops: float = DEFAULT_W_HOPS,
    w_havs: float = DEFAULT_W_HAVS,
    left_chunk: int = 512,
    n_blocks: int | None = None,
    block_mod_col: str | None = None,
    max_block_bytes: int = DEFAULT_MAX_BLOCK_BYTES,
) -> DataFrame:
    """Blocked-broadcast hybrid top-K.  ``left_chunk`` bounds the
    (chunk × m × 6) prefix-comparison tensor so worker memory stays
    flat regardless of Arrow batch size.

    ``n_blocks=None`` (default) sizes blocks from the right side's
    memory geometry — an unbounded right side can no longer be
    silently collected whole.  ``n_blocks > 1`` slices the right side
    into deterministic **pmod** blocks on ``block_mod_col`` (default
    ``right_id``; pmod so signed xxhash64-style keys are not dropped)
    — the reference's MIN_BATCH loop (search_ranking_peers.py:
    489-494,606) on its original (hybrid) path — runs the kernel per
    block and re-ranks the union with one windowed top-K; exact for
    any block count."""
    mod_col = block_mod_col or right_id
    proj = None
    if n_blocks is None:
        # persist the projected right side: the auto probe and the
        # (eager) per-block collects below share one materialization
        # instead of re-running the upstream plan per action.
        # ~40 B/row of aux (naics bytes + 2 doubles + id) on top of
        # the vector block.
        cols = list(
            dict.fromkeys([right_id, vec_col, naics_col, lat_col, lon_col, mod_col])
        )
        proj = right.select(*cols).persist()
        n_blocks = _auto_n_blocks(
            proj, vec_col, max_block_bytes, row_overhead=40
        )
        right = proj
    if n_blocks > 1:
        try:
            parts = [
                hybrid_topk(
                    left,
                    _block_slice(right, mod_col, n_blocks, b),
                    left_id,
                    right_id,
                    vec_col,
                    naics_col,
                    lat_col,
                    lon_col,
                    k,
                    threshold,
                    w_hops,
                    w_havs,
                    left_chunk,
                    n_blocks=1,
                )
                for b in range(n_blocks)
            ]
        finally:
            if proj is not None:
                proj.unpersist()  # the recursive calls collect()ed eagerly
        allc = parts[0]
        for p in parts[1:]:
            allc = allc.unionByName(p)
        return windowed_topk(
            allc, left_id, [F.col("score").desc(), F.col(right_id)], k
        )
    spark = left.sparkSession
    try:
        rows = right.select(right_id, vec_col, naics_col, lat_col, lon_col).collect()
    finally:
        if proj is not None:
            proj.unpersist()  # collect was the cache's last reader (even on failure)
    if not rows:
        return spark.createDataFrame([], f"{left_id} long, {right_id} long, score double")
    r_ids = np.array([r[0] for r in rows], dtype=np.int64)
    r_mat = np.array([r[1] for r in rows], dtype=np.float64).T.copy()  # (d, m)
    r_naics = np.array(
        [(r[2] or "") for r in rows], dtype="S6"
    ).view("uint8").reshape(len(rows), -1)
    r_nlen = np.array([len(r[2] or "") for r in rows])
    r_lat = np.array([np.nan if r[3] is None else r[3] for r in rows], dtype=np.float64)
    r_lon = np.array([np.nan if r[4] is None else r[4] for r in rows], dtype=np.float64)
    bc = spark.sparkContext.broadcast((r_ids, r_mat, r_naics, r_nlen, r_lat, r_lon))
    w_cos = 1.0 - w_hops - w_havs

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat_t, rn, rnlen, rlat, rlon = bc.value
        m = ids.shape[0]
        kk = min(k, m)
        rlat_r, rlon_r = np.radians(rlat), np.radians(rlon)
        r_bad = rnlen != 6
        for pdf in batches:
            if pdf.empty:
                continue
            # one contiguous conversion per Arrow batch, sliced per chunk
            lvec_all = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            lids_all = pdf[left_id].to_numpy()
            for s in range(0, len(pdf), left_chunk):
                chunk = pdf.iloc[s : s + left_chunk]
                lids = lids_all[s : s + left_chunk]
                lvec = lvec_all[s : s + left_chunk]
                cos = lvec @ mat_t  # (b, m)

                # NAICS hops: prefix depth via cumulative char equality
                lcodes = chunk[naics_col].fillna("").to_numpy()
                lnlen = np.array([len(c) for c in lcodes])
                ln = np.array([c.encode()[:6].ljust(6) for c in lcodes], dtype="S6")
                ln = ln.view("uint8").reshape(len(chunk), 6)
                eq = ln[:, None, :] == rn[None, :, :]  # (b, m, 6)
                p = eq.cumprod(axis=2).sum(axis=2)
                hops = np.where(p == 6, 1.0, np.maximum(1.0 - 2.0 * (6 - p) / 10.0, 0.0))
                hops = np.where(p == 0, 0.0, hops)
                bad = (lnlen != 6)[:, None] | r_bad[None, :]
                hops = np.where(bad, -1.0, hops)

                # Haversine score; missing coords → 0.5
                llat = chunk[lat_col].to_numpy(dtype=np.float64)
                llon = chunk[lon_col].to_numpy(dtype=np.float64)
                llat_r, llon_r = np.radians(llat), np.radians(llon)
                dlat = (rlat_r[None, :] - llat_r[:, None]) / 2
                dlon = (rlon_r[None, :] - llon_r[:, None]) / 2
                a = np.sin(dlat) ** 2 + (
                    np.cos(llat_r)[:, None] * np.cos(rlat_r)[None, :] * np.sin(dlon) ** 2
                )
                dist = 2 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))
                havs = 1.0 - dist / HALF_EARTH_KM
                havs = np.where(np.isnan(havs), 0.5, havs)

                score = w_cos * cos + w_hops * hops + w_havs * havs
                if kk < m:
                    part = np.argpartition(-score, kk - 1, axis=1)[:, :kk]
                else:
                    part = np.broadcast_to(np.arange(m), (score.shape[0], m)).copy()
                # vectorized emit (no per-row Python loop): order each
                # row by (score desc, right_id asc), then one mask
                sc = np.take_along_axis(score, part, axis=1)  # (b, kk)
                cid = ids[part]
                order = np.lexsort((cid, -sc), axis=-1)
                sc = np.take_along_axis(sc, order, axis=1)
                cid = np.take_along_axis(cid, order, axis=1)
                keep = sc >= threshold  # NaN fails, dropped
                lrep = np.broadcast_to(lids[:, None], sc.shape)
                yield pd.DataFrame(
                    {
                        left_id: lrep[keep].astype("int64"),
                        right_id: cid[keep].astype("int64"),
                        "score": sc[keep].astype("float64"),
                    }
                )

    return left.select(left_id, vec_col, naics_col, lat_col, lon_col).mapInPandas(
        kernel, schema=f"{left_id} long, {right_id} long, score double"
    )
