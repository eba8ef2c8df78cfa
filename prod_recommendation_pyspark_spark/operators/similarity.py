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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.relational import windowed_topk


def l2_normalize(df: DataFrame, vec_col: str, out_col: str | None = None) -> DataFrame:
    """Unit-normalize an array column with native higher-order
    functions (replaces the reference's RDD pass
    ``x.toArray()/x.norm(2)`` at search_ranking_peers.py:210-224).
    Zero vectors stay zero.

    The norm is the naive ``sqrt(sum(x²))`` — same formulation as
    DuckDB's ``list_cosine_similarity`` oracle twin; components below
    ~1e-154 underflow in the square (embedding-range inputs are far
    from this; rescale first if you have denormal data)."""
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
    # NaN parity with the kernel: SQL orders NaN above all doubles (a
    # NaN score would pass any threshold and rank FIRST desc); the
    # numpy kernel drops NaN (``s >= thr`` is False).  One contract:
    # NaN scores are dropped in both paths.
    scored = (
        pairs.withColumn("score", dot)
        .drop("__lvec", "__rvec")
        .filter(~F.isnan("score"))
    )
    if threshold is not None:
        scored = scored.filter(F.col("score") >= threshold)
    return windowed_topk(
        scored, left_id, [F.col("score").desc(), F.col(right_id)], k
    )


#: Per-executor broadcast cap for one right-side block (bytes).
DEFAULT_MAX_BLOCK_BYTES = 256 * 1024 * 1024


def _auto_n_blocks(
    right: DataFrame,
    vec_col: str,
    max_block_bytes: int,
    bytes_per_elem: int = 8,
    row_overhead: int = 0,
) -> int:
    """Block count from the right side's memory geometry: one tiny
    aggregate (count + dim) sizes the broadcast so each block stays
    under ``max_block_bytes`` regardless of input size — the
    reference's manual MIN_BATCH knob (search_ranking_peers.py:606)
    made automatic."""
    stats = right.select(
        F.count(F.lit(1)).alias("n"), F.first(F.size(vec_col)).alias("d")
    ).first()
    n_rows, dim = (stats["n"] or 0), (stats["d"] or 1)
    block_bytes = n_rows * (dim * bytes_per_elem + row_overhead)
    return int(max(1, -(-block_bytes // max_block_bytes)))


def _block_slice(right: DataFrame, mod_col: str, n_blocks: int, b: int) -> DataFrame:
    """Deterministic modulo slice b of n_blocks.  ``pmod`` (not ``%``):
    Spark's ``%`` keeps the dividend's sign, so signed block keys (e.g.
    ``xxhash64`` ids) would match NO slice in 0..n_blocks-1 and be
    silently dropped from every block.  Null keys land in slice 0
    (pmod(null) is null, which would likewise vanish)."""
    return right.filter(
        F.coalesce(
            F.pmod(F.col(mod_col).cast("long"), F.lit(n_blocks)), F.lit(0)
        )
        == b
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
    n_blocks: int | None = None,
    block_mod_col: str | None = None,
    max_block_bytes: int = DEFAULT_MAX_BLOCK_BYTES,
) -> DataFrame:
    """Blocked-broadcast cosine top-K (the scale path).

    ``n_blocks=None`` (the default) sizes blocks automatically from the
    right side's memory geometry — no caller can silently collect an
    unbounded right side to the driver.  ``n_blocks > 1`` slices the
    right side into deterministic pmod blocks on ``right_id``
    (replacing the reference's seeded ``randomSplit`` batching,
    :489-494/U2), runs the kernel per block, unions, and re-ranks —
    each executor only ever holds one block.  Inputs must be
    L2-normalized ``array<float|double>``.
    """
    mod_col = block_mod_col or right_id
    proj = None
    if n_blocks is None:
        # the probe and the per-block collect(s) both execute the right
        # side's plan — persist the (projected, small by contract) side
        # once so auto-blocking costs a cache read, not a re-execution
        # of a potentially codegen-heavy upstream plan
        cols = list(dict.fromkeys([right_id, vec_col, mod_col]))
        proj = right.select(*cols).persist()
        n_blocks = _auto_n_blocks(proj, vec_col, max_block_bytes)
        right = proj
    try:
        if n_blocks <= 1:
            # kernel already emits exact top-k per left id
            return _cosine_topk_one_block(
                left, right, left_id, right_id, vec_col, k, threshold, exclude_self
            )
        parts = []
        for b in range(n_blocks):
            blk = _block_slice(right, mod_col, n_blocks, b)
            parts.append(
                _cosine_topk_one_block(
                    left, blk, left_id, right_id, vec_col, k, threshold, exclude_self
                )
            )
        allc = parts[0]
        for p in parts[1:]:
            allc = allc.unionByName(p)
        return windowed_topk(
            allc, left_id, [F.col("score").desc(), F.col(right_id)], k
        )
    finally:
        if proj is not None:
            # every collect above was eager — the cache has served its
            # purpose by the time we return
            proj.unpersist()


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
            # vectorized emit: per-row (score desc, right_id asc) order,
            # then one boolean mask — no Python loop over rows
            sc = np.take_along_axis(scores, part, axis=1)  # (b, kk)
            cid = ids[part]  # (b, kk)
            order = np.lexsort((cid, -sc), axis=-1)
            sc = np.take_along_axis(sc, order, axis=1)
            cid = np.take_along_axis(cid, order, axis=1)
            keep = (sc >= thr) & (sc != -np.inf)  # NaN fails >=, dropped
            lrep = np.broadcast_to(lids[:, None], sc.shape)
            yield pd.DataFrame(
                {
                    left_id: lrep[keep].astype("int64"),
                    right_id: cid[keep].astype("int64"),
                    "score": sc[keep].astype("float64"),
                }
            )

    return left.select(left_id, vec_col).mapInPandas(
        kernel, schema=f"{left_id} long, {right_id} long, score double"
    )


# ---------------------------------------------------------------------------
# Approximate nearest neighbour: random-hyperplane LSH bucketing
# ---------------------------------------------------------------------------


def random_hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH, rounded to 6
    decimals so the identical literals can be embedded in both the
    Spark plan and an ANSI-SQL oracle (shortest-repr round-trip makes
    the doubles bit-identical on both sides)."""
    rng = np.random.RandomState(seed)
    return [
        [round(float(x), 6) for x in row]
        for row in rng.standard_normal((n_planes, dim))
    ]


def random_hyperplane_tables(
    dim: int, n_planes: int, n_tables: int, seed: int = 7
) -> list[list[list[float]]]:
    """``n_tables`` independent sign-LSH tables drawn from one seeded
    stream (standard multi-table LSH: a neighbour is found if ANY table
    buckets it with the query)."""
    rng = np.random.RandomState(seed)
    flat = rng.standard_normal((n_tables * n_planes, dim))
    return [
        [[round(float(x), 6) for x in row] for row in flat[t * n_planes:(t + 1) * n_planes]]
        for t in range(n_tables)
    ]


def _plane_dot(vec: Column, plane: list[float]) -> Column:
    """Left-folded dot(vec, plane) via ``zip_with`` + ``aggregate`` —
    codegen emits a loop (an unrolled 64-term chain overflows Janino's
    64 KB method limit when many planes share a projection) while the
    sequential left-to-right accumulation keeps the IEEE754 result
    identical to a `v[1]*w1 + v[2]*w2 + ...` SQL transliteration
    (sign must agree for bucket parity)."""
    weights = F.array(*[F.lit(w) for w in plane])
    return F.aggregate(
        F.zip_with(vec, weights, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit p set iff dot(vec, plane_p) >= 0.
    Pure Catalyst expressions — computed in the scan projection, fully
    codegen'd, no UDF."""
    sig = F.lit(0)
    for p, plane in enumerate(planes):
        sig = sig + F.when(_plane_dot(vec, plane) >= 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
    return sig


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    query_id: str,
    vec_col: str,
    k: int,
    tables: list[list[list[float]]],
    multi_probe: bool = True,
) -> DataFrame:
    """ANN top-K via multi-table random-hyperplane LSH — the bucketed
    scale path next to the brute-force kernels.

    Per table: O(n) signature computation in the scan projection (pure
    Catalyst, codegen'd), one shuffle on ``(table, bucket)``, candidate
    pairs only within shared buckets.  Multi-probe additionally flips
    each signature bit on the *query* side (1 + n_planes probe keys per
    query per table), recovering neighbours lost to a single boundary
    plane without touching the corpus layout.  Candidates are
    pair-deduplicated across tables/probes before exact cosine re-rank,
    so each surviving pair is scored once.

    At 100 TB the corpus signatures are precomputed and the table is
    written bucketed by ``(tbl, sig)`` so probes become partition-pruned
    scans; the (small) query side is the broadcast side of the bucket
    join.  Recall/cost is tuned by (n_planes ↑ ⇒ smaller buckets,
    n_tables ↑ ⇒ higher recall).

    Inputs carry raw (unnormalized) ``array<float>`` vectors; bucketing
    uses the raw sign (scale-invariant), ranking uses exact cosine.
    """
    n_tables = len(tables)
    n_planes = len(tables[0])
    dvec = F.col(vec_col).cast("array<double>")
    c_sigs = corpus.select(
        F.col(corpus_id).alias("__cid"),
        *[
            hyperplane_signature(dvec, t).alias(f"__sig{i}")
            for i, t in enumerate(tables)
        ],
    )
    c = c_sigs.select(
        "__cid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("tbl"), F.col(f"__sig{i}").alias("sig")
                    )
                    for i in range(n_tables)
                ]
            )
        ).alias("__k"),
    ).select("__cid", F.col("__k.tbl").alias("__tbl"), F.col("__k.sig").alias("__sig"))
    q_sigs = queries.select(
        F.col(query_id).alias("__qid"),
        *[
            hyperplane_signature(dvec, t).alias(f"__sig{i}")
            for i, t in enumerate(tables)
        ],
    )
    probe_structs = []
    for i in range(n_tables):
        base = F.col(f"__sig{i}")
        keys = [base]
        if multi_probe:
            keys += [base.bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
        probe_structs += [
            F.struct(F.lit(i).alias("tbl"), key.alias("sig")) for key in keys
        ]
    q = q_sigs.select(
        "__qid", F.explode(F.array(*probe_structs)).alias("__k")
    ).select("__qid", F.col("__k.tbl").alias("__tbl"), F.col("__k.sig").alias("__sig"))
    pairs = (
        q.join(c, ["__tbl", "__sig"])
        .filter(F.col("__qid") != F.col("__cid"))
        .select("__qid", "__cid")
        .distinct()
    )
    qv = queries.select(F.col(query_id).alias("__qid"), dvec.alias("__qvec"))
    cv = corpus.select(F.col(corpus_id).alias("__cid"), dvec.alias("__cvec"))
    qn = F.sqrt(F.aggregate("__qvec", F.lit(0.0), lambda a, x: a + x * x))
    cn = F.sqrt(F.aggregate("__cvec", F.lit(0.0), lambda a, x: a + x * x))
    dot = F.aggregate(
        F.zip_with("__qvec", "__cvec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        pairs.join(qv, "__qid")
        .join(cv, "__cid")
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            (dot / (qn * cn)).alias("score"),
        )
    )
    return windowed_topk(
        scored, query_id, [F.col("score").desc(), F.col(corpus_id)], k
    )


# ---------------------------------------------------------------------------
# Approximate nearest neighbour: IVF (inverted file) with fixed centroids
# ---------------------------------------------------------------------------


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    n_probe: int = 1,
    list_col: str = "ivf_list",
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroids by
    cosine (centroids: (centroid_id, vec) — typically a deterministic
    sample of the corpus, so the whole index is reproducible).  One
    broadcast join against the (small) centroid table + windowed
    top-n_probe; no UDFs.

    At 100 TB: corpus rows are written partitioned by their single
    nearest list (``n_probe=1``); only queries fan out to multiple
    lists, turning search into partition-pruned scans of n_probe
    lists."""
    c = centroids.select(
        F.col("centroid_id").alias(list_col), F.col("vec").alias("__cvec")
    )
    dvec = F.col(vec_col).cast("array<double>")
    v = df.select(F.col(id_col), dvec.alias("__v"))
    vn = F.sqrt(F.aggregate("__v", F.lit(0.0), lambda a, x: a + x * x))
    cn = F.sqrt(F.aggregate("__cvec", F.lit(0.0), lambda a, x: a + x * x))
    dot = F.aggregate(
        F.zip_with("__v", "__cvec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = v.crossJoin(F.broadcast(c)).select(
        id_col, list_col, (dot / (vn * cn)).alias("__csim")
    )
    ranked = windowed_topk(
        scored, id_col, [F.col("__csim").desc(), F.col(list_col)], n_probe
    )
    return ranked.select(id_col, list_col)


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    query_id: str,
    vec_col: str,
    k: int,
    centroids: DataFrame,
    n_probe: int = 4,
) -> DataFrame:
    """IVF ANN top-K: corpus vectors live in ONE inverted list (their
    nearest centroid); queries probe their ``n_probe`` nearest lists
    and rank only vectors in those lists by exact cosine.

    Complement to the sign-LSH tables (``ann_lsh_topk``): IVF adapts
    to the data distribution (lists = Voronoi cells of the centroid
    sample) where LSH is data-oblivious; recall is tuned by n_probe ×
    centroid count.  With deterministic centroids the index build is a
    pure function of the corpus — reproducible and oracle-checkable."""
    c_assign = ivf_assign(corpus, corpus_id, vec_col, centroids, n_probe=1)
    q_assign = ivf_assign(queries, query_id, vec_col, centroids, n_probe=n_probe)
    dvec = F.col(vec_col).cast("array<double>")
    cv = corpus.select(F.col(corpus_id).alias("__cid"), dvec.alias("__cvec"))
    qv = queries.select(F.col(query_id).alias("__qid"), dvec.alias("__qvec"))
    pairs = (
        q_assign.withColumnRenamed(query_id, "__qid")
        .join(c_assign.withColumnRenamed(corpus_id, "__cid"), "ivf_list")
        .filter(F.col("__qid") != F.col("__cid"))
        .select("__qid", "__cid")
        .distinct()
    )
    qn = F.sqrt(F.aggregate("__qvec", F.lit(0.0), lambda a, x: a + x * x))
    cn = F.sqrt(F.aggregate("__cvec", F.lit(0.0), lambda a, x: a + x * x))
    dot = F.aggregate(
        F.zip_with("__qvec", "__cvec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        pairs.join(qv, "__qid")
        .join(cv, "__cid")
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            (dot / (qn * cn)).alias("score"),
        )
    )
    return windowed_topk(
        scored, query_id, [F.col("score").desc(), F.col(corpus_id)], k
    )


def cosine_topk_auto(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    vec_col: str = "vec",
    k: int = 10,
    threshold: float | None = None,
    exclude_self: bool = False,
    max_block_bytes: int = 256 * 1024 * 1024,
    block_mod_col: str | None = None,
) -> DataFrame:
    """Back-compat alias: auto block sizing is now ``cosine_topk``'s
    default (``n_blocks=None``) — see ``_auto_n_blocks``.  Costs one
    tiny aggregate on the right side (count + dim) before planning; the
    result is exact for any block count (per-block exact top-K, then
    one windowed re-rank)."""
    return cosine_topk(
        left,
        right,
        left_id,
        right_id,
        vec_col,
        k=k,
        threshold=threshold,
        exclude_self=exclude_self,
        n_blocks=None,
        block_mod_col=block_mod_col,
        max_block_bytes=max_block_bytes,
    )


def sign_lsh_self_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    tables: list[list[list[float]]],
) -> DataFrame:
    """Candidate (id_a < id_b) pairs that share a sign-LSH bucket in
    ANY table — the self-join sibling of ``ann_lsh_topk``'s
    query-vs-corpus probing, feeding the near-dup verifiers
    (``dedup.embedding_near_dup_pairs(candidates=...)``).

    One signature projection (pure Catalyst), one shuffle on
    (table, bucket), pair-dedup across tables.  At 100 TB write the
    signature table bucketed by (tbl, sig) and this becomes a
    partition-local self-join per bucket."""
    dvec = F.col(vec_col).cast("array<double>")
    sigs = df.select(
        F.col(id_col).alias("__id"),
        *[
            hyperplane_signature(dvec, t).alias(f"__sig{i}")
            for i, t in enumerate(tables)
        ],
    )
    banded = sigs.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("tbl"), F.col(f"__sig{i}").alias("sig"))
                    for i in range(len(tables))
                ]
            )
        ).alias("__k"),
    ).select("__id", F.col("__k.tbl").alias("__tbl"), F.col("__k.sig").alias("__sig"))
    a = banded.select(F.col("__id").alias("id_a"), "__tbl", "__sig")
    b = banded.select(F.col("__id").alias("id_b"), "__tbl", "__sig")
    return (
        a.join(b, ["__tbl", "__sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
