"""Product quantization (PQ) for embedding compression + ANN scoring
(Jégou, Douze, Schmid 2011, "Product Quantization for Nearest
Neighbor Search") — the third leg of the engine's vector-index family
next to sign-LSH/IVF (similarity.py) and SQ8 scalar quantization.

Why PQ at 100 TB: a float32 768-dim embedding is 3 KB; its PQ code at
m=8 sub-blocks × 256 codes is 8 BYTES + a shared m·k·(dim/m) codebook.
The codes table fits in memory where the vectors never could, and ADC
(asymmetric distance computation) scans it with per-query lookup
tables instead of touching raw vectors.

Scale shapes (everything bounded by design):
- ``pq_fit`` trains m independent sub-space k-means on vector SLICES —
  each fit is the existing Lloyd operator (broadcast centroids,
  k-row driver collects only); the finished codebook is m·k rows.
- ``pq_encode`` explodes each vector into its m block slices ONCE,
  broadcast-joins the m·k-row codebook, and takes the per-(row, block)
  argmin — n·m·k scored rows, linear in the corpus, no shuffle wider
  than the (row, block) re-aggregation.
- ``pq_adc_topk`` builds the per-query LUT (n_q·m·k rows — the
  classic ADC table) and equi-joins it to the codes on (block, code):
  n_q·n·m joined rows, summed per (query, row).  The LUT side
  broadcasts; the codes side never moves.  Exactness of the SUM: each
  partial distance is the same IEEE double in any engine and the
  per-pair m-term sum is accumulated in DECIMAL, so ranking ties
  cannot split across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.clustering import sq_l2
from prod_recommendation_pyspark_spark.operators.relational import windowed_topk


def _block_slices(df: DataFrame, id_col: str, vec_col: str, m: int, block_dim: int) -> DataFrame:
    """(id, block, subvec) — one row per sub-space slice."""
    blocks = F.array(
        *[
            F.struct(
                F.lit(b).alias("block"),
                F.slice(
                    F.col(vec_col).cast("array<double>"),
                    b * block_dim + 1,
                    block_dim,
                ).alias("subvec"),
            )
            for b in range(m)
        ]
    )
    return df.select(F.col(id_col), F.explode(blocks).alias("__b")).select(
        id_col,
        F.col("__b.block").alias("block"),
        F.col("__b.subvec").alias("subvec"),
    )


def pq_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 4,
    k: int = 16,
    max_iter: int = 2,
) -> DataFrame:
    """Train the m sub-space codebooks; returns ``(block, code,
    vec)`` with ``m·k`` rows.

    All m sub-space Lloyd fits run JOINTLY as one distributed
    pipeline keyed by (block, code) — per-iteration cost is one
    assignment pass (n·m rows against the broadcast m·k codebook) and
    one (block, code) mean aggregation, independent of m, instead of
    m sequential ``kmeans_fit`` calls each paying its own job set
    (measured: the sequential form cost ~70s at sf0.01 for m=8; the
    joint form is a few seconds).  Deterministic end to end: block b
    seeds from the k lowest ids' b-th slices, empty clusters keep
    their previous centroid, so the same corpus always yields the
    same codebook."""
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    spark = df.sparkSession
    if dim_row is None:
        return spark.createDataFrame(
            [], "block int, code int, vec array<double>"
        )
    dim = int(dim_row["d"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible into {m} blocks")
    block_dim = dim // m
    blocks = _block_slices(df, id_col, vec_col, m, block_dim)
    # seeds: the k lowest ids' slices, per block — m·k rows to the driver
    seed_rows = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
        .collect()
    )
    seed_rows.sort(key=lambda r: r[id_col])
    cents_rows = [
        (b, c, list(r["__v"][b * block_dim : (b + 1) * block_dim]))
        for b in range(m)
        for c, r in enumerate(seed_rows)
    ]
    centroids = spark.createDataFrame(
        cents_rows, "block int, code int, vec array<double>"
    ).localCheckpoint(eager=True)
    aggs = [F.avg(F.col("subvec")[i]).alias(f"__m{i}") for i in range(block_dim)]
    for _ in range(max_iter):
        scored = blocks.join(F.broadcast(centroids), "block").select(
            id_col,
            "block",
            "subvec",
            F.struct(
                sq_l2(F.col("subvec"), F.col("vec")).alias("d2"),
                F.col("code").alias("code"),
            ).alias("__sc"),
        )
        assigned = (
            scored.groupBy(id_col, "block", "subvec")
            .agg(F.min("__sc").alias("__best"))
            .select("block", F.col("__best.code").alias("code"), "subvec")
        )
        new_raw = (
            assigned.groupBy("block", "code")
            .agg(*aggs)
            .select(
                "block",
                "code",
                F.array(*[F.col(f"__m{i}") for i in range(block_dim)]).alias(
                    "__new"
                ),
            )
        )
        merged = (
            centroids.select("block", "code", F.col("vec").alias("__old"))
            .join(new_raw, ["block", "code"], "left")
            .select(
                "block",
                "code",
                F.coalesce("__new", "__old").alias("vec"),
            )
        )
        centroids = merged.localCheckpoint(eager=True)  # m·k rows
    return centroids


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: DataFrame,
    m: int,
    block_dim: int,
) -> DataFrame:
    """Encode every vector to ``(id, block, code)`` long form (long
    form keeps cells scalar for the oracle surface; ``m`` rows per
    input).  Argmin ties break to the LOWEST code id via struct
    ordering — deterministic in any engine."""
    blocks = _block_slices(df, id_col, vec_col, m, block_dim)
    scored = blocks.join(F.broadcast(codebooks), "block").select(
        id_col,
        "block",
        F.struct(
            sq_l2(F.col("subvec"), F.col("vec")).alias("d2"),
            F.col("code").alias("code"),
        ).alias("__sc"),
    )
    return (
        scored.groupBy(id_col, "block")
        .agg(F.min("__sc").alias("__best"))
        .select(id_col, "block", F.col("__best.code").alias("code"))
    )


def pq_adc_topk(
    query_df: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    query_id_col: str,
    query_vec_col: str,
    item_id_col: str,
    m: int,
    block_dim: int,
    k_top: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-K: per query build the m·k lookup
    table of block distances to every codeword, join it to the codes
    table on (block, code), and sum the m partial distances per
    (query, item).  Returns ``(query_id, item_id, adc_d2, rank)``.

    The LUT (n_q·m·k rows) broadcasts; the codes table is the only
    big side and it joins on its own layout — no repartition of the
    compressed index.  The m-term distance sum accumulates in
    DECIMAL(38,12) so cross-engine ranking is tie-stable."""
    q_blocks = _block_slices(query_df, query_id_col, query_vec_col, m, block_dim)
    lut = q_blocks.join(F.broadcast(codebooks), "block").select(
        F.col(query_id_col),
        "block",
        "code",
        sq_l2(F.col("subvec"), F.col("vec")).alias("__pd2"),
    )
    joined = codes.join(F.broadcast(lut), ["block", "code"]).groupBy(
        query_id_col, item_id_col
    ).agg(
        F.round(F.sum(F.col("__pd2").cast("decimal(38,12)")), 6)
        .cast("double")
        .alias("adc_d2")
    )
    return windowed_topk(
        joined,
        query_id_col,
        [F.col("adc_d2"), F.col(item_id_col)],
        k_top,
        rank_col="rank",
    )


def pq_encode_kernel(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebook_rows: list,
    m: int,
    block_dim: int,
) -> DataFrame:
    """STREAMING-friendly PQ encode: the codebook rides along as a
    driver-collected constant (m·k rows — the same bounded-model class
    as k-means centroids) and each Arrow batch encodes with one
    vectorized numpy distance computation — a stateless ``mapInPandas``
    projection, so it mounts directly on ``readStream`` (the join+agg
    form :func:`pq_encode` uses is an aggregation and would need
    update-mode semantics a stream encode doesn't want).

    Same output contract as :func:`pq_encode`: ``(id, block, code)``
    long form, ties to the lowest code (numpy argmin first-minimum ==
    the batch form's min-struct ordering; a streaming≡batch parity
    test pins it on real embeddings).

    Scale: per-task memory = batch × m·k distance matrix; the
    codebook constant is a few hundred KB at production m·k."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    cb: dict[tuple[int, int], list[float]] = {
        (int(r["block"]), int(r["code"])): list(r["vec"])
        for r in codebook_rows
    }
    k = max(c for _, c in cb) + 1
    C = np.zeros((m, k, block_dim), dtype="float64")
    for (b, c), v in cb.items():
        C[b, c, :] = v

    out_schema = T.StructType(
        [
            T.StructField("__id", T.LongType()),
            T.StructField("block", T.IntegerType()),
            T.StructField("code", T.IntegerType()),
        ]
    )

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(
                [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
            ).reshape(len(pdf), m, block_dim)
            # (n, m, k): squared L2 per block per code.  Accumulated
            # with an EXPLICIT left-to-right loop over the block
            # dimension: numpy's .sum() uses pairwise reduction above
            # 8 elements, whose rounding can differ by 1 ULP from the
            # batch path's sequential sq_l2 fold and flip a near-tie
            # argmin — the loop pins streaming≡batch parity for every
            # block_dim, not just the shipped 8.
            diff = X[:, :, None, :] - C[None, :, :, :]
            d2 = np.zeros(diff.shape[:3], dtype="float64")
            for j in range(block_dim):
                d2 += diff[:, :, :, j] * diff[:, :, :, j]
            codes = d2.argmin(axis=2).astype("int32")  # first min = low code
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "__id": np.repeat(
                        pdf[id_col].to_numpy(dtype="int64"), m
                    ),
                    "block": np.tile(
                        np.arange(m, dtype="int32"), n
                    ),
                    "code": codes.reshape(-1),
                }
            )

    return (
        df.select(F.col(id_col), F.col(vec_col))
        .mapInPandas(encode, schema=out_schema)
        .withColumnRenamed("__id", id_col)
    )


def ivfpq_build(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_list: int = 16,
    m: int = 8,
    k: int = 16,
    coarse_iter: int = 2,
    pq_iter: int = 2,
):
    """IVF-PQ index build (the FAISS IVFADC composition): a coarse
    k-means quantizer partitions the corpus into ``n_list`` inverted
    lists, and PQ encodes each vector's RESIDUAL (x − its list
    centroid) — residuals concentrate around 0, so the same codebook
    budget quantizes them far better than raw vectors.  Returns
    ``(coarse_centroids, pq_codebooks, codes)`` where codes =
    ``(id, ivf_list, block, code)``.

    Scale: the coarse fit is the existing Lloyd operator; residual
    computation is a broadcast join + zip_with projection; PQ fit and
    encode are the joint-pipeline forms above.  At 100 TB the codes
    table is written PARTITIONED BY ivf_list, so a query's n_probe
    lists become partition-pruned scans."""
    from prod_recommendation_pyspark_spark.operators.clustering import (
        kmeans_fit,
    )

    assigned, coarse = kmeans_fit(
        df, id_col, vec_col, k=n_list, max_iter=coarse_iter
    )
    dvec = F.col(vec_col).cast("array<double>")
    res = (
        df.join(assigned.select(id_col, "cluster"), id_col)
        .join(
            F.broadcast(coarse.select("cluster", F.col("vec").alias("__cv"))),
            "cluster",
        )
        .select(
            F.col(id_col),
            F.col("cluster").alias("ivf_list"),
            F.zip_with(dvec, F.col("__cv"), lambda a, b: a - b).alias(
                "__res"
            ),
        )
        # persisted: feeds the PQ fit (seed collect + per-iter scans)
        # AND the final encode; caller/registry owns the lifetime
        .persist()
    )
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    block_dim = int(dim_row["d"]) // m
    books = pq_fit(res, id_col, "__res", m=m, k=k, max_iter=pq_iter)
    codes = pq_encode(res, id_col, "__res", books, m, block_dim).join(
        res.select(id_col, "ivf_list"), id_col
    )
    return coarse, books, codes


def ivfpq_topk(
    query_df: DataFrame,
    coarse: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame,
    query_id_col: str,
    query_vec_col: str,
    item_id_col: str,
    m: int,
    block_dim: int,
    n_probe: int = 4,
    k_top: int = 100,
) -> DataFrame:
    """IVF-PQ search: probe the ``n_probe`` nearest coarse lists, build
    the per-(query, list) residual ADC lookup table, and score ONLY
    the codes in probed lists — the join key (ivf_list, block, code)
    is the pruning.  Returns ``(query_id, item_id, adc_d2, rank)``.

    Scale: the LUT side is n_q·n_probe·m·k rows (broadcast); the codes
    side joins partition-pruned on ivf_list and never repartitions."""
    q = query_df.select(
        F.col(query_id_col),
        F.col(query_vec_col).cast("array<double>").alias("__q"),
    )
    probed = windowed_topk(
        q.crossJoin(
            F.broadcast(
                coarse.select(
                    F.col("cluster").alias("ivf_list"),
                    F.col("vec").alias("__cv"),
                )
            )
        ).select(
            query_id_col,
            "ivf_list",
            "__q",
            "__cv",
            sq_l2(F.col("__q"), F.col("__cv")).alias("__cd2"),
        ),
        query_id_col,
        [F.col("__cd2"), F.col("ivf_list")],
        n_probe,
    )
    qres = probed.select(
        query_id_col,
        "ivf_list",
        F.zip_with(F.col("__q"), F.col("__cv"), lambda a, b: a - b).alias(
            "__qres"
        ),
    )
    lut_blocks = F.array(
        *[
            F.struct(
                F.lit(b).alias("block"),
                F.slice(F.col("__qres"), b * block_dim + 1, block_dim).alias(
                    "subvec"
                ),
            )
            for b in range(m)
        ]
    )
    lut = (
        qres.select(
            query_id_col, "ivf_list", F.explode(lut_blocks).alias("__b")
        )
        .select(
            query_id_col,
            "ivf_list",
            F.col("__b.block").alias("block"),
            F.col("__b.subvec").alias("subvec"),
        )
        .join(F.broadcast(codebooks), "block")
        .select(
            query_id_col,
            "ivf_list",
            "block",
            "code",
            sq_l2(F.col("subvec"), F.col("vec")).alias("__pd2"),
        )
    )
    joined = (
        codes.join(F.broadcast(lut), ["ivf_list", "block", "code"])
        .groupBy(query_id_col, item_id_col)
        .agg(
            F.round(F.sum(F.col("__pd2").cast("decimal(38,12)")), 6)
            .cast("double")
            .alias("adc_d2")
        )
    )
    return windowed_topk(
        joined,
        query_id_col,
        [F.col("adc_d2"), F.col(item_id_col)],
        k_top,
        rank_col="rank",
    )
