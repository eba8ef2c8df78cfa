"""Similarity-engine query surface (SURVEY.md §2.10, §7 Phase D).

``cosine_topk_embeddings`` runs the blocked mapInPandas kernel;
``cosine_topk_declarative`` runs the pure-Catalyst crossJoin variant;
``peer_search_hybrid_topk`` is Stage-1 parity end-to-end (features →
L2-normalize → hybrid blend → threshold → top-K → attribute join-back).
All three are oracle-checked (DuckDB ``list_cosine_similarity`` / an
explicit SQL transliteration of the score formula).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.hybrid import hybrid_topk
from prod_recommendation_pyspark_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_crossjoin,
    l2_normalize,
)
from prod_recommendation_pyspark_spark.queries.registry import register
from prod_recommendation_pyspark_spark.sources.catalog import Catalog

W_HOPS, W_HAVS = 0.399, 0.001  # search_ranking_peers.py:608-609
W_COS = 1.0 - W_HOPS - W_HAVS  # == 0.6 exactly in IEEE754
TOPK_PEERS = 15  # search_ranking_peers.py:613
THRESHOLD = 0.0  # search_ranking_peers.py:612


@register(
    "cosine_topk_embeddings",
    sql="""
    WITH pairs AS (
        SELECT a.vec_id AS tgt_id, b.vec_id AS nbr_id,
               list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS score
        FROM embeddings a, embeddings b
        WHERE a.vec_id <> b.vec_id),
    ranked AS (
        SELECT tgt_id, nbr_id, score,
               row_number() OVER (PARTITION BY tgt_id ORDER BY score DESC, nbr_id) AS rn
        FROM pairs)
    SELECT tgt_id, nbr_id, round(score, 4) AS score
    FROM ranked WHERE rn <= 10
    ORDER BY tgt_id, nbr_id
    """,
)
def cosine_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-broadcast cosine top-10 self-join over the embeddings
    table — the kernel replacing the reference's
    IndexedRowMatrix.multiply mat-mul (search_ranking_peers.py:238-243).
    One BLAS matmul per Arrow batch, exact argpartition top-k, no
    shuffle."""
    emb = Catalog(spark, sf_dir).table("embeddings")
    norm = l2_normalize(emb, "embedding", "vec")
    # no repartition needed: the cogrouped kernel's grid shuffle
    # spreads left chunks across cores by itself
    left = norm.select(F.col("vec_id").alias("tgt_id"), "vec")
    right = norm.select(F.col("vec_id").alias("nbr_id"), "vec")
    return (
        cosine_topk(
            left, right, "tgt_id", "nbr_id", "vec", k=10, exclude_self=True
        )
        .select("tgt_id", "nbr_id", F.round("score", 4).alias("score"))
        .orderBy("tgt_id", "nbr_id")
    )


@register(
    "cosine_topk_declarative",
    sql="""
    WITH lab AS (SELECT vec_id, label, embedding FROM embeddings),
    pairs AS (
        SELECT a.vec_id AS tgt_id, b.vec_id AS nbr_id,
               list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS score
        FROM lab a JOIN lab b
          ON a.label = b.label AND a.vec_id <> b.vec_id),
    ranked AS (
        SELECT tgt_id, nbr_id, score,
               row_number() OVER (PARTITION BY tgt_id ORDER BY score DESC, nbr_id) AS rn
        FROM pairs)
    SELECT tgt_id, nbr_id, round(score, 4) AS score
    FROM ranked WHERE rn <= 5
    ORDER BY tgt_id, nbr_id
    """,
)
def cosine_topk_declarative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Catalyst variant (zip_with dot product + windowed top-K),
    here with a label-blocked candidate set — the pattern for
    'similarity within a partition key' workloads.  Validates the
    kernel and shows the declarative fallback stays on codegen."""
    emb = Catalog(spark, sf_dir).table("embeddings")
    norm = l2_normalize(emb, "embedding", "vec")
    left = norm.select(F.col("vec_id").alias("tgt_id"), F.col("label").alias("lbl"), "vec")
    right = norm.select(F.col("vec_id").alias("nbr_id"), F.col("label").alias("lbl"), "vec")
    lhs = left.select("tgt_id", "lbl", F.col("vec").alias("__lvec"))
    rhs = right.select("nbr_id", "lbl", F.col("vec").alias("__rvec"))
    pairs = lhs.join(F.broadcast(rhs), on="lbl").filter(
        F.col("tgt_id") != F.col("nbr_id")
    )
    dot = F.aggregate(
        F.zip_with("__lvec", "__rvec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = pairs.withColumn("score", dot).select("tgt_id", "nbr_id", "score")
    from prod_recommendation_pyspark_spark.operators.relational import windowed_topk

    return (
        windowed_topk(scored, "tgt_id", [F.col("score").desc(), F.col("nbr_id")], 5)
        .select("tgt_id", "nbr_id", F.round("score", 4).alias("score"))
        .orderBy("tgt_id", "nbr_id")
    )


def _firmographics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic firmographics-shaped table from
    ``customer`` (FIXTURES.md B1 stand-in): scaled feature vector +
    6-digit industry code + geo coordinates."""
    cust = Catalog(spark, sf_dir).table("customer")
    base = cust.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        (F.col("c_custkey") % 97).cast("double").alias("key_mod"),
        F.concat(F.lit("52"), F.lpad((F.col("c_custkey") % 1000).cast("string"), 4, "0")).alias("naics"),
        ((F.col("c_custkey") % 120) - 60 + 0.25).cast("double").alias("lat"),
        (((F.col("c_custkey") * 7) % 300) - 150 + 0.25).cast("double").alias("lon"),
    )
    stats = base.agg(
        F.min("c_acctbal").alias("bal_mn"),
        F.max("c_acctbal").alias("bal_mx"),
        F.min("key_mod").alias("km_mn"),
        F.max("key_mod").alias("km_mx"),
    )
    scaled = base.crossJoin(F.broadcast(stats)).select(
        "c_custkey",
        "c_name",
        "naics",
        "lat",
        "lon",
        F.array(
            (
                (F.col("c_acctbal") - F.col("bal_mn"))
                / (F.col("bal_mx") - F.col("bal_mn"))
                * 0.8
            ),
            (
                (F.col("key_mod") - F.col("km_mn"))
                / (F.col("km_mx") - F.col("km_mn"))
                * 0.2
            ),
        ).alias("raw_vec"),
    )
    return l2_normalize(scaled, "raw_vec", "vec")


_FIRMO_SQL = """
    base AS (
        SELECT c_custkey, c_name, c_acctbal,
               CAST(c_custkey % 97 AS DOUBLE) AS key_mod,
               '52' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 4, '0') AS naics,
               CAST((c_custkey % 120) - 60 + 0.25 AS DOUBLE) AS lat,
               CAST(((c_custkey * 7) % 300) - 150 + 0.25 AS DOUBLE) AS lon
        FROM customer),
    stats AS (SELECT min(c_acctbal) bal_mn, max(c_acctbal) bal_mx,
                     min(key_mod) km_mn, max(key_mod) km_mx FROM base),
    feat AS (
        SELECT c_custkey, c_name, naics, lat, lon,
               (c_acctbal - bal_mn) / (bal_mx - bal_mn) * CAST(0.8 AS DOUBLE) AS f0,
               (key_mod - km_mn) / (km_mx - km_mn) * CAST(0.2 AS DOUBLE) AS f1
        FROM base, stats),
    normed AS (
        SELECT c_custkey, c_name, naics, lat, lon,
               CASE WHEN sqrt(f0*f0 + f1*f1) = 0 THEN f0
                    ELSE f0 / sqrt(f0*f0 + f1*f1) END AS v0,
               CASE WHEN sqrt(f0*f0 + f1*f1) = 0 THEN f1
                    ELSE f1 / sqrt(f0*f0 + f1*f1) END AS v1
        FROM feat)
"""

_HOPS_SQL = """
        CASE WHEN length(l.naics) <> 6 OR length(r.naics) <> 6 THEN CAST(-1.0 AS DOUBLE)
             WHEN l.naics = r.naics THEN CAST(1.0 AS DOUBLE)
             WHEN substring(l.naics, 1, 5) = substring(r.naics, 1, 5) THEN CAST(0.8 AS DOUBLE)
             WHEN substring(l.naics, 1, 4) = substring(r.naics, 1, 4) THEN CAST(0.6 AS DOUBLE)
             WHEN substring(l.naics, 1, 3) = substring(r.naics, 1, 3) THEN CAST(0.4 AS DOUBLE)
             WHEN substring(l.naics, 1, 2) = substring(r.naics, 1, 2) THEN CAST(0.19999999999999996 AS DOUBLE)
             WHEN substring(l.naics, 1, 1) = substring(r.naics, 1, 1) THEN CAST(0.0 AS DOUBLE)
             ELSE CAST(0.0 AS DOUBLE) END
"""

_HAVS_SQL = """
        CASE WHEN l.lat IS NULL OR l.lon IS NULL OR r.lat IS NULL OR r.lon IS NULL
             THEN CAST(0.5 AS DOUBLE)
             ELSE 1.0 - (2 * 6373.0 * asin(sqrt(
                    sin(radians(r.lat - l.lat) / 2) * sin(radians(r.lat - l.lat) / 2)
                    + cos(radians(l.lat)) * cos(radians(r.lat))
                    * sin(radians(r.lon - l.lon) / 2) * sin(radians(r.lon - l.lon) / 2)
                  ))) / 20020.0 END
"""


@register(
    "peer_search_hybrid_topk",
    sql=f"""
    WITH {_FIRMO_SQL},
    pairs AS (
        SELECT l.c_custkey AS tgt_custkey, r.c_custkey AS src_custkey,
               l.c_name AS tgt_name, r.c_name AS src_name,
               CAST(0.6 AS DOUBLE) * (l.v0 * r.v0 + l.v1 * r.v1)
               + CAST(0.399 AS DOUBLE) * ({_HOPS_SQL})
               + CAST(0.001 AS DOUBLE) * ({_HAVS_SQL}) AS score
        FROM normed l JOIN normed r
          ON l.c_custkey % 10 = 0 AND r.c_custkey % 10 <> 0),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY tgt_custkey
                                     ORDER BY score DESC, src_custkey) AS rn
        FROM pairs WHERE score >= 0.0)
    SELECT tgt_custkey, src_custkey, tgt_name, src_name, round(score, 4) AS score
    FROM ranked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
)
def peer_search_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-1 parity end-to-end (search_ranking_peers.py:457-571):
    derive firmographics → weighted scaled features → L2-normalize →
    deterministic 10/90 prospect/client split (replacing randomSplit
    U2 for oracle determinism) → blocked hybrid top-15 (cos+hops+havs,
    th=0.0) → join attributes back (J1/J2).

    The kernel never touches the driver: vectors and naics/lat/lon
    side data move executor→executor through the cogroup shuffle
    (fixing the reference's driver-collected closure lists at
    :538-549)."""
    firmo = _firmographics(spark, sf_dir)
    prospects = firmo.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("tgt_custkey"), "vec", "naics", "lat", "lon"
    )
    clients = firmo.filter(F.col("c_custkey") % 10 != 0).select(
        F.col("c_custkey").alias("src_custkey"), "vec", "naics", "lat", "lon"
    )
    peers = hybrid_topk(
        prospects,
        clients,
        "tgt_custkey",
        "src_custkey",
        vec_col="vec",
        naics_col="naics",
        lat_col="lat",
        lon_col="lon",
        k=TOPK_PEERS,
        threshold=THRESHOLD,
        w_hops=W_HOPS,
        w_havs=W_HAVS,
    )
    names = Catalog(spark, sf_dir).table("customer").select("c_custkey", "c_name")
    return (
        peers.join(
            F.broadcast(names.select(F.col("c_custkey").alias("tgt_custkey"),
                                     F.col("c_name").alias("tgt_name"))),
            "tgt_custkey",
            "left",
        )
        .join(
            F.broadcast(names.select(F.col("c_custkey").alias("src_custkey"),
                                     F.col("c_name").alias("src_name"))),
            "src_custkey",
            "left",
        )
        .select(
            "tgt_custkey",
            "src_custkey",
            "tgt_name",
            "src_name",
            F.round("score", 4).alias("score"),
        )
        .orderBy("tgt_custkey", "src_custkey")
    )


# re-exported for tests
__all__ = [
    "cosine_topk_embeddings",
    "cosine_topk_declarative",
    "peer_search_hybrid_topk",
    "cosine_topk_crossjoin",
]


# ---------------------------------------------------------------------------
# ANN: multi-table random-hyperplane LSH, multi-probe, exact cosine re-rank
# ---------------------------------------------------------------------------

from prod_recommendation_pyspark_spark.operators.similarity import (  # noqa: E402
    ann_lsh_topk,
    random_hyperplane_tables,
)

_ANN_DIM, _ANN_PLANES_N, _ANN_TABLES_N, _ANN_SEED, _ANN_K = 64, 4, 4, 7, 5
_ANN_TABLES = random_hyperplane_tables(_ANN_DIM, _ANN_PLANES_N, _ANN_TABLES_N, _ANN_SEED)


def _plane_dot_sql(plane: list[float]) -> str:
    # left-assoc `+` chain — same IEEE754 fold order as the Spark expr
    return " + ".join(f"v[{i + 1}] * ({w!r})" for i, w in enumerate(plane))


def _sig_sql(planes: list[list[float]]) -> str:
    return "\n             + ".join(
        f"(CASE WHEN {_plane_dot_sql(p)} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )


_ANN_SIGS_SQL = ",\n          ".join(
    f"{_sig_sql(t)} AS sig{i}" for i, t in enumerate(_ANN_TABLES)
)
_ANN_CORPUS_SQL = "\n      UNION ALL ".join(
    f"SELECT vec_id, {i} AS tbl, sig{i} AS sig FROM s"
    for i in range(_ANN_TABLES_N)
)
_ANN_PROBES_SQL = "\n      UNION ALL ".join(
    "SELECT vec_id, {i} AS tbl, unnest([sig{i}, {flips}]) AS sig FROM s WHERE vec_id % 20 = 0".format(
        i=i,
        flips=", ".join(f"xor(sig{i}, {1 << p})" for p in range(_ANN_PLANES_N)),
    )
    for i in range(_ANN_TABLES_N)
)


@register(
    "ann_lsh_topk_embeddings",
    sql=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT vec_id,
          {_ANN_SIGS_SQL}
          FROM e),
    corpus AS ({_ANN_CORPUS_SQL}),
    probes AS ({_ANN_PROBES_SQL}),
    cand AS (
        SELECT DISTINCT p.vec_id AS tgt_id, c.vec_id AS nbr_id
        FROM probes p JOIN corpus c ON p.tbl = c.tbl AND p.sig = c.sig
        WHERE p.vec_id <> c.vec_id),
    scored AS (
        SELECT tgt_id, nbr_id, list_cosine_similarity(a.v, b.v) AS score
        FROM cand JOIN e a ON cand.tgt_id = a.vec_id
                  JOIN e b ON cand.nbr_id = b.vec_id),
    ranked AS (
        SELECT tgt_id, nbr_id, score,
               row_number() OVER (PARTITION BY tgt_id ORDER BY score DESC, nbr_id) AS rn
        FROM scored)
    SELECT tgt_id, nbr_id, round(score, 4) AS score
    FROM ranked WHERE rn <= {_ANN_K}
    ORDER BY tgt_id, nbr_id
    """,
)
def ann_lsh_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via multi-table sign-LSH (4 tables × 4 seeded
    hyperplanes → 16 buckets each), 1-bit multi-probe on the query
    side, pair-dedup across tables, exact cosine re-rank — measured
    ≥0.9 recall vs brute force on this corpus (see
    tests/test_similarity.py).  Fully deterministic: hyperplanes are
    seeded literals shared with the SQL oracle, so bucket assignment
    and results match DuckDB exactly.  At scale the corpus signature
    table is written bucketed by ``(tbl, sig)`` (partition-pruned
    probes); here the bucket join is one shuffle."""
    emb = Catalog(spark, sf_dir).table("embeddings")
    corpus = emb.select(F.col("vec_id").alias("nbr_id"), "embedding")
    qs = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("tgt_id"), "embedding"
    )
    out = ann_lsh_topk(
        corpus, qs, "nbr_id", "tgt_id", "embedding", k=_ANN_K, tables=_ANN_TABLES
    )
    return out.select(
        "tgt_id", "nbr_id", F.round("score", 4).alias("score")
    ).orderBy("tgt_id", "nbr_id")


# ---------------------------------------------------------------------------
# ANN: IVF (inverted-file) with deterministic centroid sample
# ---------------------------------------------------------------------------

from prod_recommendation_pyspark_spark.operators.similarity import (  # noqa: E402
    ann_ivf_topk,
)

_IVF_CENTROID_MOD, _IVF_NPROBE, _IVF_K = 13, 4, 5


@register(
    "ann_ivf_topk_embeddings",
    sql=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e
             WHERE vec_id % {_IVF_CENTROID_MOD} = 0),
    c_assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM e CROSS JOIN cent)
        WHERE rn <= 1),
    q_assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM e CROSS JOIN cent WHERE e.vec_id % 20 = 0)
        WHERE rn <= {_IVF_NPROBE}),
    cand AS (
        SELECT DISTINCT q.vec_id AS tgt_id, c.vec_id AS nbr_id
        FROM q_assign q JOIN c_assign c ON q.centroid_id = c.centroid_id
        WHERE q.vec_id <> c.vec_id),
    scored AS (
        SELECT tgt_id, nbr_id, list_cosine_similarity(a.v, b.v) AS score
        FROM cand JOIN e a ON cand.tgt_id = a.vec_id
                  JOIN e b ON cand.nbr_id = b.vec_id),
    ranked AS (
        SELECT tgt_id, nbr_id, score,
               row_number() OVER (PARTITION BY tgt_id ORDER BY score DESC, nbr_id) AS rn
        FROM scored)
    SELECT tgt_id, nbr_id, round(score, 4) AS score
    FROM ranked WHERE rn <= {_IVF_K}
    ORDER BY tgt_id, nbr_id
    """,
)
def ann_ivf_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5: inverted lists = Voronoi cells of a deterministic
    corpus sample (vec_id % 13) as centroids; corpus vectors live in
    their single nearest list, queries probe their 4 nearest lists,
    exact cosine re-rank.  Data-adaptive complement to the sign-LSH
    tables; fully reproducible → value-oracled in SQL.  At scale the
    corpus is written partitioned by list id, so probing is a
    partition-pruned scan of n_probe lists."""
    emb = Catalog(spark, sf_dir).table("embeddings")
    centroids = emb.filter(F.col("vec_id") % _IVF_CENTROID_MOD == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("vec")
    )
    corpus = emb.select(F.col("vec_id").alias("nbr_id"), "embedding")
    qs = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("tgt_id"), "embedding"
    )
    out = ann_ivf_topk(
        corpus, qs, "nbr_id", "tgt_id", "embedding",
        k=_IVF_K, centroids=centroids, n_probe=_IVF_NPROBE,
    )
    return out.select(
        "tgt_id", "nbr_id", F.round("score", 4).alias("score")
    ).orderBy("tgt_id", "nbr_id")


@register(
    "ann_ivf_derived_density",
    sql=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    md AS (SELECT greatest(1, count(*) // greatest(1,
                   CAST(ceil(sqrt(count(*))) AS BIGINT))) AS m FROM e),
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e
             WHERE vec_id % (SELECT m FROM md) = 0),
    c_assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM e CROSS JOIN cent)
        WHERE rn <= 1),
    q_assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM e CROSS JOIN cent WHERE e.vec_id % 20 = 0)
        WHERE rn <= {_IVF_NPROBE}),
    cand AS (
        SELECT DISTINCT q.vec_id AS tgt_id, c.vec_id AS nbr_id
        FROM q_assign q JOIN c_assign c ON q.centroid_id = c.centroid_id
        WHERE q.vec_id <> c.vec_id),
    scored AS (
        SELECT tgt_id, nbr_id, list_cosine_similarity(a.v, b.v) AS score
        FROM cand JOIN e a ON cand.tgt_id = a.vec_id
                  JOIN e b ON cand.nbr_id = b.vec_id),
    ranked AS (
        SELECT tgt_id, nbr_id, score,
               row_number() OVER (PARTITION BY tgt_id ORDER BY score DESC, nbr_id) AS rn
        FROM scored)
    SELECT tgt_id, nbr_id, round(score, 4) AS score
    FROM ranked WHERE rn <= {_IVF_K}
    ORDER BY tgt_id, nbr_id
    """,
)
def ann_ivf_derived_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the centroid density DERIVED from the corpus
    (``ivf_auto_centroids``: nlist ≈ sqrt(N) via the deterministic
    ``id % (N // ceil(sqrt(N)))`` sample) instead of the pinned
    ``% {_IVF_CENTROID_MOD}`` — the ANN analogue of the rank-window
    derivation replacing the pinned window: any fixed sampling
    constant is eventually the wrong density (at sf1 the registered
    constant is already 1,539 thirteen-row lists; sqrt(N) builds 8x
    faster AND probes at higher recall — SCALE.md round-11 ANN
    appendix).  Same query batch as ``ann_ivf_topk_embeddings`` so
    the two hash-green rows differ ONLY in density.  The oracle
    derives the identical modulus from ``count(*)`` with the same
    floating ceil(sqrt(N)) formulation, so the whole derived index is
    independently replayed — a hash match pins the derivation, the
    assignment, and the probe end to end."""
    from prod_recommendation_pyspark_spark.operators.similarity import (
        ivf_auto_centroids,
    )

    emb = Catalog(spark, sf_dir).table("embeddings")
    corpus = emb.select(F.col("vec_id").alias("nbr_id"), "embedding")
    centroids = ivf_auto_centroids(corpus, "nbr_id", "embedding")
    qs = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("tgt_id"), "embedding"
    )
    out = ann_ivf_topk(
        corpus, qs, "nbr_id", "tgt_id", "embedding",
        k=_IVF_K, centroids=centroids, n_probe=_IVF_NPROBE,
    )
    return out.select(
        "tgt_id", "nbr_id", F.round("score", 4).alias("score")
    ).orderBy("tgt_id", "nbr_id")


@register(
    "ann_ivf_nightly_e2e",
    sql=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e
             WHERE vec_id % {_IVF_CENTROID_MOD} = 0),
    c_assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM e CROSS JOIN cent)
        WHERE rn <= 1),
    q_assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM e CROSS JOIN cent WHERE e.vec_id % 17 = 3)
        WHERE rn <= {_IVF_NPROBE}),
    cand AS (
        SELECT DISTINCT q.vec_id AS tgt_id, c.vec_id AS nbr_id
        FROM q_assign q JOIN c_assign c ON q.centroid_id = c.centroid_id
        WHERE q.vec_id <> c.vec_id),
    scored AS (
        SELECT tgt_id, nbr_id, list_cosine_similarity(a.v, b.v) AS score
        FROM cand JOIN e a ON cand.tgt_id = a.vec_id
                  JOIN e b ON cand.nbr_id = b.vec_id),
    ranked AS (
        SELECT tgt_id, nbr_id, score,
               row_number() OVER (PARTITION BY tgt_id ORDER BY score DESC, nbr_id) AS rn
        FROM scored)
    SELECT tgt_id, nbr_id, round(score, 4) AS score
    FROM ranked WHERE rn <= {_IVF_K}
    ORDER BY tgt_id, nbr_id
    """,
)
def ann_ivf_nightly_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN NIGHTLY-BUILD deployment story end to end, under the
    full value oracle — the vector-index twin of
    ``rank_window_nightly_e2e``: build the IVF artifact
    (``operators.similarity.ivf_index`` — every corpus vector stamped
    with its nearest list, vectors carried along), WRITE it to parquet
    ``partitionBy("ivf_list")`` so each inverted list is a partition
    directory, reload it cold, and serve a query batch off the
    reloaded artifact (``ivf_probe``: broadcast centroid assignment →
    broadcast list fetch → exact cosine re-rank).  A hash-green row
    proves the artifact round-trip is value-lossless (double vectors
    survive parquet bit-exactly) AND that the probe replays the exact
    in-session IVF math — the oracle replays assignment + scoring only
    and knows nothing about the write/reload.

    Scale: the artifact layout is the point — a probe of n_probe
    lists is a partition-pruned scan (the probe side is broadcast, so
    dynamic partition pruning skips unprobed list directories); probe
    cost rides batch × probed-list rows, independent of corpus size.
    Query batch (vec_id % 17 = 3) is disjoint from
    ``ann_ivf_topk_embeddings``'s (% 20 = 0) so the two rows evidence
    different batches."""
    import atexit
    import shutil
    import tempfile

    from prod_recommendation_pyspark_spark.operators.similarity import (
        ivf_index,
        ivf_probe,
    )

    emb = Catalog(spark, sf_dir).table("embeddings")
    centroids = emb.filter(F.col("vec_id") % _IVF_CENTROID_MOD == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("vec")
    )
    corpus = emb.select(F.col("vec_id").alias("nbr_id"), "embedding")
    qs = emb.filter(F.col("vec_id") % 17 == 3).select(
        F.col("vec_id").alias("tgt_id"), "embedding"
    )
    base = tempfile.mkdtemp(prefix="spark_graft_ivf_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    # repartition by list before the partitioned write: one file per
    # inverted list instead of one per (task x list) — at real corpus
    # sizes the unrepartitioned write explodes into tiny files
    ivf_index(corpus, "nbr_id", "embedding", centroids).repartition(
        "ivf_list"
    ).write.mode("overwrite").partitionBy("ivf_list").parquet(
        f"{base}/ivf_index"
    )
    artifact = spark.read.parquet(f"{base}/ivf_index")
    out = ivf_probe(
        qs, artifact, "tgt_id", "nbr_id", centroids,
        vec_col="embedding", k=_IVF_K, n_probe=_IVF_NPROBE,
    )
    return out.select(
        "tgt_id", "nbr_id", F.round("score", 4).alias("score")
    ).orderBy("tgt_id", "nbr_id")


_IVF_DEL_MOD, _IVF_DEL_REM = 23, 5


@register(
    "ann_ivf_delete_e2e",
    sql=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e
             WHERE vec_id % {_IVF_CENTROID_MOD} = 0),
    c_assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM e CROSS JOIN cent
            WHERE e.vec_id % {_IVF_DEL_MOD} <> {_IVF_DEL_REM})
        WHERE rn <= 1),
    q_assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM e CROSS JOIN cent
            WHERE e.vec_id % 17 = 3
              AND e.vec_id % {_IVF_DEL_MOD} <> {_IVF_DEL_REM})
        WHERE rn <= {_IVF_NPROBE}),
    cand AS (
        SELECT DISTINCT q.vec_id AS tgt_id, c.vec_id AS nbr_id
        FROM q_assign q JOIN c_assign c ON q.centroid_id = c.centroid_id
        WHERE q.vec_id <> c.vec_id),
    scored AS (
        SELECT tgt_id, nbr_id, list_cosine_similarity(a.v, b.v) AS score
        FROM cand JOIN e a ON cand.tgt_id = a.vec_id
                  JOIN e b ON cand.nbr_id = b.vec_id),
    ranked AS (
        SELECT tgt_id, nbr_id, score,
               row_number() OVER (PARTITION BY tgt_id ORDER BY score DESC, nbr_id) AS rn
        FROM scored)
    SELECT tgt_id, nbr_id, round(score, 4) AS score
    FROM ranked WHERE rn <= {_IVF_K}
    ORDER BY tgt_id, nbr_id
    """,
)
def ann_ivf_delete_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DELETE half of the ANN artifact lifecycle (round-11 verdict
    #1): the nightly artifact is built and written over the FULL
    corpus, a takedown set (vec_id % 23 == 5) lands as a
    TOMBSTONE table, and the serving probe anti-joins it — a deleted
    vector can never surface as a neighbor between rebuilds.  The
    ORACLE knows nothing about tombstones: it replays a
    frozen-centroid REBUILD on the surviving corpus (the centroid set
    stays the full-corpus derivation — deleting a centroid's source
    vector removes its index ROW, not the list it anchors), so a
    hash-green row proves tombstone-probe ≡ rebuild-minus-deleted
    exactly — the property that makes the intraday delete semantically
    honest rather than best-effort.  ``ivf_compact`` (the anti-join as
    a rewrite job) is pinned equal to both by pytest
    (tests/test_artifact_lifecycle.py).

    Scale: the tombstone set is takedown-sized and broadcast; the
    probe's partition-pruned list fetch is unchanged — delete cost is
    one anti-join on the fetched lists, never a corpus pass.  The
    query batch excludes tombstoned ids (a deleted document does not
    issue queries); centroids are the standard frozen ``% 13``
    derivation shared with ``ann_ivf_nightly_e2e``."""
    import atexit
    import shutil
    import tempfile

    from prod_recommendation_pyspark_spark.operators.similarity import (
        ivf_index,
        ivf_probe,
    )

    emb = Catalog(spark, sf_dir).table("embeddings")
    centroids = emb.filter(F.col("vec_id") % _IVF_CENTROID_MOD == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("vec")
    )
    corpus = emb.select(F.col("vec_id").alias("nbr_id"), "embedding")
    tombs = corpus.filter(
        F.col("nbr_id") % _IVF_DEL_MOD == _IVF_DEL_REM
    ).select("nbr_id")
    qs = emb.filter(
        (F.col("vec_id") % 17 == 3)
        & (F.col("vec_id") % _IVF_DEL_MOD != _IVF_DEL_REM)
    ).select(F.col("vec_id").alias("tgt_id"), "embedding")
    base = tempfile.mkdtemp(prefix="spark_graft_ivf_del_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    ivf_index(corpus, "nbr_id", "embedding", centroids).repartition(
        "ivf_list"
    ).write.mode("overwrite").partitionBy("ivf_list").parquet(
        f"{base}/ivf_index"
    )
    artifact = spark.read.parquet(f"{base}/ivf_index")
    out = ivf_probe(
        qs, artifact, "tgt_id", "nbr_id", centroids,
        vec_col="embedding", k=_IVF_K, n_probe=_IVF_NPROBE,
        tombstones=tombs,
    )
    return out.select(
        "tgt_id", "nbr_id", F.round("score", 4).alias("score")
    ).orderBy("tgt_id", "nbr_id")


@register(
    "ann_ivf_compact_rewrite_e2e",
    sql=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e
             WHERE vec_id % {_IVF_CENTROID_MOD} = 0),
    c_assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM e CROSS JOIN cent
            WHERE e.vec_id % {_IVF_DEL_MOD} <> {_IVF_DEL_REM})
        WHERE rn <= 1),
    q_assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM e CROSS JOIN cent
            WHERE e.vec_id % 17 = 3
              AND e.vec_id % {_IVF_DEL_MOD} <> {_IVF_DEL_REM})
        WHERE rn <= {_IVF_NPROBE}),
    cand AS (
        SELECT DISTINCT q.vec_id AS tgt_id, c.vec_id AS nbr_id
        FROM q_assign q JOIN c_assign c ON q.centroid_id = c.centroid_id
        WHERE q.vec_id <> c.vec_id),
    scored AS (
        SELECT tgt_id, nbr_id, list_cosine_similarity(a.v, b.v) AS score
        FROM cand JOIN e a ON cand.tgt_id = a.vec_id
                  JOIN e b ON cand.nbr_id = b.vec_id),
    ranked AS (
        SELECT tgt_id, nbr_id, score,
               row_number() OVER (PARTITION BY tgt_id ORDER BY score DESC, nbr_id) AS rn
        FROM scored)
    SELECT tgt_id, nbr_id, round(score, 4) AS score
    FROM ranked WHERE rn <= {_IVF_K}
    ORDER BY tgt_id, nbr_id
    """,
)
def ann_ivf_compact_rewrite_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPACTION of the written ANN artifact, end to end under the
    rebuild-minus-deleted value oracle — the rewrite-job half of the
    delete lifecycle (``ann_ivf_delete_e2e`` pins the probe-time
    anti-join; this pins the PERSISTED result of running the
    compaction): build + write the full artifact, run
    ``ivf_compact_rewrite`` (PARTIAL rewrite — only list partitions
    holding tombstoned rows are replaced, under dynamic partition
    overwrite; fully-emptied lists are dropped through the Hadoop
    FileSystem API; unaffected lists' files untouched,
    mtime-pytest-pinned), reload the artifact cold, and probe WITHOUT
    tombstones.  A hash-green row proves the partial rewrite is
    value-lossless: the compacted artifact serves exactly what a
    frozen-centroid rebuild without the deleted rows would serve.

    Scale: compaction I/O rides the affected lists (takedown-sized),
    not the corpus — the property that makes intraday compaction
    viable at 100 TB where a full rewrite is a nightly-sized job."""
    import atexit
    import shutil
    import tempfile

    from prod_recommendation_pyspark_spark.operators.similarity import (
        ivf_compact_rewrite,
        ivf_index,
        ivf_probe,
    )

    emb = Catalog(spark, sf_dir).table("embeddings")
    centroids = emb.filter(F.col("vec_id") % _IVF_CENTROID_MOD == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("vec")
    )
    corpus = emb.select(F.col("vec_id").alias("nbr_id"), "embedding")
    tombs = corpus.filter(
        F.col("nbr_id") % _IVF_DEL_MOD == _IVF_DEL_REM
    ).select("nbr_id")
    qs = emb.filter(
        (F.col("vec_id") % 17 == 3)
        & (F.col("vec_id") % _IVF_DEL_MOD != _IVF_DEL_REM)
    ).select(F.col("vec_id").alias("tgt_id"), "embedding")
    base = tempfile.mkdtemp(prefix="spark_graft_ivf_cr_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    path = f"{base}/ivf_index"
    ivf_index(corpus, "nbr_id", "embedding", centroids).repartition(
        "ivf_list"
    ).write.mode("overwrite").partitionBy("ivf_list").parquet(path)
    ivf_compact_rewrite(spark, path, tombs, "nbr_id")
    artifact = spark.read.parquet(path)
    out = ivf_probe(
        qs, artifact, "tgt_id", "nbr_id", centroids,
        vec_col="embedding", k=_IVF_K, n_probe=_IVF_NPROBE,
    )
    return out.select(
        "tgt_id", "nbr_id", F.round("score", 4).alias("score")
    ).orderBy("tgt_id", "nbr_id")


_IVF_UPD_MOD, _IVF_UPD_REM = 19, 6


@register(
    "ann_ivf_update_e2e",
    sql=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e
             WHERE vec_id % {_IVF_CENTROID_MOD} = 0),
    e2 AS (SELECT vec_id,
                  CASE WHEN vec_id % {_IVF_UPD_MOD} = {_IVF_UPD_REM}
                       THEN list_reverse(v) ELSE v END AS v
           FROM e),
    c_assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e2.vec_id, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY e2.vec_id
                       ORDER BY list_cosine_similarity(e2.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM e2 CROSS JOIN cent)
        WHERE rn <= 1),
    q_assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e2.vec_id, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY e2.vec_id
                       ORDER BY list_cosine_similarity(e2.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM e2 CROSS JOIN cent WHERE e2.vec_id % 17 = 3)
        WHERE rn <= {_IVF_NPROBE}),
    cand AS (
        SELECT DISTINCT q.vec_id AS tgt_id, c.vec_id AS nbr_id
        FROM q_assign q JOIN c_assign c ON q.centroid_id = c.centroid_id
        WHERE q.vec_id <> c.vec_id),
    scored AS (
        SELECT tgt_id, nbr_id, list_cosine_similarity(a.v, b.v) AS score
        FROM cand JOIN e2 a ON cand.tgt_id = a.vec_id
                  JOIN e2 b ON cand.nbr_id = b.vec_id),
    ranked AS (
        SELECT tgt_id, nbr_id, score,
               row_number() OVER (PARTITION BY tgt_id ORDER BY score DESC, nbr_id) AS rn
        FROM scored)
    SELECT tgt_id, nbr_id, round(score, 4) AS score
    FROM ranked WHERE rn <= {_IVF_K}
    ORDER BY tgt_id, nbr_id
    """,
)
def ann_ivf_update_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE on the ANN artifact — the last cell of the CRUD matrix
    (insert: ``ann_ivf_incremental_insert``; delete:
    ``ann_ivf_delete_e2e``; compaction: ``ann_ivf_compact_rewrite_e2e``)
    — composed from the two halves already pinned: a document whose
    vector CHANGED between nightly builds (vec_id % 19 == 6, new
    vector = the reversed embedding — deterministic and
    SQL-replayable) is TOMBSTONED out of the artifact and its new
    version re-inserted under the FROZEN centroid table, exactly the
    intraday-arrival path.  Because assignment is per-row under
    frozen centroids, delete+reinsert ≡ a rebuild over the updated
    corpus with the same centroids — which is precisely what the
    oracle replays (e2 = the post-update corpus; cent = the ORIGINAL
    pre-update centroid snapshot, the frozen-centroid semantics: a
    centroid keeps anchoring its list even after its source vector
    updates, until the nightly re-derivation).

    The query batch probes with post-update vectors too — an updated
    document queries as its new self.  Scale: the update touches
    |updated| rows on both halves (broadcast anti-join + a
    |updated|-row assignment); nothing rides the corpus."""
    import atexit
    import shutil
    import tempfile

    from prod_recommendation_pyspark_spark.operators.similarity import (
        ivf_compact,
        ivf_index,
        ivf_probe,
    )

    emb = Catalog(spark, sf_dir).table("embeddings")
    centroids = emb.filter(F.col("vec_id") % _IVF_CENTROID_MOD == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("vec")
    )
    corpus = emb.select(F.col("vec_id").alias("nbr_id"), "embedding")
    updated = corpus.filter(
        F.col("nbr_id") % _IVF_UPD_MOD == _IVF_UPD_REM
    ).select("nbr_id", F.reverse("embedding").alias("embedding"))
    base = tempfile.mkdtemp(prefix="spark_graft_ivf_upd_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    ivf_index(corpus, "nbr_id", "embedding", centroids).repartition(
        "ivf_list"
    ).write.mode("overwrite").partitionBy("ivf_list").parquet(
        f"{base}/ivf_index"
    )
    artifact = spark.read.parquet(f"{base}/ivf_index")
    # UPDATE = tombstone the stale rows + frozen-centroid reinsert
    grown = ivf_compact(
        artifact, updated.select("nbr_id"), "nbr_id"
    ).unionByName(ivf_index(updated, "nbr_id", "embedding", centroids))
    post = corpus.join(
        updated.withColumnRenamed("embedding", "__new"), "nbr_id", "left"
    ).select(
        "nbr_id", F.coalesce("__new", "embedding").alias("embedding")
    )
    qs = post.filter(F.col("nbr_id") % 17 == 3).select(
        F.col("nbr_id").alias("tgt_id"), "embedding"
    )
    out = ivf_probe(
        qs, grown, "tgt_id", "nbr_id", centroids,
        vec_col="embedding", k=_IVF_K, n_probe=_IVF_NPROBE,
    )
    return out.select(
        "tgt_id", "nbr_id", F.round("score", 4).alias("score")
    ).orderBy("tgt_id", "nbr_id")


# ---------------------------------------------------------------------------
# Candidate-pruned peer search (VERDICT r2 #1): NAICS blocking ∪ equi-depth
# quantile blocking on the angle proxy (round-7 replacement for the sign-LSH
# arm — 2-D all-positive vectors collapse sign-LSH into a handful of giant
# buckets: measured 19.2M of 20.25M pairs "pruned" at sf0.1, i.e. no
# pruning; the quantile arm measures 2.87M candidates at recall 1.0000)
# ---------------------------------------------------------------------------

from prod_recommendation_pyspark_spark.operators.hybrid import (  # noqa: E402
    hybrid_topk_pruned,
)

_PRUNE_QBUCKETS, _PRUNE_PREFIX = 64, 4


def _pruned_cte() -> str:
    """Shared CTE chain computing the pruned top-K in ANSI SQL:
    firmographics → prospect/client split → candidates (4-digit NAICS
    block ∪ equi-depth angle-proxy bucket ±1) → exact hybrid score on
    candidates → per-prospect top-15.

    The bucket value replays Spark's expression exactly —
    ``v1 / sqrt(v0·v0 + v1·v1)`` (the re-normalization is deliberate:
    identical correctly-rounded IEEE ops on identical inputs give
    bit-identical bucket keys), splits are exact ``quantile_cont``
    (bit-parity with Spark ``percentile`` verified), and the ±1
    neighbor probe absorbs any residual boundary placement."""
    b = _PRUNE_QBUCKETS
    qlist = ", ".join(str(i / b) for i in range(1, b))
    return f"""
    varr AS (SELECT c_custkey, c_name, naics, lat, lon, v0, v1, [v0, v1] AS v,
                    v1 / sqrt(v0 * v0 + v1 * v1) AS v1n
             FROM normed),
    pros AS (SELECT * FROM varr WHERE c_custkey % 10 = 0),
    clis AS (SELECT * FROM varr WHERE c_custkey % 10 <> 0),
    qsplit AS (SELECT quantile_cont(v1n, [{qlist}]) AS s FROM clis),
    cqb AS (SELECT c_custkey, len(list_filter(q.s, x -> x <= v1n)) AS qb
            FROM clis CROSS JOIN qsplit q),
    pqb AS (SELECT c_custkey, qb + d.d AS qb
            FROM (SELECT c_custkey,
                         len(list_filter(q.s, x -> x <= v1n)) AS qb
                  FROM pros CROSS JOIN qsplit q) p
            CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) d),
    cand AS (
        SELECT DISTINCT tgt, src FROM (
            SELECT l.c_custkey AS tgt, r.c_custkey AS src
            FROM pros l JOIN clis r
              ON substring(l.naics, 1, {_PRUNE_PREFIX}) = substring(r.naics, 1, {_PRUNE_PREFIX})
            UNION ALL
            SELECT p.c_custkey AS tgt, c.c_custkey AS src
            FROM pqb p JOIN cqb c USING (qb)
        )),
    pruned_scored AS (
        SELECT cand.tgt AS tgt_custkey, cand.src AS src_custkey,
               CAST(0.6 AS DOUBLE) * (l.v0 * r.v0 + l.v1 * r.v1)
               + CAST(0.399 AS DOUBLE) * ({_HOPS_SQL})
               + CAST(0.001 AS DOUBLE) * ({_HAVS_SQL}) AS score
        FROM cand JOIN varr l ON cand.tgt = l.c_custkey
                  JOIN varr r ON cand.src = r.c_custkey),
    pruned_ranked AS (
        SELECT tgt_custkey, src_custkey, score,
               row_number() OVER (PARTITION BY tgt_custkey
                                  ORDER BY score DESC, src_custkey) AS rn
        FROM pruned_scored WHERE score >= 0.0)
"""


def _pruned_spark(spark: SparkSession, sf_dir: str):
    firmo = _firmographics(spark, sf_dir)
    prospects = firmo.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("tgt_custkey"), "vec", "naics", "lat", "lon"
    )
    clients = firmo.filter(F.col("c_custkey") % 10 != 0).select(
        F.col("c_custkey").alias("src_custkey"), "vec", "naics", "lat", "lon"
    )
    return hybrid_topk_pruned(
        prospects,
        clients,
        "tgt_custkey",
        "src_custkey",
        vec_col="vec",
        naics_col="naics",
        lat_col="lat",
        lon_col="lon",
        k=TOPK_PEERS,
        threshold=THRESHOLD,
        w_hops=W_HOPS,
        w_havs=W_HAVS,
        tables=[],
        naics_prefix_len=_PRUNE_PREFIX,
        quantile_buckets=_PRUNE_QBUCKETS,
    )


@register(
    "peer_search_hybrid_topk_pruned",
    sql=f"""
    WITH {_FIRMO_SQL},
    {_pruned_cte()}
    SELECT tgt_custkey, src_custkey, round(score, 4) AS score
    FROM pruned_ranked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
    negative_result=True,
)
def peer_search_hybrid_topk_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-1 peer search via the round-7 block/bucket prune:
    candidate pairs from a 4-digit industry-prefix block join ∪
    equi-depth quantile blocking on the normalized angle proxy (64
    exact-percentile buckets, prospects probing bucket ±1), exact
    hybrid scoring on candidates only, per-prospect top-15.  Measured
    at sf0.1: 2.87M candidates of 20.25M possible (7× prune) at
    recall 1.0000.

    A DOCUMENTED NEGATIVE RESULT for scale (round 9), DEREGISTERED
    from the driver registry in round 13 (verdict #3): both arms are
    constant-factor prunes (the full 4-digit block product is
    pairs/10 on this data; fixed 64 buckets are 3·pairs/64), so
    candidate volume stays QUADRATIC — measured at sf1 it ran 672s
    vs the exact kernel's ~170-205s, and re-sweeping it every round
    cost 6.6s for a lesson already on file.  The production path is
    ``peer_search_rank_window_topk`` (linear candidates; 22.7s at sf1
    at recall 1.0000 — SCALE.md round-9 appendix).  Still
    value-oracled end-to-end for manual replay via
    ``registry.NEGATIVE_RESULTS`` (the SQL replicates splits,
    bucketing, and scoring bit-for-bit, driver-green r10-r12);
    ``peer_search_pruned_recall`` remains registered and quantifies
    the prune's recall vs the exact kernel every sweep."""
    return (
        _pruned_spark(spark, sf_dir)
        .select("tgt_custkey", "src_custkey", F.round("score", 4).alias("score"))
        .orderBy("tgt_custkey", "src_custkey")
    )


_EXACT_PAIRS_CTE = f"""
    exact_scored AS (
        SELECT l.c_custkey AS tgt_custkey, r.c_custkey AS src_custkey,
               CAST(0.6 AS DOUBLE) * (l.v0 * r.v0 + l.v1 * r.v1)
               + CAST(0.399 AS DOUBLE) * ({_HOPS_SQL})
               + CAST(0.001 AS DOUBLE) * ({_HAVS_SQL}) AS score
        FROM normed l JOIN normed r
          ON l.c_custkey % 10 = 0 AND r.c_custkey % 10 <> 0),
    exact_ranked AS (
        SELECT tgt_custkey, src_custkey,
               row_number() OVER (PARTITION BY tgt_custkey
                                  ORDER BY score DESC, src_custkey) AS rn
        FROM exact_scored WHERE score >= 0.0),
    exact_pairs AS (
        SELECT tgt_custkey, src_custkey FROM exact_ranked WHERE rn <= 15)
"""


@register(
    "peer_search_pruned_recall",
    sql=f"""
    WITH {_FIRMO_SQL},
    {_pruned_cte()},
    pruned_pairs AS (
        SELECT tgt_custkey, src_custkey FROM pruned_ranked WHERE rn <= 15),
    {_EXACT_PAIRS_CTE},
    counts AS (
        SELECT (SELECT count(*) FROM exact_pairs) AS n_exact,
               (SELECT count(*) FROM pruned_pairs) AS n_pruned,
               (SELECT count(*) FROM exact_pairs e JOIN pruned_pairs p
                 ON e.tgt_custkey = p.tgt_custkey
                AND e.src_custkey = p.src_custkey) AS n_common)
    SELECT n_exact, n_pruned, n_common,
           round(CAST(n_common AS DOUBLE) / n_exact, 4) AS recall,
           CAST(n_common AS DOUBLE) / n_exact >= 0.8 AS recall_ok
    FROM counts
    """,
)
def peer_search_pruned_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned-vs-exact evidence row (VERDICT r2 #1 'Done' criterion):
    runs BOTH the exact blocked kernel and the candidate-pruned path,
    and emits one row of set statistics — |exact top-15|, |pruned
    top-15|, their intersection, recall, and a recall ≥ 0.8 contract
    boolean.  Value-oracled on all five columns: DuckDB recomputes the
    exact and pruned pair sets independently, so a hash match proves
    both Spark paths AND the measured recall."""
    firmo = _firmographics(spark, sf_dir)
    prospects = firmo.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("tgt_custkey"), "vec", "naics", "lat", "lon"
    )
    clients = firmo.filter(F.col("c_custkey") % 10 != 0).select(
        F.col("c_custkey").alias("src_custkey"), "vec", "naics", "lat", "lon"
    )
    exact = hybrid_topk(
        prospects, clients, "tgt_custkey", "src_custkey",
        vec_col="vec", naics_col="naics", lat_col="lat", lon_col="lon",
        k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
    ).select("tgt_custkey", "src_custkey", F.lit(1).alias("__e"))
    pruned = _pruned_spark(spark, sf_dir).select(
        "tgt_custkey", "src_custkey", F.lit(1).alias("__p")
    )
    # one full outer join → one pass over each side, no recompute
    joined = exact.join(pruned, ["tgt_custkey", "src_custkey"], "full")
    n_common = F.count(F.when(F.col("__e").isNotNull() & F.col("__p").isNotNull(), 1))
    n_exact = F.count("__e")
    n_pruned = F.count("__p")
    return joined.agg(
        n_exact.alias("n_exact"),
        n_pruned.alias("n_pruned"),
        n_common.alias("n_common"),
        F.round(
            n_common.cast("double") / n_exact, 4
        ).alias("recall"),
        (n_common.cast("double") / n_exact >= 0.8).alias("recall_ok"),
    )


# Rank-window pruned peer search (round 9): the LINEAR-candidate
# production path.  The block/bucket prune above is constant-factor —
# its candidate set stays quadratic (measured sf1: 672s vs the exact
# kernel's ~170-205s).  This variant decomposes by NAICS prefix LEVEL
# (hops is constant per level) and takes each prospect's sorted-
# neighborhood by angle within each level block — candidates are
# O(L · levels · window), independent of the client count.
# window is the recall knob (linear cost): measured at sf1 (2.02e9
# pairs) window 64 → recall 0.9924 @ 9.0s, 256 → 1.0000 @ 22.7s,
# 1024 → 1.0000 @ 64.3s; 256 = 17× the top-k, exact at every
# measured scale, 9× faster than the exact kernel at sf1.
_RANK_WINDOW = 256


def _rank_sides(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(prospects, clients) for the rank-window queries, on a
    localCheckpointed firmographics subtree: the scan + min/max stats
    agg + normalize feeds both candidate arms AND both scoring sides —
    unmaterialized it re-runs ~6× (plan audit).  Checkpoint blocks
    live outside the CacheManager and are reclaimed by the
    ContextCleaner when the result frames are GC'd, so repeated
    DIRECT calls (tests, notebooks, serving loops) cannot accumulate
    cached frames the way persist() did (round-9 advice); registry
    dispatch additionally clearCache()s on entry."""
    firmo = _firmographics(spark, sf_dir).localCheckpoint()
    prospects = firmo.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("tgt_custkey"), "vec", "naics", "lat", "lon"
    )
    clients = firmo.filter(F.col("c_custkey") % 10 != 0).select(
        F.col("c_custkey").alias("src_custkey"), "vec", "naics", "lat", "lon"
    )
    return prospects, clients


#: Derived rank windows memoized per (corpus snapshot, floor) for the
#: SESSION — the batch-query half of the nightly amortization
#: (round-11 verdict #2): the first invocation against a snapshot
#: runs the calibration (calibrate-and-run); every later invocation
#: reuses the derived window, mirroring how the serving path derives
#: once at index build and stamps ``__w``.  sf_dir IS the snapshot
#: identity here (driver fixtures are immutable per path); a live
#: deployment would key by snapshot version/date.  The derived window
#: is a pure function of (corpus, params), so hits cannot change any
#: result — re-verified by the unchanged value oracles.
_DERIVED_WINDOW_CACHE: dict[tuple, int] = {}


def _rank_spark(
    spark: SparkSession, sf_dir: str, window: int | None = None,
    min_window: int = 64,
) -> DataFrame:
    """Shared body of the rank-window queries.  ``window=None`` runs
    the data-driven derivation (floor ``min_window``) MEMOIZED per
    corpus snapshot via ``_DERIVED_WINDOW_CACHE``; the production
    query passes ``min_window=_RANK_WINDOW`` — derive-then-floor, so
    the derivation can only RAISE the window above the measured-exact
    256, never lower it (round-10 verdict #2)."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        rank_window_candidates,
    )

    prospects, clients = _rank_sides(spark, sf_dir)
    cand = rank_window_candidates(
        prospects,
        clients,
        "tgt_custkey",
        "src_custkey",
        window=window,
        min_window=min_window,
        k=TOPK_PEERS,
        threshold=THRESHOLD,
        w_hops=W_HOPS,
        w_havs=W_HAVS,
        window_cache=_DERIVED_WINDOW_CACHE,
        cache_key=(sf_dir, min_window),
    )
    return hybrid_topk_pruned(
        prospects,
        clients,
        "tgt_custkey",
        "src_custkey",
        vec_col="vec",
        naics_col="naics",
        lat_col="lat",
        lon_col="lon",
        k=TOPK_PEERS,
        threshold=THRESHOLD,
        w_hops=W_HOPS,
        w_havs=W_HAVS,
        candidates=cand,
        dim=2,
    )


def _rank_cte(cli_filter: str = "") -> str:
    """ANSI replay of ``rank_window_candidates`` + exact scoring:
    per level (0 = global, p = p-char prefix block), clients are
    ranked by the (angle, id) total order; each prospect's insertion
    point is the count of clients strictly before it; candidates are
    the clients within ±window positions.  The correlated insertion
    count is O(|pros|·levels·|clis|) — fine at oracle scale, and it
    replays Spark's running-sum insertion EXACTLY (same strict-less
    comparator on (v1n, c_custkey)).

    DATA INVARIANT this CTE relies on: ``_firmographics`` synthesizes
    always-well-formed 6-char NAICS codes, so the oracle omits the
    Spark path's malformed arm (lvl −1) and NULL/length handling —
    levels 0..6 cover everything.  If a future fixture ever emits
    NULL or non-6-char codes, extend ``lvls``/``blk`` with the −1
    sentinel arm (see ``_arm_clients``) BEFORE chasing a confusing
    hash mismatch; the Spark side already handles malformed codes
    (pytest ``test_rank_window_covers_malformed_codes``).

    ``cli_filter`` (an extra ``AND ...`` predicate on the clis CTE)
    replays a DELETED client corpus — ``rank_window_delete_e2e``'s
    rebuild-minus-deleted oracle: ranks, insertion points, and
    windows are all recomputed over the surviving clients, exactly
    what ``rank_window_compact`` produces on the Spark side."""
    w = _RANK_WINDOW
    return f"""
    varr AS (SELECT c_custkey, c_name, naics, lat, lon, v0, v1,
                    v1 / sqrt(v0 * v0 + v1 * v1) AS v1n
             FROM normed),
    pros AS (SELECT * FROM varr WHERE c_custkey % 10 = 0),
    clis AS (SELECT * FROM varr WHERE c_custkey % 10 <> 0{cli_filter}),
    lvls AS (SELECT unnest(range(0, 7)) AS lvl),
    cpos AS (SELECT l.lvl,
                    CASE WHEN l.lvl = 0 THEN ''
                         ELSE substring(c.naics, 1, CAST(l.lvl AS INTEGER))
                    END AS blk,
                    c.c_custkey, c.v1n,
                    row_number() OVER (
                        PARTITION BY l.lvl,
                            CASE WHEN l.lvl = 0 THEN ''
                                 ELSE substring(c.naics, 1, CAST(l.lvl AS INTEGER))
                            END
                        ORDER BY c.v1n, c.c_custkey) AS pos
             FROM clis c CROSS JOIN lvls l),
    pins AS (SELECT l.lvl,
                    CASE WHEN l.lvl = 0 THEN ''
                         ELSE substring(p.naics, 1, CAST(l.lvl AS INTEGER))
                    END AS blk,
                    p.c_custkey, p.v1n,
                    (SELECT count(*) FROM clis c
                      WHERE (l.lvl = 0 OR substring(c.naics, 1, CAST(l.lvl AS INTEGER))
                                          = substring(p.naics, 1, CAST(l.lvl AS INTEGER)))
                        AND (c.v1n < p.v1n
                             OR (c.v1n = p.v1n AND c.c_custkey < p.c_custkey))
                    ) AS ins
             FROM pros p CROSS JOIN lvls l),
    rcand AS (SELECT DISTINCT p.c_custkey AS tgt, c.c_custkey AS src
              FROM pins p JOIN cpos c ON p.lvl = c.lvl AND p.blk = c.blk
               AND c.pos BETWEEN p.ins - {w - 1} AND p.ins + {w}),
    rank_scored AS (
        SELECT rcand.tgt AS tgt_custkey, rcand.src AS src_custkey,
               CAST(0.6 AS DOUBLE) * (l.v0 * r.v0 + l.v1 * r.v1)
               + CAST(0.399 AS DOUBLE) * ({_HOPS_SQL})
               + CAST(0.001 AS DOUBLE) * ({_HAVS_SQL}) AS score
        FROM rcand JOIN varr l ON rcand.tgt = l.c_custkey
                   JOIN varr r ON rcand.src = r.c_custkey),
    rank_ranked AS (
        SELECT tgt_custkey, src_custkey, score,
               row_number() OVER (PARTITION BY tgt_custkey
                                  ORDER BY score DESC, src_custkey) AS rn
        FROM rank_scored WHERE score >= 0.0)
"""


@register(
    "peer_search_rank_window_topk",
    sql=f"""
    WITH {_FIRMO_SQL},
    {_rank_cte()}
    SELECT tgt_custkey, src_custkey, round(score, 4) AS score
    FROM rank_ranked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
)
def peer_search_rank_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-1 peer search on the LINEAR-candidate path
    (operators/hybrid.py::rank_window_candidates): per NAICS-prefix
    LEVEL (where the hops term of the hybrid score is constant), each
    prospect takes the ±256 sorted-neighborhood by angle within its
    prefix block, exact-scores only those candidates, and keeps the
    top-15.  Candidate volume is O(prospects · levels · window) —
    INDEPENDENT of client count, unlike the block/bucket prune
    (`peer_search_hybrid_topk_pruned`), whose constant-factor arms
    stay quadratic and measured SLOWER than the exact kernel at sf1
    (672s vs ~170-205s; this path: 22.7s — see SCALE.md round-9 row).

    Exactness: a true top-15 pair at prefix level p is beaten by <15
    same-block pairs on dot+geo (every same-block pair carries hops ≥
    the level's score), and in 2-D non-negative vector space dot is
    monotone in the angle gap, so the pair sits within the ±15
    angle-sorted positions plus the geo-slack padding the window
    provides (window must cover the clients within w_geo/w_dot of the
    k-th within-level dot).  Measured: top-15 sets IDENTICAL to the
    exact blocked kernel at sf0.001/sf0.01/sf0.1 AND sf1 (pytest +
    SCALE.md; at sf1 window 64 reads 0.9924 — 256 is the measured
    exact point, at 17× the top-k).

    Round 11: the window is now DERIVED from the data and floored at
    the measured-exact 256 (derive-then-floor — the derivation can
    only raise the window when a denser corpus needs more, never
    lower it below the proven constant; the pure-derived path is
    registered separately as ``rank_window_derived_parity``).  The
    oracle CTE replays the pinned-256 candidates; both windows exceed
    the true need at every measured scale (SCALE.md round-11
    appendix), so the top-15 is window-invariant and the hash still
    pins full value equality.

    Round 12: the derivation is MEMOIZED per corpus snapshot
    (``_DERIVED_WINDOW_CACHE``) — the first invocation against a
    snapshot is the calibrate-and-run form (the calibration's eager
    jobs execute once), every later invocation reuses the derived
    window and pays only the candidate build, mirroring the nightly
    path's derive-once-at-index-build (round-11 verdict #2).  The
    bench times the COLD form: one-shot batch cost includes the
    calibration by design; the amortized serving wall is the
    ``serving:rank_window_probe`` bench row.

    Reference anchor: the MIN_BATCH loop this replaces
    (search_ranking_peers.py:489-494,606-613)."""
    return (
        _rank_spark(spark, sf_dir, window=None, min_window=_RANK_WINDOW)
        .select(
            "tgt_custkey", "src_custkey", F.round("score", 4).alias("score")
        )
        .orderBy("tgt_custkey", "src_custkey")
    )


@register(
    "rank_window_derived_parity",
    sql=f"""
    WITH {_FIRMO_SQL},
    {_rank_cte()}
    SELECT tgt_custkey, src_custkey, round(score, 4) AS score
    FROM rank_ranked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
)
def rank_window_derived_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DERIVATION-evidence twin of ``peer_search_rank_window_topk``
    (round-10 verdict #1b): run the PURE data-derived window —
    ``rank_window_candidates(window=None)``, floor 64, no 256 pin —
    and pin the top-15 under the SAME full value oracle.  The oracle
    CTE generates candidates at the pinned 256; the derivation
    (operators/hybrid.py::derive_rank_window_stats — deterministic
    sample, auto-widened mod, max-need ×2, power-of-two ladder) must
    land a window that, like 256, exceeds the corpus' true need, so
    the final top-15 is IDENTICAL and hash-checkable.  A hash-green
    row therefore proves the estimator end-to-end: sampling, the
    min-need read-off from the shared rank, the ladder rounding, and
    exact recall of the resulting window — against an independent SQL
    replay, not against the Spark batch path.

    Measured (SCALE.md round-11 appendix): sampled max-need
    15 → 16 → 78 at sf0.01/sf0.1/sf1, deriving window 64 → 64 → 256
    — the derivation rides the growing tie density and lands exactly
    on the measured-exact 256 at sf1 (where the 64 floor reads recall
    0.9924), with end-to-end recall 1.0000 at all three scales."""
    return (
        _rank_spark(spark, sf_dir, window=None)
        .select(
            "tgt_custkey", "src_custkey", F.round("score", 4).alias("score")
        )
        .orderBy("tgt_custkey", "src_custkey")
    )


@register(
    "peer_search_probe_parity",
    sql=f"""
    WITH {_FIRMO_SQL},
    {_rank_cte()}
    SELECT tgt_custkey, src_custkey, round(score, 4) AS score
    FROM rank_ranked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
)
def peer_search_probe_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SERVING-PATH twin of ``peer_search_rank_window_topk``: rank the
    client corpus ONCE into the persistable index
    (operators/hybrid.py::rank_window_index), then answer the prospect
    set in TWO independent probe batches
    (operators/hybrid.py::rank_window_probe) — the index/probe split a
    nightly-built, intraday-served deployment runs, and the shape the
    streaming micro-batch twin reuses per batch.  The probed
    candidates are scored and top-15'd exactly like the batch path,
    so the FULL VALUE ORACLE is the same rank-window CTE: a hash-green
    row proves (a) the index's dense per-arm positions, (b) the
    probe's block-summary insertion arithmetic, and (c) batch-split
    invariance (splitting prospects across probes changes nothing —
    the probe is per-row independent by construction) end-to-end
    against an independent SQL replay, not merely against the batch
    Spark path.

    Scale: the index is (code_len+1)·|R| slim rows built by the
    distributed rank (no single-task sort); each probe batch touches
    a broadcast block summary (|index|/window rows) plus ≤4 window
    blocks per (prospect, arm) — index-lookup I/O, independent of
    corpus size.  Reference anchor: the per-batch scoring loop this
    serves online, search_ranking_peers.py:489-494,536-559."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        rank_window_index,
        rank_window_probe,
    )

    prospects, clients = _rank_sides(spark, sf_dir)
    # build once; localCheckpoint = the "persisted nightly artifact"
    # stand-in (three index references per probe × two probes below)
    index = rank_window_index(
        clients, "src_custkey", window=_RANK_WINDOW
    ).localCheckpoint()
    batches = [
        prospects.filter(F.col("tgt_custkey") % 20 == 0),
        prospects.filter(F.col("tgt_custkey") % 20 != 0),
    ]
    # window intentionally NOT passed: the probe derives it from the
    # index's __w metadata column (round-11 — the window travels WITH
    # the artifact, so a mismatched probe is impossible by default)
    probed = [
        rank_window_probe(b, index, "tgt_custkey", "src_custkey")
        for b in batches
    ]
    cand = probed[0].unionByName(probed[1])
    return (
        hybrid_topk_pruned(
            prospects,
            clients,
            "tgt_custkey",
            "src_custkey",
            vec_col="vec",
            naics_col="naics",
            lat_col="lat",
            lon_col="lon",
            k=TOPK_PEERS,
            threshold=THRESHOLD,
            w_hops=W_HOPS,
            w_havs=W_HAVS,
            candidates=cand, broadcast_sides=True,
            dim=2,
        )
        .select(
            "tgt_custkey", "src_custkey", F.round("score", 4).alias("score")
        )
        .orderBy("tgt_custkey", "src_custkey")
    )


@register(
    "rank_window_nightly_e2e",
    sql=f"""
    WITH {_FIRMO_SQL},
    {_rank_cte()}
    SELECT tgt_custkey, src_custkey, round(score, 4) AS score
    FROM rank_ranked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
)
def rank_window_nightly_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NIGHTLY-BUILD deployment story end to end, under the full
    value oracle: the index is built with ``window=None`` — the build
    window is DERIVED from a calibration prospect frame at index time
    and stamped into the ``__w`` metadata column — and the probe passes
    no window at all (it reads ``__w`` off the artifact).  This is the
    one registered query where NO window constant appears anywhere in
    the Spark path: derivation picks it, the artifact carries it, the
    probe obeys it.  The oracle CTE replays candidates at the pinned
    256; both windows exceed the corpus' true need at every measured
    scale (SCALE.md round-11 appendix), so the top-15 is
    window-invariant and hash-checkable.

    Composes the pieces each already pinned separately:
    ``rank_window_derivation_contract`` (the derived statistic),
    ``peer_search_probe_parity`` (index/probe arithmetic),
    ``rank_window_derived_parity`` (derived-window recall)."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        rank_window_index,
        rank_window_probe,
    )

    prospects, clients = _rank_sides(spark, sf_dir)
    index = rank_window_index(
        clients, "src_custkey", window=None,
        calibration=prospects, calibration_id="tgt_custkey",
        k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
    ).localCheckpoint()
    cand = rank_window_probe(prospects, index, "tgt_custkey", "src_custkey")
    return (
        hybrid_topk_pruned(
            prospects, clients, "tgt_custkey", "src_custkey",
            vec_col="vec", naics_col="naics", lat_col="lat", lon_col="lon",
            k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
            candidates=cand, dim=2, broadcast_sides=True,
        )
        .select(
            "tgt_custkey", "src_custkey", F.round("score", 4).alias("score")
        )
        .orderBy("tgt_custkey", "src_custkey")
    )


@register(
    "rank_window_warm_nightly_e2e",
    sql=f"""
    WITH {_FIRMO_SQL},
    {_rank_cte()}
    SELECT tgt_custkey, src_custkey, round(score, 4) AS score
    FROM rank_ranked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
)
def rank_window_warm_nightly_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WARM-STARTED nightly rebuild end to end (round 16, VERDICT
    r15 #6 — make the round-15 ``prev_window`` optimization visible to
    the driver, not just to a measurement script): night 1 builds the
    index cold (window derived and stamped into ``__w``); night 2
    REBUILDS against the same corpus passing ``prev_window`` = night
    1's ``__w`` read off the artifact — exactly the deployment loop
    the warm start was built for (sf10 steady-state measured 221 →
    116 s, OPTIMIZATION_r15.md §2).  On an undrifted corpus the warm
    check always KEEPS prev (the warm sample is a subset of the full
    sample, so its max-need is ≤ the full pass's — the kept window
    equals what the cold rebuild would derive), so the night-2 probe
    serves the identical top-15 and the full value oracle (the same
    window-invariant pinned-256 CTE as ``rank_window_nightly_e2e``)
    hash-pins the warm path end to end.  The ESCALATION branch (corpus
    drifted past prev) is pytest-pinned on the tie-heavy fixture
    (tests/test_projection_artifact.py warm-start cases)."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        _resolve_probe_window,
        rank_window_index,
        rank_window_probe,
    )

    prospects, clients = _rank_sides(spark, sf_dir)
    night1 = rank_window_index(
        clients, "src_custkey", window=None,
        calibration=prospects, calibration_id="tgt_custkey",
        k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
    ).localCheckpoint()
    prev_w = _resolve_probe_window(night1, None)  # yesterday's __w
    night2 = rank_window_index(
        clients, "src_custkey", window=None,
        calibration=prospects, calibration_id="tgt_custkey",
        k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
        prev_window=prev_w,
    ).localCheckpoint()
    cand = rank_window_probe(prospects, night2, "tgt_custkey", "src_custkey")
    return (
        hybrid_topk_pruned(
            prospects, clients, "tgt_custkey", "src_custkey",
            vec_col="vec", naics_col="naics", lat_col="lat", lon_col="lon",
            k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
            candidates=cand, dim=2, broadcast_sides=True,
        )
        .select(
            "tgt_custkey", "src_custkey", F.round("score", 4).alias("score")
        )
        .orderBy("tgt_custkey", "src_custkey")
    )


@register(
    "rank_window_delete_e2e",
    sql=f"""
    WITH {_FIRMO_SQL},
    {_rank_cte(" AND c_custkey % 9 <> 4")}
    SELECT tgt_custkey, src_custkey, round(score, 4) AS score
    FROM rank_ranked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
)
def rank_window_delete_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DELETE half of the peer-search artifact lifecycle (round-11
    verdict #1): a takedown set of clients (src_custkey % 9 == 4)
    lands as a TOMBSTONE table against the nightly index, the index is
    COMPACTED (``rank_window_compact`` — surviving rows re-ranked over
    their stored ``__v1n`` keys, positions re-densified, no corpus
    rescan), and the window-less probe serves off the compacted
    artifact.  The ORACLE knows nothing about compaction: it replays
    the full rank-window candidate generation + exact scoring on the
    SURVIVING client corpus (``_rank_cte`` with the deleted clients
    filtered out of ``clis``, so ranks, insertion points, and windows
    are all rebuilt-minus-deleted), so a hash-green row proves
    compaction ≡ rebuild end to end under the full value oracle — the
    claim that makes the intraday delete deployable.

    The pre-compaction serving mode (probe-time tombstone anti-join —
    candidates minus deleted pairs, positions unchanged) is
    pytest-pinned separately (tests/test_artifact_lifecycle.py): it
    is the BETWEEN-compactions semantics and deliberately not a
    rebuild, so it pins against the un-tombstoned probe, not this
    oracle."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        rank_window_compact,
        rank_window_index,
        rank_window_probe,
    )

    prospects, clients = _rank_sides(spark, sf_dir)
    index = rank_window_index(clients, "src_custkey", window=_RANK_WINDOW)
    tombs = clients.filter(F.col("src_custkey") % 9 == 4).select(
        "src_custkey"
    )
    # compacted artifact stand-in (localCheckpoint ~ the rewritten
    # parquet): three probe references + the __w resolve read it
    compacted = rank_window_compact(index, tombs).localCheckpoint()
    cand = rank_window_probe(
        prospects, compacted, "tgt_custkey", "src_custkey"
    )
    kept = clients.join(F.broadcast(tombs), "src_custkey", "left_anti")
    return (
        hybrid_topk_pruned(
            prospects, kept, "tgt_custkey", "src_custkey",
            vec_col="vec", naics_col="naics", lat_col="lat", lon_col="lon",
            k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
            candidates=cand, dim=2, broadcast_sides=True,
        )
        .select(
            "tgt_custkey", "src_custkey", F.round("score", 4).alias("score")
        )
        .orderBy("tgt_custkey", "src_custkey")
    )


@register(
    "rank_window_insert_e2e",
    sql=f"""
    WITH {_FIRMO_SQL},
    {_rank_cte()}
    SELECT tgt_custkey, src_custkey, round(score, 4) AS score
    FROM rank_ranked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
)
def rank_window_insert_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT on the peer-search artifact — completing its CRUD matrix
    (delete/compact: ``rank_window_delete_e2e``): the nightly index is
    built on a PARTIAL client corpus (src_custkey % 6 != 5), the
    remaining clients arrive intraday and are merged by
    ``rank_window_insert`` — armed + angle-normalized arrivals
    re-ranked against the STORED slim rows, no rescan of the existing
    corpus — and the window-less probe serves off the grown artifact.
    The ORACLE is the full-corpus rank-window replay (identical to
    the nightly query's): a hash-green row proves
    insert ≡ rebuild-over-the-grown-corpus end to end, the
    corpus-relative-positions analogue of the IVF insert's
    frozen-centroid equivalence (``ann_ivf_incremental_insert``).

    The build window (256) is kept across the insert — tie density
    can rise with growth, so sustained growth re-derives at the next
    nightly build; the ×2 derivation pad covers intraday volumes."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        rank_window_index,
        rank_window_insert,
        rank_window_probe,
    )

    prospects, clients = _rank_sides(spark, sf_dir)
    old = clients.filter(F.col("src_custkey") % 6 != 5)
    arrivals = clients.filter(F.col("src_custkey") % 6 == 5)
    index = rank_window_index(old, "src_custkey", window=_RANK_WINDOW)
    grown = rank_window_insert(index, arrivals, "src_custkey").localCheckpoint()
    cand = rank_window_probe(prospects, grown, "tgt_custkey", "src_custkey")
    return (
        hybrid_topk_pruned(
            prospects, clients, "tgt_custkey", "src_custkey",
            vec_col="vec", naics_col="naics", lat_col="lat", lon_col="lon",
            k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
            candidates=cand, dim=2, broadcast_sides=True,
        )
        .select(
            "tgt_custkey", "src_custkey", F.round("score", 4).alias("score")
        )
        .orderBy("tgt_custkey", "src_custkey")
    )


@register(
    "rank_window_versioned_publish_e2e",
    sql=f"""
    WITH {_FIRMO_SQL},
    {_rank_cte()}
    SELECT tgt_custkey, src_custkey, round(score, 4) AS score
    FROM rank_ranked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
)
def rank_window_versioned_publish_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ATOMIC rebuild publishing for the nightly artifact
    (``sources/writers.py::publish_versioned`` /
    ``readers.py::read_published``): version 1 is an index over a
    STALE partial corpus (yesterday's build, src_custkey % 6 != 5),
    version 2 is tonight's full rebuild; the serving reader resolves
    the newest COMMITTED version — Spark's ``_SUCCESS`` marker lands
    at job commit, so an in-flight or crashed rebuild is invisible
    and probes keep serving N−1 until the commit (pytest-pinned with
    a simulated crash in tests/test_artifact_lifecycle.py).  The
    probe runs off the resolved artifact; the oracle is the
    FULL-corpus rank-window replay, so a hash-green row proves the
    reader resolved v2, the publish round-tripped the index
    losslessly, and the window-less probe (``__w`` off the artifact)
    serves the rebuild exactly.

    This is the glue between the nightly rebuild and the intraday
    CRUD paths: rebuilds land as new versions, tombstones/inserts
    ride within a version, retention is a directory delete.

    Round 15 (r14 verdict #2): each publish carries the CLIENT
    FEATURE SNAPSHOT it was built from as an atomic companion
    (``publish_versioned(companions={"features": ...})``), and the
    serving re-rank reads THAT snapshot back
    (``read_published(companion="features")``, version-pinned to the
    resolved artifact) instead of recomputing the corpus feature
    subtree per probe session — the deployment shape that removed the
    measured +20s-per-probe recompute at sf1.  A hash-green row now
    also proves the companion round-trips bit-exactly: the scores are
    computed from the published features, against an oracle that
    derives them from the raw tables."""
    import atexit
    import shutil
    import tempfile

    from prod_recommendation_pyspark_spark.operators.hybrid import (
        rank_window_index,
        rank_window_probe,
    )
    from prod_recommendation_pyspark_spark.sources.readers import (
        latest_published_version,
        read_published,
    )
    from prod_recommendation_pyspark_spark.sources.writers import (
        publish_versioned,
    )

    prospects, clients = _rank_sides(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="rank_window_versions_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    stale = clients.filter(F.col("src_custkey") % 6 != 5)
    publish_versioned(
        rank_window_index(stale, "src_custkey", window=_RANK_WINDOW),
        f"{base}/index", partition_by=["__lvl"],
        companions={"features": stale},
    )
    publish_versioned(
        rank_window_index(clients, "src_custkey", window=_RANK_WINDOW),
        f"{base}/index", partition_by=["__lvl"],
        companions={"features": clients},
    )
    # resolve ONCE, read artifact + its build's features at that pin
    v = latest_published_version(spark, f"{base}/index")
    artifact = read_published(
        spark, f"{base}/index", version=v
    ).localCheckpoint()
    feats = read_published(
        spark, f"{base}/index", version=v, companion="features"
    )
    cand = rank_window_probe(
        prospects, artifact, "tgt_custkey", "src_custkey"
    )
    return (
        hybrid_topk_pruned(
            prospects, feats, "tgt_custkey", "src_custkey",
            vec_col="vec", naics_col="naics", lat_col="lat", lon_col="lon",
            k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
            candidates=cand, dim=2, broadcast_sides=True,
        )
        .select(
            "tgt_custkey", "src_custkey", F.round("score", 4).alias("score")
        )
        .orderBy("tgt_custkey", "src_custkey")
    )


def _mod_ladder(start: int = 500) -> list[int]:
    """The widening ladder ``_derivation_sample`` walks: start, then
    m = max(1, m // 2) until 1 — replicated here so the oracle replays
    the exact same rungs."""
    mods, m = [], start
    while True:
        mods.append(m)
        if m == 1:
            break
        m = max(1, m // 2)
    return mods


def _derivation_contract_sql() -> str:
    """ANSI replay of the ENTIRE window derivation
    (operators/hybrid.py::derive_rank_window_stats) on top of the
    rank-window CTE's pins/cpos: (1) the widening ladder — counts for
    every mod rung in one scan, first (largest) rung holding ≥
    least(8, |pros|) sampled prospects wins; (2) the sampled exact
    top-15 (same score expression, same (score DESC, src) tie order,
    same ≥0 threshold); (3) each true pair's minimum required window
    across its shared arms — min over co-occurring (lvl, blk) of
    greatest(ins − cpos + 1, cpos − ins), the strict-less insertion
    arithmetic pins/cpos already encode; (4) ×2 pad + the power-of-two
    ladder with floor 64.  Every intermediate (n_sampled, n_pairs,
    max_needed, window, sample_mod) lands in the output row, so a
    hash match proves the estimator END TO END, not just its final
    candidates."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        RANK_WINDOW_LADDER,
    )

    mods = ", ".join(str(m) for m in _mod_ladder(500))
    rungs = ", ".join(str(w) for w in RANK_WINDOW_LADDER)
    return f"""
    lad AS (SELECT unnest([{mods}]) AS m),
    pc AS (SELECT count(*) AS nl FROM pros),
    cnts AS (SELECT m, (SELECT count(*) FROM pros p
                         WHERE p.c_custkey % m = 0) AS c FROM lad),
    pick AS (SELECT m, c FROM cnts CROSS JOIN pc
             WHERE c >= least(8, nl) OR (m = 1 AND c > 0)
             ORDER BY m DESC LIMIT 1),
    samp_scored AS (
        SELECT l.c_custkey AS tgt, r.c_custkey AS src,
               CAST(0.6 AS DOUBLE) * (l.v0 * r.v0 + l.v1 * r.v1)
               + CAST(0.399 AS DOUBLE) * ({_HOPS_SQL})
               + CAST(0.001 AS DOUBLE) * ({_HAVS_SQL}) AS score
        FROM varr l JOIN varr r
          ON l.c_custkey % 10 = 0 AND r.c_custkey % 10 <> 0
        CROSS JOIN pick WHERE l.c_custkey % pick.m = 0),
    samp_ranked AS (
        SELECT tgt, src,
               row_number() OVER (PARTITION BY tgt
                                  ORDER BY score DESC, src) AS rn
        FROM samp_scored WHERE score >= 0.0),
    samp_pairs AS (SELECT tgt, src FROM samp_ranked WHERE rn <= 15),
    need AS (
        SELECT sp.tgt, sp.src,
               min(greatest(p.ins - c.pos + 1, c.pos - p.ins)) AS nd
        FROM samp_pairs sp
        JOIN pins p ON p.c_custkey = sp.tgt
        JOIN cpos c ON c.c_custkey = sp.src
                   AND c.lvl = p.lvl AND c.blk = p.blk
        GROUP BY sp.tgt, sp.src),
    aggd AS (SELECT count(*) AS n_pairs, max(nd) AS mx FROM need),
    wlad AS (SELECT unnest([{rungs}]) AS w),
    win AS (SELECT min(w) AS dw FROM wlad CROSS JOIN aggd
            WHERE w >= greatest(64, 2 * coalesce(mx, 0)))
    SELECT CAST(pick.c AS BIGINT) AS n_sampled,
           CAST(aggd.n_pairs AS BIGINT) AS n_pairs,
           CAST(aggd.mx AS BIGINT) AS max_needed,
           CAST(win.dw AS BIGINT) AS derived_window,
           CAST(pick.m AS BIGINT) AS sample_mod
    FROM pick CROSS JOIN aggd CROSS JOIN win
    """


@register(
    "rank_window_derivation_contract",
    sql=f"""
    WITH {_FIRMO_SQL},
    {_rank_cte()},
    {_derivation_contract_sql()}
    """,
)
def rank_window_derivation_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The window DERIVATION ITSELF under a full value oracle — one
    level stronger than ``rank_window_derived_parity`` (which proves
    the derived window's end RESULT): this row pins every intermediate
    of the estimator — the auto-widened sample size and modulus, the
    number of calibration pairs, the sampled max-need statistic, and
    the ladder-rounded window — against an independent DuckDB replay
    of the whole procedure (widening ladder → sampled exact top-15 →
    per-pair min-need over shared arms → ×2 pad → power-of-two rung).
    A hash-green row means the derivation's arithmetic cannot drift
    silently: any change to the sampling rule, the tie comparator, the
    pad, or the ladder shows up as a mismatch.

    The row is assembled from ``derive_rank_window_stats``'s returned
    dict — driver-side by design: the operator's public contract IS a
    scalar statistic consumed at nightly-build time (the index build
    derives once and stamps ``__w``), so the contract checks exactly
    what a deployment would read.  Measured at sf0.01:
    (n_sampled 50, n_pairs 750, max_needed 15, window 64, mod 15)."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        derive_rank_window_stats,
    )

    prospects, clients = _rank_sides(spark, sf_dir)
    stats = derive_rank_window_stats(
        prospects, clients, "tgt_custkey", "src_custkey",
        k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
    )
    return spark.createDataFrame(
        [(
            int(stats["n_sampled"]),
            int(stats["n_pairs"]),
            None if stats["max_needed"] is None else int(stats["max_needed"]),
            int(stats["window"]),
            int(stats["sample_mod"]),
        )],
        "n_sampled bigint, n_pairs bigint, max_needed bigint, "
        "derived_window bigint, sample_mod bigint",
    )


@register(
    "streaming_peer_serving_replay",
    sql=f"""
    WITH {_FIRMO_SQL},
    {_rank_cte()}
    SELECT tgt_custkey, src_custkey, round(score, 4) AS score
    FROM rank_ranked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
)
def streaming_peer_serving_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming serving loop REGISTERED under the full value
    oracle (round-10 verdict #6; precedent:
    ``streaming_e2e_hourly_counts``): prospects staged as three files
    in a temp landing dir → ``readStream`` with maxFilesPerTrigger=1
    (three real micro-batches) →
    ``streaming/joins.py::streaming_peer_serving`` — per batch, probe
    the static rank-window index (window DERIVED from its ``__w``
    metadata), exact-score the probed candidates, top-15 — appending
    each batch's output to a parquet sink; the sink is read back as
    the result.  Because the probe is per-row independent and each
    prospect lands in exactly one micro-batch, the unioned per-batch
    top-15 IS the batch path's top-15 — so the same rank-window CTE
    replays the whole loop, and a hash-green row pins the streaming
    execution (file source batching, foreachBatch plumbing, sink
    append), not just the operators it composes.

    Scale: per micro-batch I/O is the broadcast block summary plus ≤4
    index window-blocks per (prospect, arm) — independent of corpus
    size (measured sf1: see SCALE.md round-11 appendix).  Reference
    anchor: the per-batch scoring loop this serves online,
    search_ranking_peers.py:536-559."""
    import atexit
    import os
    import shutil
    import tempfile

    from prod_recommendation_pyspark_spark.operators.hybrid import (
        rank_window_index,
    )
    from prod_recommendation_pyspark_spark.streaming.joins import (
        streaming_peer_serving,
    )

    prospects, clients = _rank_sides(spark, sf_dir)
    index = rank_window_index(
        clients, "src_custkey", window=_RANK_WINDOW
    ).localCheckpoint()
    base = tempfile.mkdtemp(prefix="peer_serving_replay_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    landing, out = f"{base}/landing", f"{base}/out"
    for i in range(3):  # three part files -> three micro-batches
        prospects.filter(F.col("tgt_custkey") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    stream = (
        spark.readStream.schema(prospects.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )

    def emit(df: DataFrame, batch_id: int) -> None:
        df.write.mode("append").parquet(out)

    q = streaming_peer_serving(
        stream, index, clients, "tgt_custkey", "src_custkey", emit,
        k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # the landing staging is only read by the (stopped) stream — drop
    # it now so repeated runs don't accumulate prospect copies in /tmp
    # (the out dir must outlive us: the returned frame reads it lazily)
    shutil.rmtree(landing, ignore_errors=True)
    if not os.path.isdir(out):  # no batch emitted (empty prospect set)
        return spark.createDataFrame(
            [], "tgt_custkey long, src_custkey long, score double"
        )
    return (
        spark.read.parquet(out)
        .select(
            "tgt_custkey", "src_custkey", F.round("score", 4).alias("score")
        )
        .orderBy("tgt_custkey", "src_custkey")
    )


@register(
    "ann_ivf_incremental_insert",
    sql=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    nightly AS (SELECT * FROM e WHERE vec_id % 10 <> 7),
    md AS (SELECT greatest(1, count(*) // greatest(1,
                   CAST(ceil(sqrt(count(*))) AS BIGINT))) AS m FROM nightly),
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM nightly
             WHERE vec_id % (SELECT m FROM md) = 0),
    c_assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM e CROSS JOIN cent)
        WHERE rn <= 1),
    q_assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM e CROSS JOIN cent WHERE e.vec_id % 17 = 3)
        WHERE rn <= {_IVF_NPROBE}),
    cand AS (
        SELECT DISTINCT q.vec_id AS tgt_id, c.vec_id AS nbr_id
        FROM q_assign q JOIN c_assign c ON q.centroid_id = c.centroid_id
        WHERE q.vec_id <> c.vec_id),
    scored AS (
        SELECT tgt_id, nbr_id, list_cosine_similarity(a.v, b.v) AS score
        FROM cand JOIN e a ON cand.tgt_id = a.vec_id
                  JOIN e b ON cand.nbr_id = b.vec_id),
    ranked AS (
        SELECT tgt_id, nbr_id, score,
               row_number() OVER (PARTITION BY tgt_id ORDER BY score DESC, nbr_id) AS rn
        FROM scored)
    SELECT tgt_id, nbr_id, round(score, 4) AS score
    FROM ranked WHERE rn <= {_IVF_K}
    ORDER BY tgt_id, nbr_id
    """,
)
def ann_ivf_incremental_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTRADAY INSERTS between nightly index builds — the missing
    piece of the ANN deployment loop (nightly build → intraday serve →
    intraday ARRIVALS): vectors arriving after the nightly build
    (vec_id % 10 = 7 plays the arrival slice) are assigned to the
    EXISTING artifact's centroids (``ivf_index`` with the frozen
    centroid table) and unioned into the index; the probe then serves
    the standard query batch over nightly ∪ inserted.

    The correctness argument this row pins: with FROZEN centroids the
    per-vector list assignment is a pure per-row function of the
    centroid table, so incremental insertion is EXACTLY a full rebuild
    over the grown corpus — no drift, no approximation (the oracle
    replays one flat assignment of the whole corpus; a hash match
    proves union-of-increments ≡ rebuild).  What insertion does NOT
    update is the centroid set itself: list sizes skew as the corpus
    drifts from the nightly distribution, which is why the nightly
    rebuild re-derives centroids (``ivf_auto_centroids`` on the grown
    corpus) — same rhythm as the rank-window nightly re-deriving its
    window.  Centroids here are derived from the NIGHTLY slice (the
    deployment can only sample what existed at build time); the
    oracle derives the same modulus from the nightly count.

    Scale: the insert path is one broadcast join + append of the
    arrival slice's list-partitioned files — no touch of the
    existing artifact's files."""
    from prod_recommendation_pyspark_spark.operators.similarity import (
        ivf_auto_centroids,
        ivf_index,
        ivf_probe,
    )

    emb = Catalog(spark, sf_dir).table("embeddings")
    corpus = emb.select(F.col("vec_id").alias("nbr_id"), "embedding")
    nightly = corpus.filter(F.col("nbr_id") % 10 != 7)
    arrivals = corpus.filter(F.col("nbr_id") % 10 == 7)
    centroids = ivf_auto_centroids(nightly, "nbr_id", "embedding")
    index = ivf_index(nightly, "nbr_id", "embedding", centroids)
    inserted = ivf_index(arrivals, "nbr_id", "embedding", centroids)
    grown = index.unionByName(inserted)
    qs = emb.filter(F.col("vec_id") % 17 == 3).select(
        F.col("vec_id").alias("tgt_id"), "embedding"
    )
    out = ivf_probe(
        qs, grown, "tgt_id", "nbr_id", centroids,
        vec_col="embedding", k=_IVF_K, n_probe=_IVF_NPROBE,
    )
    return out.select(
        "tgt_id", "nbr_id", F.round("score", 4).alias("score")
    ).orderBy("tgt_id", "nbr_id")


@register(
    "streaming_ann_serving_replay",
    sql=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e
             WHERE vec_id % {_IVF_CENTROID_MOD} = 0),
    c_assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM e CROSS JOIN cent)
        WHERE rn <= 1),
    q_assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, cent.cv) DESC,
                                cent.centroid_id) AS rn
            FROM e CROSS JOIN cent WHERE e.vec_id % 17 = 3)
        WHERE rn <= {_IVF_NPROBE}),
    cand AS (
        SELECT DISTINCT q.vec_id AS tgt_id, c.vec_id AS nbr_id
        FROM q_assign q JOIN c_assign c ON q.centroid_id = c.centroid_id
        WHERE q.vec_id <> c.vec_id),
    scored AS (
        SELECT tgt_id, nbr_id, list_cosine_similarity(a.v, b.v) AS score
        FROM cand JOIN e a ON cand.tgt_id = a.vec_id
                  JOIN e b ON cand.nbr_id = b.vec_id),
    ranked AS (
        SELECT tgt_id, nbr_id, score,
               row_number() OVER (PARTITION BY tgt_id ORDER BY score DESC, nbr_id) AS rn
        FROM scored)
    SELECT tgt_id, nbr_id, round(score, 4) AS score
    FROM ranked WHERE rn <= {_IVF_K}
    ORDER BY tgt_id, nbr_id
    """,
)
def streaming_ann_serving_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming ANN serving loop REGISTERED under the full IVF
    value oracle — the vector twin of ``streaming_peer_serving_replay``:
    the query batch (vec_id % 17 = 3, same batch as
    ``ann_ivf_nightly_e2e``) staged as three files in a temp landing
    dir → ``readStream`` with maxFilesPerTrigger=1 (three real
    micro-batches) → ``streaming/joins.py::streaming_ann_serving`` —
    per batch, ``ivf_probe`` the static list-partitioned artifact
    written and reloaded exactly as the nightly query does — appending
    each batch's top-k to a parquet sink read back as the result.
    The probe is per-row independent and each query lands in exactly
    one micro-batch, so the unioned per-batch top-k IS the one-shot
    result and the same SQL replays the whole loop: a hash-green row
    pins the streaming execution (file-source batching, foreachBatch
    plumbing, sink append) ON TOP of the artifact round-trip.

    Scale: per-batch I/O = broadcast centroid assignment + a
    DPP-pruned scan of the batch's probed list directories —
    independent of the corpus outside those lists."""
    import atexit
    import os
    import shutil
    import tempfile

    from prod_recommendation_pyspark_spark.operators.similarity import (
        ivf_index,
    )
    from prod_recommendation_pyspark_spark.streaming.joins import (
        streaming_ann_serving,
    )

    emb = Catalog(spark, sf_dir).table("embeddings")
    centroids = emb.filter(F.col("vec_id") % _IVF_CENTROID_MOD == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("vec")
    )
    corpus = emb.select(F.col("vec_id").alias("nbr_id"), "embedding")
    qs = emb.filter(F.col("vec_id") % 17 == 3).select(
        F.col("vec_id").alias("tgt_id"), "embedding"
    )
    base = tempfile.mkdtemp(prefix="ann_serving_replay_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    landing, out = f"{base}/landing", f"{base}/out"
    ivf_index(corpus, "nbr_id", "embedding", centroids).repartition(
        "ivf_list"
    ).write.mode("overwrite").partitionBy("ivf_list").parquet(
        f"{base}/ivf_index"
    )
    artifact = spark.read.parquet(f"{base}/ivf_index")
    for i in range(3):  # three part files -> three micro-batches
        qs.filter(F.col("tgt_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    stream = (
        spark.readStream.schema(qs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )

    def emit(df: DataFrame, batch_id: int) -> None:
        df.write.mode("append").parquet(out)

    q = streaming_ann_serving(
        stream, artifact, centroids, "tgt_id", "nbr_id", emit,
        vec_col="embedding", k=_IVF_K, n_probe=_IVF_NPROBE,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # landing AND the artifact are fully consumed by the (stopped)
    # stream's eager per-batch probes — only the sink must outlive us
    # (the returned frame reads it lazily)
    shutil.rmtree(landing, ignore_errors=True)
    shutil.rmtree(f"{base}/ivf_index", ignore_errors=True)
    if not os.path.isdir(out):  # no batch emitted (empty query set)
        return spark.createDataFrame(
            [], "tgt_id long, nbr_id long, score double"
        )
    return (
        spark.read.parquet(out)
        .select(
            "tgt_id", "nbr_id", F.round("score", 4).alias("score")
        )
        .orderBy("tgt_id", "nbr_id")
    )


@register(
    "sq8_quantized_topk_embeddings",
    sql="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id, v,
                 greatest(list_max(list_transform(v, x -> abs(x))), 1e-30)
                     AS qscale
          FROM e),
    qq AS (SELECT vec_id, v, qscale,
                  list_transform(v, x -> CAST(floor(x / qscale * 127 + 0.5)
                                              AS BIGINT)) AS qv
           FROM q),
    approx AS (
        SELECT a.vec_id AS tgt_id, b.vec_id AS nbr_id,
               list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[]))
                   * a.qscale * b.qscale / 16129.0 AS ascore
        FROM qq a JOIN qq b ON a.vec_id % 20 = 0 AND a.vec_id <> b.vec_id),
    shortlist AS (
        SELECT tgt_id, nbr_id,
               row_number() OVER (PARTITION BY tgt_id
                                  ORDER BY ascore DESC, nbr_id) AS arn
        FROM approx),
    rescored AS (
        SELECT s.tgt_id, s.nbr_id,
               round(list_cosine_similarity(a.v, b.v), 4) AS score
        FROM shortlist s
        JOIN e a ON s.tgt_id = a.vec_id
        JOIN e b ON s.nbr_id = b.vec_id
        WHERE s.arn <= 50),
    ranked AS (
        SELECT tgt_id, nbr_id, score,
               row_number() OVER (PARTITION BY tgt_id
                                  ORDER BY score DESC, nbr_id) AS rn
        FROM rescored)
    SELECT tgt_id, nbr_id, score
    FROM ranked WHERE rn <= 5
    ORDER BY tgt_id, nbr_id
    """,
)
def sq8_quantized_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 two-stage retrieval (operators/similarity.py::
    quantize_vectors): score every candidate with the int8 approximate
    dot (8× smaller index — at 100 TB the difference between a vector
    corpus that fits the page cache and one that doesn't), keep a
    50-deep shortlist per query, exact-cosine rescore, return top-5.
    The integer dot is exact and the quantization rounding is half-up
    on both engines, so the SHORTLIST — not just the final ranking —
    is bit-reproducible in the oracle.  Compose with the sign-LSH /
    IVF candidate generators for sub-linear scoring at scale; this
    query keeps the candidate set brute so the oracle pins the
    quantization math itself."""
    from prod_recommendation_pyspark_spark.operators.similarity import (
        quantize_vectors,
        spread_small_input,
        sq8_approx_dot,
    )
    from pyspark.sql import Window

    emb = spread_small_input(
        Catalog(spark, sf_dir).table("embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
    )
    qq = quantize_vectors(emb, "v")
    probes = qq.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("tgt_id"),
        F.col("v").alias("tv"),
        F.col("qvec").alias("tq"),
        F.col("qscale").alias("ts"),
    )
    corpus = qq.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("v").alias("nv"),
        F.col("qvec").alias("nq"),
        F.col("qscale").alias("ns"),
    )
    approx = (
        probes.crossJoin(corpus)
        .filter(F.col("tgt_id") != F.col("nbr_id"))
        .withColumn(
            "ascore",
            sq8_approx_dot(
                F.col("tq"), F.col("ts"), F.col("nq"), F.col("ns")
            ),
        )
    )
    wa = Window.partitionBy("tgt_id").orderBy(
        F.col("ascore").desc(), F.col("nbr_id")
    )
    shortlist = approx.withColumn("arn", F.row_number().over(wa)).filter(
        F.col("arn") <= 50
    )
    dot = F.aggregate(
        F.zip_with("tv", "nv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(c), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    # rank on the ROUNDED exact score: the two engines' cosine kernels
    # (HOF fold vs DuckDB's native loop) agree at 4 decimals but not
    # necessarily in the last ULPs, and an unrounded comparator would
    # reintroduce the float-gate class at the top-5 cut
    rescored = shortlist.withColumn(
        "score", F.round(dot / (norm("tv") * norm("nv")), 4)
    )
    wr = Window.partitionBy("tgt_id").orderBy(
        F.col("score").desc(), F.col("nbr_id")
    )
    return (
        rescored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 5)
        .select("tgt_id", "nbr_id", "score")
        .orderBy("tgt_id", "nbr_id")
    )


# --- MMR diversified re-ranking over retrieval candidates -------------------
def _mmr_step_sql(k: int) -> str:
    """One unrolled greedy MMR step (mirrors
    operators/similarity.py::mmr_rerank op-for-op: 4-rounded cosines,
    λ = 0.5 — exact binary halves — candidate-id tiebreak)."""
    return f"""
    m{k} AS (SELECT c.qid, c.cid, c.rel, max(s.s) AS ms
             FROM cand c
             JOIN sel{k - 1} p ON p.qid = c.qid
             JOIN sim s ON s.qid = c.qid AND s.i = c.cid AND s.j = p.cid
             LEFT JOIN sel{k - 1} x ON x.qid = c.qid AND x.cid = c.cid
             WHERE x.cid IS NULL
             GROUP BY c.qid, c.cid, c.rel),
    p{k} AS (SELECT qid, cid, 0.5 * rel - 0.5 * ms AS score,
                    row_number() OVER (PARTITION BY qid
                        ORDER BY 0.5 * rel - 0.5 * ms DESC, cid) AS rn
             FROM m{k}),
    sel{k} AS (SELECT qid, cid, step, score FROM sel{k - 1}
               UNION ALL
               SELECT qid, cid, {k} AS step, score FROM p{k} WHERE rn = 1)"""


@register(
    "mmr_diversify_embeddings",
    sql=f"""
    WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id % 25 = 0),
    c0 AS (SELECT q.qid, e.vec_id AS cid,
                  CAST(e.embedding AS DOUBLE[]) AS cv,
                  round(list_cosine_similarity(
                      q.qv, CAST(e.embedding AS DOUBLE[])), 4) AS rel
           FROM q JOIN embeddings e ON e.vec_id <> q.qid),
    cand AS (SELECT qid, cid, cv, rel FROM (
                 SELECT *, row_number() OVER (PARTITION BY qid
                     ORDER BY rel DESC, cid) AS rn FROM c0)
             WHERE rn <= 12),
    sim AS (SELECT a.qid, a.cid AS i, b.cid AS j,
                   round(list_cosine_similarity(a.cv, b.cv), 4) AS s
            FROM cand a JOIN cand b ON a.qid = b.qid),
    sel1 AS (SELECT qid, cid, 1 AS step, rel AS score FROM (
                 SELECT qid, cid, rel, row_number() OVER (PARTITION BY qid
                     ORDER BY rel DESC, cid) AS rn FROM cand)
             WHERE rn = 1),
    {_mmr_step_sql(2)},
    {_mmr_step_sql(3)},
    {_mmr_step_sql(4)},
    {_mmr_step_sql(5)}
    SELECT qid, step, cid, score FROM sel5
    ORDER BY qid, step
    """,
)
def mmr_diversify_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified top-5 (operators/similarity.py::mmr_rerank,
    λ = 0.5) over per-query top-12 cosine candidates — every 25th
    vector is a query.  The oracle unrolls all five greedy steps as
    CTEs, so the value hash pins the entire selection sequence, not
    just the final set: quantized cosines + exact-half blending +
    id tiebreaks make the recurrence engine-identical."""
    from prod_recommendation_pyspark_spark.operators.relational import (
        windowed_topk,
    )
    from prod_recommendation_pyspark_spark.operators.similarity import (
        l2_normalize,
        mmr_rerank,
    )

    emb = Catalog(spark, sf_dir).table("embeddings")
    norm = l2_normalize(emb, "embedding", "nvec").select(
        "vec_id", "nvec", F.col("embedding").cast("array<double>").alias("cv")
    )
    q = norm.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("qid"), F.col("nvec").alias("qv")
    )
    pairs = norm.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("qid")
    )
    dot = F.aggregate(
        F.zip_with("qv", "nvec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = pairs.select(
        "qid",
        F.col("vec_id").alias("cid"),
        "cv",
        F.round(dot, 4).alias("rel"),
    )
    cand = windowed_topk(
        scored, "qid", [F.col("rel").desc(), F.col("cid")], 12
    ).select("qid", "cid", "cv", "rel")
    return mmr_rerank(
        cand, "qid", "cid", "rel", "cv", k=5, lam=0.5, round_digits=4
    ).orderBy("qid", "step")


# --- JL random projection: cosine-preservation audit -------------------------
from prod_recommendation_pyspark_spark.operators.similarity import (  # noqa: E402
    random_project,
    sign_projection_matrix,
)

_JL_K, _JL_DIM = 16, 64
_JL_MAT = sign_projection_matrix(_JL_K, _JL_DIM)
_JL_MAT_SQL = ",\n        ".join(
    f"({j}, [{', '.join(str(s) for s in row)}]::DOUBLE[])"
    for j, row in enumerate(_JL_MAT)
)


@register(
    "random_projection_cosine_audit",
    sql=f"""
    WITH sel AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE vec_id % 10 = 0),
    mat(j, s) AS (VALUES
        {_JL_MAT_SQL}),
    pj AS (SELECT vec_id, j,
                  list_reduce(
                      list_transform(range(1, {_JL_DIM + 1}),
                                     i -> v[i] * s[i]),
                      (a, x) -> a + x) AS c
           FROM sel CROSS JOIN mat),
    proj AS (SELECT vec_id, list(c ORDER BY j) AS p FROM pj GROUP BY vec_id),
    pairs AS (
        -- + 0.0 normalizes IEEE -0.0 to +0.0: the two engines may
        -- disagree on the SIGN of a rounded zero, and the driver's
        -- repr-sorted row compare treats -0.0 and 0.0 as different
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.v, b.v), 4) + 0.0 AS cos_full,
               round(list_cosine_similarity(pa.p, pb.p), 4) + 0.0 AS cos_proj
        FROM sel a JOIN sel b ON a.vec_id < b.vec_id
        JOIN proj pa ON pa.vec_id = a.vec_id
        JOIN proj pb ON pb.vec_id = b.vec_id)
    SELECT id_a, id_b, cos_full, cos_proj,
           round(abs(cos_full - cos_proj), 4) AS abs_err
    FROM pairs
    ORDER BY id_a, id_b
    """,
)
def random_projection_cosine_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Johnson–Lindenstrauss sign projection
    (operators/similarity.py::random_project): 64-dim embeddings
    projected to 16 dims by a deterministic ±1 matrix, audited by
    placing every sampled pair's full-space and projected-space
    cosine side by side with the absolute error — the measured
    distortion a similarity pipeline accepts in exchange for 4× less
    vector traffic into its ANN/dedup stages.  The SAME literal
    matrix is baked into the Spark plan and the oracle's VALUES
    clause; each projected coordinate is a pinned-order sequential
    fold, so the projections (not just the audit stats) agree
    cross-engine.

    Scale: the projection is a row-local codegen'd expression — at
    100 TB it runs at scan speed with no shuffle; the quadratic pair
    audit here is the measurement harness, not the production path
    (production feeds the 16-dim vectors into the registered
    bucketed ANN operators)."""
    emb = Catalog(spark, sf_dir).table("embeddings").filter(
        F.col("vec_id") % 10 == 0
    )
    sel = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    proj = random_project(sel, "v", "p", k=_JL_K, matrix=_JL_MAT)

    def dot(u, w):
        return F.aggregate(
            F.zip_with(u, w, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    def cos(u, w):
        return dot(u, w) / (F.sqrt(dot(u, u)) * F.sqrt(dot(w, w)))

    a = proj.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("p").alias("pa"),
    )
    b = proj.select(
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("p").alias("pb"),
    )
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    # + 0.0 mirrors the oracle's -0.0 normalization (see the SQL)
    out = pairs.select(
        "id_a",
        "id_b",
        (F.round(cos(F.col("va"), F.col("vb")), 4) + F.lit(0.0)).alias(
            "cos_full"
        ),
        (F.round(cos(F.col("pa"), F.col("pb")), 4) + F.lit(0.0)).alias(
            "cos_proj"
        ),
    )
    return out.select(
        "id_a",
        "id_b",
        "cos_full",
        "cos_proj",
        F.round(F.abs(F.col("cos_full") - F.col("cos_proj")), 4).alias(
            "abs_err"
        ),
    ).orderBy("id_a", "id_b")


# --- Projected-space retrieval recall ----------------------------------------
@register(
    "projected_topk_recall",
    sql=f"""
    WITH sel AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
    q AS (SELECT * FROM sel WHERE vec_id % 10 = 0),
    mat(j, s) AS (VALUES
        {_JL_MAT_SQL}),
    pj AS (SELECT vec_id, j,
                  list_reduce(
                      list_transform(range(1, {_JL_DIM + 1}),
                                     i -> v[i] * s[i]),
                      (a, x) -> a + x) AS c
           FROM sel CROSS JOIN mat),
    proj AS (SELECT vec_id, list(c ORDER BY j) AS p FROM pj GROUP BY vec_id),
    full_top AS (
        SELECT tgt, nbr FROM (
            SELECT q.vec_id AS tgt, c.vec_id AS nbr,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(q.v, c.v), 6)
                                DESC, c.vec_id) AS rn
            FROM q JOIN sel c ON c.vec_id <> q.vec_id)
        WHERE rn <= 10),
    proj_top AS (
        SELECT tgt, nbr FROM (
            SELECT qp.vec_id AS tgt, cp.vec_id AS nbr,
                   row_number() OVER (
                       PARTITION BY qp.vec_id
                       ORDER BY round(list_cosine_similarity(qp.p, cp.p), 6)
                                DESC, cp.vec_id) AS rn
            FROM proj qp JOIN proj cp ON cp.vec_id <> qp.vec_id
            WHERE qp.vec_id % 10 = 0)
        WHERE rn <= 10)
    SELECT f.tgt AS tgt_id, count(p.tgt) AS n_overlap
    FROM full_top f
    LEFT JOIN proj_top p ON p.tgt = f.tgt AND p.nbr = f.nbr
    GROUP BY f.tgt
    ORDER BY tgt_id
    """,
)
def projected_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end JL composition: retrieval recall@10 of the
    16-dim projected space against full 64-dim ground truth, per
    query — how many of each sampled query's true top-10 cosine
    neighbors survive when ranking runs entirely on
    ``random_project`` outputs.  This is the measurement that
    justifies (or vetoes) running the registered ANN operators on
    projected vectors at 100 TB: 4× less vector traffic costs THIS
    much recall.  Scores are quantized to 6 digits BEFORE ranking
    with id tiebreaks (kernel-epsilon cannot flip an argsort), so
    both top-10 sets — and therefore every per-query overlap count —
    replay exactly in the oracle.

    Measured verdict on THIS corpus: mean overlap@10 ≈ 1.3 (k=16) /
    2.2 (k=32) — the synthetic embeddings' neighbor gaps (cosine sd
    ≈ 0.12) sit below the JL distortion (~1/√k), so projected
    retrieval is VETOED here and the full-dim ANN paths stay the
    production route.  That is the harness doing its job: run this
    before, not after, switching a 100 TB pipeline to projected
    vectors.

    Scale: the quadratic rankings here are the measurement harness on
    a sample; production retrieval uses the bucketed ANN paths — this
    query only certifies the projection layer under them."""
    emb = Catalog(spark, sf_dir).table("embeddings")
    sel = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    proj = random_project(sel, "v", "p", k=_JL_K, matrix=_JL_MAT)

    def dot(u, w):
        return F.aggregate(
            F.zip_with(u, w, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    def cos(u, w):
        return dot(u, w) / (F.sqrt(dot(u, u)) * F.sqrt(dot(w, w)))

    def topk(df, vec_field):
        q = df.filter(F.col("vec_id") % 10 == 0).select(
            F.col("vec_id").alias("tgt"), F.col(vec_field).alias("qv")
        )
        c = df.select(
            F.col("vec_id").alias("nbr"), F.col(vec_field).alias("cv")
        )
        pairs = q.join(c, F.col("nbr") != F.col("tgt")).select(
            "tgt",
            "nbr",
            F.round(cos(F.col("qv"), F.col("cv")), 6).alias("s"),
        )
        w = Window.partitionBy("tgt").orderBy(F.desc("s"), "nbr")
        return (
            pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 10)
            .select("tgt", "nbr")
        )

    full_top = topk(sel, "v")
    proj_top = topk(proj.select("vec_id", "p"), "p").withColumnRenamed(
        "nbr", "pnbr"
    )
    return (
        full_top.join(
            proj_top,
            (full_top["tgt"] == proj_top["tgt"])
            & (full_top["nbr"] == proj_top["pnbr"]),
            "left",
        )
        .groupBy(full_top["tgt"].alias("tgt_id"))
        .agg(F.count(proj_top["tgt"]).alias("n_overlap"))
        .orderBy("tgt_id")
    )


# --- Product quantization: codes + ADC recall contract ------------------------
_PQ_M, _PQ_K, _PQ_BLOCK = 8, 32, 8  # 64-dim → 8 blocks of 8 dims, 32 codes
_PQ_NQ, _PQ_TOPK, _PQ_SHORTLIST = 5, 10, 100


@register(
    "pq_adc_recall_contract",
    sql=f"""
    SELECT vec_id,
           (SELECT count(*) FROM embeddings) AS n_items,
           TRUE AS codes_in_range,
           TRUE AS blocks_complete,
           TRUE AS self_retrieved,
           TRUE AS recall_ok
    FROM embeddings
    WHERE vec_id < {_PQ_NQ}
    ORDER BY vec_id
    """,
)
def pq_adc_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization end-to-end (operators/pq.py; Jégou et al.
    2011), in the production IVFADC shape — compressed-domain
    SHORTLIST, exact RE-RANK: train 8×32 sub-space codebooks, encode
    every vector to 8 bytes of codes, answer the first 5 queries with
    an ADC top-100 shortlist scanned purely over codes, then re-rank
    just those 100 rows with exact L2 on the raw vectors.  Contracts
    the oracle pins: every code in [0, 32), every item encoded in all
    8 blocks, each query's shortlist contains ITSELF (the compressed
    index must at minimum find the exact row), and re-ranked
    recall@10 vs the exact top-10 clears 0.5 per query (measured
    0.6-1.0 at sf0.01 AND sf0.1 on these near-random synthetic
    embeddings — PQ's adversarial case; clustered real embeddings
    quantize far better).  K-means seeding is deterministic (lowest
    ids), so the whole pipeline replays bit-identically.

    Scale: codebook = 256 rows (driver-bounded collects inside the
    per-block Lloyd fits); encode is one corpus-linear pass against
    the broadcast codebook; ADC joins the broadcast n_q·m·k LUT to
    the codes on (block, code) — raw vectors are touched ONLY for
    the 100-row-per-query re-rank, which is the entire point of PQ
    at 100 TB: the full-precision table stays on disk while the
    8-byte codes fit in memory."""
    from prod_recommendation_pyspark_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        pq_fit,
    )
    from prod_recommendation_pyspark_spark.operators.similarity import (
        spread_small_input,
    )

    # persisted: the contract re-reads embeddings for fit, encode,
    # queries, ground truth, re-rank, and stats — six scans uncached
    # (plan audit).  Registry-level clearCache owns the lifetime.
    emb = (
        spread_small_input(Catalog(spark, sf_dir).table("embeddings"))
        .select("vec_id", "embedding")
        .persist()
    )
    books = pq_fit(emb, "vec_id", "embedding", m=_PQ_M, k=_PQ_K, max_iter=3)
    codes = pq_encode(emb, "vec_id", "embedding", books, _PQ_M, _PQ_BLOCK)
    queries = emb.filter(F.col("vec_id") < _PQ_NQ).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    shortlist = pq_adc_topk(
        queries.withColumnRenamed("q_id", "query_id").withColumnRenamed(
            "q_vec", "query_vec"
        ),
        codes.withColumnRenamed("vec_id", "item_id"),
        books,
        "query_id",
        "query_vec",
        "item_id",
        _PQ_M,
        _PQ_BLOCK,
        k_top=_PQ_SHORTLIST,
    )
    from prod_recommendation_pyspark_spark.operators.clustering import sq_l2
    from prod_recommendation_pyspark_spark.operators.relational import (
        windowed_topk,
    )

    item_vecs = emb.select(
        F.col("vec_id").alias("item_id"), F.col("embedding").alias("i_vec")
    )
    # exact re-rank of the 100-row-per-query shortlist (raw vectors
    # touched here only)
    rerank = (
        shortlist.select("query_id", "item_id")
        .join(item_vecs, "item_id")
        .join(
            F.broadcast(
                queries.select(
                    F.col("q_id").alias("query_id"), F.col("q_vec")
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            "item_id",
            sq_l2(
                F.col("q_vec").cast("array<double>"),
                F.col("i_vec").cast("array<double>"),
            ).alias("d2"),
        )
    )
    rerank_top = windowed_topk(
        rerank, "query_id", [F.col("d2"), F.col("item_id")], _PQ_TOPK
    ).select("query_id", "item_id")
    # exact L2 top-K over the whole corpus (the recall ground truth)
    exact = (
        queries.crossJoin(item_vecs)
        .select(
            F.col("q_id").alias("query_id"),
            "item_id",
            sq_l2(
                F.col("q_vec").cast("array<double>"),
                F.col("i_vec").cast("array<double>"),
            ).alias("d2"),
        )
    )
    exact_top = windowed_topk(
        exact, "query_id", [F.col("d2"), F.col("item_id")], _PQ_TOPK
    ).select("query_id", "item_id")
    hits = rerank_top.join(exact_top, ["query_id", "item_id"])
    recall = hits.groupBy("query_id").agg(
        (F.count(F.lit(1)) / _PQ_TOPK).alias("recall")
    )
    # anchor on the queries frame so a zero-overlap query still emits
    # a readable recall_ok=FALSE row instead of silently dropping out
    # of the contract (row-count mismatch is a worse failure signal)
    all_q = queries.select(F.col("q_id").alias("query_id"))
    self_hit = (
        shortlist.filter(F.col("query_id") == F.col("item_id"))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("self_n"))
    )
    code_stats = codes.agg(
        F.min("code").alias("min_c"),
        F.max("code").alias("max_c"),
        F.count(F.lit(1)).alias("n_codes"),
    )
    n_items = emb.agg(F.count(F.lit(1)).alias("n_items"))
    return (
        all_q.join(recall, "query_id", "left")
        .join(self_hit, "query_id", "left")
        .crossJoin(F.broadcast(code_stats))
        .crossJoin(F.broadcast(n_items))
        .select(
            F.col("query_id").alias("vec_id"),
            "n_items",
            (
                (F.col("min_c") >= 0) & (F.col("max_c") < _PQ_K)
            ).alias("codes_in_range"),
            (F.col("n_codes") == F.col("n_items") * _PQ_M).alias(
                "blocks_complete"
            ),
            (F.coalesce("self_n", F.lit(0)) == 1).alias("self_retrieved"),
            (F.coalesce("recall", F.lit(0.0)) >= 0.5).alias("recall_ok"),
        )
        .orderBy("vec_id")
    )


# --- IVF-PQ: coarse lists + residual codes + ADC ------------------------------
_IVFPQ_NLIST, _IVFPQ_NPROBE = 16, 4


@register(
    "ivfpq_recall_contract",
    sql=f"""
    SELECT vec_id,
           (SELECT count(*) FROM embeddings) AS n_items,
           TRUE AS self_retrieved,
           TRUE AS recall_ok,
           TRUE AS pruned
    FROM embeddings
    WHERE vec_id < {_PQ_NQ}
    ORDER BY vec_id
    """,
)
def ivfpq_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ end-to-end (operators/pq.py::ivfpq_build/ivfpq_topk —
    the FAISS IVFADC composition): 16 coarse lists, PQ on RESIDUALS
    (x − list centroid), queries probe their 4 nearest lists and
    ADC-score ONLY codes in those lists, exact re-rank of the top-100
    shortlist.  Contracts the oracle pins: each query's shortlist
    contains itself, re-ranked recall@10 ≥ 0.6 (residual quantization
    measures 0.8-1.0 at sf0.01 AND sf0.1 — ~0.2 better than flat PQ
    on the same synthetic embeddings, the textbook residual win), and
    PRUNING actually happened (per query, the probed lists hold fewer
    than 60% of the corpus — the whole point of the inverted file).

    Scale: coarse fit is Lloyd (broadcast centroids); residuals are a
    broadcast join + zip_with projection; the search LUT is
    n_q·n_probe·m·k broadcast rows joined on (ivf_list, block, code)
    — with the codes table written partitioned by ivf_list, probing
    is partition-pruned I/O, and raw vectors surface only for the
    100-row re-rank."""
    from prod_recommendation_pyspark_spark.operators.clustering import sq_l2
    from prod_recommendation_pyspark_spark.operators.pq import (
        ivfpq_build,
        ivfpq_topk,
    )
    from prod_recommendation_pyspark_spark.operators.relational import (
        windowed_topk,
    )
    from prod_recommendation_pyspark_spark.operators.similarity import (
        spread_small_input,
    )

    emb = (
        spread_small_input(Catalog(spark, sf_dir).table("embeddings"))
        .select("vec_id", "embedding")
        .persist()
    )
    coarse, books, codes = ivfpq_build(
        emb, "vec_id", "embedding", n_list=_IVFPQ_NLIST, m=_PQ_M, k=16
    )
    queries = emb.filter(F.col("vec_id") < _PQ_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # persisted: the codes table feeds both the ADC scoring join and
    # the list-size pruning evidence; uncached, the whole encode
    # pipeline re-runs per consumer (plan audit)
    item_codes = codes.withColumnRenamed("vec_id", "item_id").persist()
    shortlist = ivfpq_topk(
        queries,
        coarse,
        books,
        item_codes,
        "query_id",
        "query_vec",
        "item_id",
        _PQ_M,
        _PQ_BLOCK,
        n_probe=_IVFPQ_NPROBE,
        k_top=_PQ_SHORTLIST,
    )
    item_vecs = emb.select(
        F.col("vec_id").alias("item_id"), F.col("embedding").alias("i_vec")
    )
    rerank = (
        shortlist.select("query_id", "item_id")
        .join(item_vecs, "item_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "item_id",
            sq_l2(
                F.col("query_vec").cast("array<double>"),
                F.col("i_vec").cast("array<double>"),
            ).alias("d2"),
        )
    )
    rerank_top = windowed_topk(
        rerank, "query_id", [F.col("d2"), F.col("item_id")], _PQ_TOPK
    ).select("query_id", "item_id")
    exact = queries.crossJoin(item_vecs).select(
        "query_id",
        "item_id",
        sq_l2(
            F.col("query_vec").cast("array<double>"),
            F.col("i_vec").cast("array<double>"),
        ).alias("d2"),
    )
    exact_top = windowed_topk(
        exact, "query_id", [F.col("d2"), F.col("item_id")], _PQ_TOPK
    ).select("query_id", "item_id")
    recall = (
        rerank_top.join(exact_top, ["query_id", "item_id"])
        .groupBy("query_id")
        .agg((F.count(F.lit(1)) / _PQ_TOPK).alias("recall"))
    )
    self_hit = (
        shortlist.filter(F.col("query_id") == F.col("item_id"))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("self_n"))
    )
    # pruning evidence: candidates per query = Σ sizes of its probed
    # lists, recomputed from the probe top-n_probe + per-list sizes
    list_sizes = item_codes.groupBy("ivf_list").agg(
        F.count_distinct("item_id").alias("__lsz")
    )
    probed = windowed_topk(
        queries.crossJoin(
            F.broadcast(
                coarse.select(
                    F.col("cluster").alias("ivf_list"),
                    F.col("vec").alias("__cv"),
                )
            )
        ).select(
            "query_id",
            "ivf_list",
            sq_l2(
                F.col("query_vec").cast("array<double>"), F.col("__cv")
            ).alias("__cd2"),
        ),
        "query_id",
        [F.col("__cd2"), F.col("ivf_list")],
        _IVFPQ_NPROBE,
    )
    cand = (
        probed.join(F.broadcast(list_sizes), "ivf_list")
        .groupBy("query_id")
        .agg(F.sum("__lsz").alias("n_cand"))
    )
    n_items = emb.agg(F.count(F.lit(1)).alias("n_items"))
    # anchor on the queries frame: a zero-overlap query must surface
    # as recall_ok=FALSE (and a missing candidate row as pruned=FALSE),
    # never as a silently-dropped contract row
    return (
        queries.select("query_id")
        .join(recall, "query_id", "left")
        .join(self_hit, "query_id", "left")
        .join(cand, "query_id", "left")
        .crossJoin(F.broadcast(n_items))
        .select(
            F.col("query_id").alias("vec_id"),
            "n_items",
            (F.coalesce("self_n", F.lit(0)) == 1).alias("self_retrieved"),
            (F.coalesce("recall", F.lit(0.0)) >= 0.6).alias("recall_ok"),
            (
                F.coalesce("n_cand", F.col("n_items"))
                < 0.6 * F.col("n_items")
            ).alias("pruned"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# FULL-DIMENSION peer search (round 13, verdict #1): the reference's real
# feature recipe (search_ranking_peers.py:442,450-455,608-611 — w_rev-weighted
# log revenue + 3 numerics + OHE divisions = 9 dims) through a LINEAR/
# sub-quadratic candidate generator (block-aware multi-probe IVF) and the
# exact hybrid re-rank.  This retires the one scale constraint the 2-D
# rank-window path carried (exact only for dim=2).
# ---------------------------------------------------------------------------

_FD_SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_FD_DIM = 4 + len(_FD_SEGS)  # 9 — w_rev + 3 numerics + OHE(mktsegment)
#: probes per (prospect, level) for the IVF arm.  Measured recall vs
#: the exact kernel (SCALE.md round-13): n_probe 8 → 0.9387, 12 →
#: 0.9991, 16 → 1.0000 at sf0.01; at sf0.1 the IVF arm PLATEAUS
#: (16 → 0.9977, 32 → 0.9989, 16 w/ assign_probe=2 → 0.9977) — the
#: concentrated all-positive geometry mis-buckets boundary clients —
#: which is why the PRODUCTION full-dim query rides the projection
#: window (recall 1.0000 at 13× prune); the IVF query ships as the
#: approximate-serving variant, like the ANN ivf queries.
_FD_NPROBE = 16
_FD_W_REV = 0.80  # search_ranking_peers.py:608-611
_FD_W_JPMC = 0.05
_FD_W_NUM = (1.0 - _FD_W_REV - _FD_W_JPMC) / 3.0  # :442


def _firmographics_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL reference feature recipe on the customer stand-in
    (FIXTURES.md B1): log10-floored revenue, three numerics, and the
    division OHE — min-max scaled, reference-weighted (w_rev=0.80,
    w_num=(1-w_rev-w_jpmc)/3, w_jpmc=0.05), assembled to a 9-dim
    vector and L2-normalized, with the same naics/lat/lon derivation
    as ``_firmographics``.  Built from the operator library (M5-M8)
    so the registered full-dim queries exercise the same code path a
    reference user would compose."""
    from prod_recommendation_pyspark_spark.features.encode import one_hot
    from prod_recommendation_pyspark_spark.features.scaling import (
        log10_floor,
        min_max_scale,
    )

    cust = Catalog(spark, sf_dir).table("customer")
    base = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("annual_revenue"),
        (F.col("c_custkey") % 53).cast("double").alias("company_age"),
        ((F.col("c_custkey") * 7) % 211).cast("double").alias("employees"),
        (F.col("c_custkey") % 2).cast("double").alias("public_flag"),
        F.concat(
            F.lit("52"),
            F.lpad((F.col("c_custkey") % 1000).cast("string"), 4, "0"),
        ).alias("naics"),
        ((F.col("c_custkey") % 120) - 60 + 0.25).cast("double").alias("lat"),
        (((F.col("c_custkey") * 7) % 300) - 150 + 0.25).cast("double").alias("lon"),
    )
    base = log10_floor(base, "annual_revenue", "rev_log")
    base = min_max_scale(
        base, ["rev_log", "company_age", "employees", "public_flag"],
        suffix="_s",
    )
    base = one_hot(base, "c_mktsegment", _FD_SEGS, prefix="jd", weight=_FD_W_JPMC)
    vec = F.array(
        F.col("rev_log_s") * _FD_W_REV,
        F.col("company_age_s") * _FD_W_NUM,
        F.col("employees_s") * _FD_W_NUM,
        F.col("public_flag_s") * _FD_W_NUM,
        *[F.col(f"jd_{v}") for v in _FD_SEGS],
    )
    return l2_normalize(base.withColumn("raw_vec", vec), "raw_vec", "vec")


def _fd_firmo_sql() -> str:
    """CTE chain replaying ``_firmographics_full`` term for term:
    ``fnormed(c_custkey, naics, lat, lon, v1..v9)``.  Same IEEE
    left-assoc fold order as the Spark expressions (established
    bit-parity protocol of ``_FIRMO_SQL``)."""
    scale = (
        "CASE WHEN {mx} = {mn} THEN 0.0 "
        "ELSE ({x} - {mn}) / ({mx} - {mn}) END"
    )
    fs = [
        scale.format(x="rev_log", mn="mn_rev", mx="mx_rev")
        + f" * CAST({_FD_W_REV!r} AS DOUBLE)",
        scale.format(x="company_age", mn="mn_age", mx="mx_age")
        + f" * CAST({_FD_W_NUM!r} AS DOUBLE)",
        scale.format(x="employees", mn="mn_emp", mx="mx_emp")
        + f" * CAST({_FD_W_NUM!r} AS DOUBLE)",
        scale.format(x="public_flag", mn="mn_pub", mx="mx_pub")
        + f" * CAST({_FD_W_NUM!r} AS DOUBLE)",
    ] + [
        f"(CASE WHEN c_mktsegment = '{v}' THEN 1.0 ELSE 0.0 END)"
        f" * CAST({_FD_W_JPMC!r} AS DOUBLE)"
        for v in _FD_SEGS
    ]
    f_cols = ",\n               ".join(
        f"{e} AS f{i + 1}" for i, e in enumerate(fs)
    )
    sumsq = " + ".join(f"f{i} * f{i}" for i in range(1, _FD_DIM + 1))
    v_cols = ",\n               ".join(
        f"CASE WHEN nrm = 0 THEN f{i} ELSE f{i} / nrm END AS v{i}"
        for i in range(1, _FD_DIM + 1)
    )
    return f"""
    fbase AS (
        SELECT c_custkey, c_mktsegment,
               CAST(c_acctbal AS DOUBLE) AS annual_revenue,
               CAST(c_custkey % 53 AS DOUBLE) AS company_age,
               CAST((c_custkey * 7) % 211 AS DOUBLE) AS employees,
               CAST(c_custkey % 2 AS DOUBLE) AS public_flag,
               '52' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 4, '0') AS naics,
               CAST((c_custkey % 120) - 60 + 0.25 AS DOUBLE) AS lat,
               CAST(((c_custkey * 7) % 300) - 150 + 0.25 AS DOUBLE) AS lon
        FROM customer),
    flogged AS (
        SELECT *, log10(CASE WHEN annual_revenue IS NULL
                              OR annual_revenue <= 0
                             THEN 1.0 ELSE annual_revenue END) AS rev_log
        FROM fbase),
    fstats AS (SELECT min(rev_log) mn_rev, max(rev_log) mx_rev,
                      min(company_age) mn_age, max(company_age) mx_age,
                      min(employees) mn_emp, max(employees) mx_emp,
                      min(public_flag) mn_pub, max(public_flag) mx_pub
               FROM flogged),
    ffeat AS (
        SELECT c_custkey, naics, lat, lon,
               {f_cols}
        FROM flogged, fstats),
    fnorm AS (SELECT *, sqrt({sumsq}) AS nrm FROM ffeat),
    fnormed AS (
        SELECT c_custkey, naics, lat, lon,
               {v_cols}
        FROM fnorm)
"""


def _fd_vdot(a: str, b: str, bpfx: str = "v") -> str:
    """Left-assoc 9-term dot — the HOF fold / unrolled-codegen order."""
    return " + ".join(
        f"{a}.v{i} * {b}.{bpfx}{i}" for i in range(1, _FD_DIM + 1)
    )


def _fd_sumsq(a: str, pfx: str = "v") -> str:
    return " + ".join(
        f"{a}.{pfx}{i} * {a}.{pfx}{i}" for i in range(1, _FD_DIM + 1)
    )


def _fd_cand_cte() -> str:
    """Candidate CTEs replaying ``hybrid.ivf_block_candidates`` +
    ``ivf_auto_centroids`` on the full-dim sides: derived centroid
    modulus, client argmax-cosine assignment, per-(prospect, level)
    probing of the block-occupied lists, arm equi-join."""
    cent_cols = ", ".join(f"v{i} AS c{i}" for i in range(1, _FD_DIM + 1))
    ccsim = (
        f"({_fd_vdot('x', 'ct', 'c')})"
        f" / (sqrt({_fd_sumsq('x')}) * sqrt({_fd_sumsq('ct', 'c')}))"
    )
    return f"""
    fpros AS (SELECT * FROM fnormed WHERE c_custkey % 10 = 0),
    fclis AS (SELECT * FROM fnormed WHERE c_custkey % 10 <> 0),
    fmod AS (SELECT greatest(1, count(*) // greatest(1,
                 CAST(ceil(sqrt(count(*))) AS BIGINT))) AS m FROM fclis),
    fcent AS (SELECT c_custkey AS list, {cent_cols} FROM fclis
              WHERE c_custkey % (SELECT m FROM fmod) = 0),
    fcassign AS (
        SELECT cid, list FROM (
            SELECT x.c_custkey AS cid, ct.list,
                   row_number() OVER (
                       PARTITION BY x.c_custkey
                       ORDER BY {ccsim} DESC, ct.list) AS rn
            FROM fclis x CROSS JOIN fcent ct)
        WHERE rn <= 1),
    flvls AS (SELECT unnest(range(0, 7)) AS lvl),
    fcarm AS (
        SELECT a.cid, l.lvl,
               CASE WHEN l.lvl = 0 THEN ''
                    ELSE substring(c.naics, 1, CAST(l.lvl AS INT)) END AS blk,
               a.list
        FROM fclis c JOIN fcassign a ON c.c_custkey = a.cid
        CROSS JOIN flvls l),
    fblists AS (SELECT DISTINCT lvl, blk, list FROM fcarm),
    fqscore AS (
        SELECT x.c_custkey AS pid, ct.list, {ccsim} AS csim
        FROM fpros x CROSS JOIN fcent ct),
    fparm AS (
        SELECT p.c_custkey AS pid, l.lvl,
               CASE WHEN l.lvl = 0 THEN ''
                    ELSE substring(p.naics, 1, CAST(l.lvl AS INT)) END AS blk
        FROM fpros p CROSS JOIN flvls l),
    fprobed AS (
        SELECT pid, lvl, blk, list FROM (
            SELECT pa.pid, pa.lvl, pa.blk, bl.list, qs.csim,
                   row_number() OVER (
                       PARTITION BY pa.pid, pa.lvl
                       ORDER BY qs.csim DESC, bl.list) AS rn
            FROM fparm pa
            JOIN fblists bl ON pa.lvl = bl.lvl AND pa.blk = bl.blk
            JOIN fqscore qs ON qs.pid = pa.pid AND qs.list = bl.list)
        WHERE rn <= {_FD_NPROBE}),
    fcand AS (
        SELECT DISTINCT pr.pid AS tgt, ca.cid AS src
        FROM fprobed pr
        JOIN fcarm ca ON pr.lvl = ca.lvl AND pr.blk = ca.blk
                     AND pr.list = ca.list)
"""


def _fd_hybrid_score(l: str = "l", r: str = "r") -> str:
    return (
        f"CAST(0.6 AS DOUBLE) * ({_fd_vdot(l, r)})\n"
        f"               + CAST(0.399 AS DOUBLE) * ({_HOPS_SQL})\n"
        f"               + CAST(0.001 AS DOUBLE) * ({_HAVS_SQL})"
    )


def _fd_sides(spark: SparkSession, sf_dir: str):
    """(prospects, clients) on a localCheckpointed full-dim feature
    subtree — same rationale as ``_rank_sides``: the scan + log/scale
    stats + OHE + normalize feeds the candidate arms, both scoring
    sides, AND the window calibration; unmaterialized it re-executes
    per branch (measured cold-isolated at sf0.1: 32.2 → 28.1s for the
    production query, 27.5 → 22.0s for the IVF arm, 20.1 → 18.2s for
    the recall row).  Checkpoint blocks are reclaimed by the
    ContextCleaner when the result frames are GC'd."""
    firmo = _firmographics_full(spark, sf_dir).localCheckpoint()
    prospects = firmo.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("tgt_custkey"), "vec", "naics", "lat", "lon"
    )
    clients = firmo.filter(F.col("c_custkey") % 10 != 0).select(
        F.col("c_custkey").alias("src_custkey"), "vec", "naics", "lat", "lon"
    )
    return prospects, clients


#: Projection direction for the general-dim window arm: the
#: reference's FEATURE-WEIGHT PROFILE (search_ranking_peers.py:442,
#: 608-611) — fixed literals, so the projection is per-row
#: deterministic and bit-replayable in SQL (a data-derived mean/PCA
#: direction would ride nondeterministically-ordered aggregation).
_FD_DIRECTION = [_FD_W_REV, _FD_W_NUM, _FD_W_NUM, _FD_W_NUM] + [
    _FD_W_JPMC
] * len(_FD_SEGS)
#: Production floor for the 9-D projection window — derive-then-floor
#: like the 2-D path (derivation can only RAISE it).  Measured 9-D
#: max-need: 96 / 133 / 1305 at sf0.01 / 0.1 / 1 — so 512 covers every
#: driver/oracle scale with ≥ 3.8× margin (and the ×2-padded ladder of
#: the sf0.1 need, ladder(266) = 512, lands exactly on it, so the
#: derive-then-floor result is 512 at ALL oracle scales and the SQL
#: twin can pin it), while sf1 derives 2048-4096 and reads recall
#: 1.0000 there (SCALE.md round-13).
_FD_WINDOW = 512


def _fd_win_spark(
    spark: SparkSession, sf_dir: str, window: int | None = None
) -> DataFrame:
    """The projection-WINDOW arm of the full-dim peer search:
    derive-then-floor-at-512 projection-window candidates (memoized
    per snapshot via the same ``_DERIVED_WINDOW_CACHE`` the 2-D
    production query uses) + exact unrolled-codegen re-rank.  The
    recall-evidence query pins THIS arm; the production query rides
    :func:`_fd_prod_spark`, which dispatches between this arm and the
    exact kernel on the measured cost rule."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        hybrid_topk_pruned,
        projection_window_candidates,
    )

    prospects, clients = _fd_sides(spark, sf_dir)
    cand = projection_window_candidates(
        prospects, clients, "tgt_custkey", "src_custkey",
        _FD_DIRECTION, vec_col="vec", naics_col="naics",
        window=window, min_window=_FD_WINDOW,
        k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
        window_cache=_DERIVED_WINDOW_CACHE,
        cache_key=("fulldim", sf_dir, _FD_WINDOW),
    )
    return hybrid_topk_pruned(
        prospects, clients, "tgt_custkey", "src_custkey",
        vec_col="vec", naics_col="naics", lat_col="lat", lon_col="lon",
        k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
        candidates=cand, dim=_FD_DIM,
    )


#: Client-corpus counts memoized per snapshot for the dispatch (the
#: count is one job on a localCheckpointed slim frame; caching it
#: mirrors the window memo — sf_dir IS the snapshot identity here).
_FD_NCLIENTS_CACHE: dict[str, int] = {}


def _fd_derived_window(prospects: DataFrame, clients: DataFrame, sf_dir: str) -> int:
    """Derive-then-floor-at-512 window for the full-dim recipe,
    memoized under the SAME cache key ``projection_window_candidates``
    uses in :func:`_fd_win_spark` — safe to share because the two
    derivations are value-identical: client positions and insertion
    counts count CLIENTS only, so ranking alongside all prospects vs
    only the calibration sample yields the same max-need, the same
    ladder rung, the same window."""
    key = ("fulldim", sf_dir, _FD_WINDOW)
    if key not in _DERIVED_WINDOW_CACHE:
        from prod_recommendation_pyspark_spark.operators.hybrid import (
            derive_projection_window_stats,
        )

        stats = derive_projection_window_stats(
            prospects, clients, "tgt_custkey", "src_custkey", _FD_DIRECTION,
            k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
            min_window=_FD_WINDOW,
        )
        _DERIVED_WINDOW_CACHE[key] = int(stats["window"])
    return _DERIVED_WINDOW_CACHE[key]


def _fd_route(spark: SparkSession, sf_dir: str):
    """(prospects, clients, derived window, n_clients, kernel_chosen)
    — the dispatch inputs, shared by the production query and the
    registered dispatch-evidence query."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        projection_window_wins,
    )

    prospects, clients = _fd_sides(spark, sf_dir)
    w = _fd_derived_window(prospects, clients, sf_dir)
    if sf_dir not in _FD_NCLIENTS_CACHE:
        _FD_NCLIENTS_CACHE[sf_dir] = clients.count()
    n = _FD_NCLIENTS_CACHE[sf_dir]
    return prospects, clients, w, n, not projection_window_wins(w, n)


def _fd_prod_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE full-dim production body (round-13 verdict #1): derive the
    window, compare the window arm's predicted candidate volume
    against the exact blocked-GEMM kernel at the measured
    per-candidate cost ratio, and run the winner.  Both paths produce
    the identical top-15 wherever the window arm's recall is 1.0
    (measured at every oracle scale and sf1), so the dispatch changes
    the PLAN, never the result — which is exactly what lets the SQL
    twin stay pinned to the window replay."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        hybrid_topk_pruned,
        projection_window_candidates,
    )

    prospects, clients, w, n, kernel = _fd_route(spark, sf_dir)
    if kernel:
        return hybrid_topk(
            prospects, clients, "tgt_custkey", "src_custkey",
            vec_col="vec", naics_col="naics", lat_col="lat", lon_col="lon",
            k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
        )
    cand = projection_window_candidates(
        prospects, clients, "tgt_custkey", "src_custkey",
        _FD_DIRECTION, vec_col="vec", naics_col="naics", window=w,
        k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
    )
    return hybrid_topk_pruned(
        prospects, clients, "tgt_custkey", "src_custkey",
        vec_col="vec", naics_col="naics", lat_col="lat", lon_col="lon",
        k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
        candidates=cand, dim=_FD_DIM,
    )


def _fd_proj_sql(alias: str) -> str:
    terms = " + ".join(
        f"{alias}.v{i + 1} * CAST({w!r} AS DOUBLE)"
        for i, w in enumerate(_FD_DIRECTION)
    )
    return f"({terms})"


def _fd_win_cte(cli_filter: str = "", pro_filter: str = "") -> str:
    """ANSI replay of ``projection_window_candidates``: per level,
    clients ranked by (projection, id); each prospect's insertion
    point is the count of clients strictly before it; candidates are
    the ±window sorted neighborhood — the ``_rank_cte`` pattern with
    the 2-D angle proxy swapped for the 9-term weight-profile
    projection.

    ``cli_filter`` (an extra ``AND ...`` predicate on the fclis CTE)
    replays a DELETED client corpus — ``projection_window_delete_e2e``'s
    rebuild-minus-deleted oracle, exactly like ``_rank_cte``'s.
    ``pro_filter`` (same form, on fpros) restricts the PROSPECT side —
    the serving-batch replay: probes are per-row independent, so a
    batch's candidates are exactly the full replay filtered to the
    batch's prospects."""
    w = _FD_WINDOW
    return f"""
    fpros AS (SELECT *, {_fd_proj_sql('fnormed')} AS proj FROM fnormed
              WHERE c_custkey % 10 = 0{pro_filter}),
    fclis AS (SELECT *, {_fd_proj_sql('fnormed')} AS proj FROM fnormed
              WHERE c_custkey % 10 <> 0{cli_filter}),
    flvls AS (SELECT unnest(range(0, 7)) AS lvl),
    fcpos AS (SELECT l.lvl,
                     CASE WHEN l.lvl = 0 THEN ''
                          ELSE substring(c.naics, 1, CAST(l.lvl AS INTEGER))
                     END AS blk,
                     c.c_custkey, c.proj,
                     row_number() OVER (
                         PARTITION BY l.lvl,
                             CASE WHEN l.lvl = 0 THEN ''
                                  ELSE substring(c.naics, 1, CAST(l.lvl AS INTEGER))
                             END
                         ORDER BY c.proj, c.c_custkey) AS pos
              FROM fclis c CROSS JOIN flvls l),
    fpins AS (SELECT l.lvl,
                     CASE WHEN l.lvl = 0 THEN ''
                          ELSE substring(p.naics, 1, CAST(l.lvl AS INTEGER))
                     END AS blk,
                     p.c_custkey, p.proj,
                     (SELECT count(*) FROM fclis c
                       WHERE (l.lvl = 0 OR substring(c.naics, 1, CAST(l.lvl AS INTEGER))
                                           = substring(p.naics, 1, CAST(l.lvl AS INTEGER)))
                         AND (c.proj < p.proj
                              OR (c.proj = p.proj AND c.c_custkey < p.c_custkey))
                     ) AS ins
              FROM fpros p CROSS JOIN flvls l),
    fcand AS (SELECT DISTINCT p.c_custkey AS tgt, c.c_custkey AS src
              FROM fpins p JOIN fcpos c ON p.lvl = c.lvl AND p.blk = c.blk
               AND c.pos BETWEEN p.ins - {w - 1} AND p.ins + {w})
"""


def _fd_ivf_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        hybrid_topk_pruned,
        ivf_block_candidates,
    )
    from prod_recommendation_pyspark_spark.operators.similarity import (
        ivf_auto_centroids,
    )

    prospects, clients = _fd_sides(spark, sf_dir)
    # the candidate pass touches the client frame three times
    # (assignment, arms, centroid sample) and the re-rank once more —
    # persist the slim feature frame instead of re-deriving the
    # scaled/normalized plan per branch
    clients = clients.persist()
    centroids = ivf_auto_centroids(clients, "src_custkey", "vec")
    cand = ivf_block_candidates(
        prospects, clients, "tgt_custkey", "src_custkey",
        centroids, vec_col="vec", naics_col="naics",
        n_probe=_FD_NPROBE,
    )
    return hybrid_topk_pruned(
        prospects, clients, "tgt_custkey", "src_custkey",
        vec_col="vec", naics_col="naics", lat_col="lat", lon_col="lon",
        k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
        candidates=cand, dim=_FD_DIM,
    )


@register(
    "peer_search_fulldim_ivf_topk",
    sql=f"""
    WITH {_fd_firmo_sql()},
    {_fd_cand_cte()},
    fscored AS (
        SELECT fcand.tgt AS tgt_custkey, fcand.src AS src_custkey,
               {_fd_hybrid_score()} AS score
        FROM fcand JOIN fnormed l ON fcand.tgt = l.c_custkey
                   JOIN fnormed r ON fcand.src = r.c_custkey),
    franked AS (
        SELECT tgt_custkey, src_custkey, score,
               row_number() OVER (PARTITION BY tgt_custkey
                                  ORDER BY score DESC, src_custkey) AS rn
        FROM fscored WHERE score >= 0.0)
    SELECT tgt_custkey, src_custkey, round(score, 4) AS score
    FROM franked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
    negative_result=True,
)
def peer_search_fulldim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General-dim peer search, IVF ARM — DEMOTED to
    ``registry.NEGATIVE_RESULTS`` for the firmographics recipe in
    round 14 (r13 verdict #3 option (b), same discipline as the r7
    quadratic prune): still runnable and fully value-oracled for
    replay (the DuckDB twin re-derives centroid modulus, argmax
    assignment, per-(prospect, level) block probing, candidate set,
    and the 9-term score bit for bit; driver-green r13 on file), but
    no longer a production path or a sweep line for THIS geometry.

    Why demoted, measured: on the all-positive, w_rev-dominated
    recipe, recall vs the exact kernel plateaus at 0.9977 (sf0.1) /
    0.7962 (sf1) — cosine concentrates and sampled-centroid cells
    interleave along a ~1-D manifold, so the prospect's
    centroid-cosine order is a weak proxy for where its neighbors
    live.  Round 14 also tested the obvious better-signal candidate
    (rank lists by |proj(centroid) − proj(prospect)| on the feature-
    weight profile — the informative coordinate): candidate coverage
    of the true top-15 pairs at sf1 measured **0.1605** vs
    centroid-cosine's 0.7962 (scripts/measure_fulldim_r14.py, SCALE.md
    round-14) — the centroid projections are so concentrated that
    projection distance is noise at list granularity; the failed
    experiment is recorded rather than iterated past its evidence.
    The production path is ``peer_search_fulldim_topk`` (kernel-vs-
    window dispatch); ``ivf_block_candidates`` itself stays first-
    class for clustered/multi-modal geometries, where the ANN suite
    measures IVF winning."""
    return (
        _fd_ivf_spark(spark, sf_dir)
        .select(
            "tgt_custkey", "src_custkey", F.round("score", 4).alias("score")
        )
        .orderBy("tgt_custkey", "src_custkey")
    )


@register(
    "peer_search_fulldim_topk",
    sql=f"""
    WITH {_fd_firmo_sql()},
    {_fd_win_cte()},
    fscored AS (
        SELECT fcand.tgt AS tgt_custkey, fcand.src AS src_custkey,
               {_fd_hybrid_score()} AS score
        FROM fcand JOIN fnormed l ON fcand.tgt = l.c_custkey
                   JOIN fnormed r ON fcand.src = r.c_custkey),
    franked AS (
        SELECT tgt_custkey, src_custkey, score,
               row_number() OVER (PARTITION BY tgt_custkey
                                  ORDER BY score DESC, src_custkey) AS rn
        FROM fscored WHERE score >= 0.0)
    SELECT tgt_custkey, src_custkey, round(score, 4) AS score
    FROM franked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
)
def peer_search_fulldim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE general-dim production peer search — round 14: the engine
    now ACTS on the crossover it measured in round 13.  The body
    (``_fd_prod_spark``) derives the projection window
    (derive-then-floor-at-512, memoized per snapshot), predicts the
    window arm's candidate volume (``(code_len+1)·2·window`` per
    prospect), and DISPATCHES on the measured cost rule
    (``projection_window_wins``, cost ratio 32 ≈ the sf1-measured
    ~29× per-candidate overhead of the rank+fetch machinery vs one
    BLAS row): the exact blocked-GEMM kernel when the derived window
    is no longer a real prune — which is every scale of THIS
    near-uniform synthetic recipe, where window-need grows ~linearly
    with density (133 → 1305 per ×10 data; at sf1 the kernel measured
    51 s vs the window arm's 636 s on identical input) — and the
    projection-window arm (``projection_window_candidates`` at the
    derived window + exact unrolled-codegen re-rank) on clustered
    corpora whose derived windows stay small.

    The dispatch changes the PLAN, never the RESULT: the window arm's
    recall vs the kernel is measured 1.0000 at sf0.001/0.01/0.1
    (floor 512) and sf1 (derived 4096) — ``peer_search_fulldim_recall``
    pins the window arm against the kernel under the value oracle —
    so the SQL twin stays the bit-exact window-512 replay while the
    Spark side runs whichever plan is cheaper.  Dispatch inputs are
    themselves value-oracled (``peer_search_fulldim_dispatch``).  Why
    not IVF: on this all-positive, w_rev-dominated geometry cosine
    concentrates and sampled-centroid cells interleave — the IVF arm
    plateaus at 0.9977 (sf0.1) / 0.7962 (sf1), and the round-14
    better-signal experiment (projection-distance list ranking) made
    it WORSE (coverage 0.1605 at sf1), so
    ``peer_search_fulldim_ivf_topk`` is demoted to
    ``registry.NEGATIVE_RESULTS`` for this recipe (value-oracled for
    replay; the operator stays first-class for clustered geometries).

    Serving lifecycle (round 14): the window arm's nightly artifact is
    ``projection_window_index`` / ``probe`` (__w + __dir stamped;
    ``peer_search_fulldim_probe_parity`` pins the probed serving under
    this same oracle).  Reference anchor: the blocked-matmul batching
    intent at search_ranking_peers.py:489-494,240-243."""
    return (
        _fd_prod_spark(spark, sf_dir)
        .select(
            "tgt_custkey", "src_custkey", F.round("score", 4).alias("score")
        )
        .orderBy("tgt_custkey", "src_custkey")
    )


@register(
    "peer_search_fulldim_recall",
    sql=f"""
    WITH {_fd_firmo_sql()},
    {_fd_win_cte()},
    fscored AS (
        SELECT fcand.tgt AS tgt_custkey, fcand.src AS src_custkey,
               {_fd_hybrid_score()} AS score
        FROM fcand JOIN fnormed l ON fcand.tgt = l.c_custkey
                   JOIN fnormed r ON fcand.src = r.c_custkey),
    fpruned AS (
        SELECT tgt_custkey, src_custkey FROM (
            SELECT tgt_custkey, src_custkey,
                   row_number() OVER (PARTITION BY tgt_custkey
                                      ORDER BY score DESC, src_custkey) AS rn
            FROM fscored WHERE score >= 0.0)
        WHERE rn <= 15),
    fexact_scored AS (
        SELECT l.c_custkey AS tgt_custkey, r.c_custkey AS src_custkey,
               {_fd_hybrid_score()} AS score
        FROM fnormed l JOIN fnormed r
          ON l.c_custkey % 10 = 0 AND r.c_custkey % 10 <> 0),
    fexact AS (
        SELECT tgt_custkey, src_custkey FROM (
            SELECT tgt_custkey, src_custkey,
                   row_number() OVER (PARTITION BY tgt_custkey
                                      ORDER BY score DESC, src_custkey) AS rn
            FROM fexact_scored WHERE score >= 0.0)
        WHERE rn <= 15),
    fcounts AS (
        SELECT (SELECT count(*) FROM fexact) AS n_exact,
               (SELECT count(*) FROM fpruned) AS n_pruned,
               (SELECT count(*) FROM fexact e JOIN fpruned p
                 ON e.tgt_custkey = p.tgt_custkey
                AND e.src_custkey = p.src_custkey) AS n_common)
    SELECT n_exact, n_pruned, n_common,
           round(CAST(n_common AS DOUBLE) / n_exact, 4) AS recall,
           CAST(n_common AS DOUBLE) / n_exact >= 0.95 AS recall_ok
    FROM fcounts
    """,
)
def peer_search_fulldim_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall evidence for the general-dim PRODUCTION path: the exact
    blocked BLAS kernel (``hybrid_topk`` — dimension-generic since
    round 2) and the projection-window path both run on the SAME
    9-dim features; one row of set statistics, all five columns
    independently recomputed by DuckDB (the oracle derives BOTH pair
    sets itself, so a hash match proves the Spark kernel, the Spark
    candidate path, AND the measured recall).  Floor ≥ 0.95 as the
    contract boolean; measured 1.0000 at sf0.001/sf0.01/sf0.1 (floor
    512) and sf1 (derived 4096) — SCALE.md round-13 row.  The IVF
    arm's recall (0.9977 at sf0.1, 0.7962 at sf1) is recorded in
    SCALE.md — it stays the fallback for geometries where a single
    projection is uninformative."""
    prospects, clients = _fd_sides(spark, sf_dir)
    prospects = prospects.persist()
    clients = clients.persist()
    exact = hybrid_topk(
        prospects, clients, "tgt_custkey", "src_custkey",
        vec_col="vec", naics_col="naics", lat_col="lat", lon_col="lon",
        k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
    ).select("tgt_custkey", "src_custkey", F.lit(1).alias("__e"))
    pruned = _fd_win_spark(spark, sf_dir).select(
        "tgt_custkey", "src_custkey", F.lit(1).alias("__p")
    )
    joined = exact.join(pruned, ["tgt_custkey", "src_custkey"], "full")
    n_common = F.count(
        F.when(F.col("__e").isNotNull() & F.col("__p").isNotNull(), 1)
    )
    n_exact = F.count("__e")
    n_pruned = F.count("__p")
    return joined.agg(
        n_exact.alias("n_exact"),
        n_pruned.alias("n_pruned"),
        n_common.alias("n_common"),
        F.round(n_common.cast("double") / n_exact, 4).alias("recall"),
        (n_common.cast("double") / n_exact >= 0.95).alias("recall_ok"),
    )


@register(
    "peer_search_fulldim_dispatch",
    sql=f"""
    WITH {_fd_firmo_sql()},
    fclis AS (SELECT * FROM fnormed WHERE c_custkey % 10 <> 0)
    SELECT CAST({_FD_WINDOW} AS INTEGER) AS derived_window,
           (SELECT count(*) FROM fclis) AS n_clients,
           CAST(7 * 2 * {_FD_WINDOW} AS BIGINT) AS pred_candidates,
           CAST(7 * 2 * {_FD_WINDOW} AS BIGINT) * 32
               >= (SELECT count(*) FROM fclis) AS kernel_chosen
    """,
)
def peer_search_fulldim_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISPATCH-evidence row for the full-dim production query
    (round-13 verdict #1's pytest-plus-oracle 'Done'): the derived
    window, the client count, the window arm's predicted per-prospect
    candidate volume, and the routing decision, all under the value
    oracle.  The SQL twin PINS ``derived_window`` at 512 — the claim
    that derive-then-floor lands exactly on the floor at every oracle
    scale (max-need 96/133 at sf0.01/0.1, ×2 pad, ladder(266) = 512)
    — and recomputes the client count and the cost rule
    (``pred · 32 ≥ n_clients`` ⇒ kernel) independently, so a
    hash-green row proves the dispatcher's BOTH inputs and its
    decision.  On this recipe the kernel is chosen at every oracle
    scale AND at sf1/sf10 (the window only wins when
    ``14·w·32 < |clients|`` — clustered corpora with small derived
    windows); the rule's boundary behavior is pytest-pinned
    (test_projection_artifact.py)."""
    _, _, w, n, kernel = _fd_route(spark, sf_dir)
    from prod_recommendation_pyspark_spark.operators.hybrid import CODE_LEN

    pred = (CODE_LEN + 1) * 2 * w
    return spark.createDataFrame(
        [(int(w), int(n), int(pred), bool(kernel))],
        "derived_window int, n_clients long, pred_candidates long, "
        "kernel_chosen boolean",
    )


def _srv_ratio_sql(n_expr: str) -> str:
    """DuckDB replay of ``hybrid.serving_cost_ratio``: the kernel/probe
    per-pair cost ratio log-log interpolated between the two measured
    decades, built from the SAME literal throughput constants so the
    oracle recomputes the rule's every input independently."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        SERVING_KERNEL_PAIRS_PER_SEC,
        SERVING_PROBE_PAIRS_PER_SEC,
    )

    lo_n, hi_n = 135_000, 1_350_000
    r_lo = (
        f"({SERVING_KERNEL_PAIRS_PER_SEC[lo_n]!r}"
        f" / {SERVING_PROBE_PAIRS_PER_SEC[lo_n]!r})"
    )
    r_hi = (
        f"({SERVING_KERNEL_PAIRS_PER_SEC[hi_n]!r}"
        f" / {SERVING_PROBE_PAIRS_PER_SEC[hi_n]!r})"
    )
    clamped = (
        f"least(greatest(CAST({n_expr} AS DOUBLE), {float(lo_n)!r}),"
        f" {float(hi_n)!r})"
    )
    t = (
        f"((ln({clamped}) - ln({float(lo_n)!r}))"
        f" / (ln({float(hi_n)!r}) - ln({float(lo_n)!r})))"
    )
    return f"exp(ln({r_lo}) + {t} * (ln({r_hi}) - ln({r_lo})))"


@register(
    "peer_search_serving_dispatch",
    sql=f"""
    WITH {_fd_firmo_sql()},
    fclis AS (SELECT * FROM fnormed WHERE c_custkey % 10 <> 0),
    n AS (SELECT count(*) AS n_clients FROM fclis),
    r AS (SELECT n_clients, {_srv_ratio_sql('n_clients')} AS ratio FROM n)
    SELECT CAST({_FD_WINDOW} AS INTEGER) AS derived_window,
           n_clients,
           CAST(7 * 2 * {_FD_WINDOW} AS BIGINT) AS pred_probe_pairs,
           round(ratio, 4) AS cost_ratio,
           CAST(7 * 2 * {_FD_WINDOW} AS DOUBLE) * ratio < n_clients
               AS probe_chosen
    FROM r
    """,
)
def peer_search_serving_dispatch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DISPATCH-evidence row for the SERVING path (round-14 verdict
    #1), the ``peer_search_fulldim_dispatch`` protocol applied to
    ``hybrid.serving_probe_wins``: the artifact's window, the client
    count, the probe's predicted per-prospect fetched-pair volume, the
    interpolated kernel/probe cost ratio at this corpus size, and the
    routing decision — every input AND the decision recomputed
    independently by the SQL twin (which pins ``derived_window`` at
    the floor-512 claim and rebuilds the ratio from the same literal
    throughput constants — rotated round 16 to the SCALE.md round-15
    re-measure in LOCKSTEP with the rule, the oracle's literals being
    built from the constants at registration).  At the oracle scales
    the clamped ratio is ~0.719 and the rule reads
    ``14·512·0.719 < |clients|`` — probe at sf0.1 (13.5k clients),
    kernel at sf0.01 (1.35k), the same verdicts as before the
    rotation — so the sweeps exercise BOTH verdicts;
    the measured decade geometries are pytest-pinned
    (tests/test_projection_artifact.py)."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        CODE_LEN,
        serving_cost_ratio,
        serving_probe_wins,
    )

    prospects, clients = _fd_sides(spark, sf_dir)
    w = _fd_derived_window(prospects, clients, sf_dir)
    if sf_dir not in _FD_NCLIENTS_CACHE:
        _FD_NCLIENTS_CACHE[sf_dir] = clients.count()
    n = _FD_NCLIENTS_CACHE[sf_dir]
    pred = (CODE_LEN + 1) * 2 * w
    return spark.createDataFrame(
        [
            (
                int(w),
                int(n),
                int(pred),
                float(round(serving_cost_ratio(n), 4)),
                bool(serving_probe_wins(w, n)),
            )
        ],
        "derived_window int, n_clients long, pred_probe_pairs long, "
        "cost_ratio double, probe_chosen boolean",
    )


@register(
    "peer_search_serve_batch_e2e",
    sql=f"""
    WITH {_fd_firmo_sql()},
    {_fd_win_cte(pro_filter=" AND c_custkey % 30 = 0")},
    fscored AS (
        SELECT fcand.tgt AS tgt_custkey, fcand.src AS src_custkey,
               {_fd_hybrid_score()} AS score
        FROM fcand JOIN fnormed l ON fcand.tgt = l.c_custkey
                   JOIN fnormed r ON fcand.src = r.c_custkey),
    franked AS (
        SELECT tgt_custkey, src_custkey, score,
               row_number() OVER (PARTITION BY tgt_custkey
                                  ORDER BY score DESC, src_custkey) AS rn
        FROM fscored WHERE score >= 0.0)
    SELECT tgt_custkey, src_custkey, round(score, 4) AS score
    FROM franked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
)
def peer_search_serve_batch_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END serving dispatch under the full value oracle
    (round-14 verdict #1's 'Done'): one intraday prospect batch
    (every 3rd prospect) answered through ``hybrid.serve_batch`` —
    which resolves the ``__dir`` artifact's family/metadata, applies
    the measured ``serving_probe_wins`` rule, and runs the winning
    route.  The oracle is the batch-restricted window-512 replay; it
    pins EITHER route because the derived window keeps recall 1.0 on
    this recipe at every measured scale, so the dispatch changes the
    plan, never the result — the same invariance the batch dispatch's
    oracle rides.  Across the sweep scales the rule actually flips
    (kernel at sf0.01's 1.35k clients, probe at sf0.1's 13.5k), so a
    green row at both scales is evidence for both routes end to end."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        projection_window_index,
        serve_batch,
    )

    prospects, clients = _fd_sides(spark, sf_dir)
    batch = prospects.filter(F.col("tgt_custkey") % 30 == 0)
    index = projection_window_index(
        clients, "src_custkey", _FD_DIRECTION, window=_FD_WINDOW
    ).localCheckpoint()
    if sf_dir not in _FD_NCLIENTS_CACHE:
        _FD_NCLIENTS_CACHE[sf_dir] = clients.count()
    out = serve_batch(
        batch, index, clients, "tgt_custkey", "src_custkey",
        vec_col="vec", naics_col="naics", lat_col="lat", lon_col="lon",
        k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
        n_right=_FD_NCLIENTS_CACHE[sf_dir],
    )
    return (
        out.select(
            "tgt_custkey", "src_custkey", F.round("score", 4).alias("score")
        )
        .orderBy("tgt_custkey", "src_custkey")
    )


@register(
    "peer_search_fulldim_probe_parity",
    sql=f"""
    WITH {_fd_firmo_sql()},
    {_fd_win_cte()},
    fscored AS (
        SELECT fcand.tgt AS tgt_custkey, fcand.src AS src_custkey,
               {_fd_hybrid_score()} AS score
        FROM fcand JOIN fnormed l ON fcand.tgt = l.c_custkey
                   JOIN fnormed r ON fcand.src = r.c_custkey),
    franked AS (
        SELECT tgt_custkey, src_custkey, score,
               row_number() OVER (PARTITION BY tgt_custkey
                                  ORDER BY score DESC, src_custkey) AS rn
        FROM fscored WHERE score >= 0.0)
    SELECT tgt_custkey, src_custkey, round(score, 4) AS score
    FROM franked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
)
def peer_search_fulldim_probe_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SERVING-PATH twin of the full-dim window arm (round-13 verdict
    #2's 'Done' query): build the general-dim nightly artifact ONCE
    (operators/hybrid.py::projection_window_index — client corpus
    ranked per arm by the reference-weight-profile projection, __w and
    __dir stamped as metadata), answer the prospect set in TWO
    independent probe batches
    (operators/hybrid.py::projection_window_probe — window AND
    direction read off the artifact; mismatches raise), score and
    top-15 exactly like the batch path.  The FULL VALUE ORACLE is the
    same window-512 CTE as ``peer_search_fulldim_topk``'s: a
    hash-green row proves the index's dense per-arm positions under
    the projection key, the probe's block-summary insertion
    arithmetic, and batch-split invariance end-to-end against an
    independent SQL replay.  This closes round-13 gap #1: the 9-D
    production recipe now has the same nightly-build /
    intraday-probe economics as the 2-D path (the distributed rank
    runs at BUILD time; probes touch ≤4 window blocks per (prospect,
    arm) — see the ``serving:projection_window_probe`` bench row).
    CRUD rides the shared metadata-dispatched cells
    (rank_window_compact / rank_window_insert — pytest-pinned
    rebuild equivalences on __dir artifacts)."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        hybrid_topk_pruned,
        projection_window_index,
        projection_window_probe,
    )

    prospects, clients = _fd_sides(spark, sf_dir)
    index = projection_window_index(
        clients, "src_custkey", _FD_DIRECTION, window=_FD_WINDOW
    ).localCheckpoint()
    batches = [
        prospects.filter(F.col("tgt_custkey") % 20 == 0),
        prospects.filter(F.col("tgt_custkey") % 20 != 0),
    ]
    probed = [
        projection_window_probe(b, index, "tgt_custkey", "src_custkey")
        for b in batches
    ]
    cand = probed[0].unionByName(probed[1])
    return (
        hybrid_topk_pruned(
            prospects, clients, "tgt_custkey", "src_custkey",
            vec_col="vec", naics_col="naics", lat_col="lat", lon_col="lon",
            k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
            candidates=cand, dim=_FD_DIM, broadcast_sides=True,
        )
        .select(
            "tgt_custkey", "src_custkey", F.round("score", 4).alias("score")
        )
        .orderBy("tgt_custkey", "src_custkey")
    )


@register(
    "projection_window_delete_e2e",
    sql=f"""
    WITH {_fd_firmo_sql()},
    {_fd_win_cte(cli_filter=" AND c_custkey % 9 <> 4")},
    fscored AS (
        SELECT fcand.tgt AS tgt_custkey, fcand.src AS src_custkey,
               {_fd_hybrid_score()} AS score
        FROM fcand JOIN fnormed l ON fcand.tgt = l.c_custkey
                   JOIN fnormed r ON fcand.src = r.c_custkey),
    franked AS (
        SELECT tgt_custkey, src_custkey, score,
               row_number() OVER (PARTITION BY tgt_custkey
                                  ORDER BY score DESC, src_custkey) AS rn
        FROM fscored WHERE score >= 0.0)
    SELECT tgt_custkey, src_custkey, round(score, 4) AS score
    FROM franked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
)
def projection_window_delete_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE lifecycle on the 9-D serving artifact, under the full
    value oracle — the projection twin of ``rank_window_delete_e2e``:
    a third of an id-class of clients is tombstoned, the ``__dir``
    artifact is compacted by the SHARED metadata-dispatched
    ``rank_window_compact`` (surviving rows re-ranked over their
    STORED projection keys — no corpus rescan, no re-projection,
    ``__dir`` re-stamped), and the window-less, direction-less probe
    serves off the compacted artifact.  The oracle re-derives the
    whole pipeline over the SURVIVING clients (``_fd_win_cte`` with
    the deleted ids filtered out — ranks, insertion points, windows
    all rebuilt-minus-deleted), so a hash-green row proves compaction
    ≡ rebuild for the projection family end to end.  Pre-compaction
    tombstone-probe semantics are pytest-pinned separately
    (tests/test_projection_artifact.py)."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        hybrid_topk_pruned,
        projection_window_index,
        projection_window_probe,
        rank_window_compact,
    )

    prospects, clients = _fd_sides(spark, sf_dir)
    index = projection_window_index(
        clients, "src_custkey", _FD_DIRECTION, window=_FD_WINDOW
    )
    tombs = clients.filter(F.col("src_custkey") % 9 == 4).select(
        "src_custkey"
    )
    compacted = rank_window_compact(index, tombs).localCheckpoint()
    cand = projection_window_probe(
        prospects, compacted, "tgt_custkey", "src_custkey"
    )
    kept = clients.join(F.broadcast(tombs), "src_custkey", "left_anti")
    return (
        hybrid_topk_pruned(
            prospects, kept, "tgt_custkey", "src_custkey",
            vec_col="vec", naics_col="naics", lat_col="lat", lon_col="lon",
            k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
            candidates=cand, dim=_FD_DIM, broadcast_sides=True,
        )
        .select(
            "tgt_custkey", "src_custkey", F.round("score", 4).alias("score")
        )
        .orderBy("tgt_custkey", "src_custkey")
    )


@register(
    "projection_window_insert_e2e",
    sql=f"""
    WITH {_fd_firmo_sql()},
    {_fd_win_cte()},
    fscored AS (
        SELECT fcand.tgt AS tgt_custkey, fcand.src AS src_custkey,
               {_fd_hybrid_score()} AS score
        FROM fcand JOIN fnormed l ON fcand.tgt = l.c_custkey
                   JOIN fnormed r ON fcand.src = r.c_custkey),
    franked AS (
        SELECT tgt_custkey, src_custkey, score,
               row_number() OVER (PARTITION BY tgt_custkey
                                  ORDER BY score DESC, src_custkey) AS rn
        FROM fscored WHERE score >= 0.0)
    SELECT tgt_custkey, src_custkey, round(score, 4) AS score
    FROM franked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
)
def projection_window_insert_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT lifecycle on the 9-D serving artifact, under the full
    value oracle — the projection twin of ``rank_window_insert_e2e``:
    the nightly ``__dir`` artifact is built on a PARTIAL client corpus
    (src_custkey % 6 != 5), the remaining clients arrive intraday and
    merge through the SHARED metadata-dispatched ``rank_window_insert``
    — which reads the direction OFF THE ARTIFACT, keys ONLY the
    arrivals with it, and re-runs the distributed dense rank against
    the stored slim rows (no rescan, intra-batch duplicate ids
    dropped) — and the metadata-less probe serves off the grown
    artifact.  The oracle is the full-corpus projection-window replay,
    so a hash-green row proves insert ≡ rebuild-over-the-grown-corpus
    for the projection family end to end."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        hybrid_topk_pruned,
        projection_window_index,
        projection_window_probe,
        rank_window_insert,
    )

    prospects, clients = _fd_sides(spark, sf_dir)
    old = clients.filter(F.col("src_custkey") % 6 != 5)
    arrivals = clients.filter(F.col("src_custkey") % 6 == 5)
    index = projection_window_index(
        old, "src_custkey", _FD_DIRECTION, window=_FD_WINDOW
    )
    grown = rank_window_insert(
        index, arrivals, "src_custkey"
    ).localCheckpoint()
    cand = projection_window_probe(
        prospects, grown, "tgt_custkey", "src_custkey"
    )
    return (
        hybrid_topk_pruned(
            prospects, clients, "tgt_custkey", "src_custkey",
            vec_col="vec", naics_col="naics", lat_col="lat", lon_col="lon",
            k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
            candidates=cand, dim=_FD_DIM, broadcast_sides=True,
        )
        .select(
            "tgt_custkey", "src_custkey", F.round("score", 4).alias("score")
        )
        .orderBy("tgt_custkey", "src_custkey")
    )


@register(
    "streaming_projection_serving_replay",
    sql=f"""
    WITH {_fd_firmo_sql()},
    {_fd_win_cte()},
    fscored AS (
        SELECT fcand.tgt AS tgt_custkey, fcand.src AS src_custkey,
               {_fd_hybrid_score()} AS score
        FROM fcand JOIN fnormed l ON fcand.tgt = l.c_custkey
                   JOIN fnormed r ON fcand.src = r.c_custkey),
    franked AS (
        SELECT tgt_custkey, src_custkey, score,
               row_number() OVER (PARTITION BY tgt_custkey
                                  ORDER BY score DESC, src_custkey) AS rn
        FROM fscored WHERE score >= 0.0)
    SELECT tgt_custkey, src_custkey, round(score, 4) AS score
    FROM franked WHERE rn <= 15
    ORDER BY tgt_custkey, src_custkey
    """,
)
def streaming_projection_serving_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 24/7 serving loop for the GENERAL-DIM artifact, registered
    under the full value oracle — the projection twin of
    ``streaming_peer_serving_replay``, and the round-14 proof that the
    streaming loops are artifact-FAMILY-driven: the same
    ``streaming/joins.py::streaming_peer_serving`` is handed a
    ``__dir`` artifact, detects the family from the metadata ONCE at
    start (``_resolve_serving_probe`` — window + direction validated,
    then stripped so no per-batch metadata jobs run), probes each of
    three real micro-batches with the projection key, and exact-scores
    at the direction's dim.  Prospects land in exactly one micro-batch
    and the probe is per-row independent, so the unioned per-batch
    top-15 IS the batch path's — the same window-512 CTE replays the
    whole loop, pinning the streaming execution end to end."""
    import atexit
    import os
    import shutil
    import tempfile

    from prod_recommendation_pyspark_spark.operators.hybrid import (
        projection_window_index,
    )
    from prod_recommendation_pyspark_spark.streaming.joins import (
        streaming_peer_serving,
    )

    prospects, clients = _fd_sides(spark, sf_dir)
    index = projection_window_index(
        clients, "src_custkey", _FD_DIRECTION, window=_FD_WINDOW
    ).localCheckpoint()
    base = tempfile.mkdtemp(prefix="projection_serving_replay_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    landing, out = f"{base}/landing", f"{base}/out"
    for i in range(3):  # three part files -> three micro-batches
        prospects.filter(F.col("tgt_custkey") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    stream = (
        spark.readStream.schema(prospects.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )

    def emit(df: DataFrame, batch_id: int) -> None:
        df.write.mode("append").parquet(out)

    q = streaming_peer_serving(
        stream, index, clients, "tgt_custkey", "src_custkey", emit,
        k=TOPK_PEERS, threshold=THRESHOLD, w_hops=W_HOPS, w_havs=W_HAVS,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    shutil.rmtree(landing, ignore_errors=True)
    if not os.path.isdir(out):  # no batch emitted (empty prospect set)
        return spark.createDataFrame(
            [], "tgt_custkey long, src_custkey long, score double"
        )
    return (
        spark.read.parquet(out)
        .select(
            "tgt_custkey", "src_custkey", F.round("score", 4).alias("score")
        )
        .orderBy("tgt_custkey", "src_custkey")
    )
