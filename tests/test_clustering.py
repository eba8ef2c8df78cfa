"""K-means (Lloyd) properties: deterministic seeding, monotone
non-increasing inertia across iterations, exactly-one cluster per
point, empty-cluster survival."""

from __future__ import annotations

from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    kmeans_inertia,
    kmeans_update,
)
from tests.conftest import SF_SMOKE


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_kmeans_fit_is_deterministic(spark):
    emb = _emb(spark)
    a1, c1 = kmeans_fit(emb, "vec_id", "embedding", k=5, max_iter=4)
    a2, c2 = kmeans_fit(emb, "vec_id", "embedding", k=5, max_iter=4)
    rows1 = {(r["vec_id"], r["cluster"]) for r in a1.collect()}
    rows2 = {(r["vec_id"], r["cluster"]) for r in a2.collect()}
    assert rows1 == rows2
    cents1 = {r["cluster"]: tuple(round(x, 9) for x in r["vec"]) for r in c1.collect()}
    cents2 = {r["cluster"]: tuple(round(x, 9) for x in r["vec"]) for r in c2.collect()}
    assert cents1 == cents2


def test_kmeans_inertia_non_increasing(spark):
    emb = _emb(spark)
    # manual Lloyd rounds with the operator primitives
    centroids = (
        emb.orderBy("vec_id")
        .limit(4)
        .select(
            F.monotonically_increasing_id().alias("__tmp"),
            F.col("embedding").cast("array<double>").alias("vec"),
        )
    )
    rows = centroids.collect()
    centroids = spark.createDataFrame(
        [(i, list(r["vec"])) for i, r in enumerate(rows)],
        "cluster int, vec array<double>",
    )
    inertias = []
    for _ in range(3):
        assigned = kmeans_assign(emb, "vec_id", "embedding", centroids)
        inertias.append(kmeans_inertia(assigned))
        centroids = (
            centroids.select("cluster", F.col("vec").alias("__old"))
            .join(
                kmeans_update(assigned, emb, "vec_id", "embedding", dim=64),
                "cluster",
                "left",
            )
            .select(
                "cluster", F.coalesce(F.col("vec"), F.col("__old")).alias("vec")
            )
            .localCheckpoint(eager=True)
        )
    assert all(
        b <= a + 1e-9 for a, b in zip(inertias, inertias[1:])
    ), f"inertia increased: {inertias}"
    assert inertias[-1] < inertias[0]  # it actually improves on this data


def test_kmeans_assign_one_cluster_per_point(spark):
    emb = _emb(spark)
    _, cents = kmeans_fit(emb, "vec_id", "embedding", k=3, max_iter=2)
    assigned = kmeans_assign(emb, "vec_id", "embedding", cents)
    n_points = emb.count()
    assert assigned.count() == n_points
    assert assigned.select("vec_id").distinct().count() == n_points
    assert assigned.select("cluster").distinct().count() <= 3


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # 2 tight groups, k=3 seeded so one centroid starts far away and
    # captures nothing after the first update
    rows = [(i, [0.0 + i * 0.01, 0.0]) for i in range(5)] + [
        (10 + i, [10.0 + i * 0.01, 0.0]) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    _, cents = kmeans_fit(df, "id", "v", k=3, max_iter=3)
    assert cents.count() == 3  # no cluster vanished


def test_pagerank_hand_computed(spark):
    """3-node graph, one iteration checked by hand: 1→2, 2→1, 3→1,
    damping 0.5, N=3, r0 = 1/3 each.  After one step:
    rank(1) = 1/6 + 0.5·(r(2)/1 + r(3)/1) = 1/2,
    rank(2) = 1/6 + 0.5·(r(1)/1)        = 1/3,
    rank(3) = 1/6 + 0.5·0               = 1/6.
    Total mass stays 1.0 (no dangling nodes here)."""
    from prod_recommendation_pyspark_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 1)], "src long, dst long"
    )
    got = {
        r.node: round(r.rank, 9)
        for r in pagerank(edges, iterations=1, damping=0.5).collect()
    }
    assert got == {1: round(0.5, 9), 2: round(1 / 3, 9), 3: round(1 / 6, 9)}
    total = sum(
        r.rank for r in pagerank(edges, iterations=3, damping=0.5).collect()
    )
    assert abs(total - 1.0) < 1e-9
