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
