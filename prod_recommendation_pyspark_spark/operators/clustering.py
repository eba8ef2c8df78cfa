"""K-means clustering over array<float|double> embedding columns
(LLM-data-pipeline extension: cluster-based curation/dedup/sampling,
and the centroid builder for the IVF ANN index in
``operators/similarity.py``).

Spark-first Lloyd iterations, no MLlib VectorUDT:

* assignment = broadcast centroid table + squared-L2 distance as a
  ``zip_with``/``aggregate`` expression + windowed top-1 — one shuffle
  per iteration (the windowed min), centroids never leave the JVM;
* update = per-cluster element-wise mean via ``k × dim`` native
  ``avg(v[i])`` aggregates (dim is a literal — the projection is
  codegen'd), one shuffle on the cluster id;
* per-iteration ``localCheckpoint`` truncates lineage (the
  connected-components lesson: nested iterative plans grow
  exponentially in analysis cost otherwise);
* deterministic seeding: the first ``k`` rows by id order — fully
  reproducible, and oracle-checkable one step at a time.

Scale: each iteration is two shuffles over (rows × 1) assignment and
(k × dim) partials; the centroid table (k × dim doubles) must fit in a
broadcast, which is the standard k-means-on-a-cluster contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.relational import windowed_topk


def sq_l2(a: Column, b: Column) -> Column:
    """Squared Euclidean distance between two array columns (native
    fold — same IEEE left-to-right order as a SQL transliteration)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    cluster_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment by squared L2 (ties → lowest
    cluster id, deterministic).  ``centroids``: (cluster, vec).
    Broadcast join + windowed top-1; no UDF."""
    c = centroids.select(
        F.col("cluster").alias(cluster_col), F.col("vec").alias("__cvec")
    )
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
    scored = v.crossJoin(F.broadcast(c)).select(
        id_col,
        cluster_col,
        sq_l2(F.col("__v"), F.col("__cvec")).alias("__d2"),
    )
    return windowed_topk(
        scored, id_col, [F.col("__d2"), F.col(cluster_col)], 1
    ).select(id_col, cluster_col, "__d2")


def kmeans_update(
    assigned: DataFrame,
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    cluster_col: str = "cluster",
) -> DataFrame:
    """New centroids = element-wise mean per cluster: ``dim`` native
    ``avg(v[i])`` aggregates in one pass (dim is a compile-time
    literal, so the projection stays inside whole-stage codegen)."""
    joined = assigned.select(id_col, cluster_col).join(
        df.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
        ),
        id_col,
    )
    aggs = [F.avg(F.col("__v")[i]).alias(f"__m{i}") for i in range(dim)]
    means = joined.groupBy(cluster_col).agg(*aggs)
    return means.select(
        F.col(cluster_col).alias("cluster"),
        F.array(*[F.col(f"__m{i}") for i in range(dim)]).alias("vec"),
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    max_iter: int = 10,
    tol: float = 1e-6,
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's algorithm; returns ``(assignments, centroids)``.

    Seeds = the ``k`` lowest-id rows (deterministic; at scale seed from
    a pre-sampled id list instead of a global sort-limit — TakeOrdered
    ships only k rows to the driver either way).  Convergence = max
    per-centroid squared shift ≤ ``tol`` (one tiny k-row compare per
    round).  Empty clusters keep their previous centroid (standard
    Lloyd fallback)."""
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    spark = df.sparkSession
    if dim_row is None:  # empty input: no assignments, no centroids
        empty_assign = spark.createDataFrame(
            [], f"{id_col} long, cluster int, __d2 double"
        )
        empty_cents = spark.createDataFrame([], "cluster int, vec array<double>")
        return empty_assign, empty_cents
    dim = int(dim_row["d"])
    cents = (
        df.orderBy(id_col)
        .limit(k)
        .select(
            F.col(id_col).alias("__seed_id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
        )
    )
    # re-key clusters 0..k-1 deterministically by seed id order
    seed_rows = cents.collect()
    centroids = spark.createDataFrame(
        [(i, list(r["vec"])) for i, r in enumerate(sorted(seed_rows, key=lambda r: r["__seed_id"]))],
        "cluster int, vec array<double>",
    ).localCheckpoint(eager=True)
    assigned = None
    for _ in range(max_iter):
        assigned = kmeans_assign(df, id_col, vec_col, centroids)
        new_raw = kmeans_update(assigned, df, id_col, vec_col, dim)
        # empty clusters keep the previous centroid
        merged = (
            centroids.select(
                "cluster", F.col("vec").alias("__old")
            )
            .join(new_raw, "cluster", "left")
            .select(
                "cluster",
                F.coalesce(F.col("vec"), F.col("__old")).alias("vec"),
                F.col("__old"),
            )
        )
        shifted = merged.select(
            F.max(sq_l2(F.col("vec"), F.col("__old"))).alias("s")
        ).first()["s"]
        centroids = merged.select("cluster", "vec").localCheckpoint(eager=True)
        if shifted is not None and shifted <= tol:
            break
    final_assign = kmeans_assign(df, id_col, vec_col, centroids)
    return final_assign, centroids


def kmeans_inertia(assigned: DataFrame) -> float:
    """Sum of squared distances to the assigned centroid — the
    monotone-non-increasing Lloyd objective (property-test hook)."""
    return float(assigned.agg(F.sum("__d2")).first()[0] or 0.0)
