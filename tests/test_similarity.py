"""Kernel correctness properties: the blocked mapInPandas kernel must
agree exactly with the declarative crossJoin baseline, with and without
blocking; self-similarity of a normalized vector is 1."""

from __future__ import annotations

from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_crossjoin,
    l2_normalize,
)
from tests.conftest import SF_SMOKE


def _normalized(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    return l2_normalize(emb, "embedding", "vec")


def _pairs(df):
    return {
        (r.tgt_id, r.nbr_id, round(r.score, 9)) for r in df.collect()
    }


def test_kernel_equals_crossjoin(spark):
    norm = _normalized(spark)
    left = norm.select(F.col("vec_id").alias("tgt_id"), "vec")
    right = norm.select(F.col("vec_id").alias("nbr_id"), "vec")
    kern = cosine_topk(left, right, "tgt_id", "nbr_id", "vec", k=5, exclude_self=True)
    base = cosine_topk_crossjoin(
        left, right, "tgt_id", "nbr_id", "vec", k=5, exclude_self=True
    )
    assert _pairs(kern) == _pairs(base)


def test_blocked_kernel_equals_single_block(spark):
    norm = _normalized(spark)
    left = norm.select(F.col("vec_id").alias("tgt_id"), "vec")
    right = norm.select(F.col("vec_id").alias("nbr_id"), "vec")
    one = cosine_topk(left, right, "tgt_id", "nbr_id", "vec", k=7, exclude_self=True)
    four = cosine_topk(
        left, right, "tgt_id", "nbr_id", "vec", k=7, exclude_self=True, n_blocks=4
    )
    assert _pairs(one) == _pairs(four)


def test_self_similarity_is_one(spark):
    norm = _normalized(spark)
    left = norm.select(F.col("vec_id").alias("tgt_id"), "vec")
    right = norm.select(F.col("vec_id").alias("nbr_id"), "vec")
    top1 = cosine_topk(left, right, "tgt_id", "nbr_id", "vec", k=1)
    rows = top1.collect()
    assert all(r.tgt_id == r.nbr_id for r in rows)
    assert all(abs(r.score - 1.0) < 1e-9 for r in rows)


def test_topk_bound_per_group(spark):
    norm = _normalized(spark)
    left = norm.select(F.col("vec_id").alias("tgt_id"), "vec")
    right = norm.select(F.col("vec_id").alias("nbr_id"), "vec")
    out = cosine_topk(left, right, "tgt_id", "nbr_id", "vec", k=3, exclude_self=True)
    counts = out.groupBy("tgt_id").count().agg(F.max("count")).first()[0]
    assert counts <= 3
