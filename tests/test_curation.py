"""Curation-operator tests: repetition stats, char-bigram LM scoring,
temperature resampling, and SemDeDup cluster-local pairs — oracle
compares at sf0.001 plus property checks on synthetic frames."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.dedup import semantic_dedup_pairs
from prod_recommendation_pyspark_spark.operators.text import (
    char_bigram_lm,
    lm_score,
    repetition_stats,
    temperature_resample,
    uniform_hash,
)
from prod_recommendation_pyspark_spark.queries import ORACLES, QUERIES
from tests.oracle_util import assert_matches_oracle

SF = "/root/testdata/sf0.001"


def test_repetition_stats_oracle(spark, duck):
    assert_matches_oracle(
        QUERIES["repetition_stats_documents"](spark, SF),
        duck,
        ORACLES["repetition_stats_documents"],
    )


def test_lm_score_oracle(spark, duck):
    assert_matches_oracle(
        QUERIES["lm_score_documents"](spark, SF),
        duck,
        ORACLES["lm_score_documents"],
    )


def test_temperature_resample_oracle(spark, duck):
    assert_matches_oracle(
        QUERIES["temperature_resample_documents"](spark, SF),
        duck,
        ORACLES["temperature_resample_documents"],
    )


def test_semantic_dedup_oracle(spark, duck):
    assert_matches_oracle(
        QUERIES["semantic_dedup_pairs_embeddings"](spark, SF),
        duck,
        ORACLES["semantic_dedup_pairs_embeddings"],
    )


def test_repetition_stats_degenerate_doc(spark):
    """A fully repeated doc scores 1.0 on every top-fraction; a
    all-distinct doc scores 1/n and dup fractions 0."""
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "a b c d e f")], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r
        for r in repetition_stats(df, "text", "doc_id").collect()
    }
    assert rows[1]["top1_frac"] == 1.0
    assert rows[1]["dup1_frac"] == 0.75  # 1 - 1/4
    assert rows[1]["top2_frac"] == 1.0  # "spam spam" x3
    assert rows[2]["dup1_frac"] == 0.0
    assert rows[2]["dup2_frac"] == 0.0
    assert rows[2]["top1_frac"] == round(1 / 6, 4)


def test_repetition_stats_blank_doc_emits_no_row(spark):
    """''/whitespace-only text is 0 words (split('') == ['']), not a
    maximally-repetitive 1-word doc — blank docs must not appear."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real words here")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df, "text", "doc_id").collect()}
    assert set(rows) == {3}
    assert rows[3]["n_words"] == 3


def test_repetition_stats_short_doc_null_orders(spark):
    """A 2-word doc has no trigram: order-3 columns are NULL, order-1/2
    still populate."""
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    r = repetition_stats(df, "text", "doc_id").collect()[0]
    assert r["n_words"] == 2
    assert r["top3_frac"] is None and r["dup3_frac"] is None
    assert r["top2_frac"] == 1.0


def test_lm_model_is_proper_distribution(spark):
    """Per context char, sum of P(c2|c1) over MODELED bigrams stays
    < 1 (add-one smoothing reserves mass for unseen continuations)."""
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    model = char_bigram_lm(df, "text")
    sums = (
        model.groupBy(F.substring("bigram", 1, 1).alias("c1"))
        .agg(F.sum(F.exp("log_prob")).alias("p_sum"))
        .collect()
    )
    assert sums and all(0 < r["p_sum"] <= 1.0 + 1e-9 for r in sums)


def test_lm_score_ranks_gibberish_below_language(spark):
    """Scored under a model trained on English-like text, a qwerty-mash
    doc must score below a same-distribution doc."""
    corpus = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog sat too"),
            (2, "she sells sea shells on the sea shore all day"),
            (3, "the rain in spain falls mainly on the plain"),
        ],
        ["doc_id", "text"],
    )
    probe = spark.createDataFrame(
        [(10, "the cat sat on the mat"), (11, "zxqv jkwq pzxm qqvz")],
        ["doc_id", "text"],
    )
    model = char_bigram_lm(corpus, "text")
    scores = {
        r["doc_id"]: r["avg_logprob"]
        for r in lm_score(probe, model, "text", "doc_id").collect()
    }
    assert scores[10] > scores[11]


def test_uniform_hash_range_and_determinism(spark):
    df = spark.range(0, 1000).select(uniform_hash(F.col("id")).alias("u"))
    stats = df.agg(
        F.min("u").alias("lo"), F.max("u").alias("hi"), F.avg("u").alias("mu")
    ).collect()[0]
    assert 0.0 <= stats["lo"] and stats["hi"] < 1.0
    assert abs(stats["mu"] - 0.5) < 0.05  # multiplicative hash mixes well


def test_uniform_hash_full_bigint_range(spark):
    """The split-multiply form must not overflow BIGINT (ANSI would
    throw) and must equal (id mod 2^32) * 2654435761 mod 2^32 for ids
    beyond 2^32 — snowflake-scale ids are the 100 TB norm."""
    ids = [0, 1, 3_474_701_544, 2**32 - 1, 2**32 + 7, 2**62 + 12345, -17]
    df = spark.createDataFrame([(i,) for i in ids], ["id"])
    got = {
        r["id"]: r["u"]
        for r in df.select("id", uniform_hash(F.col("id")).alias("u")).collect()
    }
    for i in ids:
        expect = ((i % 2**32) * 2654435761 % 2**32) / 2**32
        assert abs(got[i] - expect) < 1e-15, i


def test_temperature_resample_rates(spark):
    """Head domain is thinned toward sqrt scaling; tail domain keeps
    everything (keep_prob exactly 1.0)."""
    rows = [(i, "big") for i in range(400)] + [
        (i, "small") for i in range(400, 500)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "domain"])
    kept = temperature_resample(df, "domain", "doc_id", alpha=0.5)
    by_dom = {
        r["domain"]: r["n"]
        for r in kept.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert by_dom["small"] == 100  # keep_prob 1.0 — every row survives
    # expected 400 * (400/100)^-0.5 = 200; the hash is uniform enough
    assert 160 <= by_dom["big"] <= 240


def test_semantic_dedup_within_cluster_only(spark):
    """Near-identical vectors land in one cluster and pair; orthogonal
    vectors never pair even at threshold 0."""
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),  # near-dup of 0
        (3, [0.01, 0.999, 0.0]),  # near-dup of 1
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = semantic_dedup_pairs(
        df, "vec_id", "embedding", k=2, threshold=0.9
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(0, 2), (1, 3)}
    for r in pairs:
        assert r["cosine"] > 0.99


def test_curation_pipeline_oracle(spark, duck):
    assert_matches_oracle(
        QUERIES["curation_pipeline_documents"](spark, SF),
        duck,
        ORACLES["curation_pipeline_documents"],
    )


def test_curation_pipeline_is_subset_of_corpus(spark):
    """Every surviving row is a real document and survivors strictly
    shrink the corpus (each gate drops something at these thresholds)."""
    out = QUERIES["curation_pipeline_documents"](spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_out, n_docs = out.count(), docs.count()
    assert 0 < n_out < n_docs
    joined = out.join(docs, "doc_id").count()
    assert joined == n_out


def test_semantic_dedup_max_cluster_guard(spark):
    """A degenerate corpus (everything lands in one cluster) with
    max_cluster caps per-task pair work: every emitted pair sits in one
    sub-split, the pair count shrinks vs unguarded, and the result is
    deterministic across runs."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [1.0 + rng.uniform(-1e-3, 1e-3), rng.uniform(-1e-3, 1e-3)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    full = semantic_dedup_pairs(df, "vec_id", "embedding", k=1, threshold=0.9)
    capped = semantic_dedup_pairs(
        df, "vec_id", "embedding", k=1, threshold=0.9, max_cluster=50
    )
    n_full, n_capped = full.count(), capped.count()
    assert n_full == 200 * 199 // 2  # all near-identical → every pair
    # 4 sub-splits of ~50: expected ~1/4 of pairs survive; bound loosely
    assert 0 < n_capped < n_full * 0.45
    assert n_capped == semantic_dedup_pairs(
        df, "vec_id", "embedding", k=1, threshold=0.9, max_cluster=50
    ).count()
    # capped pairs are a subset of the true pair set
    assert capped.join(full, ["id_a", "id_b"], "left_anti").count() == 0
