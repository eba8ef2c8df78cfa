"""Round-7 hardening pins: cache lifecycle, restart idempotence,
scale knobs, and id-type genericity fixes.

Each test pins a specific review finding:
* registry-level cache release (persists in query bodies no longer
  accumulate across a multi-query session);
* StreamMergeTarget survives a driver restart (durable version
  pointer + batch-id replay skip);
* ``segment_dedup(hash_key=True)`` (8-byte shuffle key) ≡ string-key
  semantics, and NULL text behaves like empty text;
* ``brand_association_rules(max_basket=...)`` caps the basket blowup
  deterministically;
* ``mmr_rerank`` / ``heavy_hitters`` accept non-long / non-string id
  and item types (schemas derived from input, not hardcoded).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_registered_query_releases_prior_caches(spark):
    """Dispatching any registered query clears caches left by the
    previous one — at most one query's blocks are alive at a time."""
    from prod_recommendation_pyspark_spark.queries.registry import (
        QUERIES,
        release_session_caches,
    )

    release_session_caches(spark)
    # baseline, not zero: earlier tests may hold localCheckpoint RDDs,
    # which are ContextCleaner-owned, not CacheManager-owned
    base = _n_cached(spark)
    # q21 persists its lineitem+orders join and backs the returned plan
    q21 = QUERIES["q21_waiting_suppliers"](spark, SF_SMOKE)
    q21.collect()
    assert _n_cached(spark) > base, "q21 should have materialized a cache"
    # the next registered query's entry releases q21's blocks
    QUERIES["agg_stats_orders"](spark, SF_SMOKE).collect()
    # agg_stats_orders itself persists nothing
    assert _n_cached(spark) <= base


def test_release_session_caches_empties_cache_manager(spark):
    from prod_recommendation_pyspark_spark.queries.registry import (
        release_session_caches,
    )

    release_session_caches(spark)
    base = _n_cached(spark)
    df = spark.range(100).persist()
    df.count()
    assert _n_cached(spark) > base
    release_session_caches(spark)
    assert _n_cached(spark) <= base


def test_stream_merge_target_survives_restart(spark, tmp_path):
    """A fresh StreamMergeTarget on the same dir recovers the latest
    version and skips replayed batch ids — the checkpoint-replay
    double-merge the review flagged."""
    from prod_recommendation_pyspark_spark.streaming.maintenance import (
        StreamMergeTarget,
    )

    base = str(tmp_path / "target")
    t1 = StreamMergeTarget(spark, base, keys=["k"])
    t1.init(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    t1.apply_batch(
        spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"), 0
    )
    assert t1.version == 1

    # driver restart: a brand-new object on the same directory
    t2 = StreamMergeTarget(spark, base, keys=["k"])
    assert t2.version == 1
    assert t2.last_batch_id == 0
    before = sorted((r.k, r.v) for r in t2.current().collect())

    # checkpoint replays batch 0 — must be a no-op, not a merge into v0
    t2.apply_batch(
        spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"), 0
    )
    assert t2.version == 1
    assert sorted((r.k, r.v) for r in t2.current().collect()) == before

    # a genuinely new batch still applies
    t2.apply_batch(spark.createDataFrame([(4, "d")], "k int, v string"), 1)
    assert t2.version == 2
    assert {r.k for r in t2.current().collect()} == {1, 2, 3, 4}


def test_segment_dedup_hash_key_matches_string_key(spark):
    from prod_recommendation_pyspark_spark.operators.text import (
        segment_dedup,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog " * 6),
            (2, "the quick brown fox jumps over the lazy dog " * 6),
            (3, "an entirely different document body with unique words"),
            (4, ""),
        ],
        "id long, text string",
    )
    kw = dict(seg_words=5, max_occurrences=1)
    plain = {
        r.id: (r.n_segments, r.n_kept, r.clean_text)
        for r in segment_dedup(docs, "id", "text", **kw).collect()
    }
    hashed = {
        r.id: (r.n_segments, r.n_kept, r.clean_text)
        for r in segment_dedup(
            docs, "id", "text", hash_key=True, **kw
        ).collect()
    }
    assert plain == hashed
    assert plain[4] == (0, 0, "")


def test_segment_dedup_null_text_is_empty_doc(spark):
    """NULL text takes the empty-doc branch: n_segments=0, not NULL."""
    from prod_recommendation_pyspark_spark.operators.text import (
        segment_dedup,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "some real words here")],
        "id long, text string",
    )
    out = {
        r.id: (r.n_segments, r.n_kept, r.clean_text)
        for r in segment_dedup(docs, "id", "text", seg_words=2).collect()
    }
    assert out[1] == (0, 0, "")
    assert out[2] == (0, 0, "")
    assert out[3][0] > 0


def test_association_rules_max_basket_cap(spark):
    from prod_recommendation_pyspark_spark.queries.analytic import (
        brand_association_rules,
    )

    uncapped = brand_association_rules(spark, SF_SMOKE)
    assert uncapped.count() > 0
    # a cap far above any basket size changes nothing
    wide = brand_association_rules(spark, SF_SMOKE, max_basket=10_000)
    assert sorted(map(tuple, uncapped.collect())) == sorted(
        map(tuple, wide.collect())
    )
    # cap=1 → every basket contributes zero pairs → no rules at all
    assert brand_association_rules(spark, SF_SMOKE, max_basket=1).count() == 0


def test_mmr_rerank_string_ids(spark):
    """Output schema derives from input id types (review finding:
    hardcoded `long` broke string-id callers)."""
    from prod_recommendation_pyspark_spark.operators.similarity import (
        mmr_rerank,
    )

    df = spark.createDataFrame(
        [
            ("q1", "docA", 0.9, [1.0, 0.0]),
            ("q1", "docB", 0.8, [1.0, 0.0]),
            ("q1", "docC", 0.5, [0.0, 1.0]),
        ],
        "qid string, cid string, rel double, cv array<double>",
    )
    rows = (
        mmr_rerank(df, "qid", "cid", "rel", "cv", k=2, lam=0.5)
        .orderBy("step")
        .collect()
    )
    assert [r.cid for r in rows] == ["docA", "docC"]
    assert rows[0].qid == "q1" and isinstance(rows[0].cid, str)


def test_heavy_hitters_bigint_items(spark):
    """Candidate schema mirrors the input type (review finding:
    hardcoded `string` made bigint items join-miss)."""
    from prod_recommendation_pyspark_spark.operators.text import (
        heavy_hitters,
    )

    vals = [7] * 50 + [11] * 30 + list(range(100, 120))
    df = spark.createDataFrame(
        [(v,) for v in vals], "item bigint"
    ).repartition(4)
    out = {
        r.item: r.n_occurrences
        for r in heavy_hitters(df, "item", k=20, min_frac=0.2).collect()
    }
    assert out == {7: 50, 11: 30}


@pytest.mark.parametrize("forced", [False])
def test_graph_queries_no_forced_degree_broadcast(spark, forced):
    """The degree-table joins carry no broadcast HINT — strategy is
    AQE's choice (review finding: forced broadcast of |V|-row tables
    over-commits memory at scale).  Checked on the analyzed plan: no
    UnresolvedHint/ResolvedHint survives around the degree joins."""
    from prod_recommendation_pyspark_spark.queries.analytic import (
        link_prediction_parts,
        triangle_count_parts,
    )

    for fn in (triangle_count_parts, link_prediction_parts):
        df = fn(spark, SF_SMOKE)
        # a FORCED broadcast shows up as a ResolvedHint node in the
        # analyzed logical plan; size-based broadcasts chosen later by
        # the planner/AQE (fine and expected at small SF) do not
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in analyzed, fn.__name__
        assert "UnresolvedHint" not in analyzed, fn.__name__
