"""Property tests for the non-oracle LLM-pipeline operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.dedup import (
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
)
from prod_recommendation_pyspark_spark.operators.multimodal import (
    attach_fake_payload,
    extract_image_features,
    sample_frames,
)
from prod_recommendation_pyspark_spark.queries.llm_pipeline import (
    simhash_near_dup_pairs,
)
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_lsh_candidates_cover_true_pairs(spark):
    """Every true near-dup pair (Jaccard ≥ 0.8) must surface as an LSH
    candidate — recall property of the banding scheme."""
    docs = _docs(spark)
    truth = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.8).collect()
    }
    cands = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(docs, "doc_id", "text", 3, 64, 16).collect()
    }
    assert truth, "corpus should contain planted near-dups"
    assert truth <= cands


def test_simhash_close_for_near_dups(spark):
    """Near-dup documents must land within the simhash Hamming radius."""
    docs = _docs(spark)
    truth = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.9).collect()
    }
    sim = {
        (r.id_a, r.id_b) for r in simhash_near_dup_pairs(spark, SF_SMOKE).collect()
    }
    assert truth and truth <= sim


def test_multimodal_features_deterministic(spark):
    docs = _docs(spark).limit(50)
    media = attach_fake_payload(docs, "doc_id", "text")
    f1 = {(r.media_id, tuple(r.features)) for r in extract_image_features(media).collect()}
    f2 = {(r.media_id, tuple(r.features)) for r in extract_image_features(media).collect()}
    assert f1 == f2
    assert all(len(feats) == 8 for _, feats in f1)


def test_sample_frames_shape(spark):
    docs = _docs(spark).limit(10)
    media = attach_fake_payload(docs, "doc_id", "text")
    frames = sample_frames(media, every_n=10)
    counts = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 3 for r in counts)


def test_streaming_matches_batch(spark):
    """Streaming windowed counts over a static directory must equal the
    batch computation on the same files."""
    import shutil
    import tempfile

    from prod_recommendation_pyspark_spark.streaming.adapter import (
        read_events_stream,
        run_stream_to_memory,
        streaming_windowed_counts,
    )
    from prod_recommendation_pyspark_spark.operators.events import tumbling_window_agg
    from prod_recommendation_pyspark_spark.sources.catalog import Catalog

    # file stream sources need a directory of files
    stage_dir = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(f"{SF_SMOKE}/events.parquet", f"{stage_dir}/part-0.parquet")
    stream = read_events_stream(spark, stage_dir)
    agg = streaming_windowed_counts(stream)
    run_stream_to_memory(agg, "stream_counts")
    got = {
        (r.window_start, r.event_type, r.n_events)
        for r in spark.sql("SELECT * FROM stream_counts").collect()
    }
    ev = Catalog(spark, SF_SMOKE).table("events")
    batch = tumbling_window_agg(
        ev, "ts", "1 hour", ["event_type"], [F.count(F.lit(1)).alias("n_events")]
    )
    want = {
        (r.window_start, r.event_type, r.n_events) for r in batch.collect()
    }
    assert got == want


def test_stateful_user_totals_matches_batch(spark):
    """Custom applyInPandasWithState operator: after draining the
    stream, the last update per user must equal the batch per-user
    totals on the same files."""
    import shutil
    import tempfile

    from prod_recommendation_pyspark_spark.streaming.adapter import (
        read_events_stream,
        run_stream_to_memory,
    )
    from prod_recommendation_pyspark_spark.streaming.stateful import (
        stateful_user_totals,
    )
    from prod_recommendation_pyspark_spark.sources.catalog import Catalog

    stage_dir = tempfile.mkdtemp(prefix="events_state_")
    shutil.copy(f"{SF_SMOKE}/events.parquet", f"{stage_dir}/part-0.parquet")
    stream = read_events_stream(spark, stage_dir).select("user_id", "value")
    out = stateful_user_totals(stream)
    run_stream_to_memory(out, "stateful_totals", output_mode="update")
    rows = spark.sql("SELECT * FROM stateful_totals").collect()
    # memory sink in update mode appends each update; keep the last per user
    last = {}
    for r in rows:
        last[r.user_id] = (r.n_events, round(r.total_value, 6))
    ev = Catalog(spark, SF_SMOKE).table("events")
    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv")
    )
    want = {r.user_id: (r.n, round(r.tv, 6)) for r in batch.collect()}
    assert last == want


def test_simhash_banded_equals_brute_force(spark):
    """Banded SimHash pairing is exact (pigeonhole), so it must return
    the identical pair set as the O(n^2) cross join."""
    from prod_recommendation_pyspark_spark.operators.dedup import (
        hamming64,
        simhash,
        simhash_banded_pairs,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    sigs = docs.select("doc_id", simhash(F.col("text")).alias("sig"))
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_banded_pairs(sigs, "doc_id", "sig", max_hamming=8).collect()
    }
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming64(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= 8)
        .collect()
    }
    assert banded == brute and len(banded) > 0


def test_embedding_near_dup_candidates_path(spark):
    """Candidate-restricted scoring must agree with the cross join on
    the candidate pairs it is given."""
    from prod_recommendation_pyspark_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    brute = embedding_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.3, brute=True)
    all_ids = emb.select(F.col("vec_id").alias("id_a"))
    cands = all_ids.crossJoin(emb.select(F.col("vec_id").alias("id_b")))
    via_cands = embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.3, candidates=cands
    )
    key = lambda df: {(r.id_a, r.id_b, round(r.cosine, 9)) for r in df.collect()}
    assert key(brute) == key(via_cands) and brute.count() > 0


def test_connected_components_shapes(spark):
    """Chain, clique, pair, and self-loop all resolve to min-id
    components; chain exercises multi-round propagation."""
    from prod_recommendation_pyspark_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),      # chain: diameter 4
         (10, 11), (11, 12), (10, 12),        # triangle
         (20, 21),                            # pair
         (30, 30)],                           # self-loop
        "id_a long, id_b long",
    )
    got = {
        (r.u, r.component)
        for r in connected_components(edges, "id_a", "id_b").collect()
    }
    want = {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
            (10, 10), (11, 10), (12, 10),
            (20, 20), (21, 20), (30, 30)}
    assert got == want


def test_embedding_near_dup_default_is_pruned(spark):
    """VERDICT r2 #7: ``candidates=None`` must auto-derive sign-LSH
    candidates — the physical plan may not contain a cartesian or
    nested-loop product, and the approximate default only prunes
    (never invents) pairs relative to the explicit brute baseline."""
    from prod_recommendation_pyspark_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    out = embedding_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.45)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    brute = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            emb, "vec_id", "embedding", threshold=0.45, brute=True
        ).collect()
    }
    auto = {(r.id_a, r.id_b) for r in out.collect()}
    assert auto <= brute


def test_winnowing_guarantee_shared_passage(spark):
    """The winnowing theorem (Schleimer et al. §3): two documents
    sharing a substring of length >= k + w - 1 share at least one
    fingerprint.  Two otherwise-different docs with a common 40-char
    passage (>= 16 + 12 - 1 = 27) must collide; two unrelated random
    docs must NOT reach min_shared at these parameters."""
    import random

    from prod_recommendation_pyspark_spark.operators.text import (
        winnow_dedup_candidates,
        winnow_fingerprints,
    )

    rng = random.Random(7)
    rand = lambda n: "".join(rng.choice("abcdefghij ") for _ in range(n))
    passage = "the common shared passage that both docs contain"
    docs = spark.createDataFrame(
        [
            (1, rand(200) + passage + rand(200)),
            (2, rand(200) + passage + rand(200)),
            (3, rand(400)),
        ],
        "doc_id int, text string",
    )
    fps = winnow_fingerprints(docs, "doc_id", "text", k=16, w=12)
    rows = fps.collect()
    sets = {}
    for r in rows:
        sets.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert sets[1] & sets[2], "docs sharing a 40-char passage must collide"
    cand = winnow_dedup_candidates(
        docs, "doc_id", "text", k=16, w=12, min_shared=2
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in cand}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnow_candidates_match_verified_jaccard(spark):
    """At the registered parameters (k=16, w=12, min_shared=5) the
    winnowing candidates cover >= 90% of the LSH + exact-Jaccard>=0.8
    verified pairs with ZERO false candidates.  (Exact coverage is
    1.00 at sf0.01 — the oracle corpus — and 27/28 at sf0.001: a
    high-Jaccard pair whose overlap is many short spans can evade the
    >= k+w-1 passage guarantee; that's the documented theory
    trade-off, not a bug.)"""
    from prod_recommendation_pyspark_spark.operators.dedup import (
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
    )
    from prod_recommendation_pyspark_spark.operators.text import (
        winnow_dedup_candidates,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    truth = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.8,
            candidates=lsh_candidate_pairs(docs, "doc_id", "text"),
        ).select("id_a", "id_b").collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in winnow_dedup_candidates(
            docs, "doc_id", "text", k=16, w=12, min_shared=5
        ).collect()
    }
    assert truth, "corpus should contain near-dup pairs"
    assert not (got - truth), f"false candidates: {sorted(got - truth)[:5]}"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"winnow recall too low: {recall:.2f}"


def test_redact_pii_counts_and_chain(spark):
    """Counts are per-pattern matches on the ORIGINAL text (the SSN is
    also phone-shaped); redaction chains email → ipv4 → ssn → phone,
    so every planted span leaves as [PII]."""
    from prod_recommendation_pyspark_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [(1, "mail a.b@x.io ip 10.0.0.7 ssn 123-45-6789 tel 555-010-0042 end")],
        "id int, t string",
    )
    r = redact_pii(df, "t").first()
    assert (r.n_email, r.n_ipv4, r.n_ssn) == (1, 1, 1)
    assert r.n_phone == 2  # ssn span is phone-shaped too
    assert r.t_redacted == "mail [PII] ip [PII] ssn [PII] tel [PII] end"


def test_decontaminate_flags_shared_passage_only(spark):
    """A corpus doc sharing an 8-word run with a benchmark doc is
    flagged; an unrelated doc reports n_contaminated=0 and False."""
    from prod_recommendation_pyspark_spark.operators.text import decontaminate

    passage = "one two three four five six seven eight"
    bench = spark.createDataFrame(
        [(100, f"benchmark prefix {passage} benchmark suffix")],
        "doc_id int, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, f"leaked copy {passage} with extra words"),
            (2, "totally different words nine ten eleven twelve thirteen"),
        ],
        "doc_id int, text string",
    )
    rows = {
        r.doc_id: (r.n_contaminated, r.contaminated)
        for r in decontaminate(
            corpus, bench, "doc_id", "text", shingle_words=8
        ).collect()
    }
    assert rows[1][0] >= 1 and rows[1][1] is True
    assert rows[2] == (0, False)


def test_incremental_lsh_candidates_cross_only(spark):
    """Incremental dedup reports corpus x batch near-dups only:
    batch-internal duplicates are out of scope (documented), corpus
    ids land in id_a, batch ids in id_b."""
    from prod_recommendation_pyspark_spark.operators.dedup import (
        incremental_lsh_candidates,
        minhash_band_keys,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely unrelated text about spark bucketed joins")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(10, base), (11, base), (12, "another unrelated batch document")],
        ["doc_id", "text"],
    )
    keys = minhash_band_keys(corpus, "doc_id", "text")
    pairs = {
        (r.id_a, r.id_b)
        for r in incremental_lsh_candidates(
            keys, batch, "doc_id", "text"
        ).collect()
    }
    assert (1, 10) in pairs and (1, 11) in pairs
    # batch-internal pair (10, 11) must NOT appear, nor corpus-internal
    assert all(a in (1, 2) and b in (10, 11, 12) for a, b in pairs)


def test_leakage_safe_split_no_cross_split_near_dups(spark):
    """The split's whole point: zero verified near-dup pairs may span
    train/test, and every cluster is single-split."""
    from prod_recommendation_pyspark_spark.queries import QUERIES

    split = QUERIES["leakage_safe_split_documents"](spark, SF_SMOKE).persist()
    pairs = QUERIES["minhash_lsh_dedup_candidates"](spark, SF_SMOKE).select(
        "id_a", "id_b"
    )
    a = split.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    b = split.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    crossed = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert crossed == 0
    multi = (
        split.groupBy("group_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert multi == 0
    split.unpersist()


def test_strip_markup_edge_cases(spark):
    """Script/style/comment blocks vanish, tags strip, the five XML
    entities + nbsp decode, &amp; decodes LAST so double-encoded
    entities survive as entities, and markup-free text round-trips."""
    from prod_recommendation_pyspark_spark.operators.text import strip_markup

    rows = [
        (1, '<script a>x<b</script>Keep<style>.c{}</style>'),
        (2, '<!-- gone --><p a="1">A &amp; B &lt;x&gt;&nbsp;&quot;q&quot; &#39;s&#39;</p>'),
        (3, 'no markup at all'),
        (4, '&amp;lt; stays an entity'),
        (5, '<SCRIPT>upper</SCRIPT>case<BR/>tag'),
    ]
    df = spark.createDataFrame(rows, ["i", "h"])
    got = {
        r.i: r.t
        for r in df.select("i", strip_markup(F.col("h")).alias("t")).collect()
    }
    assert got[1] == "Keep"
    assert got[2] == 'A & B <x> "q" \'s\''
    assert got[3] == "no markup at all"
    assert got[4] == "&lt; stays an entity"
    assert got[5] == "case tag"


def test_normalize_url_rules(spark):
    """Every canonicalization rule, including the RE2-safe delimiter
    capture for default ports and tracking-param separator repair."""
    from prod_recommendation_pyspark_spark.operators.text import normalize_url

    cases = {
        "HTTP://WWW.Ex.COM:80/Path/?utm_source=x&id=7#f":
            "http://www.ex.com/Path/?id=7",
        "https://Site.org:443/a?gclid=z": "https://site.org/a",
        "https://s.io/p?utm_a=1&utm_b=2&keep=3": "https://s.io/p?keep=3",
        "http://host.com/": "http://host.com",
        "http://host.com:8080/x": "http://host.com:8080/x",  # non-default port kept
        "https://h.io/CaseKept/Path": "https://h.io/CaseKept/Path",
        "http://d.io/p?": "http://d.io/p",  # dangling '?' collapses
        "http://d.io/p/?": "http://d.io/p",  # '?' then trailing slash
        "https://root.io/": "https://root.io",  # root slash collapses too
    }
    df = spark.createDataFrame([(u,) for u in cases], ["u"])
    got = {
        r.u: r.n
        for r in df.select("u", normalize_url(F.col("u")).alias("n")).collect()
    }
    for u, want in cases.items():
        assert got[u] == want, (u, got[u])


def test_segment_dedup_semantics(spark):
    """Corpus-duplicated tiles vanish from EVERY document; unique ones
    survive in order; empty docs keep a row with n_segments=0."""
    from prod_recommendation_pyspark_spark.operators.text import segment_dedup

    rows = [
        (1, "the cookie banner uses cookies here is real content one"),
        (2, "the cookie banner uses cookies totally different article text"),
        (3, "unique words only nothing shared with any other doc"),
        (4, "   "),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in segment_dedup(
            df, "doc_id", "text", seg_words=5, max_occurrences=1
        ).collect()
    }
    # the shared 5-word prefix tile is dropped from BOTH docs 1 and 2
    assert out[1].clean_text == "here is real content one"
    assert out[2].clean_text == "totally different article text"
    assert out[1].n_segments == 2 and out[1].n_kept == 1
    # doc 3 fully survives, both tiles, original order
    assert out[3].clean_text == "unique words only nothing shared with any other doc"
    assert out[3].n_segments == 2 and out[3].n_kept == 2
    # whitespace-only doc: present, zero segments, empty text
    assert out[4].n_segments == 0 and out[4].n_kept == 0
    assert out[4].clean_text == ""


def test_prefix_filter_jaccard_exact_boundary(spark):
    """Prefix filtering must equal brute force, including a pair at
    EXACTLY the threshold (J = 8/10 = 0.8): float-ceil overshoot on
    t*n would shorten the prefix and drop it."""
    from prod_recommendation_pyspark_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    words = "a b c d e f g h i j".split()
    rows = [
        (1, " ".join(words + ["k"])),   # 9 trigram shingles
        (2, " ".join(words + ["x"])),   # shares 8 of them -> J = 0.8
        (3, "totally different text with nothing shared at all here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    key = lambda d: {
        (r.id_a, r.id_b, round(r.jaccard, 9)) for r in d.collect()
    }
    brute = key(ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.8))
    pref = key(prefix_filter_jaccard_pairs(df, "doc_id", "text", 3, 0.8))
    assert (1, 2, 0.8) in brute
    assert pref == brute


def test_prefix_filter_equals_brute_on_corpus(spark):
    """Full corpus equivalence at sf0.001 — the exactness claim."""
    from prod_recommendation_pyspark_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    docs = _docs(spark)
    key = lambda d: {
        (r.id_a, r.id_b, round(r.jaccard, 9)) for r in d.collect()
    }
    brute = key(ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.8))
    pref = key(prefix_filter_jaccard_pairs(docs, "doc_id", "text", 3, 0.8))
    assert brute and pref == brute


def test_heavy_hitters_sketch_under_eviction(spark):
    """With capacity k far below the cardinality, Misra-Gries evicts
    constantly — yet the two-phase result must still equal the plain
    groupBy whenever min_frac >= 1/k (the completeness guarantee)."""
    from prod_recommendation_pyspark_spark.operators.text import heavy_hitters

    # 3 hot items (1000/500/300 occurrences) drowned in 2000 distinct
    # singletons; k=20 forces heavy eviction pressure in every task.
    rows = (
        [("hot_a",)] * 1000
        + [("hot_b",)] * 500
        + [("hot_c",)] * 300
        + [(f"noise_{i}",) for i in range(2000)]
    )
    df = spark.createDataFrame(rows, ["item"]).repartition(8)
    total = len(rows)
    got = {
        (r.item, r.n_occurrences)
        for r in heavy_hitters(df, "item", k=20, min_frac=0.06).collect()
    }
    want = {
        (r.item, r.n)
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > total * 0.06)
        .collect()
    }
    assert got == {("hot_a", 1000), ("hot_b", 500), ("hot_c", 300)} == want


def test_heavy_hitters_rejects_unsafe_threshold(spark):
    from prod_recommendation_pyspark_spark.operators.text import heavy_hitters

    df = spark.createDataFrame([("x",)], ["item"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        heavy_hitters(df, "item", k=10, min_frac=0.05)  # 0.05 < 1/10


def test_decontaminate_bloom_equals_exact(spark):
    """The bloom-prefiltered decontamination must equal the exact
    operator row-for-row (false positives die in the verify join)."""
    from prod_recommendation_pyspark_spark.operators.text import (
        decontaminate,
        decontaminate_bloom,
    )

    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % 7 == 3)
    corpus = docs.filter(F.col("doc_id") % 7 != 3)
    kw = dict(shingle_words=8, min_overlap=1)
    exact = {
        (r.doc_id, r.n_contaminated, r.contaminated)
        for r in decontaminate(corpus, bench, "doc_id", "text", **kw).collect()
    }
    bloom = {
        (r.doc_id, r.n_contaminated, r.contaminated)
        for r in decontaminate_bloom(
            corpus, bench, "doc_id", "text", **kw
        ).collect()
    }
    assert bloom == exact
    assert any(c for _, _, c in bloom), "corpus should contain leakage"


def test_decontaminate_bloom_tiny_filter_still_exact(spark):
    """Even with a deliberately undersized, collision-heavy bitset
    (1 bit/key, 1 probe — huge fp rate) the verify join keeps the
    result exact; only the candidate volume grows."""
    from prod_recommendation_pyspark_spark.operators.text import (
        decontaminate,
        decontaminate_bloom,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "alpha beta gamma delta epsilon zeta eta theta iota")],
        "doc_id long, text string",
    )
    kw = dict(shingle_words=8, min_overlap=1)
    exact = sorted(
        map(tuple, decontaminate(corpus, bench, "doc_id", "text", **kw).collect())
    )
    noisy = sorted(
        map(
            tuple,
            decontaminate_bloom(
                corpus, bench, "doc_id", "text",
                bits_per_key=1, n_probes=1, **kw,
            ).collect(),
        )
    )
    assert noisy == exact


def test_inverted_index_semantics(spark):
    """Hand corpus: exact df/cf, sorted postings, and the max_postings
    cap truncating AFTER the sort (smallest doc ids win)."""
    from prod_recommendation_pyspark_spark.operators.text import inverted_index

    docs = spark.createDataFrame(
        [
            (3, "apple banana apple"),
            (1, "banana cherry"),
            (2, "apple banana banana"),
        ],
        "doc_id long, text string",
    )
    rows = {r.term: r for r in inverted_index(docs, "doc_id", "text").collect()}
    assert rows["apple"].df == 2 and rows["apple"].cf == 3
    assert rows["apple"].postings == [2, 3]
    assert rows["banana"].df == 3 and rows["banana"].cf == 4
    assert rows["banana"].postings == [1, 2, 3]
    assert rows["cherry"].postings == [1]
    capped = {
        r.term: r
        for r in inverted_index(
            docs, "doc_id", "text", max_postings=2
        ).collect()
    }
    assert capped["banana"].postings == [1, 2]
    assert capped["banana"].df == 3  # df stays exact past the cap


def test_sorted_neighborhood_equals_flat_rank(spark):
    """The bucketed rank composition must produce EXACTLY the flat
    row_number-over-everything pair set (blocking is physical, not
    semantic), including keys that straddle bucket-prefix boundaries
    and duplicate keys (tie-break on id)."""
    from pyspark.sql import Window as W

    from prod_recommendation_pyspark_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    rows = [
        (1, "aa alpha"), (2, "ab beta"), (3, "aa alpha"), (4, "zz omega"),
        (5, "b gamma"), (6, ""), (7, "ab bets"), (8, "aardvark"),
        (9, "z zeta"), (10, "b gamm"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    key = F.col("text")
    got = {
        (r.id_a, r.id_b, r.rank_gap)
        for r in sorted_neighborhood_pairs(
            docs, "doc_id", key, window=3, bucket_chars=2
        ).collect()
    }
    flat = docs.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(key, "doc_id"))
        .alias("rank"),
    )
    a = flat.select(
        F.col("doc_id").alias("id_a"), F.col("rank").alias("ra")
    )
    b = flat.select(
        F.col("doc_id").alias("id_b"), F.col("rank").alias("rb")
    )
    want = {
        (r.id_a, r.id_b, r.rb - r.ra)
        for r in a.crossJoin(b)
        .filter((F.col("rb") - F.col("ra") >= 1) & (F.col("rb") - F.col("ra") <= 2))
        .collect()
    }
    assert got == want
    # each pair exactly once (the set sizes prove no granule dup)
    n_pairs = sorted_neighborhood_pairs(
        docs, "doc_id", key, window=3, bucket_chars=2
    ).count()
    assert n_pairs == len(want)


def test_rendezvous_shard_stability(spark):
    """HRW contract: resizing N=8 -> N=9 moves a ~1/9 minority of
    rows, every moved row lands on the NEW shard, and assignment is
    deterministic across invocations."""
    from prod_recommendation_pyspark_spark.operators.text import (
        rendezvous_shard,
    )

    ids = spark.range(2000).withColumnRenamed("id", "doc_id")
    a8 = ids.select("doc_id", rendezvous_shard(F.col("doc_id"), 8, "s8"))
    a9 = ids.select("doc_id", rendezvous_shard(F.col("doc_id"), 9, "s9"))
    j = a8.join(a9, "doc_id").collect()
    moved = [r for r in j if r.s8 != r.s9]
    frac = len(moved) / len(j)
    assert 0.05 < frac < 0.20  # expected 1/9 ~ 0.111
    assert all(r.s9 == 8 for r in moved)  # moved rows -> the new shard
    # balance: every shard populated, none dominant
    from collections import Counter

    c = Counter(r.s8 for r in j)
    assert set(c) == set(range(8))
    assert max(c.values()) < 2 * min(c.values())
    # deterministic re-run
    again = {
        (r.doc_id, r.s8)
        for r in ids.select(
            "doc_id", rendezvous_shard(F.col("doc_id"), 8, "s8")
        ).collect()
    }
    assert again == {(r.doc_id, r.s8) for r in j}


def test_rrf_rewards_agreement(spark):
    """A doc ranked top by BOTH rankings must out-score a doc ranked
    top by only one (the fusion property); rrf values are bounded by
    2/(60+1)."""
    from prod_recommendation_pyspark_spark.queries.registry import QUERIES

    rows = QUERIES["rrf_hybrid_retrieval"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.rrf <= round(2 / 61, 6) + 1e-9
        assert (r.rank_a is not None) or (r.rank_b is not None)
    both = [r for r in rows if r.rank_a is not None and r.rank_b is not None]
    assert both  # rankings overlap on this corpus


def test_bpe_merges_hand_computed(spark):
    """Tiny vocabulary with a known merge sequence: 'low' x5 and
    'lower' x2 share 'l o' (7) and 'o w' (7); tie breaks to the
    lexicographically smaller pair 'l o', then 'lo w' (7), then the
    2-count tie between 'e r' and 'low e' goes to 'e r'."""
    from prod_recommendation_pyspark_spark.operators.text import (
        bpe_merge_steps,
    )

    wf = spark.createDataFrame(
        [("low", 5), ("lower", 2)], "word string, freq long"
    )
    merges, reps = bpe_merge_steps(wf, "word", "freq", steps=3)
    assert merges[0] == ("l o", "lo", 7)
    assert merges[1] == ("lo w", "low", 7)
    assert merges[2] == ("e r", "er", 2)
    final = {r.word: r.rep for r in reps.collect()}
    assert final["low"] == " low "
    assert final["lower"] == " low er "


def test_bpe_single_char_words_are_safe(spark):
    from prod_recommendation_pyspark_spark.operators.text import (
        bpe_merge_steps,
    )

    wf = spark.createDataFrame(
        [("a", 10), ("ab", 3)], "word string, freq long"
    )
    merges, reps = bpe_merge_steps(wf, "word", "freq", steps=2)
    assert merges[0] == ("a b", "ab", 3)
    assert len(merges) == 1  # second round has no pairs left


def test_dsir_target_like_docs_outrank_off_domain(spark):
    """A raw doc written in the target's vocabulary must out-weight a
    raw doc written in disjoint vocabulary (LLR > 0 vs < 0)."""
    from prod_recommendation_pyspark_spark.operators.text import (
        dsir_importance_weights,
    )

    target = spark.createDataFrame(
        [(i, "alpha beta gamma alpha beta") for i in range(10)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(100, "alpha beta gamma"), (101, "zebra quux corge")],
        "doc_id long, text string",
    )
    w = {
        r.doc_id: r.dsir_weight
        for r in dsir_importance_weights(
            raw, target, "doc_id", "text", n_buckets=128
        ).collect()
    }
    assert w[100] > w[101]
    assert w[100] > 0 > w[101]


def test_hll_union_of_chunks_equals_direct_sketch(spark):
    """HLL mergeability at NDV far above the group count: the union of
    per-chunk sketches estimates the same as one direct sketch, and
    both land within 3% of the exact distinct count."""
    n = 200_000
    df = spark.range(n).select(
        (F.col("id") % 4).alias("chunk"),
        # multiplicative scramble so values aren't sequential
        ((F.col("id") * 2654435761) % 1_000_000_007).alias("v"),
    )
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v", 12)).alias("est"),
        F.count_distinct("v").alias("exact"),
    ).first()
    merged = (
        df.groupBy("chunk")
        .agg(F.hll_sketch_agg("v", 12).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()
    )
    assert merged.est == direct.est
    assert abs(direct.est - direct.exact) <= 0.03 * direct.exact


def test_pq_encode_and_adc_recover_exact_structure(spark):
    """Clustered toy corpus: vectors sit exactly ON their sub-space
    centroids, so PQ must encode losslessly — every query's ADC
    distance to itself is 0 and ADC top-1 is the query itself."""
    from prod_recommendation_pyspark_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        pq_fit,
    )

    # two blocks of dim 2; block values from {(0,0),(9,9)} → k=2 per
    # block captures them exactly after one Lloyd step
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 9.0, 9.0]),
        (2, [9.0, 9.0, 0.0, 0.0]),
        (3, [9.0, 9.0, 9.0, 9.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_fit(df, "vec_id", "embedding", m=2, k=2, max_iter=3)
    assert books.count() == 4  # 2 blocks x 2 codes
    codes = pq_encode(df, "vec_id", "embedding", books, 2, 2)
    assert codes.count() == 8  # 4 vectors x 2 blocks
    adc = pq_adc_topk(
        df.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ),
        codes.withColumnRenamed("vec_id", "item_id"),
        books,
        "query_id",
        "query_vec",
        "item_id",
        2,
        2,
        k_top=1,
    ).collect()
    assert len(adc) == 4
    for r in adc:
        assert r.item_id == r.query_id  # top-1 is self
        assert r.adc_d2 == 0.0  # lossless encoding -> zero distance


def test_bpe_encode_subwords_reassemble_to_words(spark):
    """Character conservation: concatenating a word's subword tokens
    must reproduce the word exactly, for every word, after any number
    of merges."""
    from prod_recommendation_pyspark_spark.operators.text import (
        bpe_encode,
        bpe_merge_steps,
    )

    words = spark.createDataFrame(
        [("lowest", 5), ("lower", 7), ("low", 9), ("newest", 6)],
        "word string, freq long",
    )
    merges, _ = bpe_merge_steps(words, "word", "freq", steps=3)
    assert len(merges) == 3
    for r in bpe_encode(words, "word", "freq", merges).collect():
        assert "".join(r.subwords) == r.word
        assert all(s for s in r.subwords)


def test_gap_fill_locf_fills_interior_gaps_only(spark):
    """LOCF: interior gaps carry the last value; leading gaps (before
    a key's first observation) stay null; observed rows are marked."""
    import datetime as dt

    from prod_recommendation_pyspark_spark.operators.events import (
        gap_fill_locf,
    )

    d = dt.date
    daily = spark.createDataFrame(
        [
            (1, d(2024, 1, 1), 10.0),
            (1, d(2024, 1, 4), 40.0),
            (2, d(2024, 1, 3), 99.0),
        ],
        "user_id long, day date, value double",
    )
    got = {
        (r.user_id, r.day): (r.value, r.is_observed)
        for r in gap_fill_locf(daily, "user_id", "day", "value").collect()
    }
    # spine covers 2024-01-01..04 for BOTH users
    assert len(got) == 8
    assert got[(1, d(2024, 1, 2))] == (10.0, False)   # interior gap filled
    assert got[(1, d(2024, 1, 3))] == (10.0, False)
    assert got[(1, d(2024, 1, 4))] == (40.0, True)
    assert got[(2, d(2024, 1, 1))] == (None, False)   # leading gap stays null
    assert got[(2, d(2024, 1, 4))] == (99.0, False)


def test_ivfpq_residuals_beat_flat_pq_shortlist(spark):
    """Residual quantization must not LOSE to flat PQ: on the real
    embeddings corpus, IVF-PQ's exact-reranked recall@10 (union over 5
    queries) is >= flat PQ's with the same m, k budget."""
    from prod_recommendation_pyspark_spark.operators.clustering import sq_l2
    from prod_recommendation_pyspark_spark.operators.pq import (
        ivfpq_build,
        ivfpq_topk,
        pq_adc_topk,
        pq_encode,
        pq_fit,
    )
    from prod_recommendation_pyspark_spark.operators.relational import (
        windowed_topk,
    )

    emb = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .persist()
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    iv = emb.select(
        F.col("vec_id").alias("item_id"), F.col("embedding").alias("i_vec")
    )
    exact = q.crossJoin(iv).select(
        "query_id",
        "item_id",
        sq_l2(
            F.col("query_vec").cast("array<double>"),
            F.col("i_vec").cast("array<double>"),
        ).alias("d2"),
    )
    truth = {
        (r.query_id, r.item_id)
        for r in windowed_topk(
            exact, "query_id", [F.col("d2"), F.col("item_id")], 10
        )
        .select("query_id", "item_id")
        .collect()
    }

    def recall(shortlist):
        hits = {
            (r.query_id, r.item_id)
            for r in shortlist.select("query_id", "item_id").collect()
        }
        return len(hits & truth) / len(truth)

    m, k, bd = 4, 8, 16
    books = pq_fit(emb, "vec_id", "embedding", m=m, k=k, max_iter=2)
    flat_codes = pq_encode(emb, "vec_id", "embedding", books, m, bd)
    flat = pq_adc_topk(
        q,
        flat_codes.withColumnRenamed("vec_id", "item_id"),
        books,
        "query_id",
        "query_vec",
        "item_id",
        m,
        bd,
        k_top=50,
    )
    coarse, rbooks, rcodes = ivfpq_build(
        emb, "vec_id", "embedding", n_list=8, m=m, k=k
    )
    ivf = ivfpq_topk(
        q,
        coarse,
        rbooks,
        rcodes.withColumnRenamed("vec_id", "item_id"),
        "query_id",
        "query_vec",
        "item_id",
        m,
        bd,
        n_probe=4,
        k_top=50,
    )
    r_flat, r_ivf = recall(flat), recall(ivf)
    assert r_ivf >= r_flat
    assert r_ivf >= 0.5


def test_dedup_store_probe_reads_buckets_without_shuffle(spark):
    """The persisted dedup index contract: probing a NEW batch against
    the band-key store reloaded from its (band, key)-bucketed table
    must shuffle ONLY the batch side — the corpus's pre-hashed bucket
    files join with no Exchange (per-day cost rides |batch|) — and
    must produce the same candidates as the in-session store."""
    from prod_recommendation_pyspark_spark.operators.dedup import (
        incremental_lsh_candidates,
        minhash_band_keys,
    )
    from prod_recommendation_pyspark_spark.sources.writers import (
        write_bucketed,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 != 4)
    batch = docs.filter(F.col("doc_id") % 5 == 4)
    store = minhash_band_keys(corpus, "doc_id", "text")
    write_bucketed(store, "bt_dedup_band_index", 16, ["band", "key"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        reloaded = spark.table("bt_dedup_band_index")
        cands = incremental_lsh_candidates(reloaded, batch, "doc_id", "text")
        plan = cands._jdf.queryExecution().executedPlan().toString()
        # the store is the SMJ's LEFT branch (':'-prefixed lines in
        # the plan tree): its bucketed scan must feed the join with
        # NO Exchange — every shuffle in the plan belongs to the
        # batch side (minhash aggs + bucket alignment) or the final
        # distinct, i.e. rides |batch|
        store_side_exchanges = [
            ln for ln in plan.splitlines()
            if "Exchange" in ln and ":" in ln.split("Exchange")[0]
        ]
        assert not store_side_exchanges, plan
        assert "Bucketed: true" in plan, plan
        got = {(r.id_a, r.id_b) for r in cands.collect()}
        want = {
            (r.id_a, r.id_b)
            for r in incremental_lsh_candidates(
                store, batch, "doc_id", "text"
            ).collect()
        }
        assert got == want and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_dedup_band_index")
