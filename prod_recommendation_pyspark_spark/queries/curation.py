"""Corpus-curation query surface — the quality / rebalancing passes a
pretraining-data pipeline runs between ingestion and dedup: n-gram
repetition signals (Gopher), char-bigram LM scoring (CCNet-style),
domain temperature resampling, and SemDeDup cluster-local near-dup
pairs.  All native Catalyst; every query has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.dedup import semantic_dedup_pairs
from prod_recommendation_pyspark_spark.operators.similarity import (
    spread_small_input as _spread,
)
from prod_recommendation_pyspark_spark.operators.text import (
    char_bigram_lm,
    lm_score,
    repetition_stats,
    temperature_resample,
)
from prod_recommendation_pyspark_spark.queries.registry import register
from prod_recommendation_pyspark_spark.sources.catalog import Catalog


@register(
    "repetition_stats_documents",
    sql=r"""
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        FROM documents WHERE regexp_matches(text, '\S')),
    g AS (
        SELECT doc_id, n, array_to_string(w[i:i+n-1], ' ') AS gram
        FROM w, unnest([1, 2, 3]) AS t(n),
             unnest(range(1, len(w) - n + 2)) AS s(i)
        WHERE len(w) >= n),
    pg AS (SELECT doc_id, n, gram, count(*) AS cnt
           FROM g GROUP BY doc_id, n, gram),
    po AS (SELECT doc_id, n, max(cnt) AS top_cnt, sum(cnt) AS total,
                  count(*) AS n_distinct
           FROM pg GROUP BY doc_id, n)
    SELECT doc_id,
           CAST(max(CASE WHEN n = 1 THEN total END) AS BIGINT) AS n_words,
           round(max(CASE WHEN n = 1 THEN top_cnt END) * 1.0
                 / max(CASE WHEN n = 1 THEN total END), 4) AS top1_frac,
           round(1 - max(CASE WHEN n = 1 THEN n_distinct END) * 1.0
                 / max(CASE WHEN n = 1 THEN total END), 4) AS dup1_frac,
           round(max(CASE WHEN n = 2 THEN top_cnt END) * 1.0
                 / max(CASE WHEN n = 2 THEN total END), 4) AS top2_frac,
           round(1 - max(CASE WHEN n = 2 THEN n_distinct END) * 1.0
                 / max(CASE WHEN n = 2 THEN total END), 4) AS dup2_frac,
           round(max(CASE WHEN n = 3 THEN top_cnt END) * 1.0
                 / max(CASE WHEN n = 3 THEN total END), 4) AS top3_frac,
           round(1 - max(CASE WHEN n = 3 THEN n_distinct END) * 1.0
                 / max(CASE WHEN n = 3 THEN total END), 4) AS dup3_frac
    FROM po GROUP BY doc_id
    HAVING max(CASE WHEN n = 1 THEN total END) >= 3
    ORDER BY doc_id
    """,
)
def repetition_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-family word-n-gram repetition signals per document
    (operators/text.py::repetition_stats): the most-frequent-n-gram
    occurrence fraction and the duplicated-occurrence fraction for
    n = 1..3.  Docs with < 3 words are dropped (no trigram to
    measure).  One explode over all three orders → two keyed
    shuffles — the TF-IDF fan-out shape, 100 TB-safe."""
    docs = _spread(
        Catalog(spark, sf_dir).table("documents").filter(F.col("text").rlike(r"\S"))
    )
    stats = repetition_stats(docs, "text", "doc_id")
    return stats.filter(F.col("n_words") >= 3).orderBy("doc_id")


@register(
    "lm_score_documents",
    sql=r"""
    WITH norm AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z ]', '', 'g'),
                                   ' +', ' ', 'g')) AS s
        FROM documents),
    db AS (
        SELECT doc_id, s[i:i+1] AS bigram
        FROM norm, unnest(range(1, len(s))) AS t(i)
        WHERE len(s) >= 2),
    cnt AS (SELECT bigram, count(*) AS cnt FROM db GROUP BY bigram),
    ctx AS (SELECT bigram[1:1] AS c1, sum(cnt) AS ctx_cnt
            FROM cnt GROUP BY bigram[1:1]),
    model AS (
        SELECT bigram, ln((cnt + 1.0) / (ctx_cnt + 27)) AS log_prob
        FROM cnt JOIN ctx ON bigram[1:1] = c1),
    scored AS (
        SELECT doc_id, coalesce(log_prob, ln(1.0 / 27)) AS lp
        FROM db LEFT JOIN model USING (bigram))
    SELECT doc_id, count(*) AS n_bigrams,
           round(CAST(sum(CAST(lp AS DECIMAL(38,12))) AS DOUBLE) / count(*), 4)
               AS avg_logprob
    FROM scored GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def lm_score_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal: train a char-bigram model over
    the corpus itself (add-one smoothing, 27-symbol alphabet), then
    score each document's mean bigram log-prob.  The model is ≤729
    rows regardless of corpus size, so scoring is a broadcast join;
    training is one bounded-key shuffle.  Low scores flag gibberish /
    non-language text."""
    docs = _spread(Catalog(spark, sf_dir).table("documents"))
    model = char_bigram_lm(docs, "text")
    return lm_score(docs, model, "text", "doc_id").orderBy("doc_id")


@register(
    "temperature_resample_documents",
    sql="""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    r AS (SELECT lang,
                 round(pow(n * 1.0 / (SELECT min(n) FROM c), -0.5), 12)
                     AS keep_prob
          FROM c)
    SELECT doc_id, lang, round(keep_prob, 6) AS keep_prob
    FROM documents JOIN r USING (lang)
    WHERE ((((doc_id % 4294967296) // 65536) * 2654435761 % 4294967296) * 65536
           + (doc_id % 65536) * 2654435761) % 4294967296 / 4294967296.0 < keep_prob
    ORDER BY doc_id
    """,
)
def temperature_resample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain rebalancing at temperature α = 0.5 over the
    language column (operators/text.py::temperature_resample): the
    rarest language keeps every row, head languages are thinned by
    ``(n_d / min n)^(α-1)``; each row's fate is a portable integer
    hash of its id, so the oracle replays identical keep decisions —
    unlike ``df.sample``, reshuffling cannot change the sample."""
    docs = Catalog(spark, sf_dir).table("documents")
    kept = temperature_resample(docs, "lang", "doc_id", alpha=0.5)
    return kept.select("doc_id", "lang", "keep_prob").orderBy("doc_id")


@register(
    "semantic_dedup_pairs_embeddings",
    sql="""
    WITH emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cv
        FROM (SELECT * FROM emb ORDER BY vec_id LIMIT 8)),
    assign AS (
        SELECT vec_id, v, arg_min(cluster, list_distance(v, cv)) AS cluster
        FROM emb CROSS JOIN cent GROUP BY vec_id, v),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster AS cluster,
               round(list_cosine_similarity(a.v, b.v), 4) AS cosine
        FROM assign a JOIN assign b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
    SELECT id_a, id_b, CAST(cluster AS INT) AS cluster, cosine
    FROM pairs WHERE cosine >= 0.4
    ORDER BY id_a, id_b
    """,
)
def semantic_dedup_pairs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup cluster-local near-dup pairs over the embeddings table
    (operators/dedup.py::semantic_dedup_pairs, k=8, τ=0.4): global
    deterministic clustering (k lowest-id vectors as centroids,
    broadcast argmin assignment) makes the quadratic cosine step local
    to each cluster — the cross-cluster O(n²) never materializes.  The
    oracle replays the identical centroids, L2 assignment, and cosine
    threshold.  Both engines round the cosine to 4 digits BEFORE the
    ``>= 0.4`` gate, so kernel-order float epsilon cannot flip a
    borderline pair between them."""
    emb = Catalog(spark, sf_dir).table("embeddings")
    pairs = semantic_dedup_pairs(emb, "vec_id", "embedding", k=8, threshold=0.4)
    return pairs.select("id_a", "id_b", "cluster", "cosine").orderBy(
        "id_a", "id_b"
    )


@register(
    "curation_pipeline_documents",
    sql=r"""
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        FROM documents WHERE regexp_matches(text, '\S')),
    g AS (
        SELECT doc_id, n, array_to_string(w[i:i+n-1], ' ') AS gram
        FROM w, unnest([1, 2]) AS t(n),
             unnest(range(1, len(w) - n + 2)) AS s(i)
        WHERE len(w) >= n),
    pg AS (SELECT doc_id, n, gram, count(*) AS cnt
           FROM g GROUP BY doc_id, n, gram),
    rep AS (SELECT doc_id,
                   max(CASE WHEN n = 1 THEN total END) AS n_words,
                   max(CASE WHEN n = 2 THEN topf END) AS top2_frac,
                   max(CASE WHEN n = 2 THEN dupf END) AS dup2_frac
            FROM (SELECT doc_id, n, max(cnt) * 1.0 / sum(cnt) AS topf,
                         1 - count(*) * 1.0 / sum(cnt) AS dupf,
                         sum(cnt) AS total
                  FROM pg GROUP BY doc_id, n)
            GROUP BY doc_id),
    norm AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z ]', '', 'g'),
                                   ' +', ' ', 'g')) AS s
        FROM documents),
    db AS (SELECT doc_id, s[i:i+1] AS bigram
           FROM norm, unnest(range(1, len(s))) AS t(i) WHERE len(s) >= 2),
    cnt AS (SELECT bigram, count(*) AS cnt FROM db GROUP BY bigram),
    ctx AS (SELECT bigram[1:1] AS c1, sum(cnt) AS ctx_cnt
            FROM cnt GROUP BY bigram[1:1]),
    model AS (SELECT bigram, ln((cnt + 1.0) / (ctx_cnt + 27)) AS lp
              FROM cnt JOIN ctx ON bigram[1:1] = c1),
    lm AS (SELECT doc_id,
                  round(CAST(sum(CAST(lp AS DECIMAL(38,12))) AS DOUBLE)
                        / count(*), 4) AS avg_logprob
           FROM db JOIN model USING (bigram) GROUP BY doc_id),
    gated AS (
        SELECT d.doc_id, d.lang, d.text, rep.n_words, lm.avg_logprob
        FROM documents d JOIN rep USING (doc_id) JOIN lm USING (doc_id)
        WHERE rep.n_words >= 3 AND rep.dup2_frac <= 0.10
          AND rep.top2_frac <= 0.15 AND lm.avg_logprob >= -1.80),
    deduped AS (
        SELECT doc_id, lang, n_words, avg_logprob
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                  ORDER BY doc_id) AS rn
              FROM gated)
        WHERE rn = 1),
    hist AS (SELECT lang, count(*) AS n FROM deduped GROUP BY lang),
    rates AS (SELECT lang,
                     round(pow(n * 1.0 / (SELECT min(n) FROM hist), -0.5), 12)
                         AS keep_prob
              FROM hist)
    SELECT doc_id, lang, CAST(n_words AS BIGINT) AS n_words,
           round(avg_logprob, 4) AS avg_logprob,
           round(keep_prob, 6) AS keep_prob
    FROM deduped JOIN rates USING (lang)
    WHERE ((((doc_id % 4294967296) // 65536) * 2654435761 % 4294967296) * 65536
           + (doc_id % 65536) * 2654435761) % 4294967296 / 4294967296.0 < keep_prob
    ORDER BY doc_id
    """,
)
def curation_pipeline_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed end-to-end curation pass a pretraining corpus runs
    before tokenization — every stage an operator from this package,
    one oracle-checked query:

    1. repetition gate (word + bigram stats; drop degenerate docs:
       ``dup2_frac > 0.10`` or ``top2_frac > 0.15`` or < 3 words),
    2. LM-score floor (corpus-trained char-bigram model,
       ``avg_logprob >= -1.80`` — the CCNet perplexity gate),
    3. exact dedup (md5 of normalized text, keep lowest doc_id),
    4. temperature resampling over language (α = 0.5, histogram taken
       on the SURVIVING corpus — the set actually being sampled).

    Scale shape: stages 1-2 are the bounded-key shuffles audited on
    their standalone queries; the gates compose as joins on doc_id
    (broadcast-sized stat projections at any corpus size the stats
    themselves survive); dedup is one shuffle on the fingerprint;
    the resample histogram is |langs| rows.  Thresholds sit at the
    p90-p99 of this corpus so every stage provably drops something."""
    from prod_recommendation_pyspark_spark.operators.dedup import exact_dedup

    docs = Catalog(spark, sf_dir).table("documents")
    spread = _spread(docs.filter(F.col("text").rlike(r"\S")))
    rep = repetition_stats(spread, "text", "doc_id", orders=(1, 2))
    model = char_bigram_lm(_spread(docs), "text")
    lm = lm_score(_spread(docs), model, "text", "doc_id")
    gated = (
        docs.join(rep, "doc_id")
        .join(lm.select("doc_id", "avg_logprob"), "doc_id")
        .filter(
            (F.col("n_words") >= 3)
            & (F.col("dup2_frac") <= 0.10)
            & (F.col("top2_frac") <= 0.15)
            & (F.col("avg_logprob") >= -1.80)
        )
    )
    deduped = exact_dedup(gated, "text", "doc_id", keep="min").select(
        "doc_id", "lang", "n_words", "avg_logprob"
    )
    kept = temperature_resample(deduped, "lang", "doc_id", alpha=0.5)
    return kept.select(
        "doc_id",
        "lang",
        "n_words",
        F.round("avg_logprob", 4).alias("avg_logprob"),
        "keep_prob",
    ).orderBy("doc_id")


@register(
    "token_entropy_by_lang",
    sql=r"""
    WITH w AS (SELECT lang,
                      unnest(string_split_regex(trim(lower(text)), '\s+'))
                          AS term
               FROM documents WHERE regexp_matches(text, '\S')),
    cnt AS (SELECT lang, term, count(*) AS c FROM w GROUP BY lang, term),
    tot AS (SELECT lang, sum(c) AS n, count(*) AS n_distinct
            FROM cnt GROUP BY lang)
    SELECT cnt.lang,
           CAST(tot.n AS BIGINT) AS n_tokens,
           CAST(tot.n_distinct AS BIGINT) AS n_distinct,
           round(CAST(sum(CAST(
                     round(-(c / tot.n) * ln(c / tot.n), 12)
                 AS DECIMAL(38,12))) AS DOUBLE), 6) AS entropy
    FROM cnt JOIN tot USING (lang)
    GROUP BY cnt.lang, tot.n, tot.n_distinct
    ORDER BY cnt.lang
    """,
)
def token_entropy_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each language's token distribution — the
    corpus-diversity diagnostic a data-mixing pipeline tracks per
    domain (low entropy flags boilerplate-dominated or degenerate
    slices).  Σ −p·ln p with each term quantized to 12 digits BEFORE
    the DECIMAL accumulation, so the only residual cross-engine
    surface is a 1-ULP ``ln`` difference landing exactly on a 1e-12
    boundary (the lm_score class); the sum itself is exact and
    order-independent.  Two bounded-key shuffles: (lang, term) counts,
    then per-lang totals broadcast back."""
    docs = Catalog(spark, sf_dir).table("documents")
    w = docs.filter(F.col("text").rlike(r"\S")).select(
        "lang",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "term"
        ),
    )
    cnt = w.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("lang").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_distinct")
    )
    p = F.col("c") / F.col("n")
    term = F.round(-p * F.log(p), 12).cast("decimal(38,12)")
    return (
        cnt.join(F.broadcast(tot), "lang")
        .groupBy("lang", "n", "n_distinct")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("entropy"))
        .select(
            "lang",
            F.col("n").alias("n_tokens"),
            "n_distinct",
            "entropy",
        )
        .orderBy("lang")
    )


@register(
    "kl_divergence_by_lang",
    sql=r"""
    WITH w AS (SELECT lang,
                      unnest(string_split_regex(trim(lower(text)), '\s+'))
                          AS term
               FROM documents WHERE regexp_matches(text, '\S')),
    lc AS (SELECT lang, term, count(*) AS c FROM w GROUP BY lang, term),
    lt AS (SELECT lang, sum(c) AS n FROM lc GROUP BY lang),
    gc AS (SELECT term, sum(c) AS gc FROM lc GROUP BY term),
    gt AS (SELECT sum(c) AS gn FROM lc)
    SELECT lc.lang,
           round(CAST(sum(CAST(
                     round((c / lt.n) * ln((c / lt.n) / (gc / gt.gn)), 12)
                 AS DECIMAL(38,12))) AS DOUBLE), 6) AS kl_from_corpus
    FROM lc JOIN lt USING (lang) JOIN gc USING (term) CROSS JOIN gt
    GROUP BY lc.lang
    ORDER BY lc.lang
    """,
)
def kl_divergence_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(P_lang ‖ P_corpus) over token distributions — the
    data-mixing diagnostic paired with ``token_entropy_by_lang``: how
    far each language slice's usage diverges from the global mix
    (spikes flag domain drift or contamination).  Every lang term is
    present in the corpus distribution by construction, so no
    zero-denominator terms exist; each p·ln(p/q) term is quantized to
    12 digits before the DECIMAL accumulation (order-independent sum;
    residual = the 1-ULP ln class).  Shuffles: (lang, term) counts,
    term-level corpus counts, per-lang totals — all bounded keys."""
    docs = Catalog(spark, sf_dir).table("documents")
    w = docs.filter(F.col("text").rlike(r"\S")).select(
        "lang",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "term"
        ),
    )
    lc = w.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("c"))
    lt = lc.groupBy("lang").agg(F.sum("c").alias("n"))
    gc = lc.groupBy("term").agg(F.sum("c").alias("gc"))
    gt = lc.agg(F.sum("c").alias("gn"))
    p = F.col("c") / F.col("n")
    q = F.col("gc") / F.col("gn")
    term = F.round(p * F.log(p / q), 12).cast("decimal(38,12)")
    return (
        lc.join(F.broadcast(lt), "lang")
        .join(gc, "term")
        .crossJoin(F.broadcast(gt))
        .groupBy("lang")
        .agg(
            F.round(F.sum(term).cast("double"), 6).alias("kl_from_corpus")
        )
        .orderBy("lang")
    )


# --- Static mixture rebalancing weights ---------------------------------------
@register(
    "mixture_balance_weights",
    sql="""
    WITH c AS (SELECT lang, source, count(*) AS n_docs
               FROM documents GROUP BY lang, source),
    t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
                 count(*) AS n_groups FROM c),
    w AS (SELECT c.lang, c.source, c.n_docs,
                 round(c.n_docs / t.total, 6) AS actual_share,
                 least(t.total / (t.n_groups * c.n_docs), 8.0) AS w_capped
          FROM c CROSS JOIN t),
    z AS (SELECT CAST(sum(CAST(n_docs * w_capped AS DECIMAL(38,18)))
                      AS DOUBLE) AS norm FROM w)
    SELECT w.lang AS lang, w.source AS source,
           w.n_docs AS n_docs, w.actual_share AS actual_share,
           round(w.w_capped, 6) AS weight,
           round(w.n_docs * w.w_capped / z.norm, 6) AS balanced_share
    FROM w CROSS JOIN z
    ORDER BY lang, source
    """,
)
def mixture_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static training-mixture rebalancing: per (lang, source) domain,
    the sampling weight that moves the corpus toward a UNIFORM
    domain mixture, with upsampling capped at 8x (rare domains are
    repeated at most 8 times rather than dominating the sample), and
    the resulting post-balance share after renormalization.  This is
    the classic static data-mixture step (uniform-target reweighting
    with a repetition cap) that precedes temperature resampling.

    Scale: one map-side-combinable count per domain; everything after
    operates on |domains| rows with the two scalar totals broadcast.
    Weights derive from exact integer counts through IEEE division
    (identical in both engines); emitted values are rounded."""
    c = (
        Catalog(spark, sf_dir)
        .table("documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    t = c.agg(
        F.sum("n_docs").alias("total"),
        F.count(F.lit(1)).alias("n_groups"),
    )
    w = c.crossJoin(F.broadcast(t)).select(
        "lang",
        "source",
        "n_docs",
        F.round(F.col("n_docs") / F.col("total"), 6).alias("actual_share"),
        F.least(
            F.col("total") / (F.col("n_groups") * F.col("n_docs")),
            F.lit(8.0),
        ).alias("w_capped"),
    )
    # norm is summed in decimal space: a double sum over |domains|
    # rows is summation-order-sensitive and the engines iterate the
    # groups in different orders
    z = w.agg(
        F.sum(
            (F.col("n_docs") * F.col("w_capped")).cast("decimal(38,18)")
        )
        .cast("double")
        .alias("norm")
    )
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "lang",
            "source",
            "n_docs",
            "actual_share",
            F.round("w_capped", 6).alias("weight"),
            F.round(
                F.col("n_docs") * F.col("w_capped") / F.col("norm"), 6
            ).alias("balanced_share"),
        )
        .orderBy("lang", "source")
    )
