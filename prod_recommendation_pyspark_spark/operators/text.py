"""Text-analysis operators (LLM-data-pipeline extensions; SURVEY §7
Phase F).  Everything is native Catalyst string/regex/higher-order
expressions — no Python in the hot path, so these run at full scan
speed over 100 TB of documents.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal per-language stopword sets for the n-gram/stopword-voting
# heuristic.  Deliberately tiny: language ID here is a deterministic,
# cheap pre-filter, not a classifier.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los", "un"],
    "fr": ["le", "la", "de", "et", "un", "que", "pour"],
}

# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
# — the classic GPT-2-style pre-split shape, kept regex-portable.
BPE_TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count.  Text with no non-whitespace character
    is 0 tokens — the guard is ``rlike(\\S)``, not ``trim == ''``,
    because ``trim`` strips only ASCII spaces and a tab/newline-only
    doc would otherwise count its empty-string split artifacts
    (``split('')`` yields ``['']``) as words."""
    return F.when(~col.rlike(r"\S"), F.lit(0)).otherwise(F.size(tokens(col)))


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish pre-tokens (lowercased)."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(BPE_TOKEN_PATTERN), 0))


def stopword_hits(col: Column, words: list[str]) -> Column:
    """How many whitespace tokens are in ``words``."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(F.lower(col)), lambda t: F.array_contains(arr, t)))


def language_id(col: Column, fallback: str = "und") -> Column:
    """Stopword-voting language ID: argmax of per-language stopword
    hits, ``fallback`` when no stopwords at all.  Ties break by
    language-code order (deterministic)."""
    scores = [(lang, stopword_hits(col, ws)) for lang, ws in sorted(STOPWORDS.items())]
    best_lang = F.lit(fallback)
    best_score = F.lit(0)
    for lang, score in scores:
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def punct_count(col: Column) -> Column:
    return F.length(F.regexp_replace(col, "[^.!?,;:]", ""))


def alpha_ratio(col: Column) -> Column:
    """Fraction of characters that are ASCII letters."""
    return F.length(F.regexp_replace(col, "[^A-Za-z]", "")) / F.greatest(
        F.length(col), F.lit(1)
    )


def quality_score(col: Column) -> Column:
    """Composite document-quality heuristic in [0,1]: rewards
    mid-length documents, high alpha ratio, and some punctuation;
    penalizes extreme token lengths.  The exact blend is a policy
    knob — the operator contract is determinism + boundedness."""
    n_tok = token_count(col)
    avg_tok_len = F.length(col) / F.greatest(n_tok, F.lit(1))
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    alpha_term = alpha_ratio(col)
    tok_len_term = F.when((avg_tok_len >= 3) & (avg_tok_len <= 12), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return F.round(
        0.4 * length_term + 0.4 * alpha_term + 0.2 * tok_len_term, 6
    )


def doc_fingerprint(col: Column) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text
    (the exact-dedup key; also a stable shard/bucket key via its hex
    prefix)."""
    from prod_recommendation_pyspark_spark.operators.dedup import normalize_text

    return F.md5(normalize_text(col))


def text_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One-pass per-document stats projection."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        F.round(F.length(c) / F.greatest(token_count(c), F.lit(1)), 4).alias(
            "avg_token_len"
        ),
        punct_count(c).alias("n_punct"),
        F.round(alpha_ratio(c), 4).alias("alpha_ratio"),
        quality_score(c).alias("quality"),
        language_id(c).alias("lang_pred"),
        doc_fingerprint(c).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# TF-IDF / BM25 term scoring — corpus-level text analysis
# ---------------------------------------------------------------------------


def term_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, term, tf) for lowercased whitespace terms.  One explode +
    one shuffle on (doc, term).  At 100 TB this is the canonical
    token-level fan-out: ~tokens-per-doc × rows, aggregated map-side
    before the shuffle by partial HashAggregate."""
    return (
        df.select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 1,
) -> DataFrame:
    """(doc, term, tf, df, tfidf) — smooth idf ``ln((N+1)/(df+1)) + 1``
    (scikit-learn's formulation: strictly positive, no div-by-zero).

    Shuffle shape: one on (doc, term) for tf, one on term for document
    frequency; the corpus size N rides in as a broadcast single row.
    ``min_df`` prunes the long tail of hapax terms BEFORE the join back
    — at 100 TB that is most of the vocabulary.

    The tf table is persisted: document frequency and the score join
    both hang off it, and without the cache each reference re-runs the
    full tokenize+explode over the corpus (the plan audit showed the
    scan duplicated per branch).  The cache backs the returned plan —
    caller owns its lifetime (LRU-evicted under pressure)."""
    tf = term_frequencies(df, id_col, text_col).persist()
    docfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    return (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (
                F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0)) + F.lit(1.0)
            ),
        )
        .select(id_col, "term", "tf", "df", "tfidf")
    )


def bm25(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k1: float = 1.2,
    b: float = 0.75,
    min_df: int = 1,
) -> DataFrame:
    """(doc, term, bm25) — Okapi BM25 term scores.

    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``;
    ``score = idf · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``.
    The corpus aggregate (N, avgdl) is a broadcast single row; the
    per-document length table is one row PER DOC — joined on the doc
    key with no broadcast hint (AQE broadcasts it locally when small;
    at 100 TB it is a co-partitioned shuffle join, which is correct).

    tf is persisted: FOUR branches (score join, df, dl, corpus stats)
    hang off it — uncached, each re-runs the corpus tokenization
    (see :func:`tfidf`); caller owns the cache lifetime."""
    tf = term_frequencies(df, id_col, text_col).persist()
    docfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    doclen = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = doclen.select(
        F.count(F.lit(1)).alias("__n"), F.avg("dl").alias("__avgdl")
    )
    idf = F.log(
        1.0 + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl") / F.col("__avgdl"))
    )
    return (
        tf.join(docfreq, "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("bm25", idf * tf_norm)
        .select(id_col, "term", "tf", "df", "dl", "bm25")
    )


# ---------------------------------------------------------------------------
# Feature hashing (hashing trick) — portable polynomial hash
# ---------------------------------------------------------------------------

#: Modulus for the portable term hash: prime, small enough that
#: ``acc*31 + ord`` never overflows BIGINT between reductions.
FEATURE_HASH_MOD = 1_000_003


def portable_term_hash(term: Column) -> Column:
    """Deterministic polynomial hash ``acc = (acc·31 + ascii) % p`` over
    the term's characters.  Unlike ``xxhash64`` this is reproducible in
    ANSI SQL (the DuckDB oracle folds the same recurrence), so the
    whole hashing-trick pipeline is value-checkable cross-engine.  The
    per-step mod keeps the accumulator bounded — BIGINT overflow is an
    ERROR in strict engines, not a wraparound."""
    chars = F.split(term, "")
    return F.aggregate(
        F.filter(chars, lambda c: c != ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % FEATURE_HASH_MOD,
    )


def feature_hash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Hashing-trick vectorization: (doc, bucket, weight) long-form
    sparse features, bucket = portable_term_hash(term) % n_buckets,
    weight = term count.  No vocabulary fit, no dictionary broadcast —
    the classic fixed-width featurizer for unbounded vocabularies.
    One explode + one shuffle on (doc, bucket); long form keeps every
    value a driver-hashable scalar (assemble to arrays only at an ML
    boundary)."""
    return (
        df.select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .filter(F.col("term") != "")
        .withColumn("bucket", F.pmod(portable_term_hash(F.col("term")), F.lit(n_buckets)))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


# ---------------------------------------------------------------------------
# PII redaction + benchmark decontamination (pretraining curation ops)
# ---------------------------------------------------------------------------

#: RE2-safe patterns (no lookaround/backreference) so the SAME regex
#: runs in Spark (Java regex) and the DuckDB oracle (RE2) — parity of
#: the redacted text is value-checked cross-engine.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+?\d[\d().-]{7,}\d",
}


def redact_pii(
    df: DataFrame,
    text_col: str,
    out_col: str | None = None,
    patterns: dict[str, str] | None = None,
    token: str = "[PII]",
) -> DataFrame:
    """Scrub PII-shaped spans before a corpus leaves curation: chained
    ``regexp_replace`` per pattern (email → ipv4 → ssn → phone, dict
    order) plus a per-pattern match count column ``n_<name>`` (counted
    on the ORIGINAL text — later patterns never see spans an earlier
    pattern already collapsed, which is also why the chain order is
    part of the contract and the count can exceed the redactions a
    pattern performs itself).

    Pure scan-level projection — codegen'd, no shuffle, trivially
    100 TB-safe.  Patterns stay RE2-compatible by contract (see
    ``PII_PATTERNS``) so oracle engines replay them verbatim."""
    out_col = out_col or f"{text_col}_redacted"
    patterns = PII_PATTERNS if patterns is None else patterns
    text = F.col(text_col)
    redacted = text
    counts = []
    for name, pat in patterns.items():
        counts.append(
            F.size(F.regexp_extract_all(text, F.lit(pat), 0)).alias(f"n_{name}")
        )
        redacted = F.regexp_replace(redacted, pat, token)
    return df.select("*", *counts, redacted.alias(out_col))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    shingle_words: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Test-set decontamination: count each corpus document's distinct
    word ``shingle_words``-grams that appear in ANY benchmark document,
    and flag documents at ≥ ``min_overlap`` — the standard leakage
    check before pretraining on a crawl that may contain the eval set.

    Shape: benchmark shingles are deduped then joined to corpus
    shingles on the shingle string — ONE shuffle keyed by shingle (the
    benchmark side is tiny and broadcastable; Spark picks broadcast
    when it fits), then one aggregation on the doc id.  Returns
    ``(id, n_contaminated, contaminated)`` for every corpus row.  At
    100 TB: hash the shingles first (8-byte join keys instead of
    strings) and df-cap ubiquitous shingles — same skew logic as
    MinHash band buckets."""
    from prod_recommendation_pyspark_spark.operators.dedup import word_shingles

    c_sh = corpus.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_words)).alias("__s"),
    )
    b_sh = benchmark.select(
        F.explode(word_shingles(F.col(text_col), shingle_words)).alias("__s")
    ).distinct()
    hits = (
        c_sh.join(b_sh, "__s")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("__s")).alias("n_contaminated"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    shingle_words: int = 8,
    min_overlap: int = 1,
    bits_per_key: int = 10,
    n_probes: int = 3,
) -> DataFrame:
    """``decontaminate`` with a Bloom-filter prefilter — EXACTLY the
    same result (false positives are removed by an exact verify), but
    the corpus side never shuffles its full shingle stream.

    When this is the right shape — measured honestly: while the
    benchmark's shingle set fits the broadcast threshold, the exact
    operator's join is ALREADY broadcast (no corpus shuffle), and the
    bloom probes are pure overhead — measured at sf0.1/sf1
    (local[32]): exact 5.3s/27.0s vs bloom 6.5s/43.1s, identical
    results.  The bloom path wins when the benchmark side OUTGROWS
    broadcast: a hash relation costs ~100+ bytes per shingle (10 GB
    at 10⁸ benchmark shingles — infeasible to broadcast, forcing a
    full corpus-shingle shuffle onto the exact path), while this
    bitset costs ``bits_per_key`` BITS per key (125 MB at 10⁸ keys,
    ``bits_per_key=10``) — extending broadcast economics ~100× in
    benchmark size.  The membership test (``n_probes`` xxhash64
    probes; fp ≈ (1-e^(-k/b))^k ≈ 2% at 10/3) is codegen'd bit
    arithmetic in the corpus scan projection, so only the ~fp
    fraction of shingles reaches the exact-verify join.  The manual
    analog of Spark's runtime bloom-filter join pruning, applied
    where the optimizer can't see it.

    Exactness: candidates = {true hits} ∪ {fp}; the verify join keeps
    only true hits, so output ≡ ``decontaminate`` row-for-row (pinned
    by pytest and by sharing the exact operator's DuckDB oracle).

    Driver contract: one collect of the OR-folded bitset words
    (≤ m_bits/64 rows ≈ the bitset itself, never the raw position
    stream — same class as centroid/dictionary collects)."""
    import math

    from prod_recommendation_pyspark_spark.operators.dedup import word_shingles

    spark = corpus.sparkSession
    b_sh = benchmark.select(
        F.explode(word_shingles(F.col(text_col), shingle_words)).alias("__s")
    ).distinct()
    n_keys = b_sh.count()
    m_bits = 1 << max(6, math.ceil(math.log2(max(1, n_keys * bits_per_key))))
    n_words = m_bits // 64
    probes = [
        F.pmod(F.xxhash64(F.lit(i), F.col("__s")), F.lit(m_bits)).alias(f"__p{i}")
        for i in range(n_probes)
    ]
    # the probe hashes are computed by the SAME Spark expression the
    # corpus side uses, so no cross-language hash reimplementation can
    # drift.  The bitset is ASSEMBLED DISTRIBUTED: positions fold into
    # (word_index, bit_or of set bits) on the executors, and only the
    # ≤ m_bits/64 non-zero words cross to the driver — never the raw
    # n_probes · |shingles| position stream (tens of GB at 10⁸
    # benchmark shingles, dwarfing the 125 MB bitset it builds).
    word_rows = (
        b_sh.select(F.explode(F.array(*[p for p in probes])).alias("p"))
        .select(
            F.expr("CAST(p DIV 64 AS INT)").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .collect()
    )
    words = [0] * n_words
    for r in word_rows:
        words[r.w] = r.bits
    bits_df = spark.createDataFrame([(words,)], "__bits array<bigint>")

    c_sh = corpus.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_words)).alias("__s"),
    ).crossJoin(F.broadcast(bits_df))
    for i in range(n_probes):
        c_sh = c_sh.withColumn(
            f"__p{i}", F.pmod(F.xxhash64(F.lit(i), F.col("__s")), F.lit(m_bits))
        )
    cond = None
    for i in range(n_probes):
        hit = F.expr(
            f"(element_at(__bits, CAST(__p{i} DIV 64 AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST(__p{i} % 64 AS INT))) != 0"
        )
        cond = hit if cond is None else (cond & hit)
    cands = c_sh.filter(cond).select(id_col, "__s")
    hits = (
        cands.join(b_sh, "__s")  # exact verify: fp candidates die here
        .groupBy(id_col)
        .agg(F.count_distinct("__s").alias("n_contaminated"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Segment-level corpus dedup with document reassembly (CCNet line dedup)
# ---------------------------------------------------------------------------


def segment_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seg_words: int = 20,
    max_occurrences: int = 1,
    hash_key: bool = False,
) -> DataFrame:
    """Corpus-wide duplicated-segment removal with in-place document
    reassembly — the CCNet/RefinedWeb "line dedup" pass (Wenzek et al.
    2020 §3.1 dedups paragraphs across shards; boilerplate like cookie
    banners and navigation chrome repeats verbatim across millions of
    pages and should vanish from EVERY document, not just one copy).
    Documents here carry no newline structure, so the unit is a
    deterministic tiling: consecutive ``seg_words``-word windows
    (stride = window, last tile short).  Every tile whose normalized
    text occurs more than ``max_occurrences`` times ACROSS THE CORPUS
    is dropped from all documents; survivors are stitched back in
    original order.

    Returns ``(id, n_segments, n_kept, clean_text)`` for every input
    row — empty documents keep ``n_segments = 0`` and an empty
    ``clean_text`` (the LEFT join back), so no row silently vanishes.

    Shape at 100 TB: tiling is a pure projection (HOF transform over a
    sequence — no Python); the occurrence count is ONE shuffle keyed
    by segment text (cardinality ≤ total tiles, with partial map-side
    aggregation); the keep-filter is a shuffle join on the same key;
    reassembly is one shuffle on the doc id with ``array_sort`` fixing
    ``collect_list``'s nondeterministic arrival order.

    ``hash_key=True`` is the 100 TB path: the occurrence count and the
    keep-join shuffle on the segment's 8-byte ``xxhash64`` instead of
    the full segment string (~100 bytes/key at ``seg_words=20``) —
    ~10× less shuffle volume for those two exchanges, at the cost of
    treating a 64-bit hash collision as a duplicate (probability
    ~n²/2⁶⁵ — negligible against the dedup's own false-positive
    tolerance).  The default keeps the string key so the DuckDB oracle
    replays the join verbatim."""
    # NULL text must take the empty-doc branch too: `~rlike` is NULL
    # for NULL input, which would fall through to tokens(NULL) and
    # yield NULL n_segments instead of the documented n_segments=0.
    words = (
        F.when(
            F.col(text_col).isNull() | ~F.col(text_col).rlike(r"\S"),
            F.array().cast("array<string>"),
        )
        .otherwise(tokens(F.lower(F.col(text_col))))
        .alias("__w")
    )
    base = df.select(F.col(id_col), words)
    n_seg = F.ceil(F.size("__w") / F.lit(seg_words)).cast("int")
    tiles = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(
            F.slice("__w", i * seg_words + 1, seg_words), " "
        ),
    )
    # sequence(0, -1) would count DOWN — guard the empty doc explicitly
    segged = base.select(
        id_col,
        F.when(F.size("__w") == 0, F.array().cast("array<string>"))
        .otherwise(tiles)
        .alias("__segs"),
    )
    exploded = segged.select(
        id_col, F.posexplode("__segs").alias("pos", "seg")
    )
    join_key = "seg"
    if hash_key:
        exploded = exploded.withColumn("__k", F.xxhash64("seg"))
        join_key = "__k"
    counts = exploded.groupBy(join_key).agg(
        F.count(F.lit(1)).alias("__c")
    )
    kept = exploded.join(counts, join_key).filter(
        F.col("__c") <= max_occurrences
    )
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        segged.select(F.col(id_col), F.size("__segs").alias("n_segments"))
        .join(reassembled, id_col, "left")
        .select(
            F.col(id_col),
            "n_segments",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (rolling k-gram hash + window minimum)
# ---------------------------------------------------------------------------


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD 2003 — the MOSS fingerprinter) as a pure Catalyst
    expression pipeline.

    Normalize (lowercase, strip non-alphanumerics) → hash every
    k-char gram with the portable polynomial recurrence
    (``portable_term_hash`` — oracle-reproducible, unlike xxhash64) →
    slide a w-gram window, keep each window's MINIMUM hash → the
    distinct selected hashes are the document's fingerprint set.
    Guarantee: two documents sharing a normalized substring of length
    ≥ k + w - 1 share at least one fingerprint; no match shorter than
    k is ever detected (the noise floor).  Expected density ~2/(w+1)
    of all grams, so the fingerprint set is a bounded-size sketch.

    Returns long-form distinct ``(id, fingerprint)`` rows — the join
    shape dedup wants, every cell driver-hashable.

    Scale shape: selection is a pure per-row projection — NO shuffle
    until a consumer joins/aggregates.  Gram hashes are O(k) folds
    here (k stays small and the fold transliterates to the DuckDB
    oracle verbatim); for large k swap in the O(1)-per-gram rolling
    recurrence (prefix hashes ``P_i = P_{i-1}·B + c_i``, gram =
    ``P_{i+k} - P_i·B^k`` mod p) — same outputs, oracle needs the
    same rewrite.  Documents shorter than k hash their whole
    remainder (and an empty normalized text yields the seed hash 0),
    so every row emits ≥ 1 fingerprint."""
    from prod_recommendation_pyspark_spark.operators.similarity import (
        spread_small_input,
    )

    # gram hashing is the CPU-heavy projection pipelined on the scan:
    # a single-split read would run it on one core (measured 17.5s
    # serial vs 9.9s for 4x the rows spread across 32)
    df = spread_small_input(df)
    clean = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(clean) - (k - 1), F.lit(1))),
        lambda i: portable_term_hash(clean.substr(i, F.lit(k))),
    )
    # Projection ladder (same trick as minhash_signature): the window
    # pass references the gram array TWICE (size + slice) — behind its
    # own non-cheap alias CollapseProject keeps the boundary, so grams
    # evaluate once per row.  Inlined, every window's slice() would
    # recompute the WHOLE gram array: O(n²·k) per document (measured:
    # minutes per 5k-char doc — the plan shows the full transform
    # subtree nested inside the slice lambda).
    hashed = df.select(F.col(id_col), grams.alias("__grams"))
    wins = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size("__grams") - (w - 1), F.lit(1))
        ),
        lambda j: F.array_min(F.slice(F.col("__grams"), j, w)),
    )
    return hashed.select(
        F.col(id_col),
        F.explode(F.array_sort(F.array_distinct(wins))).alias("fingerprint"),
    )


def winnow_dedup_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = 10_000,
) -> DataFrame:
    """Near-dup candidate pairs by shared winnowing fingerprints:
    ``(id_a, id_b, n_shared)`` with ``id_a < id_b`` and ≥
    ``min_shared`` fingerprints in common — the fingerprint-overlap
    complement to MinHash-LSH (which thresholds on whole-document
    Jaccard; winnowing localizes, so a single long shared passage is
    enough regardless of the rest of the document).

    One shuffle on the fingerprint (self-equi-join) + one on the pair
    key.  ``max_df`` drops fingerprints present in more documents
    (boilerplate) — the same cartesian-bomb cap as MinHash's
    ``max_bucket``: a fingerprint shared by f docs contributes
    O(f²) pairs, so ubiquitous grams must be pruned at 100 TB."""
    fps = winnow_fingerprints(df, id_col, text_col, k=k, w=w)
    if max_df is not None:
        from pyspark.sql import Window

        dfw = Window.partitionBy("fingerprint")
        fps = (
            fps.withColumn("__df", F.count(F.lit(1)).over(dfw))
            .filter(F.col("__df") <= max_df)
            .drop("__df")
        )
    a = fps.select(F.col(id_col).alias("id_a"), "fingerprint")
    b = fps.select(F.col(id_col).alias("id_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# Sequence prep: token-window chunking + budgeted packing
# ---------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split each document into overlapping token windows —
    (doc, chunk_idx, start_token, chunk_text, n_chunk_tokens) — the
    standard pretraining/RAG chunker.  Pure Catalyst: tokenize once,
    ``sequence`` generates window starts, ``slice`` + ``array_join``
    materialize each chunk.  No UDF, so it runs at scan speed and the
    explode fan-out (≈ n_tokens / stride per doc) is the only cost.
    Empty/whitespace docs yield no chunks."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = token_count(F.col(text_col))
    # last useful start is < n - overlap: a start beyond that yields a
    # chunk whose tokens all lie inside the previous chunk's coverage
    # (pure-duplicate output — e.g. a 100-token doc at stride 96 must
    # produce ONE chunk, not [0..100] plus the redundant [96..100])
    starts = F.sequence(
        F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(stride)
    )
    return (
        df.filter(n > 0)
        .select(
            F.col(id_col),
            toks.alias("__toks"),
            F.posexplode(starts).alias("chunk_idx", "start_token"),
        )
        .select(
            id_col,
            "chunk_idx",
            "start_token",
            F.array_join(
                F.slice("__toks", F.col("start_token") + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(
                F.size("__toks") - F.col("start_token"), F.lit(chunk_tokens)
            ).alias("n_chunk_tokens"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int = 2048,
    n_shards: int = 64,
) -> DataFrame:
    """Budgeted sequence packing, the Spark-friendly *fractional*
    variant: shard deterministically by key, order within the shard by
    key, pack_id = floor(exclusive-cumsum / budget) — every pack except
    a shard's last holds ≥ ``budget`` tokens, documents may straddle a
    pack boundary (the trainer's concat-then-split convention).

    Scale shape: ONE shuffle (the per-shard window); shards bound
    window partition size, and packing decisions never leave the
    executor.  The exact next-fit variant (no straddling) is
    ``pack_sequences_nextfit`` — same sharding, per-shard
    applyInPandas."""
    shard = F.pmod(F.col(id_col).cast("long"), F.lit(n_shards))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("shard", shard)
        .withColumn(
            "cum_before", F.coalesce(F.sum(n_tokens_col).over(w), F.lit(0))
        )
        .withColumn(
            "pack_id", F.floor(F.col("cum_before") / F.lit(budget)).cast("long")
        )
    )


def pack_sequences_nextfit(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int = 2048,
    n_shards: int = 64,
) -> DataFrame:
    """Exact next-fit packing: docs never straddle packs — a doc that
    would overflow the open pack starts a new one (oversized docs get
    a pack of their own).  The running open-pack state is inherently
    sequential, so it runs per shard in ``applyInPandas`` (Arrow-
    batched; one shuffle on the shard key, greedy loop over a shard's
    docs only).  Deterministic: shard = pmod(key), order by key."""
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        pack_ids, fill = [], 0
        cur = 0
        for n in pdf[n_tokens_col]:
            n = int(n)
            if fill > 0 and fill + n > budget:
                cur += 1
                fill = 0
            pack_ids.append(cur)
            fill += n
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        return pdf

    from pyspark.sql import types as T

    shard = F.pmod(F.col(id_col).cast("long"), F.lit(n_shards))
    with_shard = df.withColumn("shard", shard)
    # fresh StructType — StructType.add MUTATES the instance, and
    # df.schema hands back the DataFrame's cached schema object
    schema = T.StructType(
        list(with_shard.schema.fields) + [T.StructField("pack_id", T.LongType())]
    )
    return with_shard.groupBy("shard").applyInPandas(pack, schema=schema)


# ---------------------------------------------------------------------------
# Repetition statistics (Gopher-style quality signals)
# ---------------------------------------------------------------------------


def repetition_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    orders: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Per-document n-gram repetition signals (the Gopher "repetition
    removal" family, Rae et al. 2021, word-level): for each order n in
    ``orders``, the fraction of n-gram occurrences taken by the single
    most frequent n-gram (``top{n}_frac``) and the duplicated-occurrence
    fraction ``dup{n}_frac = 1 - distinct/total``.  High values mark
    degenerate boilerplate/spam that survives per-line filters.

    Shape: posexplode the words array, then ONE Generate over a
    ``len(orders)``-entry struct array per word position (gram =
    plain slice/concat_ws — codegen'd; positions past an order's last
    full gram emit NULL and are filtered) → one partial-aggregated
    shuffle on ``(id, order, gram)`` → one on ``(id, order)`` →
    pivot-free conditional aggregation to per-order columns.  The
    all-HOF column form (transform over sequence) runs interpreted
    AND gets re-evaluated serially below any spreading exchange by
    the InferFiltersFromGenerate+pushdown combination (see
    ``dedup.lsh_candidate_pairs`` for the same rewrite); here the
    inferred filter is ``size(array(<literals>)) > 0`` — constant-
    folded away.  Gram cardinality bounds the shuffle exactly like
    TF-IDF's (doc, term) fan-out, so the plan carries to 100 TB
    unchanged.  Documents with fewer words than the largest order get
    NULL fractions for that order (no occurrences to measure).
    Measured at sf0.1/local[32], cache-cleared runs: 10.4 → 1.1 s."""
    # text without any non-whitespace char: split('') yields [''] — a
    # bogus "word" — so such docs are mapped to a 0-word array (same
    # rlike guard as token_count; trim would miss tab/newline-only
    # docs) and emit no output row at all.
    words_df = df.select(
        F.col(id_col),
        F.when(
            ~F.col(text_col).rlike(r"\S"), F.array().cast("array<string>")
        )
        .otherwise(tokens(F.lower(F.col(text_col))))
        .alias("__w"),
    )
    pos = words_df.select(
        id_col, "__w", F.posexplode("__w").alias("__p", "__word")
    )
    w, p = F.col("__w"), F.col("__p")
    tagged = F.array(
        *[
            F.struct(
                F.lit(n).alias("order"),
                F.when(
                    p <= F.size(w) - n,
                    F.concat_ws(" ", F.slice(w, p + 1, n)),
                ).alias("gram"),
            )
            for n in orders
        ]
    )
    grams = (
        pos.select(id_col, F.explode(tagged).alias("g"))
        .filter(F.col("g.gram").isNotNull())
        .select(
            id_col, F.col("g.order").alias("order"), F.col("g.gram").alias("gram")
        )
    )
    per_gram = grams.groupBy(id_col, "order", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_order = per_gram.groupBy(id_col, "order").agg(
        F.max("cnt").alias("top_cnt"),
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    aggs = []
    for n in orders:
        is_n = F.col("order") == n
        top = F.max(F.when(is_n, F.col("top_cnt")))
        tot = F.max(F.when(is_n, F.col("total")))
        dst = F.max(F.when(is_n, F.col("n_distinct")))
        aggs.append(F.round(top / tot, 4).alias(f"top{n}_frac"))
        aggs.append(F.round(1 - dst / tot, 4).alias(f"dup{n}_frac"))
        if n == 1:
            aggs.insert(0, tot.cast("long").alias("n_words"))
    return per_order.groupBy(id_col).agg(*aggs)


# ---------------------------------------------------------------------------
# Character-bigram language-model scoring (CCNet-style quality signal)
# ---------------------------------------------------------------------------

LM_ALPHABET_SIZE = 27  # a-z + space


def _lm_normalize(col: Column) -> Column:
    """Lowercase, strip to ``[a-z ]``, squeeze runs of spaces, trim —
    the fixed normalization both the trainer and scorer share."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), "[^a-z ]", ""), " +", " "
        )
    )


def _exploded_bigrams(
    df: DataFrame, text_col: str, keep: list[str]
) -> DataFrame:
    """Long-form ``(*keep, bigram)`` rows: normalize, explode start
    positions, take 2-char substrings — no higher-order functions, so
    the per-char work is codegen'd and the Generate's inferred
    non-empty filter only references ``sequence(length(...))`` (two
    cheap regex passes), not a transform pipeline (see
    ``repetition_stats`` for the pattern).  Docs whose normalized text
    is shorter than 2 chars emit no rows."""
    norm_df = df.select(*keep, _lm_normalize(F.col(text_col)).alias("__s"))
    pos = norm_df.filter(F.length("__s") >= 2).select(
        *keep,
        "__s",
        F.explode(F.sequence(F.lit(1), F.length("__s") - 1)).alias("__i"),
    )
    return pos.select(
        *keep, F.substring(F.col("__s"), F.col("__i"), 2).alias("bigram")
    )


def char_bigram_lm(
    df: DataFrame, text_col: str
) -> DataFrame:
    """Train a character-bigram LM over the corpus: ``(bigram,
    log_prob)`` with add-one smoothing over the 27-symbol alphabet,
    ``P(c2 | c1) = (count(c1c2) + 1) / (count(c1·) + 27)``.

    One explode → one shuffle on the bigram (≤ 729 live keys, partial
    map-side combine does almost all the work) → a tiny self-
    aggregation for the context totals.  The model is ≤ 729 rows — it
    broadcasts for scoring no matter how large the corpus was."""
    bg = (
        _exploded_bigrams(df, text_col, keep=[])
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ctx = bg.groupBy(F.substring("bigram", 1, 1).alias("c1")).agg(
        F.sum("cnt").alias("ctx_cnt")
    )
    return bg.join(ctx, F.substring(F.col("bigram"), 1, 1) == F.col("c1")).select(
        "bigram",
        F.log((F.col("cnt") + 1) / (F.col("ctx_cnt") + LM_ALPHABET_SIZE)).alias(
            "log_prob"
        ),
    )


def lm_score(
    df: DataFrame,
    model: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Score documents under a ``char_bigram_lm`` model: mean log-prob
    per observed bigram (unseen bigrams fall back to the unsmoothed-
    context floor ``log(1/27)`` — a bigram absent from the model means
    its context may also be unseen, and the floor keeps the score
    total-order stable).  Low scores mark gibberish / non-language
    text (the CCNet perplexity-bucket idea with the model trained on
    the corpus itself).

    Shape: explode → broadcast join against the ≤729-row model →
    re-aggregate on the doc id.  Two narrow shuffles at any scale."""
    doc_bg = _exploded_bigrams(df, text_col, keep=[id_col])
    floor = math.log(1.0 / LM_ALPHABET_SIZE)
    scored = doc_bg.join(F.broadcast(model), "bigram", "left").select(
        id_col, F.coalesce("log_prob", F.lit(floor)).alias("lp")
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        # exact decimal accumulation: a per-doc double sum of ~10³
        # log-probs is summation-order-dependent (cross-engine ULP
        # class — see the money-sum queries); the decimal sum makes
        # the rounded score and any threshold gate on it
        # engine-identical
        F.round(
            F.sum(F.col("lp").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_logprob"),
    )


# ---------------------------------------------------------------------------
# Domain temperature resampling
# ---------------------------------------------------------------------------

#: Knuth's 2^32 multiplicative-hash constant — portable across engines
HASH_MULT = 2654435761
HASH_MOD = 2**32


def uniform_hash(id_col: Column) -> Column:
    """Deterministic per-row uniform in [0,1) from an integer id:
    ``(id * 2654435761) mod 2^32 / 2^32``, evaluated with the id first
    reduced mod 2^32 and the multiply split into 16-bit halves so every
    intermediate stays below 2^49 — exact (no overflow, ANSI-safe) in
    BIGINT arithmetic for the full 64-bit id range, so any SQL engine
    replays the identical keep/drop decisions.  The id column must be
    integral (or an exactly-integral numeric); string ids should be
    mapped to dense ids first (``features.encode.string_index``)."""
    return uniform_hash_long(id_col) / F.lit(float(HASH_MOD))


def uniform_hash_long(id_col: Column) -> Column:
    """Integer core of :func:`uniform_hash`: the multiplicative
    (Knuth golden-ratio) scramble ``(id * 2654435761) mod 2^32`` as a
    BIGINT in [0, 2^32), with the same overflow-safe 16-bit-half
    evaluation.  Use directly when an integer sort key is wanted
    (``epoch_shuffle``) rather than a [0,1) draw."""
    m = F.pmod(id_col.cast("long"), F.lit(HASH_MOD))
    m_hi = F.floor(m / F.lit(65536))
    m_lo = F.pmod(m, F.lit(65536))
    return F.pmod(
        F.pmod(m_hi * F.lit(HASH_MULT), F.lit(HASH_MOD)) * F.lit(65536)
        + m_lo * F.lit(HASH_MULT),
        F.lit(HASH_MOD),
    )


def temperature_resample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based domain rebalancing (the multilingual-sampling
    rule of Conneau & Lample 2019 §3.1, applied as a deterministic
    downsampling filter): with ``n_d`` rows in domain ``d``, keep
    probability ``p_d = (n_d / min_d n_d) ** (alpha - 1)`` — the
    smallest domain keeps everything, head domains are thinned toward
    the ``alpha``-temperature distribution.  Each row's keep decision
    is ``uniform_hash(id) < p_d``: reproducible, no RNG state, stable
    under re-partitioning (unlike ``df.sample``).

    Shape: one tiny groupBy for the domain histogram (broadcast back),
    then a pure filter — the histogram is |domains| rows at any corpus
    size.  Returns surviving rows with ``keep_prob`` attached.

    The gate compares against ``round(keep_prob, 12)``: ``pow`` is not
    guaranteed correctly rounded, so JVM ``Math.pow`` and another
    engine's libm can differ by 1 ULP — quantizing to 12 digits makes
    the keep/drop decision operate on an engine-identical value (a row
    flips only if the true probability sits within ~1e-13 of a 1e-12
    boundary AND the hash lands in that sliver — measure-zero in
    practice vs the raw 1-ULP gate)."""
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    min_n = counts.agg(F.min("__n").alias("__min_n"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        domain_col,
        F.round(
            F.pow(F.col("__n") / F.col("__min_n"), F.lit(alpha - 1.0)), 12
        ).alias("keep_prob"),
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .filter(uniform_hash(F.col(id_col)) < F.col("keep_prob"))
        .select(*df.columns, F.round("keep_prob", 6).alias("keep_prob"))
    )


# ---------------------------------------------------------------------------
# Markup stripping — the HTML→text step of a pretraining ingest
# ---------------------------------------------------------------------------


def strip_markup(col: Column) -> Column:
    """Extract readable text from HTML-ish markup: drop script/style
    blocks and comments, strip tags, decode the five XML entities plus
    ``&nbsp;``, squeeze whitespace.  A chain of codegen'd
    ``regexp_replace`` — every pattern is RE2-safe (no backreferences,
    no lookaround), so ANY engine replays the identical extraction
    (the DuckDB oracle runs the same chain).  This is the
    trafilatura-lite ingest step; at 100 TB it runs at scan speed as a
    pure projection."""
    out = col
    for pat in (
        r"(?is)<script[^>]*>.*?</script>",
        r"(?is)<style[^>]*>.*?</style>",
        r"(?s)<!--.*?-->",
        r"<[^>]+>",
    ):
        out = F.regexp_replace(out, pat, " ")
    for ent, ch in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # LAST, so &amp;lt; decodes to &lt; not <
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def normalize_url(col: Column) -> Column:
    """Canonicalize a URL for dedup (the crawl-pipeline URL-level
    dedup that runs BEFORE content dedup): lowercase scheme+host,
    strip default ports (:80 http / :443 https), drop the fragment,
    drop tracking params (utm_*, fbclid, gclid — whole-param regex,
    then tidy separators), collapse a dangling '?', and trim one
    trailing slash — including the ROOT slash (``https://x.com/`` →
    ``https://x.com``), which is exactly the collapse a dedup key
    wants since both forms name the same resource.  All RE2-safe
    codegen'd string/regex ops — engine-replayable, scan speed."""
    # lowercase scheme://host[:port] only (path/query stay cased)
    out = F.concat(
        F.lower(F.regexp_extract(col, r"^([^/]+//[^/?#]*)", 1)),
        F.regexp_replace(col, r"^[^/]+//[^/?#]*", ""),
    )
    # no lookahead (RE2 has none): capture the delimiter-or-eos instead
    out = F.regexp_replace(out, r"^(http://[^/?#]*):80([/?#]|$)", r"$1$2")
    out = F.regexp_replace(out, r"^(https://[^/?#]*):443([/?#]|$)", r"$1$2")
    out = F.regexp_replace(out, r"#.*$", "")  # fragment
    # tracking params, three positional passes so separators stay valid:
    # mid/terminal &p=v; leading ?p=v& (another param follows); lone ?p=v
    track = r"(utm_[a-z]+|fbclid|gclid)=[^&#]*"
    out = F.regexp_replace(out, r"&" + track, "")
    out = F.regexp_replace(out, r"\?" + track + r"&", "?")
    out = F.regexp_replace(out, r"\?" + track + r"$", "")
    out = F.regexp_replace(out, r"\?$", "")  # dangling '?' (http://x/p?)
    out = F.regexp_replace(out, r"([^:/])/$", r"$1")  # trailing slash (eos)
    return out


# ---------------------------------------------------------------------------
# Exact heavy hitters — per-partition Misra-Gries + exact recount
# ---------------------------------------------------------------------------


def heavy_hitters(
    items: DataFrame,
    item_col: str,
    k: int = 1000,
    min_frac: float = 0.002,
) -> DataFrame:
    """EXACT frequent items over a (possibly huge-cardinality) item
    stream with bounded per-task memory: returns every item whose
    occurrence count exceeds ``min_frac`` of all occurrences, with its
    exact count — WITHOUT ever shuffling the full item cardinality.

    Two phases (the classic sketch-then-verify pattern):

    1. Per-partition Misra-Gries summaries (capacity ``k``) via
       ``mapInPandas`` — O(k) memory per task regardless of
       cardinality.  Completeness: an item with global frequency
       > N/k must exceed n_p/k in at least one partition (averaging
       argument), and MG never evicts an item above its partition's
       n_p/k — so the union of partition candidates is a SUPERSET of
       every global heavy hitter whenever ``min_frac ≥ 1/k``.
    2. Exact recount restricted to candidates: broadcast semi-join
       (≤ k·partitions candidate rows) then a groupBy whose shuffle
       key cardinality is bounded by the candidate set, not the
       vocabulary.

    Contrast with plain groupBy-HAVING: same answer, but groupBy
    shuffles EVERY distinct item; at 100 TB of text the shingle
    vocabulary is itself TB-scale while the candidates are k·tasks
    rows.  ``mapInPandas`` is justified here because the per-partition
    MG loop is inherently sequential-stateful — no Catalyst aggregate
    expresses "decrement all counters on overflow".

    Requires ``min_frac >= 1.0 / k`` (raises otherwise — below that
    the sketch cannot guarantee completeness and the result would be
    silently approximate)."""
    import pandas as pd

    if min_frac < 1.0 / k:
        raise ValueError(
            f"min_frac={min_frac} < 1/k={1.0 / k}: completeness guarantee "
            "needs min_frac >= 1/k (raise k or the threshold)"
        )

    src = items.select(F.col(item_col).alias("item"))
    # Candidate schema mirrors the input item type so bigint items
    # (pre-hashed shingles) survive the round-trip and the left_semi
    # join below compares like types — a hardcoded `string` would
    # silently stringify them and the join would match nothing.
    item_type = items.schema[item_col].dataType.simpleString()

    def mg_partition(batches):
        counters: dict = {}
        for pdf in batches:
            for it in pdf["item"]:
                # numeric nulls arrive as NaN through Arrow, not None
                if it is None or pd.isna(it):
                    continue
                if it in counters:
                    counters[it] += 1
                elif len(counters) < k:
                    counters[it] = 1
                else:
                    dead = [c for c in counters if counters[c] == 1]
                    for c in counters:
                        counters[c] -= 1
                    for c in dead:
                        del counters[c]
        yield pd.DataFrame({"item": pd.Series(list(counters.keys()))})

    cands = src.mapInPandas(
        mg_partition, schema=f"item {item_type}"
    ).distinct()
    total = src.agg(F.count(F.lit(1)).alias("__total"))
    return (
        src.join(F.broadcast(cands), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") > F.col("__total") * F.lit(min_frac))
        .select(
            "item",
            "n_occurrences",
            F.round(F.col("n_occurrences") / F.col("__total"), 6).alias(
                "frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable frequency estimation in fixed memory
# ---------------------------------------------------------------------------


def _cms_bucket(item: Column, j: Column, width: int) -> Column:
    """Row-hash for CMS row ``j``: the portable polynomial hash over
    ``"<j>:<item>"`` mod ``width`` — one hash family parameterized by
    the row index, replayable in ANSI SQL (same recurrence as
    ``portable_term_hash``, so the DuckDB oracle reproduces every
    cell and every estimate exactly)."""
    return F.pmod(
        portable_term_hash(
            F.concat(j.cast("string"), F.lit(":"), item.cast("string"))
        ),
        F.lit(width),
    )


def count_min_cells(
    items: DataFrame, item_col: str, width: int = 256, depth: int = 4
) -> DataFrame:
    """Build a count-min sketch (Cormode & Muthukrishnan 2005) over an
    item stream as a long-form cell table ``(j, bucket, cnt)`` —
    ``depth`` rows × ``width`` buckets, each cell the exact count of
    items hashing there.

    This IS the textbook mergeable sketch expressed relationally: the
    cell table is a grouped count, so Catalyst's partial aggregation
    does the per-partition sketch build AND the merge map-side — the
    shuffle moves at most ``depth × width`` cells per partition no
    matter how many items or how large the vocabulary.  At 100 TB the
    output is still ≤ ``depth × width`` rows: frequency estimation in
    fixed memory where the exact GROUP BY would shuffle the full
    vocabulary."""
    return (
        items.select(
            F.col(item_col).alias("__item"),
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
        )
        .select("j", _cms_bucket(F.col("__item"), F.col("j"), width).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_estimate(
    cells: DataFrame,
    probes: DataFrame,
    item_col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point-query the sketch: estimate = min over the ``depth`` cells
    a probe item hashes to.  Guarantees: never an underestimate;
    overestimate ≤ (e/width)·N with probability 1 − e^(−depth).
    The cell table is ≤ ``depth × width`` rows — broadcast — so
    estimating any number of probes is a map-side join plus a
    ``depth``-row min per probe; probes missing from the sketch's
    hash range cannot occur (every bucket cell exists or the count is
    0 via the left join's coalesce)."""
    pb = probes.select(
        F.col(item_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    ).withColumn("bucket", _cms_bucket(F.col(item_col), F.col("j"), width))
    return (
        pb.join(F.broadcast(cells), ["j", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("n_est"))
    )


# ---------------------------------------------------------------------------
# Inverted index build — the search-engine indexing primitive
# ---------------------------------------------------------------------------


def inverted_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_postings: int = 20,
) -> DataFrame:
    """Build an inverted index over the corpus: one row per term with
    its document frequency ``df``, collection frequency ``cf``, and
    the first ``max_postings`` doc ids of its sorted posting list —
    the indexing half of a search engine (BM25/TF-IDF are the scoring
    half, already covered by ``bm25``/``tfidf``).

    Shape: tokenize (pure projection) → ONE shuffle on (term, doc) for
    the per-doc counts → ONE shuffle on term for the posting-list
    assembly.  ``array_sort(collect_list(...))`` fixes arrival-order
    nondeterminism so the posting arrays are value-comparable;
    ``slice`` caps the per-term array at ``max_postings`` AFTER the
    sort, so hot terms (stopwords — df ≈ |corpus|) cannot blow a
    single reducer's output row, while ``df``/``cf`` stay exact.  At
    100 TB you'd shard hot terms' postings into fixed-size segment
    rows instead of truncating; the cap keeps this single-row-per-term
    variant bounded."""
    occ = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).filter(F.col("term") != "")
    per_doc = occ.groupBy("term", id_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    return per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("__c").alias("cf"),
        F.slice(
            F.array_sort(F.collect_list(F.col(id_col))), 1, max_postings
        ).alias("postings"),
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    key_col: str = "shuffle_key",
) -> DataFrame:
    """Deterministic per-epoch corpus shuffle key: the portable
    polynomial hash of ``"<epoch>:<id>"`` (epoch mixing) scrambled by
    the multiplicative golden-ratio hash (order diffusion — the
    polynomial alone is order-PRESERVING for short sequential ids, a
    non-shuffle) — a new pseudo-random total order every epoch, fully
    reproducible (re-running epoch 3 after a failure yields the
    identical order; two engines agree — the property ``rand(seed)``
    lacks, since its stream depends on partitioning).  A lightweight
    locality-breaker, not a cryptographic permutation: adjacent
    epochs' orders are decorrelated enough for training-batch
    diversity, pinned by a permutation/difference pytest.

    Training-data shuffling at 100 TB: never a global sort — write
    each epoch with ``repartitionByRange(key_col)`` +
    ``sortWithinPartitions(key_col, id)`` so shards come out locally
    sorted in a globally consistent pseudo-random order, one range
    shuffle per epoch.  The key is row-local arithmetic; this helper
    only attaches it."""
    return df.withColumn(
        key_col,
        uniform_hash_long(
            portable_term_hash(
                F.concat(
                    F.lit(str(epoch)), F.lit(":"), F.col(id_col).cast("string")
                )
            )
        ),
    )


def rendezvous_shard(
    id_col: Column, n_shards: int, shard_col_alias: str = "shard"
) -> Column:
    """Rendezvous (highest-random-weight) shard assignment (Thaler &
    Ravishankar 1998): shard(id) = argmax over shards of
    h(shard, id) — the stable-sharding primitive consistent hashing
    approximates.  Resizing N→N+1 moves EXACTLY the rows whose new
    shard wins the argmax: expected 1/(N+1) of the corpus, versus
    ~100% for ``id % N`` (every modulus change reshuffles almost
    everything — the classic cache/shard-invalidation bug).

    The per-shard weight is the multiplicative scramble of
    ``id·31 + shard`` (row-local BIGINT arithmetic, replayable in
    ANSI SQL); the argmax is ``array_position(weights, array_max)``
    over the N-element weight array — ties go to the smaller shard id
    (first occurrence), and the array form keeps the expression tree
    LINEAR in N (the chained-when fold duplicated every weight
    subtree per step: at N=9 the generated method blew janino's 64KB
    limit and the scan fell back to interpreted execution — seen in
    the sf0.01 sweep log).  Pure projection: assigning 100 TB costs a
    scan, no shuffle."""
    w_arr = F.array(
        *[uniform_hash_long(id_col * 31 + F.lit(s)) for s in range(n_shards)]
    )
    return (
        (F.array_position(w_arr, F.array_max(w_arr)) - 1)
        .cast("int")
        .alias(shard_col_alias)
    )


def bpe_merge_steps(
    words: DataFrame,
    word_col: str,
    freq_col: str,
    steps: int = 4,
):
    """Byte-pair-encoding vocabulary induction (Sennrich et al. 2016)
    over a (word, freq) table: ``steps`` rounds of count-adjacent-
    symbol-pairs → pick the most frequent (ties to the
    lexicographically smallest pair) → merge it everywhere.  Returns
    ``(merges, final_reps)``: the learned merge list
    [(pair, merged, count), ...] and the DataFrame of final word
    representations.

    Merge application is ONE leftmost-non-overlapping string replace
    of ``" x y "`` per step — identical in Spark and ANSI SQL, which
    is what puts the whole training loop under a value hash.  It
    deviates from classic BPE only inside single-symbol runs
    ("aaaa": the shared separator space is consumed, so alternate
    occurrences survive a round longer); for natural-language
    vocabularies the merge sequence is the textbook one.

    Spark shape: per step, ONE pair-count aggregation over the
    (bounded) vocabulary table and a 1-row argmax collect — the same
    k-row driver-collect class as k-means centroids; merge
    application is a codegen'd replace.  The vocabulary table, not
    the corpus, iterates: at 100 TB the corpus is touched once to
    build (word, freq)."""
    chars = F.filter(F.split(F.col(word_col), ""), lambda c: c != "")
    rep_df = words.select(
        F.col(word_col).alias("word"),
        F.col(freq_col).alias("freq"),
        F.concat(
            F.lit(" "), F.array_join(chars, " "), F.lit(" ")
        ).alias("rep"),
    )
    merges = []
    for _ in range(steps):
        syms = F.split(F.trim(F.col("rep")), " ")
        # sequence(1, 0) counts DOWN in Spark — guard 1-symbol words
        pairs = F.when(
            F.size(syms) < 2, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.concat(
                    F.element_at(syms, i),
                    F.lit(" "),
                    F.element_at(syms, i + 1),
                ),
            )
        )
        pc = (
            rep_df.select("freq", F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pc.orderBy(F.desc("cnt"), "pair").limit(1).collect()
        if not best:
            break
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        merged = pair.replace(" ", "")
        merges.append((pair, merged, cnt))
        rep_df = rep_df.withColumn(
            "rep",
            F.replace(
                F.col("rep"), F.lit(f" {pair} "), F.lit(f" {merged} ")
            ),
        )
    return merges, rep_df


# ---------------------------------------------------------------------------
# DSIR data-selection importance weights (Xie et al. 2023, "Data
# Selection for Language Models via Importance Resampling")
# ---------------------------------------------------------------------------


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 128,
) -> DataFrame:
    """Hashed-n-gram importance weights for data selection: fit two
    bag-of-hashed-unigram models — the TARGET distribution p (the
    domain you want more of) and the RAW distribution q (the pool you
    select from) — and score every raw document with its
    log-likelihood ratio ``w(x) = Σ_tokens ln(p_b / q_b)``, add-0.5
    smoothing on both sides.  High-weight documents look like the
    target; selection then keeps the top slice (or resamples
    proportionally).

    Cross-engine exactness: the bucket hash is the portable
    polynomial (:func:`portable_term_hash`), the per-bucket ratio is
    a double expression with identical operation order in both
    engines, and the per-document sum accumulates the per-token
    ``ln`` values in DECIMAL(38,12) — the same summation-order
    defense ``lm_score`` documents.

    Scale shape: the two model fits collapse to ``n_buckets``-row
    tables in ONE pass each with map-side combine (the shuffle
    carries ≤ n_buckets rows per mapper, never the token stream);
    the scorer re-explodes raw tokens and broadcast-joins the
    ≤ n_buckets-row LLR table, then re-aggregates on the doc id —
    corpus-linear, dimension-bounded, no driver transit."""

    def bucket_counts(df: DataFrame, alias: str) -> DataFrame:
        toks = df.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("__t")
        ).filter(F.col("__t") != "")
        return (
            toks.select(
                (portable_term_hash(F.col("__t")) % n_buckets).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    tc = bucket_counts(target, "tc")
    rc = bucket_counts(raw, "rc")
    # outer-join the two ≤ n_buckets-row tables; missing buckets count
    # 0.  Eagerly checkpointed: the model feeds BOTH the totals agg
    # and the LLR projection — uncheckpointed, each consumer re-runs
    # the two corpus token scans (seen in the plan audit: 4 document
    # scans instead of 2).  n_buckets rows — driver-safe.
    model = (
        tc.join(rc, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("tc", F.lit(0)).alias("tc"),
            F.coalesce("rc", F.lit(0)).alias("rc"),
        )
        .localCheckpoint(eager=True)
    )
    tt = model.agg(F.sum("tc").alias("tt"), F.sum("rc").alias("rt"))
    llr = model.crossJoin(F.broadcast(tt)).select(
        "bucket",
        F.log(
            ((F.col("tc") + 0.5) / (F.col("tt") + 0.5 * n_buckets))
            / ((F.col("rc") + 0.5) / (F.col("rt") + 0.5 * n_buckets))
        ).alias("llr"),
    )
    doc_toks = raw.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("__t"),
    ).filter(F.col("__t") != "")
    scored = doc_toks.select(
        id_col, (portable_term_hash(F.col("__t")) % n_buckets).alias("bucket")
    ).join(F.broadcast(llr), "bucket")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        # round in DECIMAL space (exact, engine-identical), THEN cast
        # — double-space rounding re-opens the boundary divergence the
        # decimal accumulation closed (see functions/exact.py)
        F.round(F.sum(F.col("llr").cast("decimal(38,12)")), 4)
        .cast("double")
        .alias("dsir_weight"),
    )


def bpe_encode(
    words: DataFrame,
    word_col: str,
    freq_col: str,
    merges: list[tuple[str, str, int]],
) -> DataFrame:
    """Apply a learned BPE merge list (from :func:`bpe_merge_steps`)
    to a (word, freq) table — the TOKENIZE step that turns the trained
    vocabulary into an encoder for the whole corpus.  Each word
    char-splits into the spaced representation and every merge applies
    in training order as the same ``" x y " → " xy "`` replace the
    trainer used, so encode(train_corpus) reproduces the trainer's
    final representations exactly.  Returns ``(word, freq,
    subwords array<string>)``.

    Scale: pure codegen'd string projection — len(merges) chained
    ``replace`` calls, no shuffle, no UDF; encoding 100 TB costs the
    scan.  Real tokenizers apply thousands of merges with a
    priority-queue encoder; the replace-chain form is exact for the
    merge-list sizes the in-engine trainer produces and keeps the
    whole encode SQL-replayable."""
    chars = F.filter(F.split(F.col(word_col), ""), lambda c: c != "")
    out = words.select(
        F.col(word_col).alias("word"),
        F.col(freq_col).alias("freq"),
        F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" ")).alias(
            "rep"
        ),
    )
    for pair, merged, _ in merges:
        out = out.withColumn(
            "rep",
            F.replace(F.col("rep"), F.lit(f" {pair} "), F.lit(f" {merged} ")),
        )
    return out.select(
        "word", "freq", F.split(F.trim(F.col("rep")), " ").alias("subwords")
    )
