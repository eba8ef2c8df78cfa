"""Property-based tests (hypothesis) for operator invariants that the
DuckDB oracle can't conveniently reach: randomized inputs instead of
the fixed test tables.  Example counts are kept small — every example
is a Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

PROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6), min_size=1, max_size=30
)


@PROP
@given(ks=keys)
def test_dense_ids_are_global_ranks(spark, ks):
    from prod_recommendation_pyspark_spark.operators.relational import dense_ids

    df = spark.createDataFrame([(k,) for k in ks], "k string")
    got = {(r.k, r.idx) for r in dense_ids(df, "k", "idx", num_partitions=4).collect()}
    want = {(k, i) for i, k in enumerate(sorted(set(ks)))}
    assert got == want


# Magnitudes are bounded away from the denormal range: the operator
# (like DuckDB's list_cosine_similarity, its oracle twin) computes
# sum(x^2) naively, and x^2 underflows below ~1e-154 — a documented
# non-goal for embedding-range inputs.
@PROP
@given(
    vec=st.lists(
        st.one_of(
            st.floats(min_value=1e-6, max_value=100),
            st.floats(min_value=-100, max_value=-1e-6),
            st.just(0.0),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_l2_normalize_unit_norm(spark, vec):
    import math

    from prod_recommendation_pyspark_spark.operators.similarity import l2_normalize

    df = spark.createDataFrame([(vec,)], "v array<double>")
    out = l2_normalize(df, "v", "n").collect()[0]["n"]
    norm = math.sqrt(sum(x * x for x in vec))
    if norm == 0:
        assert out == vec
    else:
        assert abs(math.sqrt(sum(x * x for x in out)) - 1.0) < 1e-9


@PROP
@given(texts=st.lists(st.text(alphabet="abc xyz.,!", min_size=0, max_size=40), min_size=1, max_size=10))
def test_token_count_matches_python(spark, texts):
    from prod_recommendation_pyspark_spark.operators.text import token_count

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {r.i: r.n for r in df.select("i", token_count(F.col("t")).alias("n")).collect()}
    for i, t in enumerate(texts):
        want = len([w for w in t.strip().split() if w]) if t.strip() else 0
        assert got[i] == want, (t, got[i], want)


@PROP
@given(texts=st.lists(st.text(alphabet="abcd efg", min_size=1, max_size=30), min_size=2, max_size=8))
def test_simhash_identical_text_distance_zero(spark, texts):
    from prod_recommendation_pyspark_spark.operators.dedup import hamming64, simhash

    rows = [(i, t) for i, t in enumerate(texts + texts)]  # planted exact dups
    df = spark.createDataFrame(rows, "i long, t string")
    sigs = df.select("i", simhash(F.col("t")).alias("s")).collect()
    by_text = {}
    for r, (i, t) in zip(sorted(sigs, key=lambda r: r.i), rows):
        by_text.setdefault(t, set()).add(r.s)
    for t, ss in by_text.items():
        assert len(ss) == 1, f"same text produced different signatures: {t!r}"
