"""Approximate-quantile RANK-guarantee contract.

`queries/analytic.py::approx_sketches_orders` already pins HLL++ and
the approx median to VALUE tolerances (within 10%/5% of exact).  A
value tolerance is scale-dependent — on a heavy-tailed column a sketch
can drift far in rank while staying within 5% of the value, or
vice-versa.  The query here audits the guarantee `percentile_approx`
actually documents: the returned value's RANK is within εN of qN.
Oracle pattern as elsewhere for sketches: the replayable exact facts
(q, N) plus the contract boolean under the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.queries.registry import register
from prod_recommendation_pyspark_spark.sources.catalog import Catalog


@register(
    "approx_quantile_contract_orders",
    sql="""
    SELECT CAST(q AS DOUBLE) AS q,
           (SELECT count(*) FROM orders) AS n_orders,
           TRUE AS rank_ok
    FROM (SELECT unnest([0.25, 0.5, 0.75, 0.9]) AS q)
    ORDER BY q
    """,
)
def approx_quantile_contract_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Approximate-quantile contract: `percentile_approx` (Greenwald-
    Khanna style, accuracy=10000) on o_totalprice at four quantiles,
    each checked by its RANK against the full table — the returned
    value v must satisfy  count(< v)/N ≤ q + ε  and
    count(≤ v)/N ≥ q − ε  with ε = 10/accuracy (10× the guarantee, a
    deterministic CI margin).

    Shape: ONE aggregation computes all four sketch quantiles; the
    rank audit is one more pass with the 4-value array broadcast —
    at 100 TB the sketch pass alone is the production path (mergeable
    summaries, no sort, no full-key shuffle), the audit pass is this
    query's evidence."""
    qs = [0.25, 0.5, 0.75, 0.9]
    accuracy = 10_000
    eps = 10.0 / accuracy
    orders = Catalog(spark, sf_dir).table("orders")
    aq = orders.agg(
        F.percentile_approx("o_totalprice", qs, accuracy).alias("__aq")
    )
    audited = orders.crossJoin(F.broadcast(aq)).agg(
        F.count(F.lit(1)).alias("n_orders"),
        *[
            F.count(
                F.when(
                    F.col("o_totalprice") < F.element_at("__aq", i + 1), 1
                )
            ).alias(f"__lt{i}")
            for i in range(len(qs))
        ],
        *[
            F.count(
                F.when(
                    F.col("o_totalprice") <= F.element_at("__aq", i + 1), 1
                )
            ).alias(f"__le{i}")
            for i in range(len(qs))
        ],
    )
    rows = [
        F.struct(
            F.lit(q).alias("q"),
            F.col("n_orders").alias("n_orders"),
            (
                (F.col(f"__lt{i}") / F.col("n_orders") <= q + eps)
                & (F.col(f"__le{i}") / F.col("n_orders") >= q - eps)
            ).alias("rank_ok"),
        )
        for i, q in enumerate(qs)
    ]
    return (
        audited.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.q", "r.n_orders", "r.rank_ok")
        .orderBy("q")
    )


@register(
    "approx_distinct_contract_orders",
    sql="""
    SELECT col_name, n_exact, TRUE AS rel_err_ok
    FROM (VALUES
        ('o_custkey',     (SELECT count(DISTINCT o_custkey) FROM orders)),
        ('o_orderdate',   (SELECT count(DISTINCT o_orderdate) FROM orders)),
        ('o_orderstatus', (SELECT count(DISTINCT o_orderstatus) FROM orders))
    ) AS t(col_name, n_exact)
    ORDER BY col_name
    """,
)
def approx_distinct_contract_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HyperLogLog++ distinct-count contract: `approx_count_distinct`
    (rsd=0.05) on three orders columns spanning the cardinality range
    a profiler meets (3-value status enum, ~2.4k order dates, the custkey id space), each
    audited against the exact distinct count to within 5×rsd — a
    deterministic CI margin (HLL++ error is 3σ ≈ 0.15 at this rsd;
    the sketch is seed-fixed, so the audit cannot flake).

    Shape: the sketch column and the exact column ride the SAME
    single aggregation pass (the exact side is this query's audit
    evidence; at 100 TB the sketch alone is the production path —
    mergeable registers, fixed memory, no distinct-key shuffle,
    exactly why a profiler ships HLL and not COUNT DISTINCT).  The
    hash covers (col_name, n_exact, rel_err_ok): exact facts plus the
    contract boolean, the same replayable-facts pattern as
    `approx_quantile_contract_orders`."""
    rsd = 0.05
    margin = 5 * rsd
    orders = Catalog(spark, sf_dir).table("orders")
    cols = ["o_custkey", "o_orderdate", "o_orderstatus"]
    agg = orders.agg(
        *[F.approx_count_distinct(c, rsd).alias(f"__a_{c}") for c in cols],
        *[F.countDistinct(c).alias(f"__e_{c}") for c in cols],
    )
    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"__e_{c}").alias("n_exact"),
            (
                F.abs(F.col(f"__a_{c}") / F.col(f"__e_{c}") - 1.0) <= margin
            ).alias("rel_err_ok"),
        )
        for c in cols
    ]
    return (
        agg.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.col_name", "r.n_exact", "r.rel_err_ok")
        .orderBy("col_name")
    )
