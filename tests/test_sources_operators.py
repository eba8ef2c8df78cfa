"""Round-trip and operator tests for the pieces not exercised through
the oracle queries: readers/writers (S1-S8), key remap (J4), trim join
(J9), threshold top-K (O2/O3), and the sentinel-row smoke pattern
(SURVEY §5 / search_ranking_peers.py:464-471)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.hybrid import hybrid_topk_crossjoin
from prod_recommendation_pyspark_spark.operators.relational import (
    dedup_first_by_key,
    topk_by_threshold,
    trim_normalized_join,
)
from prod_recommendation_pyspark_spark.recommender.ratings import key_remap
from prod_recommendation_pyspark_spark.sources.catalog import Catalog
from prod_recommendation_pyspark_spark.sources.readers import (
    latest_snapshot,
    literal_rows,
    read_csv,
    read_pipe_csv,
    read_table,
)
from prod_recommendation_pyspark_spark.sources.writers import (
    write_csv,
    write_json,
    write_parquet,
)
from tests.conftest import SF_SMOKE


def test_csv_parquet_json_roundtrip(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2.5).alias("val"), F.lit("x|y").alias("s")
    )
    base = tempfile.mkdtemp(prefix="sinks_")
    write_csv(df, f"{base}/csv", single_file=True)
    write_parquet(df, f"{base}/pq")
    write_json(df, f"{base}/json")
    back_csv = read_csv(spark, f"{base}/csv")
    back_pq = read_table(spark, f"{base}/pq" + "/")  # dir ending: pipe default
    back_pq2 = spark.read.parquet(f"{base}/pq")
    assert back_csv.count() == 100
    assert back_pq2.count() == 100
    assert sorted(back_csv.columns) == sorted(df.columns)
    files = os.listdir(f"{base}/csv")
    assert sum(f.endswith(".csv") for f in files) == 1  # single_file honored
    _ = back_pq


def test_pipe_csv_roundtrip(spark):
    df = spark.range(10).select(F.col("id").cast("string").alias("a"),
                                F.lit("v").alias("b"))
    base = tempfile.mkdtemp(prefix="pipe_")
    df.coalesce(1).write.mode("overwrite").option("header", True).option(
        "delimiter", "|"
    ).csv(f"{base}/out")
    back = read_pipe_csv(spark, f"{base}/out")
    assert back.count() == 10 and back.columns == ["a", "b"]


def test_partitioned_write_and_latest_snapshot(spark):
    df = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "20240101").otherwise("20240102").alias(
            "snapshot_date"
        ),
    )
    base = tempfile.mkdtemp(prefix="snap_")
    write_parquet(df, f"{base}/t", partition_by=["snapshot_date"])
    back = spark.read.parquet(f"{base}/t")
    latest = latest_snapshot(back, "snapshot_date")
    dates = [r.snapshot_date for r in latest.select("snapshot_date").distinct().collect()]
    assert [str(d) for d in dates] == ["20240102"]
    # eager mode: literal equality becomes a static partition filter
    plan = latest._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(snapshot_date" in plan
    assert "(snapshot_date" in plan and "20240102" in plan
    # lazy mode still computes the same rows
    lazy = latest_snapshot(back, "snapshot_date", eager=False)
    assert lazy.count() == latest.count()


def test_key_remap_and_trim_join(spark):
    data = literal_rows(
        spark, [("e1", 5.0), ("e2", 7.0), ("e3", 1.0)], ["eci", "v"]
    )
    mapping = literal_rows(spark, [("e1", "c1"), ("e2", "c2")], ["eci", "cid"])
    remapped = key_remap(data, mapping, "eci", "cid")
    got = {(r.cid, r.v) for r in remapped.collect()}
    assert got == {("c1", 5.0), ("c2", 7.0), (None, 1.0)}

    left = literal_rows(spark, [("  widget ", 1)], ["name", "l"])
    right = literal_rows(spark, [("widget", 9)], ["name", "r"])
    joined = trim_normalized_join(left, right, "name")
    rows = joined.collect()
    assert len(rows) == 1 and rows[0].r == 9


def test_topk_by_threshold(spark):
    df = literal_rows(
        spark,
        [("g", i, float(i)) for i in range(10)],
        ["grp", "id", "score"],
    )
    out = topk_by_threshold(df, "grp", "score", k=3, threshold=5.0)
    got = sorted(r.id for r in out.collect())
    assert got == [7, 8, 9]


def test_dedup_first_nondeterministic_path(spark):
    df = literal_rows(spark, [("k", 1), ("k", 2), ("j", 3)], ["key", "v"])
    out = dedup_first_by_key(df, "key")  # dropDuplicates path
    assert out.count() == 2


def test_sentinel_row_peer_smoke(spark):
    """SURVEY §5: inject a known entity and assert its expected peers
    surface — the reference's hand-injected test row pattern
    (search_ranking_peers.py:464-471) as an automated assertion."""
    rows = [
        # id, vec(2d unit), naics, lat, lon
        (1000, [1.0, 0.0], "521234", 10.0, 10.0),   # sentinel prospect
        (1, [1.0, 0.0], "521234", 10.0, 10.0),      # identical twin
        (2, [0.9701425001453319, 0.24253562503633297], "521299", 11.0, 11.0),
        (3, [0.0, 1.0], "990000", -60.0, 120.0),    # orthogonal, far
    ]
    df = spark.createDataFrame(
        rows, "cid long, vec array<double>, naics string, lat double, lon double"
    )
    sentinel = df.filter(F.col("cid") == 1000).select(
        F.col("cid").alias("tgt"), "vec", "naics", "lat", "lon"
    )
    others = df.filter(F.col("cid") != 1000).select(
        F.col("cid").alias("src"), "vec", "naics", "lat", "lon"
    )
    peers = hybrid_topk_crossjoin(
        sentinel, others, "tgt", "src", "vec", "naics", "lat", "lon", k=2
    ).collect()
    ranked = [r.src for r in sorted(peers, key=lambda r: -r.score)]
    assert ranked == [1, 2]  # twin first, near-neighbor second, orthogonal out
    top = max(peers, key=lambda r: r.score)
    assert abs(top.score - (0.6 * 1.0 + 0.399 * 1.0 + 0.001 * 1.0)) < 1e-9


def test_catalog_register_all_sql(spark):
    cat = Catalog(spark, SF_SMOKE)
    cat.register_all()
    n = spark.sql("SELECT count(*) AS n FROM lineitem").first().n
    assert n == 6000


def test_salted_agg_equals_plain(spark):
    """Salted two-stage aggregation must produce exactly the plain
    groupBy result (skew mitigation is a physical choice, not a
    semantic one)."""
    from prod_recommendation_pyspark_spark.operators.relational import salted_agg

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    plain = {
        (r.o_orderstatus, r.n, round(r.tot, 2))
        for r in orders.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("tot"))
        .collect()
    }
    salted = {
        (r.o_orderstatus, r.n, round(r.tot, 2))
        for r in salted_agg(
            orders,
            ["o_orderstatus"],
            [F.count(F.lit(1)).alias("pn"), F.sum("o_totalprice").alias("pt")],
            [F.sum("pn").alias("n"), F.sum("pt").alias("tot")],
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_bucketed_join_has_no_shuffle(spark):
    """Two tables bucketed by the join key into the same bucket count
    must join with zero Exchange operators (the 100 TB shuffle
    amortizer); result must equal the plain join."""
    from prod_recommendation_pyspark_spark.sources.writers import write_bucketed

    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    write_bucketed(cust, "bt_customer", 8, ["c_custkey"], sort_cols=["c_custkey"])
    write_bucketed(orders, "bt_orders", 8, ["o_custkey"], sort_cols=["o_custkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bc = spark.table("bt_customer")
        bo = spark.table("bt_orders")
        joined = bc.join(bo, bc.c_custkey == bo.o_custkey).groupBy(
            "c_mktsegment"
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("tot"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the groupBy shuffles once; the join itself must not
        assert "SortMergeJoin" in plan
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges <= 1, plan
        got = {
            (r.c_mktsegment, r.n, round(r.tot, 2)) for r in joined.collect()
        }
        want = {
            (r.c_mktsegment, r.n, round(r.tot, 2))
            for r in cust.join(orders, cust.c_custkey == orders.o_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("tot"))
            .collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_customer")
        spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_write_compacted_sizes_files(spark, tmp_path):
    """write_compacted estimates encoded row width and picks the file
    count; tiny target => many files, huge target => one file; data
    round-trips either way."""
    from prod_recommendation_pyspark_spark.sources.writers import write_compacted

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    n = li.count()

    many_dir = str(tmp_path / "many")
    n_many = write_compacted(li, many_dir, target_file_bytes=16 * 1024)
    assert n_many > 1
    assert spark.read.parquet(many_dir).count() == n

    one_dir = str(tmp_path / "one")
    n_one = write_compacted(li, one_dir, target_file_bytes=1 << 30)
    assert n_one == 1
    assert spark.read.parquet(one_dir).count() == n


def test_pack_sequences_nextfit_respects_budget(spark):
    """Exact next-fit packing: no pack exceeds the budget unless it
    holds a single oversized doc; order within a shard is preserved;
    fractional and exact variants agree on shard assignment."""
    from pyspark.sql import functions as F

    from prod_recommendation_pyspark_spark.operators.text import (
        pack_sequences,
        pack_sequences_nextfit,
    )

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37, F.lit(300)) + 1).alias("n_tokens"),
    )
    budget = 256
    exact = pack_sequences_nextfit(df, "doc_id", "n_tokens", budget=budget, n_shards=8)
    rows = exact.collect()
    assert len(rows) == 200

    import collections

    packs = collections.defaultdict(list)
    for r in rows:
        packs[(r["shard"], r["pack_id"])].append((r["doc_id"], r["n_tokens"]))
    for (_, _), docs in packs.items():
        total = sum(n for _, n in docs)
        assert total <= budget or len(docs) == 1  # oversized doc alone
    # next-fit never leaves a doc behind and keeps per-shard id order
    for (_s, _p), docs in packs.items():
        assert docs == sorted(docs)

    frac = pack_sequences(df, "doc_id", "n_tokens", budget=budget, n_shards=8)
    shard_map_exact = {r["doc_id"]: r["shard"] for r in rows}
    for r in frac.collect():
        assert shard_map_exact[r["doc_id"]] == r["shard"]


def test_chunk_documents_no_redundant_trailing_chunk(spark):
    """A doc whose tokens already fit in the first chunk must produce
    exactly ONE chunk — a trailing start inside the previous chunk's
    coverage would emit pure-duplicate training text."""
    from pyspark.sql import functions as F

    from prod_recommendation_pyspark_spark.operators.text import chunk_documents

    text_100 = " ".join(f"w{i}" for i in range(100))   # 100 tokens < 128
    text_200 = " ".join(f"w{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, text_100), (2, text_200)], "doc_id long, text string"
    )
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=128, overlap=32)
    per_doc = {r["doc_id"]: r["n"] for r in
               out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_doc[1] == 1          # 100 tokens: one chunk, no 4-token dup
    assert per_doc[2] == 2          # 200 tokens: [0..128), [96..200)
    # union of chunks still covers every token of doc 2
    rows = out.filter(F.col("doc_id") == 2).orderBy("chunk_idx").collect()
    covered = set()
    for r in rows:
        covered.update(range(r["start_token"],
                             r["start_token"] + r["n_chunk_tokens"]))
    assert covered == set(range(200))


def test_string_index_non_string_column(spark):
    """StringIndexer semantics on a NUMERIC label column — the label
    table schema must mirror the input type (regression: the
    driver-side rewrite hardcoded string)."""
    from prod_recommendation_pyspark_spark.features.encode import string_index

    df = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, None)], "id long, cat int"
    )
    out = {r["id"]: r["cat_idx"] for r in string_index(df, "cat").collect()}
    assert out[1] == 0.0 and out[2] == 0.0    # most frequent label
    assert out[3] == 1.0
    assert out[4] == 2.0                       # null -> n_labels ('keep')


def test_string_index_max_labels_guard(spark):
    """Round-14 (r13 verdict #5): the driver-side label dictionary is
    BOUNDED — misapplying string_index to a high-cardinality key
    raises loudly (with the bounded limit-pull, BEFORE an unbounded
    collect), instead of OOMing the driver at 100 TB; a cardinality at
    exactly the cap still works."""
    import pytest

    from prod_recommendation_pyspark_spark.features.encode import string_index

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("cat")
    )
    with pytest.raises(ValueError, match="max_labels"):
        string_index(df, "cat", max_labels=6)
    out = string_index(df, "cat", max_labels=7)
    assert out.select("cat_idx").distinct().count() == 7


def test_zorder_layout_tightens_file_stats(spark, tmp_path):
    """The point of the Z-order write: per-file min/max spans shrink on
    BOTH interleaved columns (vs a round-robin layout, where every
    file spans ~the whole range of every column), which is what parquet
    min/max pruning needs to skip files for filters on either column."""
    import glob

    import pyarrow.parquet as pq

    from prod_recommendation_pyspark_spark.operators.layout import (
        write_zordered,
    )
    from prod_recommendation_pyspark_spark.sources.catalog import Catalog
    from tests.conftest import SF_SMOKE

    ev = Catalog(spark, SF_SMOKE).table("events")
    rr_dir, z_dir = str(tmp_path / "rr"), str(tmp_path / "zo")
    ev.repartition(8).write.mode("overwrite").parquet(rr_dir)
    write_zordered(ev, z_dir, ["user_id", "value"], bits=16, n_files=8)

    def avg_span(d: str, col: str) -> float:
        los, his = [], []
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.read_metadata(f)
            lo = hi = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            assert lo is not None, f"no stats for {col} in {f}"
            los.append(float(lo))
            his.append(float(hi))
        g_lo, g_hi = min(los), max(his)
        spans = [(h - l) / (g_hi - g_lo) for l, h in zip(los, his)]
        return sum(spans) / len(spans)

    for col in ("user_id", "value"):
        rr, zo = avg_span(rr_dir, col), avg_span(z_dir, col)
        # round-robin files each span ~the full range; z-ordered files
        # must each cover a materially smaller slice of BOTH columns
        assert zo < 0.75 * rr, f"{col}: zorder {zo:.3f} vs roundrobin {rr:.3f}"


def test_merge_upsert_semantics(spark):
    """Matched keys take the source version, unmatched source inserts,
    unmatched target survives, delete flags remove their match, and a
    NULL delete flag counts as not-deleted."""
    from prod_recommendation_pyspark_spark.operators.relational import (
        merge_upsert,
    )

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    source = spark.createDataFrame(
        [(2, "B", False), (3, None, True), (4, "D", None), (9, "X", True)],
        "k long, v string, dead boolean",
    )
    got = {
        (r.k, r.v)
        for r in merge_upsert(target, source, ["k"], delete_col="dead").collect()
    }
    # 1 kept, 2 updated, 3 deleted, 4 inserted (null flag), 9's delete
    # of a nonexistent key is a no-op
    assert got == {(1, "a"), (2, "B"), (4, "D")}


def test_scd2_history_runs_and_nulls(spark):
    """Runs collapse to their first snapshot; NULL attrs open runs and
    compare null-safely; valid_to chains to the next change."""
    import datetime as dt

    from prod_recommendation_pyspark_spark.operators.events import (
        scd2_history,
    )

    d = dt.date
    rows = [
        # key 1: a,a,b,b,a  -> runs a@1, b@3, a@5
        (1, d(2024, 1, 1), "a"), (1, d(2024, 1, 2), "a"),
        (1, d(2024, 1, 3), "b"), (1, d(2024, 1, 4), "b"),
        (1, d(2024, 1, 5), "a"),
        # key 2: NULL,NULL,x -> runs NULL@1, x@3
        (2, d(2024, 1, 1), None), (2, d(2024, 1, 2), None),
        (2, d(2024, 1, 3), "x"),
    ]
    df = spark.createDataFrame(rows, "k long, snap date, attr string")
    got = {
        (r.k, r.attr, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in scd2_history(df, ["k"], "snap", ["attr"]).collect()
    }
    assert got == {
        (1, "a", "2024-01-01", "2024-01-03", False),
        (1, "b", "2024-01-03", "2024-01-05", False),
        (1, "a", "2024-01-05", "None", True),
        (2, None, "2024-01-01", "2024-01-03", False),
        (2, "x", "2024-01-03", "None", True),
    }


def test_quality_checks_detect_violations(spark):
    """The gate must FAIL on dirty data: duplicate key, null FK, value
    outside the allowed set, negative amount, dangling reference."""
    from prod_recommendation_pyspark_spark.operators.quality import (
        column_checks,
        completeness,
        fk_check,
        in_set_fraction,
        non_negative,
        uniqueness,
    )

    child = spark.createDataFrame(
        [(1, 10, "O", 5.0), (1, 20, "Z", -3.0), (2, None, "O", 7.0)],
        "k long, fk long, status string, amt double",
    )
    parent = spark.createDataFrame([(10,)], ["pk"])
    rows = {
        r.check: (r.metric, r.passed)
        for r in column_checks(
            child,
            {
                "uniq": uniqueness("k"),
                "comp": completeness("fk"),
                "inset": in_set_fraction("status", ["O"]),
                "nonneg": non_negative("amt"),
            },
        )
        .unionByName(fk_check(child, parent, "fk", "pk", "fk"))
        .collect()
    }
    assert rows["uniq"] == (round(2 / 3, 6), False)
    assert rows["comp"] == (round(2 / 3, 6), False)
    assert rows["inset"] == (round(2 / 3, 6), False)
    assert rows["nonneg"] == (-3.0, False)
    # orphans: fk=20 (no parent) and fk=NULL both count
    assert rows["fk"] == (2.0, False)


def test_in_set_fraction_counts_nulls_as_violations(spark):
    """A NULL is not in any allowed set: isin's NULL result must not be
    silently skipped by avg (that would pass a gate on a column whose
    only violations are NULLs)."""
    from prod_recommendation_pyspark_spark.operators.quality import (
        column_checks,
        in_set_fraction,
    )

    df = spark.createDataFrame([("O",), (None,)], "status string")
    r = column_checks(df, {"inset": in_set_fraction("status", ["O"])}).collect()[0]
    assert r.metric == 0.5 and not r.passed


def test_exact_aggregates_match_float_forms(spark):
    """dsum/davg/dstd equal the float aggregates on money-scale data
    (to 9 dp) and reproduce stddev_samp's NULL-for-singleton contract."""
    from prod_recommendation_pyspark_spark.functions.exact import (
        davg,
        dstd,
        dsum,
    )

    df = spark.createDataFrame(
        [("a", 10.25), ("a", 20.75), ("a", 30.5), ("b", 7.07)], ["g", "x"]
    )
    rows = {
        r.g: r
        for r in df.groupBy("g")
        .agg(
            dsum(F.col("x")).alias("s"),
            davg(F.col("x")).alias("m"),
            dstd(F.col("x")).alias("sd"),
            F.sum("x").alias("fs"),
            F.avg("x").alias("fm"),
            F.stddev_samp("x").alias("fsd"),
        )
        .collect()
    }
    a = rows["a"]
    assert abs(a.s - a.fs) < 1e-9 and abs(a.m - a.fm) < 1e-9
    assert abs(a.sd - a.fsd) < 1e-9
    b = rows["b"]
    assert b.sd is None and b.fsd is None  # singleton: NULL, not 0/inf


def test_salted_join_equals_plain_inner_and_left(spark):
    """Salting is a physical spread, never a semantic change: the
    salted join must equal the plain join row-for-row for inner AND
    left-outer, including duplicate right keys (fan-out ×2, not ×2
    per salt replica) and an unmatched left key (one null-pad row,
    not one per replica)."""
    from prod_recommendation_pyspark_spark.operators.relational import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k int, lv string"
    )
    right = spark.createDataFrame(
        [(1, 10.0), (1, 11.0), (2, 20.0)], "k int, rv double"
    )
    for how in ("inner", "left"):
        plain = sorted(
            tuple(r) for r in left.join(right, ["k"], how).collect()
        )
        salted = sorted(
            tuple(r)
            for r in salted_join(left, right, ["k"], n_salts=4, how=how)
            .select("k", "lv", "rv")
            .collect()
        )
        assert salted == plain, how


def test_salted_join_rejects_unsupported_how(spark):
    import pytest as _pytest

    from prod_recommendation_pyspark_spark.operators.relational import salted_join

    df = spark.createDataFrame([(1,)], "k int")
    with _pytest.raises(ValueError):
        salted_join(df, df, ["k"], how="full")


def test_salted_join_spreads_hot_key(spark):
    """A hot key's left rows must land in more than one salt bucket —
    the whole point of the operator (deterministic hash over all
    columns, so distinct rows get distinct-ish salts)."""
    from pyspark.sql import functions as F2

    left = spark.range(200).select(
        F2.lit(7).alias("k"), F2.col("id").alias("lv")
    )
    salt = F2.pmod(F2.hash("k", "lv"), F2.lit(8))
    n_buckets = left.select(salt.alias("s")).distinct().count()
    assert n_buckets >= 4


def test_table_diff_recovers_cdc_effect(spark):
    """table_diff(old, merge_upsert(old, batch)) must equal the
    batch's effect exactly — including NULL-value changes (null-safe
    compare) and untouched rows staying silent."""
    from prod_recommendation_pyspark_spark.operators.relational import (
        merge_upsert,
        table_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, name string, bal double",
    )
    batch = spark.createDataFrame(
        [
            (2, "b", 20.0, False),   # NULL -> 20.0 : changed (bal)
            (3, "c2", 30.0, False),  # name change  : changed (name)
            (4, None, None, True),   # delete       : removed
            (5, "e", 50.0, False),   # insert       : added
        ],
        "k int, name string, bal double, is_del boolean",
    )
    new = merge_upsert(old, batch, ["k"], delete_col="is_del")
    got = {
        r.k: (r.diff_status, r.changed_cols)
        for r in table_diff(old, new, ["k"]).collect()
    }
    assert got == {
        2: ("changed", "bal"),
        3: ("changed", "name"),
        4: ("removed", ""),
        5: ("added", ""),
    }


def test_temporal_split_has_gap_and_partitions_everything(spark):
    from prod_recommendation_pyspark_spark.operators.events import (
        temporal_split,
    )

    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(days=i))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = temporal_split(df, "ts", train_frac=0.5, gap_days=4).collect()
    assert len(out) == 30  # every row assigned
    by_split = {}
    for r in out:
        by_split.setdefault(r.split, []).append(r.id)
    assert set(by_split) == {"train", "embargo", "test"}
    assert len(by_split["embargo"]) == 4
    assert max(by_split["train"]) < min(by_split["embargo"])
    assert max(by_split["embargo"]) < min(by_split["test"])
    # the gap: no test day within gap_days of any train day
    assert min(by_split["test"]) - max(by_split["train"]) > 4


def test_table_diff_key_only_membership(spark):
    """Key-only tables (no shared non-key columns) still diff on
    membership — added/removed rows, never 'changed' (round-7 review:
    the empty compare set used to raise IndexError)."""
    from prod_recommendation_pyspark_spark.operators.relational import (
        table_diff,
    )

    old = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    new = spark.createDataFrame([(2,), (3,), (4,)], "k long")
    got = {
        r.k: (r.diff_status, r.changed_cols)
        for r in table_diff(old, new, ["k"]).collect()
    }
    assert got == {1: ("removed", ""), 4: ("added", "")}


def test_sorted_neighborhood_null_keys_rank_first(spark):
    """Null sort keys coalesce to '' inside the blocker (round-7
    review: Spark NULLS FIRST vs the oracle's NULLS LAST shifted every
    global rank) — a null-keyed row ranks like an empty string and
    still pairs with its neighbors instead of vanishing from the
    bucket join."""
    from pyspark.sql import functions as F

    from prod_recommendation_pyspark_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "aa"), (3, "ab"), (4, "zz")],
        "doc_id long, k string",
    )
    pairs = {
        (r.id_a, r.id_b, r.rank_gap)
        for r in sorted_neighborhood_pairs(
            docs, "doc_id", F.col("k"), window=2, bucket_chars=2
        ).collect()
    }
    # sort order: '' (null→coalesced), 'aa', 'ab', 'zz' → adjacent pairs
    assert pairs == {(1, 2, 1), (2, 3, 1), (3, 4, 1)}


def test_derive_salt_factor_ladder(spark):
    """The derived salt factor: 1 on a uniform key (no overhead when
    there is no skew), the smallest rung fitting the hottest key to
    the target otherwise, capped at the ladder top; and the salted
    agg under a DERIVED factor still equals the plain GROUP BY."""
    from prod_recommendation_pyspark_spark.operators.relational import (
        SALT_LADDER,
        derive_salt_factor,
        salted_agg,
    )

    uniform = spark.range(1000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    assert derive_salt_factor(uniform, ["k"], target_rows_per_task=100) == 1

    # one key holds 900 of 1000 rows: target 100 -> needs >= 9 -> rung 16
    hot = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    assert derive_salt_factor(hot, ["k"], target_rows_per_task=100) == 16
    # absurd target -> capped at the top rung, never an error
    assert (
        derive_salt_factor(hot, ["k"], target_rows_per_task=1)
        == SALT_LADDER[-1]
    )

    got = {
        (r.k, r.s, r.n)
        for r in salted_agg(
            hot, ["k"],
            aggs=[F.sum("v").alias("ps"), F.count(F.lit(1)).alias("pc")],
            final_aggs=[F.sum("ps").alias("s"), F.sum("pc").alias("n")],
            n_salts=None, target_rows_per_task=100,
        ).collect()
    }
    want = {
        (r.k, r.s, r.n)
        for r in hot.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
