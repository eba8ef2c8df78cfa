"""Streaming lifecycle under FAILURE INJECTION (round-12 verdict #4).

The clean paths — hot-swap on publish, restart-from-checkpoint — are
pinned by test_streaming_ops.py.  These tests kill the pipeline at the
two windows the advisories called out and prove the serving contracts
hold through the wreckage:

1. a publisher dying BETWEEN writing its version files and the commit
   marker must never have that half-published version resolved by the
   serving loop (and a later clean publish must claim the version
   number over the wreck);
2. a server dying BETWEEN the foreachBatch sink write and the
   checkpoint commit must not double-serve the batch after restart —
   Structured Streaming re-delivers it with the SAME batch_id
   (at-least-once), and the idempotent batch-id-partitioned sink
   makes the replay overwrite, not append.
"""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


def _peer_fixture(spark):
    from prod_recommendation_pyspark_spark.queries.similarity import (
        _firmographics,
    )

    firmo = _firmographics(spark, SF_SMOKE).localCheckpoint()
    pros = firmo.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("tgt"), "vec", "naics", "lat", "lon"
    )
    clis = firmo.filter(F.col("c_custkey") % 10 != 0).select(
        F.col("c_custkey").alias("src"), "vec", "naics", "lat", "lon"
    )
    return pros, clis


def _want(spark, batch_pros, index_clis, all_clis, k=5):
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        hybrid_topk_pruned,
        rank_window_index,
        rank_window_probe,
    )

    idx = rank_window_index(index_clis, "src", window=32)
    cand = rank_window_probe(batch_pros, idx, "tgt", "src")
    return {
        (r["tgt"], r["src"], round(r["score"], 9))
        for r in hybrid_topk_pruned(
            batch_pros, all_clis, "tgt", "src", candidates=cand, dim=2, k=k
        ).collect()
    }


def test_serving_never_resolves_half_published_version(spark):
    """Kill the publisher between data write and _SUCCESS: the wreck
    at ``__v=2`` (real parquet files, no marker) must stay invisible —
    batches keep serving v1 — and a later clean publish must clear the
    wreck, claim version 2, and flip serving at the batch boundary."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        rank_window_index,
    )
    from prod_recommendation_pyspark_spark.sources.readers import (
        latest_published_version,
    )
    from prod_recommendation_pyspark_spark.sources.writers import (
        publish_versioned,
    )
    from prod_recommendation_pyspark_spark.streaming.joins import (
        streaming_peer_serving_published,
    )

    pros, clis = _peer_fixture(spark)
    stale = clis.filter(F.col("src") % 3 != 1)
    base = tempfile.mkdtemp(prefix="fail_pub_") + "/index"
    publish_versioned(
        rank_window_index(stale, "src", window=32), base,
        partition_by=["__lvl"],
    )
    # the CRASH: a publisher wrote every file of v2 (the full-corpus
    # rebuild) but died before the job committed _SUCCESS
    rank_window_index(clis, "src", window=32).write.partitionBy(
        "__lvl"
    ).parquet(f"{base}/__v=2")
    os.remove(os.path.join(base, "__v=2", "_SUCCESS"))
    # plus a dead staging dir from the same wreck
    os.makedirs(os.path.join(base, ".__staging_dead_publisher"))
    assert latest_published_version(spark, base) == 1

    d = tempfile.mkdtemp(prefix="fail_pub_stream_")
    b0 = pros.filter(F.col("tgt") % 20 == 0)
    b1 = pros.filter((F.col("tgt") % 20 != 0) & (F.col("tgt") % 3 == 0))
    b2 = pros.filter((F.col("tgt") % 20 != 0) & (F.col("tgt") % 3 != 0))
    for b in (b0, b1, b2):
        b.coalesce(1).write.mode("append").parquet(d)
        time.sleep(1.1)  # file source orders by mtime: keep batch order
    stream = (
        spark.readStream.schema(pros.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )

    per_batch: dict[int, list] = {}

    def emit(df, batch_id):
        per_batch[batch_id] = df.collect()
        if batch_id == 1:
            # the retried nightly rebuild lands cleanly mid-stream:
            # it must CLAIM version 2 over the marker-less wreck
            assert publish_versioned(
                rank_window_index(clis, "src", window=32), base,
                partition_by=["__lvl"],
            ) == 2

    q = streaming_peer_serving_published(
        stream, base, clis, "tgt", "src", emit, k=5
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(per_batch) == [0, 1, 2]

    as_set = lambda rows: {  # noqa: E731
        (r["tgt"], r["src"], round(r["score"], 9)) for r in rows
    }
    # batches 0-1 rode v1 THROUGH the wreck (a resolvable v2 would
    # have flipped batch 1 already); batch 2 rode the clean v2
    assert as_set(per_batch[0]) == _want(spark, b0, stale, clis)
    assert as_set(per_batch[1]) == _want(spark, b1, stale, clis)
    got2 = as_set(per_batch[2])
    assert got2 == _want(spark, b2, clis, clis) and len(got2) > 0
    assert got2 != _want(spark, b2, stale, clis)


def test_replayed_batch_never_double_serves(spark):
    """Kill the server between the sink write and the checkpoint
    commit: on restart Structured Streaming RE-DELIVERS the batch with
    the same batch_id (at-least-once), and the batch-id-partitioned
    idempotent sink must absorb the replay — exactly one copy of every
    served row, no batch lost, no batch doubled."""
    from prod_recommendation_pyspark_spark.operators.hybrid import (
        rank_window_index,
    )
    from prod_recommendation_pyspark_spark.sources.writers import (
        publish_versioned,
    )
    from prod_recommendation_pyspark_spark.streaming.joins import (
        streaming_peer_serving_published,
    )
    from prod_recommendation_pyspark_spark.streaming.sinks import (
        idempotent_parquet_batch_writer,
    )

    pros, clis = _peer_fixture(spark)
    base = tempfile.mkdtemp(prefix="fail_replay_") + "/index"
    publish_versioned(
        rank_window_index(clis, "src", window=32), base,
        partition_by=["__lvl"],
    )

    d = tempfile.mkdtemp(prefix="fail_replay_stream_")
    b0 = pros.filter(F.col("tgt") % 20 == 0)
    b1 = pros.filter(F.col("tgt") % 20 != 0)
    b0.coalesce(1).write.mode("append").parquet(d)
    time.sleep(1.1)
    b1.coalesce(1).write.mode("append").parquet(d)

    sink = tempfile.mkdtemp(prefix="fail_replay_sink_")
    ckpt = tempfile.mkdtemp(prefix="fail_replay_ckpt_")
    write_batch = idempotent_parquet_batch_writer(sink)
    deliveries: list[int] = []
    crashed = {"done": False}

    def emit(df, batch_id):
        deliveries.append(batch_id)
        write_batch(df, batch_id)  # the sink write COMMITS...
        if batch_id == 0 and not crashed["done"]:
            crashed["done"] = True
            # ...and the server dies before the CHECKPOINT commit
            raise RuntimeError("injected crash after sink write")

    def start():
        stream = (
            spark.readStream.schema(pros.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        return streaming_peer_serving_published(
            stream, base, clis, "tgt", "src", emit, k=5,
            checkpoint_dir=ckpt,
        )

    q = start()
    try:
        try:
            q.processAllAvailable()
        except Exception:
            pass  # the injected crash fails the query
        assert q.exception() is not None  # it really died mid-batch
    finally:
        q.stop()

    q2 = start()  # restart from the same checkpoint
    try:
        q2.processAllAvailable()
        assert q2.exception() is None
    finally:
        q2.stop()

    # the crash window was real: batch 0 was delivered TWICE with the
    # same id (once before the kill, once on restart), batch 1 once
    assert deliveries == [0, 0, 1]
    got = spark.read.parquet(sink)
    rows = {
        (r["tgt"], r["src"], round(r["score"], 9), r["batch_id"])
        for r in got.collect()
    }
    assert got.count() == len(rows), "replay appended duplicates"
    want0 = {(*t, 0) for t in _want(spark, b0, clis, clis)}
    want1 = {(*t, 1) for t in _want(spark, b1, clis, clis)}
    assert rows == want0 | want1 and len(want0) > 0 and len(want1) > 0


def test_serving_skips_batches_before_first_published_version(spark):
    """Round-13 advice pin: a non-empty batch arriving BEFORE any
    committed version must be SKIPPED (with a warning) instead of
    raising inside foreachBatch and killing the 24/7 query — and once
    the first publish commits, the very next batch serves from it."""
    import warnings as _warnings

    from prod_recommendation_pyspark_spark.operators.hybrid import (
        rank_window_index,
    )
    from prod_recommendation_pyspark_spark.sources.writers import (
        publish_versioned,
    )
    from prod_recommendation_pyspark_spark.streaming.joins import (
        streaming_peer_serving_published,
    )

    pros, clis = _peer_fixture(spark)
    base = tempfile.mkdtemp(prefix="fail_nover_") + "/index"  # EMPTY

    d = tempfile.mkdtemp(prefix="fail_nover_stream_")
    b0 = pros.filter(F.col("tgt") % 20 == 0)
    b1 = pros.filter(F.col("tgt") % 20 != 0)
    b0.coalesce(1).write.mode("append").parquet(d)
    time.sleep(1.1)
    b1.coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema(pros.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )

    per_batch: dict[int, list] = {}

    def emit(df, batch_id):
        per_batch[batch_id] = df.collect()

    # batch 0 arrives against an EMPTY base; the first publish lands
    # only after it — inject the publish from a foreachBatch-adjacent
    # hook by wrapping emit is not possible (emit never fires for the
    # skipped batch), so publish after the first micro-batch drains
    dl = tempfile.mkdtemp(prefix="fail_nover_dl_") + "/dead_letter"
    q = streaming_peer_serving_published(
        stream, base, clis, "tgt", "src", emit, k=5, dead_letter_dir=dl
    )
    try:
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            q.processAllAvailable()  # both batches drain; both skipped
        assert q.exception() is None  # the loop SURVIVED the no-version batch
        assert any(
            "before any committed version" in str(w.message) for w in caught
        )
        served_before = dict(per_batch)
        publish_versioned(
            rank_window_index(clis, "src", window=32), base,
            partition_by=["__lvl"],
        )
        # a third batch after the first commit must be served
        b2 = pros.filter(F.col("tgt") % 3 == 0)
        b2.coalesce(1).write.mode("append").parquet(d)
        q.processAllAvailable()
    finally:
        q.stop()
    assert served_before == {}  # nothing served pre-publish, no crash
    assert len(per_batch) == 1
    (got,) = per_batch.values()
    want = _want(spark, b2, clis, clis)
    assert {(r["tgt"], r["src"], round(r["score"], 9)) for r in got} == want
    assert len(want) > 0
    # round-14 advice: the skipped batches are NOT silently lost —
    # both were parked in the dead-letter path (their offsets commit
    # with the skip, so this parquet is the ONLY replay artifact),
    # keyed by batch id, re-enqueueable as a plain read
    parked = spark.read.parquet(dl)
    assert parked.count() == b0.count() + b1.count()
    # round-15 advice: the park is a batch-id-keyed PARTITION dir
    # written with overwrite — partition discovery surfaces the id,
    # and a foreachBatch replay of the same batch cannot double-park
    assert {
        r["__dlq_batch"]
        for r in parked.select("__dlq_batch").distinct().collect()
    } == {0, 1}
    replayed = {r["tgt"] for r in parked.select("tgt").collect()}
    assert replayed == {r["tgt"] for r in pros.select("tgt").collect()}
    # replay idempotency: re-parking batch 0's rows under its batch id
    # (what an at-least-once restart does) leaves the park unchanged
    b0.write.mode("overwrite").parquet(f"{dl}/__dlq_batch=0")
    assert spark.read.parquet(dl).count() == b0.count() + b1.count()
