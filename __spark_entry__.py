"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``prod_recommendation_pyspark_spark``; this
file only exposes the query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prod_recommendation_pyspark_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["topk_segments_by_nation"](spark, "/root/testdata/sf0.001")


def _driver_history() -> tuple[int, set[str], set[str], dict[str, int]]:
    """(latest round number, hash-verified names, rows-only names,
    name → last round it passed) across all committed
    CORRECTNESS_r*.json files.  Hash-verified means a real value-hash
    match; ``err == 'no_oracle'`` rows only ever got a rows-only check
    and are tracked separately."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    latest = 0
    hash_ok: set[str] = set()
    rows_only: set[str] = set()
    last_pass: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        latest = max(latest, rnd)
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rec.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match"):
                hash_ok.add(name)
                last_pass[name] = max(last_pass.get(name, 0), rnd)
            elif row.get("err") == "no_oracle" and (
                row.get("rows_match")
                or (
                    name in ROWS_ONLY_COMPANIONS
                    and (row.get("spark_rows") or 0) > 0
                )
            ):
                # the driver records rows_match=null (not true) for
                # no_oracle rows; a non-empty spark_rows is the rows-only
                # pass signal — but ONLY for the two DESIGNED rows-only
                # queries (otherwise they re-enter "fresh" every round
                # and burn two sample slots forever).  Any OTHER query
                # surfacing no_oracle means its SQL oracle is missing by
                # accident, and it must keep re-entering fresh so the
                # gap stays visible.
                rows_only.add(name)
                last_pass[name] = max(last_pass.get(name, 0), rnd)
    return latest, hash_ok, rows_only, last_pass


#: The two rows-only-by-design queries and the hash-verified companion
#: contract that carries their value evidence.  ``als_recommend_topn``
#: is iterative MLlib factorization (not ANSI-SQL-reproducible);
#: ``simhash_near_dup_pairs`` depends on Spark's xxhash64.  Their
#: ``err == "no_oracle"`` rows in CORRECTNESS files are EXPECTED, not
#: failures: the companion query pins the same computation's invariants
#: (and for simhash, banded≡brute equivalence) under a full value hash.
ROWS_ONLY_COMPANIONS = {
    "als_recommend_topn": "als_recommend_topn_contract",
    "simhash_near_dup_pairs": "simhash_banded_vs_brute",
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Sample rotation: the driver's per-round correctness check covers a
    prefix of this dict, so a frozen registration order would verify
    the same early-round 50 queries forever and newest operators would
    never get driver-verified.  Ordering:

    1. never-verified queries first (stable registration order) — new
       operators get driver-verified the round they land;
    2. then ALL previously-verified queries, ROTATED by the round
       number — so already-verified queries keep cycling back through
       the driver's sample window and a regression introduced later in
       a shared operator is caught within a few rounds, instead of the
       old scheme's permanent demotion;
    3. rows-only (``no_oracle``) queries join the rotation pool too,
       but are tracked separately from hash-verified ones — a rows-only
       pass never counts as hash verification.
    """
    latest_round, hash_ok, rows_only, last_pass = _driver_history()
    fresh = [n for n in QUERIES if n not in hash_ok and n not in rows_only]
    # Pinned directly after the fresh block, ahead of the rotation:
    # 1. the companion contracts that carry the rows-only pair's value
    #    evidence must recur in the sample window, not wait out a full
    #    rotation cycle (als contract last driver-green r06, simhash
    #    banded r02) — pinned only while STALE (no driver pass within
    #    the last 2 rounds), so the slots free up once current;
    # 2. queries whose code changed in round 9 (review fixes) get
    #    driver re-verification that round instead of riding their
    #    stale green — GATED on the history state so the pin expires:
    #    once CORRECTNESS_r09 exists (latest_round >= 9) the slots
    #    return to the rotation instead of being consumed forever.
    changed_r9 = (
        [
            "pq_adc_recall_contract",
            "ivfpq_recall_contract",
            "negative_sampling_ratings",
            "ndv_hll_contract_orders",
        ]
        if latest_round == 8
        else []
    )
    # 3. same pattern for round 11: the production rank-window query
    #    switched to the derived window (derive-then-floor-at-256) and
    #    the probe-parity query now derives its window from the
    #    index's __w metadata — both must be driver re-verified the
    #    round the change lands, not ride their round-10 greens to the
    #    back of the staleness rotation.
    changed_r11 = (
        [
            "peer_search_rank_window_topk",
            "peer_search_probe_parity",
        ]
        if latest_round == 10
        else []
    )
    # 4. round 12: queries whose Spark path or oracle SQL changed —
    #    the zero-norm filter entered every ivf_assign plan, the
    #    salt-rung oracle gained the empty-input coalesce, the
    #    rank-window production/parity queries now run through the
    #    per-snapshot window memo, and the streaming dedup replay
    #    reads its sink with an explicit schema.
    changed_r12 = (
        [
            "auto_salted_agg_returnflag",
            "peer_search_rank_window_topk",
            "rank_window_derived_parity",
            "streaming_dedup_serving_replay",
            "ann_ivf_topk_embeddings",
            "ann_ivf_derived_density",
            "ann_ivf_nightly_e2e",
            "ann_ivf_incremental_insert",
            "streaming_ann_serving_replay",
        ]
        if latest_round == 11
        else []
    )
    # 5. round 13: the versioned publish moved to staging-dir +
    #    atomic-rename claiming, and rank_window_insert gained the
    #    duplicate-arrival anti-join — the e2e queries riding those
    #    paths get driver re-verification the round the change lands.
    changed_r13 = (
        [
            "rank_window_versioned_publish_e2e",
            "rank_window_insert_e2e",
            "streaming_peer_serving_replay",
        ]
        if latest_round == 12
        else []
    )
    # 6. round 14: the full-dim production query now DISPATCHES
    #    kernel-vs-window (the kernel runs at oracle scales), the
    #    rank-window probe/insert/compact paths moved through the
    #    shared _probe_fetch/_index_rows cells with metadata-driven
    #    family dispatch, and the versioned publish gained
    #    marker-verified claims + wreck quarantine — every query on
    #    those paths gets driver re-verification the round the change
    #    lands.
    changed_r14 = (
        [
            "peer_search_fulldim_topk",
            "peer_search_fulldim_recall",
            "peer_search_probe_parity",
            "rank_window_delete_e2e",
            "rank_window_insert_e2e",
            "rank_window_nightly_e2e",
            "rank_window_versioned_publish_e2e",
            "streaming_peer_serving_replay",
        ]
        if latest_round == 13
        else []
    )
    # 7. round 15: the probe fetch gained the broadcast_probes gate
    #    (default-True plans unchanged, but the shared body changed),
    #    compact/insert resolve direction through the renamed/extended
    #    resolver, and the versioned publish's wreck quarantine is now
    #    verified-after-rename — every e2e query riding those cells
    #    gets driver re-verification the round the change lands.
    # ... and the candidate-pruned re-rank moved its NaN/threshold
    # guards above the top-K window (scores evaluate once; set
    # equality pytest-pinned vs the crossjoin oracle) — every query
    # riding hybrid_topk_pruned re-verifies too.
    changed_r15 = (
        [
            "peer_search_probe_parity",
            "peer_search_fulldim_probe_parity",
            "rank_window_delete_e2e",
            "rank_window_insert_e2e",
            "projection_window_delete_e2e",
            "projection_window_insert_e2e",
            "rank_window_versioned_publish_e2e",
            "streaming_peer_serving_replay",
            "streaming_projection_serving_replay",
            "peer_search_hybrid_topk_pruned",
            "peer_search_pruned_recall",
            "peer_search_rank_window_topk",
            "rank_window_derived_parity",
            "rank_window_nightly_e2e",
            "peer_search_fulldim_topk",
            "peer_search_fulldim_recall",
            # session 2: ann_lsh re-rank norms moved below the pair
            # join (bit-identical values; re-verified at 3 scales)
            "ann_lsh_topk_embeddings",
        ]
        if latest_round == 14
        else []
    )
    # 8. round 16 (optimization round 2): the serving-dispatch
    #    throughput constants rotated to the round-15 re-measure IN
    #    LOCKSTEP with their SQL twin (the oracle's literals are built
    #    from the constants at registration) — the dispatch-evidence
    #    query's computed cost_ratio changed and must be driver
    #    re-verified against the rotated oracle the round it lands,
    #    along with the e2e query that rides the routing decision.
    #    ... the ANN sign-LSH pair chain now repartitions by __qid
    #    BELOW the dedup so dedup + scoring + top-K share one exchange
    #    (same distinct set, same values; re-verified at 3 scales);
    #    the cold window derivation overlaps its calibration kernel
    #    with the rank build on driver threads and materializes the
    #    shared rank (same derived window, same candidates); the ALS
    #    prep derives its dense-id maps concurrently and feeds the
    #    auto-sizer a precomputed equal count (same block count, same
    #    model).  Every query riding those cells re-verifies the round
    #    the change lands.
    changed_r16 = (
        [
            "peer_search_serving_dispatch",
            "peer_search_serve_batch_e2e",
            "ann_lsh_topk_embeddings",
            "peer_search_rank_window_topk",
            "rank_window_derived_parity",
            "rank_window_derivation_contract",
            "rank_window_nightly_e2e",
            "peer_search_fulldim_topk",
            "peer_search_fulldim_recall",
            "peer_search_fulldim_dispatch",
            "peer_search_fulldim_probe_parity",
            "peer_search_probe_parity",
            "peer_search_hybrid_topk_pruned",
            "peer_search_pruned_recall",
            "streaming_peer_serving_replay",
            "streaming_projection_serving_replay",
            "dense_id_ratings_maps",
            "als_recommend_topn_contract",
        ]
        if latest_round == 15
        else []
    )
    stale_companions = [
        n
        for n in ROWS_ONLY_COMPANIONS.values()
        if latest_round - last_pass.get(n, 0) >= 2
    ]
    pinned = [
        n
        for n in stale_companions
        + changed_r9
        + changed_r11
        + changed_r12
        + changed_r13
        + changed_r14
        + changed_r15
        + changed_r16
        if n in QUERIES and n not in fresh
    ]
    pool = [
        n
        for n in QUERIES
        if (n in hash_ok or n in rows_only) and n not in pinned
    ]
    # STALENESS-ordered (round-9 verdict #5): oldest driver evidence
    # first, so the sample window always resamples the queries whose
    # last green is most stale — each pass refreshes their last_pass,
    # which rotates them to the back naturally.  The old stride
    # rotation sampled disjoint slices but could leave a query
    # unrefreshed for ~len(pool)/50 rounds regardless of staleness.
    # Tie-break on registration order (dict order) for determinism.
    reg_order = {n: i for i, n in enumerate(QUERIES)}
    pool.sort(key=lambda n: (last_pass.get(n, 0), reg_order[n]))
    ordered = fresh + pinned + pool
    # COMPANION PAIRING (round-12 verdict #7): whenever a rows-only
    # query lands in the driver's sample prefix, its hash-verified
    # companion contract must land in the SAME CORRECTNESS file —
    # otherwise the `err: "no_oracle"` row reads as a failure to
    # anyone not cross-referencing ROWS_ONLY_COMPANIONS.  Placing the
    # companion immediately BEFORE its twin guarantees it for any
    # prefix window size: a window containing the twin at position i
    # contains the companion at i-1.
    for twin, comp in ROWS_ONLY_COMPANIONS.items():
        if twin in ordered and comp in ordered:
            ordered.remove(comp)
            ordered.insert(ordered.index(twin), comp)
    return {n: QUERIES[n] for n in ordered}


def staleness_note() -> str:
    """One-line registry-staleness summary for the per-round ORACLE
    file (round-14 verdict #5): how stale the driver-evidence tail is
    — the oldest last-driver-pass round across the registry and the
    count of queries whose last driver pass is more than K=2 rounds
    old.  Generated from the same committed CORRECTNESS history the
    sample rotation reads, so the note costs nothing and cannot drift
    from the rotation's own view."""
    latest, hash_ok, rows_only, last_pass = _driver_history()
    verified = [n for n in QUERIES if n in hash_ok or n in rows_only]
    never = [n for n in QUERIES if n not in last_pass]
    if not verified:
        return f"registry staleness: no driver history yet (r{latest})."
    oldest = min(last_pass.get(n, 0) for n in verified)
    k = 2
    older = sum(1 for n in verified if latest - last_pass.get(n, 0) > k)
    return (
        f"registry staleness vs driver samples (r{latest}): "
        f"{len(verified)}/{len(QUERIES)} driver-verified ever; oldest "
        f"last-driver-pass r{oldest}; {older} queries last "
        f"driver-passed more than {k} rounds ago"
        + (f"; {len(never)} never sampled (fresh)" if never else "")
        + ".  (Every registered query is additionally re-oracled in "
        "full by the per-round sf0.001/sf0.01 sweeps recorded in this "
        "file — driver staleness measures the independent driver's "
        "sampling lag, not verification coverage.)"
    )


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every SQL-expressible query.

    Exactly two registered queries have no entry here BY DESIGN and
    surface as ``err: "no_oracle"`` rows-only checks every time the
    driver samples them — that is expected output, not a failure:

    - ``als_recommend_topn``: iterative MLlib ALS factorization is not
      ANSI-SQL-reproducible; its value evidence is the hash-green
      ``als_recommend_topn_contract`` (schema/cardinality/join-key and
      score-invariant pins on the SAME recommendation frame).
    - ``simhash_near_dup_pairs``: depends on Spark's xxhash64 (no
      DuckDB twin); its value evidence is the hash-green
      ``simhash_banded_vs_brute`` (banded candidate set ≡ brute-force
      Hamming join on the same corpus).

    See ``ROWS_ONLY_COMPANIONS`` for the machine-readable pairing."""
    return dict(ORACLES)
