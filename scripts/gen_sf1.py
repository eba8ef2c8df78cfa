"""Generate an sf1 stress dataset (10x sf0.1) under /tmp/sf1.

The committed testdata tops out at sf0.1; the scale audit (SCALE.md)
needs one decade more to show the heavy plans are shape-stable —
broadcasts that must degrade to shuffle joins actually degrade, bucket
caps keep candidate volumes bounded, nothing driver-side blows up.

Construction (deterministic, seed-pinned, DuckDB + numpy — no JVM, so
it can't disturb a concurrent Spark run):

* relational tables: 10 key-shifted replicas of sf0.1 — every foreign
  key is shifted by the same replica offset, so join fan-outs,
  selectivities, and per-key skew are IDENTICAL to sf0.1, just 10x
  the cardinality (region/nation stay as-is: they are fixed dims).
* events: 10 replicas with shifted event_id/user_id — same hourly
  arrival profile, 10x the users.
* documents: 50k fresh docs sampled from the sf0.1 vocabulary with
  the empirical length/lang/source distributions, plus ~5% planted
  near-duplicates (a prior doc with 2 words substituted) so the
  dedup paths see a realistic candidate rate instead of either zero
  or a 10-replica explosion.
* embeddings: 20k vectors = a label-stratified resample of sf0.1
  vectors + N(0, 0.05) noise — preserves the 10-cluster geometry the
  IVF/LSH paths bucket on.

Usage: python scripts/gen_sf1.py [out_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

BASE = "/root/testdata/sf0.1"
REPS = 10

SHIFTS = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "events": {"event_id": 100_000, "user_id": 1_500},
}


def replicate(con: duckdb.DuckDBPyConnection, table: str, out: str) -> None:
    cols = [
        c[0]
        for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{BASE}/{table}.parquet')"
        ).fetchall()
    ]
    shift = SHIFTS.get(table, {})
    sel = ", ".join(
        f"{c} + r.i * {shift[c]} AS {c}" if c in shift else c for c in cols
    )
    con.execute(
        f"""
        COPY (
            SELECT {sel}
            FROM read_parquet('{BASE}/{table}.parquet')
            CROSS JOIN (SELECT unnest(range({REPS})) AS i) r
            ORDER BY {cols[0]}
        ) TO '{out}/{table}.parquet' (FORMAT PARQUET)
        """
    )


def gen_documents(con: duckdb.DuckDBPyConnection, out: str) -> None:
    rng = np.random.default_rng(7)
    rows = con.execute(
        f"SELECT text, lang, source FROM read_parquet('{BASE}/documents.parquet')"
    ).fetchall()
    vocab = sorted({w for t, _, _ in rows for w in t.split()})
    lengths = [len(t.split()) for t, _, _ in rows]
    langs = [lg for _, lg, _ in rows]
    sources = [s for _, _, s in rows]
    n_docs = 50_000
    texts: list[str] = []
    for i in range(n_docs):
        if texts and rng.random() < 0.05:
            # planted near-duplicate: mutate 2 word positions of a
            # previously generated doc
            words = texts[rng.integers(0, len(texts))].split()
            for _ in range(2):
                words[rng.integers(0, len(words))] = vocab[
                    rng.integers(0, len(vocab))
                ]
            texts.append(" ".join(words))
        else:
            n = lengths[rng.integers(0, len(lengths))]
            texts.append(
                " ".join(vocab[j] for j in rng.integers(0, len(vocab), n))
            )
    doc_lang = [langs[i] for i in rng.integers(0, len(langs), n_docs)]
    doc_src = [sources[i] for i in rng.integers(0, len(sources), n_docs)]
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(doc_lang, pa.string()),
            "source": pa.array(doc_src, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out}/documents.parquet")


def gen_embeddings(con: duckdb.DuckDBPyConnection, out: str) -> None:
    rng = np.random.default_rng(11)
    rows = con.execute(
        f"SELECT embedding, label FROM read_parquet('{BASE}/embeddings.parquet')"
    ).fetchall()
    vecs = np.array([r[0] for r in rows], dtype=np.float32)
    labels = np.array([r[1] for r in rows], dtype=np.int32)
    n_out = 20_000
    pick = rng.integers(0, len(vecs), n_out)
    noise = rng.normal(0.0, 0.05, size=(n_out, vecs.shape[1])).astype(
        np.float32
    )
    out_vecs = vecs[pick] + noise
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array(range(n_out), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in out_vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels[pick], pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{BASE}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in ("customer", "supplier", "part", "orders", "lineitem", "events"):
        replicate(con, t, out)
        print(f"{t}: replicated x{REPS}")
    gen_documents(con, out)
    print("documents: 50k generated")
    gen_embeddings(con, out)
    print("embeddings: 20k generated")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
