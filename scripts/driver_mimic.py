"""Mimic the correctness driver: plain SparkSession (driver builds its
own — NOT our tuned factory), entry() smoke, then every queries()[name]
vs oracle_sql()[name] via DuckDB at the given sf dir.

The comparator replicates the driver's pandas canonicalizer
FAITHFULLY, as reverse-engineered from six rounds of driver behavior:
toPandas → columns sorted by name → sort_values over all columns →
TEXT-serialize (``to_csv``) → compare.  Evidence for the text form:

- ``q3_shipping_priority_sql`` was driver hash-GREEN r1-r6 with Spark
  ``object``-date vs DuckDB ``datetime64[us]`` — pandas text
  formatting renders an all-midnight datetime64 column as bare dates,
  so the two serialize identically;
- ``pack_sequences_fractional`` was driver hash-RED in r7 with
  IDENTICAL values but DuckDB's windowed sum() HUGEINT→float64
  (``512.0`` vs ``512`` — text-distinct);
- list cells CRASH the driver's ``sort_values`` with "unhashable
  type: 'list'" (the r7 ``inverted_index_documents`` /
  ``entity_resolution_pipeline_docs`` misses).

The old repr-based comparator here tolerated all three, which is
exactly how they shipped red.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as e

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

# Sweep economics (round-13 verdict #7): SPARK_GRAFT_SKIP_SLOW=1
# excludes the registry's SLOW_SWEEP tier (the measured >20s-at-sf0.1
# long tail) from a FULL sweep — used for the per-round sf0.1 sweep,
# whose skipped names are then swept explicitly only when changed.
# Explicitly-named queries (argv[2]) are never skipped.
SKIP_SLOW: set[str] = set()
if os.environ.get("SPARK_GRAFT_SKIP_SLOW") == "1" and ONLY is None:
    from prod_recommendation_pyspark_spark.queries.registry import SLOW_SWEEP

    SKIP_SLOW = set(SLOW_SWEEP)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

print("== entry() smoke ==")
df = e.entry(spark)
rows = df.collect()
print(f"entry rows={len(rows)} schema={df.columns}", flush=True)
assert len(rows) >= 0

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def vhash(df: pd.DataFrame) -> str:
    return df.to_csv(index=False)


qs, oracles = e.queries(), e.oracle_sql()
fails = []
skipped = sorted(n for n in qs if n in SKIP_SLOW)
if skipped:
    print(f"SKIP_SLOW tier ({len(skipped)}): {skipped}", flush=True)
for name in sorted(qs):
    if ONLY and name not in ONLY:
        continue
    if name in SKIP_SLOW:
        continue
    t0 = time.time()
    try:
        sdf_raw = qs[name](spark, SF).toPandas()
        if name not in oracles:
            print(f"{name}: rows-only check, n={len(sdf_raw)}", flush=True)
            continue
        odf_raw = con.execute(oracles[name]).df()
        sdf, odf = canon(sdf_raw), canon(odf_raw)
        ok_n = len(sdf) == len(odf)
        ok_s = list(sdf.columns) == list(odf.columns)
        ok_v = ok_n and ok_s and vhash(sdf) == vhash(odf)
        note = ""
        if ok_n and ok_s and not ok_v:
            dt_s = dict(sdf.dtypes.astype(str))
            dt_o = dict(odf.dtypes.astype(str))
            if dt_s != dt_o:
                note = f" DTYPE-DIVERGENCE s={dt_s} o={dt_o}"
        status = "OK" if (ok_n and ok_s and ok_v) else "MISMATCH"
        print(
            f"{name}: {status} rows={len(sdf)}/{len(odf)} schema={ok_s} "
            f"values={ok_v} ({time.time() - t0:.1f}s){note}",
            flush=True,
        )
        if status != "OK":
            fails.append(name)
    except Exception as ex:
        print(
            f"{name}: ERROR {type(ex).__name__}: {str(ex)[:300]}", flush=True
        )
        fails.append(name)

print("FAILED:" if fails else "ALL OK", fails)
sys.exit(1 if fails else 0)
