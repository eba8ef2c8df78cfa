"""Mimic the correctness driver: plain SparkSession (driver builds its
own — NOT our tuned factory), entry() smoke, then every queries()[name]
vs oracle_sql()[name] via DuckDB at the given sf dir."""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as e

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

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
print(f"entry rows={len(rows)} schema={df.columns}")
assert len(rows) >= 0

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def nv(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else round(v, 6)
        return v

    return sorted([tuple(nv(r[i]) for i in order) for r in rows], key=repr)


qs, oracles = e.queries(), e.oracle_sql()
fails = []
for name in sorted(qs):
    try:
        sdf = qs[name](spark, SF)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name}: rows-only check, n={len(srows)}")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_n = len(srows) == len(drows)
        ok_s = sorted(sdf.columns) == sorted(dcols)
        ok_v = norm(srows, sdf.columns) == norm(drows, dcols)
        status = "OK" if (ok_n and ok_s and ok_v) else "MISMATCH"
        print(f"{name}: {status} rows={len(srows)}/{len(drows)} schema={ok_s} values={ok_v}")
        if status != "OK":
            fails.append(name)
    except Exception as ex:
        print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]}")
        fails.append(name)

print("FAILED:" if fails else "ALL OK", fails)
sys.exit(1 if fails else 0)
