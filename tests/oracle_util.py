"""Local mini-oracle: compare a Spark DataFrame to DuckDB SQL the same
way the driver does — row count, schema width, and order-insensitive
values (sorted by column name, rows sorted)."""

from __future__ import annotations

import math


def _normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 6)
        if isinstance(v, bool):
            return bool(v)
        return v

    reordered = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(reordered, key=repr)


def assert_matches_oracle(spark_df, duck_con, sql: str, check_names: bool = True):
    sdf = spark_df
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    res = duck_con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]

    assert len(spark_rows) == len(duck_rows), (
        f"row count: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    if check_names:
        assert sorted(spark_cols) == sorted(duck_cols), (
            f"columns: spark={sorted(spark_cols)} duckdb={sorted(duck_cols)}"
        )
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"value mismatch, first 3: {mismatches[:3]}"
