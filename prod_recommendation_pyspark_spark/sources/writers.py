"""Sink operators (SURVEY.md §2.1 S5-S7).

The reference writes every output as ``coalesce(1)`` single-file CSV
(search_ranking_peers.py:168-173, inference_postprocess.py:94-96) —
fine for small report tables, a scalability cliff otherwise (one task
writes everything).  Here ``single_file`` is an explicit opt-in and the
default is a parallel partitioned write.  Fixes defect B6
(``key_word`` vs ``keyword`` NameError at search_ranking_peers.py:171).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    single_file: bool = False,
) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", header).csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (optionally sorted) parquet table — the shuffle
    amortizer for repeated joins/aggregations on the same key.  Two
    tables bucketed by the same columns into the same bucket count
    join WITHOUT an Exchange on either side (and without the sort, if
    ``sort_cols`` match); at 100 TB that converts every recurring
    fact-fact join on the bucket key from a full shuffle into a local
    zip of pre-hashed files.  Bucketing requires the table catalog
    (``saveAsTable``), not a bare path write."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
