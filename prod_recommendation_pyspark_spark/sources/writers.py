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
    path: str | None = None,
) -> None:
    """Hash-bucketed (optionally sorted) parquet table — the shuffle
    amortizer for repeated joins/aggregations on the same key.  Two
    tables bucketed by the same columns into the same bucket count
    join WITHOUT an Exchange on either side (and without the sort, if
    ``sort_cols`` match); at 100 TB that converts every recurring
    fact-fact join on the bucket key from a full shuffle into a local
    zip of pre-hashed files.  Bucketing requires the table catalog
    (``saveAsTable``), not a bare path write.

    ``path`` makes the table EXTERNAL at that location — use it when
    the data's lifetime is managed outside the warehouse (per-run temp
    artifacts): a managed saveAsTable into a fresh session whose
    warehouse dir still holds a previous run's files fails with
    LOCATION_ALREADY_EXISTS.  On ``mode='overwrite'`` any stale
    catalog entry under the same name is dropped first (the name is
    only a handle; the location is the data); ``mode='append'`` keeps
    the existing table — dropping there would silently destroy the
    prior data the append exists to extend (round-11 advice)."""
    if mode == "overwrite":
        df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def publish_versioned(
    df: DataFrame,
    base: str,
    partition_by: list[str] | None = None,
) -> int:
    """ATOMIC-PUBLISH a nightly artifact rebuild: write the frame
    under ``base/__v=N`` (N = latest committed version + 1) and let
    readers resolve versions through
    ``sources/readers.py::read_published``, which only ever sees
    versions whose ``_SUCCESS`` marker exists.  Because Spark writes
    ``_SUCCESS`` at job COMMIT (after every task file is in place),
    the publish is atomic from the reader's side: a rebuild in
    progress — or one that died halfway — is invisible, and serving
    keeps reading version N−1 until the commit lands.  This is the
    missing glue between the nightly rebuild and the intraday CRUD
    paths: rebuilds land as a new version, tombstones/inserts ride
    within a version, nothing ever serves a half-written artifact.

    Returns the version number written.  Version directories are
    plain partition-style paths (``__v=3``), so retention is a
    directory delete and a version's files are never rewritten.  A
    CRASHED previous attempt at the same version (directory present,
    no ``_SUCCESS``) is removed and rewritten — safe because no
    reader can resolve an uncommitted version; a COMMITTED version is
    never overwritten (``errorifexists``)."""
    spark = df.sparkSession
    from prod_recommendation_pyspark_spark.sources.readers import (
        latest_published_version,
    )

    n = latest_published_version(spark, base) + 1
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    target = jvm.org.apache.hadoop.fs.Path(f"{base}/__v={n}")
    fs = target.getFileSystem(hconf)
    if fs.exists(target) and not fs.exists(
        jvm.org.apache.hadoop.fs.Path(target, "_SUCCESS")
    ):
        fs.delete(target, True)  # crashed write: invisible to readers
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(f"{base}/__v={n}")
    return n


def prune_published_versions(spark, base: str, keep: int = 3) -> list[int]:
    """RETENTION for a ``publish_versioned`` base: drop all but the
    newest ``keep`` committed versions, plus any uncommitted (crashed)
    version directories older than the newest committed one.  Returns
    the version numbers removed.  A version is a directory delete —
    files within a version are immutable by construction — so
    retention cost is one FileSystem listing + one delete per expired
    version, never a data rewrite.  ``keep`` must be ≥ 1: the newest
    committed version is always retained (serving reads it)."""
    if keep < 1:
        raise ValueError("prune_published_versions: keep must be >= 1")
    from prod_recommendation_pyspark_spark.sources.readers import (
        latest_published_version,
    )

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(base)
    fs = p.getFileSystem(hconf)
    if not fs.exists(p):
        return []
    latest = latest_published_version(spark, base)
    committed: list[int] = []
    uncommitted: list[int] = []
    for status in fs.listStatus(p):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith("__v=")):
            continue
        try:
            n = int(name[4:])
        except ValueError:
            continue
        marker = jvm.org.apache.hadoop.fs.Path(status.getPath(), "_SUCCESS")
        (committed if fs.exists(marker) else uncommitted).append(n)
    expire = sorted(committed)[:-keep] if len(committed) > keep else []
    expire += [n for n in uncommitted if n < latest]
    for n in sorted(expire):
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{base}/__v={n}"), True)
    return sorted(expire)


def write_compacted(
    df: DataFrame,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sample_rows: int = 1000,
    mode: str = "overwrite",
) -> int:
    """Size-aware parquet write: estimate the encoded bytes-per-row
    from a small sample (written to an in-memory parquet buffer, so
    the estimate includes the target format's encoding+compression),
    then ``repartition(ceil(total / target_file_bytes))`` so output
    files land near the target size.  Returns the file count used.

    This is the small-files tool: a 1000-task job writing 5 MB files
    turns a 100 TB table into ~20M objects that throttle every
    subsequent scan's listing and open costs; compacting to
    128-512 MB files is the standard fix.  The sample pass is one
    ``limit(sample_rows)`` job; the write itself is the only full
    pass.  (For repeated incremental compaction use a lakehouse
    format's OPTIMIZE — this is the plain-parquet equivalent.)
    """
    import io
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    # persist: count, sample, and the write all consume df — uncached,
    # an expensive upstream plan would execute three times
    df = df.persist()
    try:
        n_rows = df.count()
        if n_rows == 0:
            df.coalesce(1).write.mode(mode).parquet(path)
            return 1
        sample = df.limit(min(sample_rows, n_rows)).toPandas()
        buf = io.BytesIO()
        pq.write_table(pa.Table.from_pandas(sample), buf, compression="snappy")
        bytes_per_row = max(buf.getbuffer().nbytes / max(len(sample), 1), 1.0)
        n_files = max(1, math.ceil(n_rows * bytes_per_row / target_file_bytes))
        df.repartition(n_files).write.mode(mode).parquet(path)
        return n_files
    finally:
        df.unpersist()
