"""Physical data layout for spatial scans and co-located joins.

Two 100 TB-scale mechanisms the sandbox's single-JVM tests still verify
structurally:

1. **Cell-range file manifest ("Global Range Encoding" pruning)** — write
   the table range-partitioned and sorted by the Morton ``cell`` key, so
   each parquet file covers one tight cell interval, then record per-file
   (cell_min, cell_max, n_rows) in a sidecar manifest. A spatial query
   (bbox → cover cell ranges, `geo/cells.py`) prunes the *file list* with
   an interval-overlap test on the manifest before Spark ever opens a
   footer. At a million files this moves pruning from per-file footer
   reads to one manifest scan — the same trick Iceberg metadata and the
   EDBT'18 Global-Range-Encoding paper use (see PAPERS.md); parquet
   row-group min/max pruning still applies inside the surviving files.

2. **Bucketed co-located joins** — persist both sides of a recurring join
   `bucketBy(n, key)` so the join is shuffle-free (no Exchange in the
   plan): the per-bucket layout *is* the shuffle, paid once at write time.
   This is the batch analogue of co-partitioned streams; on a cluster the
   bucket count is chosen once per table (≈ total data / 256 MB) and every
   downstream cell join inherits it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_spatial(
    df: DataFrame,
    path: str,
    *,
    cell_col: str = "cell",
    n_ranges: "int | None" = None,
) -> None:
    """Write ``df`` cell-range-clustered + a per-file cell-span manifest.

    ``repartitionByRange`` gives each output file a disjoint cell interval
    (range exchange with sampled bounds); ``sortWithinPartitions`` makes
    parquet row-group stats tight inside each file."""
    spark = df.sparkSession
    n = n_ranges or spark.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, F.col(cell_col))
        .sortWithinPartitions(cell_col)
        .write.mode("overwrite")
        .parquet(path)
    )
    scan = spark.read.parquet(path)
    manifest = (
        scan.select(
            F.col("_metadata.file_path").alias("file"),
            F.col(cell_col).alias("__c"),
        )
        .groupBy("file")
        .agg(
            F.min("__c").alias("cell_min"),
            F.max("__c").alias("cell_max"),
            F.count("*").alias("n_rows"),
        )
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}__manifest")


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}__manifest")


def read_spatial(
    spark: SparkSession,
    path: str,
    ranges: "list[tuple[int, int]]",
    *,
    cell_col: str = "cell",
) -> DataFrame:
    """Scan only the files whose [cell_min, cell_max] span overlaps any of
    ``ranges`` (inclusive), with the residual cell predicate re-applied —
    file-level pruning by manifest, row-level exactness by filter."""
    man = read_manifest(spark, path)
    cond = None
    for lo, hi in ranges:
        c = (F.col("cell_max") >= F.lit(lo)) & (F.col("cell_min") <= F.lit(hi))
        cond = c if cond is None else (cond | c)
    files = [r["file"] for r in man.filter(cond).select("file").collect()]
    base = spark.read.parquet(path)
    if not files:
        return base.filter(F.lit(False))
    df = spark.read.schema(base.schema).parquet(*files)
    rcond = None
    for lo, hi in ranges:
        c = (F.col(cell_col) >= F.lit(lo)) & (F.col(cell_col) <= F.lit(hi))
        rcond = c if rcond is None else (rcond | c)
    return df.filter(rcond)


def pruned_file_count(
    spark: SparkSession, path: str, ranges: "list[tuple[int, int]]"
) -> "tuple[int, int]":
    """(files selected, files total) for a range query — pruning telemetry."""
    man = read_manifest(spark, path).collect()
    total = len(man)
    sel = sum(
        1
        for r in man
        if any(r["cell_max"] >= lo and r["cell_min"] <= hi for lo, hi in ranges)
    )
    return sel, total


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    n_buckets: int,
    key: str,
    path: "str | None" = None,
) -> None:
    """Persist ``df`` hash-bucketed (and per-bucket sorted) by ``key``.

    Joins/aggregations between tables bucketed on the same key with the
    same bucket count run without an Exchange — verified by plan assertion
    in tests/test_layout.py."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


# ---------------------------------------------------------------------------
# Metadata-only snapshot / clone — the engine's server-side copy
# ---------------------------------------------------------------------------

def snapshot_spatial(spark: SparkSession, path: str, snapshot_path: str) -> int:
    """Snapshot a spatial table as metadata only: copy its manifest (file
    references + cell spans + row counts), never the data bytes.

    This is the engine's re-expression of the reference's server-side copy
    (object_storage/src/object_storage/object_location.py O13/O14 +
    object_store copy: the bytes never travel through the client). Here
    they never travel at all — a snapshot is one small parquet write
    regardless of table size, the same move Iceberg makes with metadata
    snapshots. Returns the number of files referenced."""
    man = read_manifest(spark, path)
    man.coalesce(1).write.mode("overwrite").parquet(f"{snapshot_path}__manifest")
    return man.count()


def read_snapshot(
    spark: SparkSession,
    snapshot_path: str,
    ranges: "list[tuple[int, int]] | None" = None,
    *,
    cell_col: str = "cell",
) -> DataFrame:
    """Read a snapshot through its manifest's file references (the files
    still live under the source table's path — zero-copy), with optional
    manifest-level range pruning + residual predicate, exactly as
    ``read_spatial``."""
    man = read_manifest(spark, snapshot_path)
    if ranges:
        cond = None
        for lo, hi in ranges:
            c = (F.col("cell_max") >= F.lit(lo)) & (F.col("cell_min") <= F.lit(hi))
            cond = c if cond is None else (cond | c)
        man = man.filter(cond)
    files = [r["file"] for r in man.select("file").collect()]
    if not files:
        raise ValueError(f"snapshot at {snapshot_path} references no files")
    df = spark.read.parquet(*files)
    if ranges:
        rcond = None
        for lo, hi in ranges:
            c = (F.col(cell_col) >= F.lit(lo)) & (F.col(cell_col) <= F.lit(hi))
            rcond = c if rcond is None else (rcond | c)
        df = df.filter(rcond)
    return df


def optimize_spatial(
    spark: SparkSession,
    path: str,
    *,
    cell_col: str = "cell",
    target_rows_per_file: int = 1_000_000,
) -> "tuple[int, int]":
    """Small-file compaction (the OPTIMIZE maintenance job): rewrite a
    spatial table into ~``target_rows_per_file``-row cell-range-clustered
    files and refresh its manifest. Streaming ingest and incremental
    appends accrete small files; a million tiny files makes every scan
    pay a million opens, and tight per-file cell spans (what the manifest
    prunes on) only hold if files are re-range-partitioned periodically.

    Returns (files_before, files_after). The rewrite is one
    repartitionByRange pass (sampled bounds) + the standard manifest write;
    readers see the swap atomically at the directory level in a real
    object store via write-then-rename table locations — here the swap is
    two renames with the DELETE LAST (old directory moved aside, tmp
    promoted, aside-copy removed only after promotion succeeds), so a
    crash at any point leaves either the old or the new table readable,
    never neither (ADVICE r2: rmtree-then-move lost the table on a crash
    between the calls).

    WARNING: OPTIMIZE rewrites the data files, so any metadata-only
    snapshot taken earlier (``snapshot_spatial``) still references the
    PRE-optimize files and breaks — exactly as expiring old Iceberg
    snapshots does. Materialize or re-take snapshots you need to keep
    before running OPTIMIZE."""
    man_before = read_manifest(spark, path).count()
    df = spark.read.parquet(path)
    total = df.count()
    n = max(1, round(total / target_rows_per_file))
    tmp = f"{path}__optimize_tmp"
    (
        df.repartitionByRange(n, F.col(cell_col))
        .sortWithinPartitions(cell_col)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    # swap by rename, not a second Spark write: re-writing through a scan
    # can merge/reorder the freshly range-clustered files and loosen the
    # per-file cell spans the manifest prunes on
    import shutil

    local_path = path.replace("file:", "")
    local_tmp = tmp.replace("file:", "")
    aside = f"{local_path}__optimize_old"
    if os.path.exists(aside):
        shutil.rmtree(aside)  # leftover from a previous crashed swap
    os.rename(local_path, aside)
    try:
        shutil.move(local_tmp, local_path)
    except BaseException:
        os.rename(aside, local_path)  # roll back: old table intact
        raise
    shutil.rmtree(aside)
    scan = spark.read.parquet(path)
    manifest = (
        scan.select(
            F.col("_metadata.file_path").alias("file"),
            F.col(cell_col).alias("__c"),
        )
        .groupBy("file")
        .agg(
            F.min("__c").alias("cell_min"),
            F.max("__c").alias("cell_max"),
            F.count("*").alias("n_rows"),
        )
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}__manifest")
    return man_before, read_manifest(spark, path).count()
