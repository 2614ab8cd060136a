"""Checkpoint resumability with per-partition lineage (BASELINE.json
north_rule: "resumable from checkpoint with per-partition lineage + metrics").

Design (batch + snapshot manifests — no Structured Streaming needed; the
reference's own download_directory documents non-transactional partial
failure, object_storage/src/object_storage/object_store.py:215-221, which is
precisely the failure mode this module closes):

- Work is partitioned by an integer **part key** (typically a coarse cell,
  e.g. ``cell_parent(cell, 4)`` — spatially aligned so each unit is one
  cell-range scan).
- ``run_resumable`` computes the pending part list as planned parts
  LEFT ANTI JOIN committed lineage rows, processes only those, and appends:
  - data files under ``<out>/data/part_key=<k>/`` (one directory per unit,
    so a unit's output is replaced atomically by directory overwrite);
  - one lineage row per unit to ``<out>/lineage/`` with
    (part_key, n_rows, checksum, batch_id, committed_ts) — written only
    AFTER the unit's data lands (write-ahead-data, commit-by-lineage).
- A unit's checksum = bit_xor of xxhash64 over its rows' columns —
  order-insensitive, cheap, and comparable across reruns for integrity
  verification (``verify_lineage``).

On Iceberg-enabled clusters the data append maps to a table append +
snapshot; the lineage table is identical. The parquet layout here is the
sandbox fallback behind the same API.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "part_key bigint, n_rows bigint, checksum bigint, batch_id string, committed_ts double"
)


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    path = f"{out_dir}/lineage"
    try:
        return spark.read.schema(LINEAGE_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], LINEAGE_SCHEMA)


def pending_parts(spark: SparkSession, planned: DataFrame, out_dir: str) -> DataFrame:
    """planned(part_key) minus committed lineage — the resume anti-join."""
    done = read_lineage(spark, out_dir).select("part_key").distinct()
    return planned.join(done, "part_key", "left_anti")


def _checksum_cols(df: DataFrame) -> list:
    return [f.name for f in df.schema.fields if f.name != "part_key"]


def run_resumable(
    df: DataFrame,
    out_dir: str,
    *,
    part_col: str = "part_key",
    parts_per_batch: int | None = None,
    fail_after_parts: int | None = None,
    unit_batch: int | None = None,
) -> dict:
    """Process ``df`` (which must carry ``part_col``) into ``out_dir``,
    resumably. Returns {"processed": n, "skipped": n, "batch_id": ...}.

    Pending units are processed in chunks of ``unit_batch`` parts, each
    chunk ONE distributed pass: a dynamic-partition-overwrite write of every
    part in the chunk (idempotent — a replay overwrites only those
    partition dirs), then one grouped stats job, then one lineage append
    that commits the whole chunk. Default is all pending parts in a single
    chunk — at 4096 spatial units that is 3 Spark jobs, not 12k sequential
    driver round-trips; choose a smaller ``unit_batch`` to trade throughput
    for finer crash-resume granularity (a crash loses at most one chunk's
    work, never its lineage consistency: lineage is appended only after the
    chunk's data is fully written).

    ``fail_after_parts`` injects a crash after N committed units (test hook
    for the kill-resume-verify cycle; forces unit_batch=1 so the injection
    point is exact).
    """
    spark = df.sparkSession
    df = df.withColumnRenamed(part_col, "part_key") if part_col != "part_key" else df
    planned = df.select("part_key").distinct()
    todo = [r.part_key for r in pending_parts(spark, planned, out_dir).collect()]
    todo.sort()
    skipped = planned.count() - len(todo)
    if parts_per_batch is not None:
        todo = todo[:parts_per_batch]
    batch_id = uuid.uuid4().hex[:12]

    if fail_after_parts is not None:
        unit_batch = 1
    elif unit_batch is None:
        unit_batch = max(len(todo), 1)

    cols = _checksum_cols(df)
    processed = 0
    for start in range(0, len(todo), unit_batch):
        if fail_after_parts is not None and processed >= fail_after_parts:
            raise RuntimeError(
                f"injected failure after {processed} parts (batch {batch_id})"
            )
        chunk = todo[start : start + unit_batch]
        data = df.filter(F.col("part_key").isin(chunk))
        (
            data.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("part_key")
            .parquet(f"{out_dir}/data")
        )
        stats = data.groupBy("part_key").agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.expr(f"bit_xor(xxhash64({', '.join(cols)}))"), F.lit(0)
            ).alias("ck"),
        ).collect()
        now = time.time()
        rows = [(r.part_key, r.n, r.ck, batch_id, now) for r in stats]
        spark.createDataFrame(rows, LINEAGE_SCHEMA).write.mode("append").parquet(
            f"{out_dir}/lineage"
        )
        processed += len(chunk)
    return {"processed": processed, "skipped": int(skipped), "batch_id": batch_id}


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.option("basePath", f"{out_dir}/data").parquet(f"{out_dir}/data")


def verify_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    """Recompute per-part (n_rows, checksum) from the data files and diff
    against lineage — returns rows that disagree (empty == intact)."""
    data = read_output(spark, out_dir)
    cols = [c for c in data.columns if c != "part_key"]
    actual = data.groupBy("part_key").agg(
        F.count("*").alias("a_rows"),
        F.coalesce(F.expr(f"bit_xor(xxhash64({', '.join(cols)}))"), F.lit(0)).alias("a_ck"),
    )
    lin = read_lineage(spark, out_dir).groupBy("part_key").agg(
        F.max("n_rows").alias("n_rows"), F.max("checksum").alias("checksum")
    )
    j = actual.join(lin, "part_key", "full_outer")
    return j.filter(
        (F.col("a_rows").isNull())
        | (F.col("n_rows").isNull())
        | (F.col("a_rows") != F.col("n_rows"))
        | (F.col("a_ck") != F.col("checksum"))
    )
