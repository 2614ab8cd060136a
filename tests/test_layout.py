"""Physical layout: manifest-pruned spatial scans and shuffle-free bucketed
joins — the structural 100 TB mechanisms, verified by file counts and plan
shape on small data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def cell_df(spark):
    # 4000 rows across a contiguous cell range; values depend on cell only
    return spark.range(4000).select(
        (F.col("id") * 7 % 4096).alias("cell"),
        (F.col("id") % 100).alias("v"),
    )


def test_spatial_manifest_prunes_files(spark, cell_df, tmp_path_factory):
    from geografir_spark.plans.layout import (
        pruned_file_count,
        read_spatial,
        write_spatial,
    )

    path = str(tmp_path_factory.mktemp("layout") / "cells")
    write_spatial(cell_df, path, n_ranges=8)

    sel, total = pruned_file_count(spark, path, [(100, 199)])
    assert total >= 8
    assert sel < total, "a narrow range query must not touch every file"

    got = read_spatial(spark, path, [(100, 199)]).orderBy("cell", "v").collect()
    exp = (
        cell_df.filter((F.col("cell") >= 100) & (F.col("cell") <= 199))
        .orderBy("cell", "v")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]

    # multi-range (a bbox cover is a list of cell intervals)
    got2 = read_spatial(spark, path, [(0, 9), (4000, 4095)]).count()
    exp2 = cell_df.filter(
        ((F.col("cell") >= 0) & (F.col("cell") <= 9))
        | ((F.col("cell") >= 4000) & (F.col("cell") <= 4095))
    ).count()
    assert got2 == exp2

    # empty range → empty result with the table schema
    empty = read_spatial(spark, path, [(1 << 40, (1 << 40) + 5)])
    assert empty.count() == 0
    assert empty.columns == ["cell", "v"]


def test_bucketed_join_has_no_shuffle(spark, cell_df, tmp_path_factory):
    from geografir_spark.plans.layout import write_bucketed

    base = tmp_path_factory.mktemp("buckets")
    left = cell_df.withColumnRenamed("v", "lv")
    right = cell_df.withColumnRenamed("v", "rv").withColumn(
        "rv", F.col("rv") + 1
    )
    write_bucketed(left, "t_left", n_buckets=8, key="cell", path=str(base / "l"))
    write_bucketed(right, "t_right", n_buckets=8, key="cell", path=str(base / "r"))
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("t_left").join(spark.table("t_right"), "cell")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"
            # correctness: same result as the plain (shuffling) join
            plain = left.join(right, "cell")
            assert j.count() == plain.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_left")
        spark.sql("DROP TABLE IF EXISTS t_right")


def test_snapshot_is_metadata_only_and_reads_back(spark, tmp_path):
    """O13/O14 server-side copy re-expressed: a snapshot copies the manifest
    (file references), not data — byte-free of data files, prunes like the
    source, and equals the source's rows."""
    import os

    from geografir_spark.plans.layout import (
        read_snapshot, read_spatial, snapshot_spatial, write_spatial,
    )

    src = str(tmp_path / "tbl")
    snap = str(tmp_path / "snap")
    df = spark.range(0, 4000).selectExpr("id", "id % 97 AS cell")
    write_spatial(df, src, n_ranges=8)

    n_files = snapshot_spatial(spark, src, snap)
    assert n_files == 8
    # zero-copy: the snapshot dir contains ONLY the manifest, no data files
    assert not os.path.exists(snap)
    man_files = [
        f for f in os.listdir(f"{snap}__manifest") if f.endswith(".parquet")
    ]
    assert len(man_files) == 1

    # full read equals source
    assert read_snapshot(spark, snap).count() == 4000
    # pruned read equals the source's pruned read
    ranges = [(10, 20)]
    a = sorted(r["id"] for r in read_snapshot(spark, snap, ranges).collect())
    b = sorted(r["id"] for r in read_spatial(spark, src, ranges).collect())
    assert a == b and len(a) > 0


def test_optimize_compacts_small_files(spark, tmp_path):
    """OPTIMIZE maintenance: a fragmented table (64 tiny files) rewrites to
    ~target-sized cell-clustered files, the manifest refreshes, and both
    full and range-pruned reads are row-identical before/after."""
    from geografir_spark.plans.layout import (
        optimize_spatial, read_spatial, write_spatial,
    )

    path = str(tmp_path / "frag")
    df = spark.range(0, 8000).selectExpr("id", "id % 97 AS cell")
    write_spatial(df, path, n_ranges=64)

    before_rows = sorted(r["id"] for r in spark.read.parquet(path).collect())
    nb, na = optimize_spatial(spark, path, target_rows_per_file=4000)
    assert nb == 64 and na <= 4
    after_rows = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert after_rows == before_rows
    pruned = sorted(
        r["id"] for r in read_spatial(spark, path, [(10, 20)]).collect()
    )
    assert pruned == sorted(i for i in range(8000) if 10 <= i % 97 <= 20)
