"""Skew handling + checkpoint/resume lineage tests."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skewed_df(spark):
    from geografir_spark.geo import cells

    # 5000 rows in one hot res-9 cell (width 0.703°), jittered within it,
    # 500 spread over others
    hot = spark.range(5000).selectExpr(
        "id AS page_id",
        "0.36 + CAST(id % 100 AS DOUBLE) * 0.003 AS lon",
        "0.06 + CAST(id % 80 AS DOUBLE) * 0.003 AS lat",
    )
    cold = spark.range(500).selectExpr(
        "id + 10000 AS page_id",
        "CAST((id % 300) - 150 AS DOUBLE) + 0.5 AS lon",
        "CAST((id % 140) - 70 AS DOUBLE) + 0.5 AS lat",
    )
    return cells.with_cell(hot.unionByName(cold), "lon", "lat", 9)


def test_salt_hot_cells(spark, skewed_df):
    from geografir_spark.operators.skew import salt_hot_cells

    salted = salt_hot_cells(
        skewed_df, threshold=1000, n_salts=8, hash_col="page_id"
    )
    agg = salted.groupBy("cell", "salt").agg(F.count("*").alias("n"))
    per_cell = agg.groupBy("cell").agg(
        F.count("*").alias("n_salts"), F.sum("n").alias("n")
    )
    hot_row = per_cell.orderBy(F.desc("n")).first()
    assert hot_row.n == 5000 and hot_row.n_salts == 8
    # cold cells unsalted (exactly one salt bucket each)
    assert per_cell.filter("n < 1000 AND n_salts != 1").count() == 0
    # total row count preserved
    assert salted.count() == 5500


def test_split_hot_cells(spark, skewed_df):
    from geografir_spark.geo import cells
    from geografir_spark.operators.skew import split_hot_cells

    split = split_hot_cells(skewed_df, threshold=1000, levels=2)
    assert split.count() == 5500
    res_counts = split.selectExpr(
        f"{cells.res_sql('cell')} AS r"
    ).groupBy("r").count().collect()
    by_res = {r.r: r["count"] for r in res_counts}
    assert by_res[11] == 5000  # hot rows re-encoded 2 levels finer
    assert by_res[9] == 500    # cold rows untouched
    # the fine cells are descendants of the original hot cell
    hot_cell = skewed_df.groupBy("cell").count().orderBy(F.desc("count")).first().cell
    parents = split.filter(f"({cells.res_sql('cell')}) = 11").selectExpr(
        f"{cells.parent_sql('cell', 9)} AS p"
    ).distinct().collect()
    assert {r.p for r in parents} == {hot_cell}
    # and the hot mass actually spread over multiple children
    n_children = split.filter(f"({cells.res_sql('cell')}) = 11").select("cell").distinct().count()
    assert n_children > 1


def test_lineage_resume_and_verify(spark):
    from geografir_spark.plans import lineage

    out_dir = tempfile.mkdtemp(prefix="lineage_test_")
    shutil.rmtree(out_dir)
    df = spark.range(1000).selectExpr(
        "id % 10 AS part_key", "id AS value", "id * 2 AS other"
    )
    # run 1: crash after 4 parts
    with pytest.raises(RuntimeError, match="injected failure"):
        lineage.run_resumable(df, out_dir, fail_after_parts=4)
    lin1 = lineage.read_lineage(spark, out_dir)
    assert lin1.count() == 4

    # resume: must process exactly the remaining 6, skip the 4 done
    r = lineage.run_resumable(df, out_dir)
    assert r["processed"] == 6 and r["skipped"] == 4

    # final output == the full input, and lineage verifies clean
    out = lineage.read_output(spark, out_dir)
    assert out.count() == 1000
    assert lineage.verify_lineage(spark, out_dir).count() == 0

    # idempotent: a third run does nothing
    r2 = lineage.run_resumable(df, out_dir)
    assert r2["processed"] == 0 and r2["skipped"] == 10

    # corrupt a partition → verify flags exactly that part
    import glob
    import os

    victim = glob.glob(f"{out_dir}/data/part_key=3/*.parquet")
    for f in victim:
        os.remove(f)
    bad = lineage.verify_lineage(spark, out_dir).collect()
    assert len(bad) == 1 and bad[0].part_key == 3
    shutil.rmtree(out_dir)


def test_salted_topk_equals_unsalted(spark, skewed_df):
    """The two-phase salted top-k (top-k per (cell, salt), then top-k of the
    survivors) must return EXACTLY the unsalted window result — the
    correctness contract behind bench.py's skew measurement."""
    from pyspark.sql import Window as W

    from geografir_spark.operators.skew import salt_hot_cells

    k = 5
    df = skewed_df.withColumn("score", F.pmod(F.xxhash64("page_id"), F.lit(10_000)))
    order = [F.desc("score"), F.asc("page_id")]

    w = W.partitionBy("cell").orderBy(*order)
    plain = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("cell", "page_id", "rn")
    )

    s = salt_hot_cells(df, threshold=1000, n_salts=8, hash_col="page_id")
    w1 = W.partitionBy("cell", "salt").orderBy(*order)
    cand = s.withColumn("rn", F.row_number().over(w1)).filter(F.col("rn") <= k)
    w2 = W.partitionBy("cell").orderBy(*order)
    two_phase = (
        cand.drop("rn")
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select("cell", "page_id", "rn")
    )

    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, two_phase.collect()))
    assert a == b and len(a) > 0


def test_connected_components_chain_and_cliques(spark):
    """Label propagation over a 7-node chain (forces multiple rounds — the
    diameter bound), a triangle, and an isolated pair: every node's label
    is its component's min id."""
    from geografir_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10, 16)]       # chain 10-…-16
        + [(100, 101), (101, 102), (100, 102)]    # triangle
        + [(200, 201)],                           # pair
        "src LONG, dst LONG",
    )
    got = {r["id"]: r["label"] for r in connected_components(edges).collect()}
    assert {got[i] for i in range(10, 17)} == {10}
    assert {got[i] for i in (100, 101, 102)} == {100}
    assert {got[i] for i in (200, 201)} == {200}
    assert len(got) == 7 + 3 + 2


def test_connected_components_nonconvergence_raises(spark):
    """ADVICE r2: a component whose diameter exceeds max_iter must FAIL
    loudly, not silently return split components."""
    import pytest

    from geografir_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 12)], "src LONG, dst LONG"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=3)
    # and with a sufficient bound the same chain converges to one component
    got = {r["id"]: r["label"] for r in connected_components(chain).collect()}
    assert set(got.values()) == {0}


def test_host_quota_two_phase_equals_single_window(spark):
    """VERDICT r2 #5: the two-phase salted quota (per-(host,salt) top-k →
    per-host re-quota over <= quota*n_salts survivors) must return exactly
    the single-window result on a mega-host fixture, with both windows in
    the plan (the scale certificate: no reducer ever sees a whole hot
    host)."""
    from geografir_spark.operators.text import hash60_expr
    from geografir_spark.queries import _host_quota_sql

    # mega-host fixture: 60% of docs share one host via doc_id % 50 == 7
    docs = spark.range(0, 5000).selectExpr(
        "CASE WHEN id % 10 < 6 THEN id * 50 + 7 ELSE id END AS doc_id",
        "'t' AS text", "'en' AS lang", "CAST(id % 997 AS INT) AS n_chars",
    )
    docs.createOrReplaceTempView("documents")
    try:
        two = spark.sql(_host_quota_sql("spark"))
        h = hash60_expr("CAST(page_id AS STRING)", "spark")
        from geografir_spark.sources.pages import pages_select_sql

        single = spark.sql(f"""
        WITH p AS (SELECT *, split(url, '/')[2] AS host, ({h}) AS hsh
                   FROM ({pages_select_sql('documents')})),
             r AS (SELECT host, page_id, n_chars,
                          row_number() OVER (PARTITION BY host
                                             ORDER BY hsh, page_id) AS rn
                   FROM p)
        SELECT host, count(*) AS n_kept,
               CAST(sum(n_chars) AS BIGINT) AS kept_chars,
               min(page_id) AS first_kept
        FROM r WHERE rn <= 3 GROUP BY host
        """)
        a = sorted(map(tuple, two.collect()))
        b = sorted(map(tuple, single.collect()))
        assert a == b and len(a) > 0
        # the fixture really is skewed: one host holds the majority
        plan = two._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Window") >= 2, "two-phase plan must show 2 windows"
    finally:
        spark.catalog.dropTempView("documents")
