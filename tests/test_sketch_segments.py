"""Unit semantics for the round-3 additions: segment-level dedup, the
HLL distinct sketch, and OD cell flows — small hand-built fixtures with
hand-checkable answers (the registry queries cover the sf0.01 oracle gate;
these pin the operator semantics on adversarial inputs)."""

from __future__ import annotations

import duckdb
import pytest


WORDS20_A = " ".join(f"a{i}" for i in range(20))
WORDS20_B = " ".join(f"b{i}" for i in range(20))
WORDS20_C = " ".join(f"c{i}" for i in range(20))


def _seg_rows(spark, docs):
    from geografir_spark.operators.dedup import segment_dedup_sql

    spark.createDataFrame(docs, "doc_id long, text string").createOrReplaceTempView(
        "segdocs"
    )
    sql = segment_dedup_sql("segdocs", "doc_id", "text", "spark")
    return {r["doc_id"]: r.asDict() for r in spark.sql(sql).collect()}


def test_segment_dedup_cross_doc_boilerplate(spark):
    # doc 1 owns both segments; doc 2 repeats segment A as its first 20
    # tokens (boilerplate) then has fresh content; doc 3 is all boilerplate.
    docs = [
        (1, f"{WORDS20_A} {WORDS20_B}"),
        (2, f"{WORDS20_A} {WORDS20_C}"),
        (3, f"{WORDS20_A} {WORDS20_B}"),
    ]
    out = _seg_rows(spark, docs)
    assert out[1] == {
        "doc_id": 1, "n_segs": 2, "n_dup_segs": 0, "earliest_keeper": 1,
    }
    assert out[2]["n_dup_segs"] == 1  # segment A owned by doc 1
    assert out[2]["earliest_keeper"] == 1
    assert out[3] == {
        "doc_id": 3, "n_segs": 2, "n_dup_segs": 2, "earliest_keeper": 1,
    }


def test_segment_dedup_within_doc_repeat_counts_per_occurrence(spark):
    # the same segment twice within ONE doc: the doc is its own keeper, so
    # neither occurrence counts as a cross-doc dup (keeper_doc < doc_id)
    docs = [(7, f"{WORDS20_A} {WORDS20_A}")]
    out = _seg_rows(spark, docs)
    assert out[7] == {
        "doc_id": 7, "n_segs": 2, "n_dup_segs": 0, "earliest_keeper": 7,
    }


def test_segment_dedup_short_doc_single_segment(spark):
    out = _seg_rows(spark, [(1, "just three words"), (2, "just three words")])
    assert out[1]["n_segs"] == 1 and out[1]["n_dup_segs"] == 0
    assert out[2]["n_segs"] == 1 and out[2]["n_dup_segs"] == 1


def test_segment_dedup_dialects_agree(spark):
    from geografir_spark.operators.dedup import segment_dedup_sql

    docs = [
        (1, f"{WORDS20_A} {WORDS20_B} tail words here"),
        (2, f"{WORDS20_B} {WORDS20_C}"),
        (3, "short"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").createOrReplaceTempView(
        "segdocs"
    )
    got = sorted(
        tuple(r)
        for r in spark.sql(
            segment_dedup_sql("segdocs", "doc_id", "text", "spark")
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE segdocs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO segdocs VALUES (?, ?)", docs)
    want = sorted(
        tuple(r)
        for r in con.execute(
            segment_dedup_sql("segdocs", "doc_id", "text", "duckdb")
        ).fetchall()
    )
    assert got == want


def test_hll_estimate_within_expected_error(spark):
    from geografir_spark.operators.sketch import hll_distinct_sql

    # 3 groups with 100 / 1000 / 5000 distinct items; HLL m=64 has
    # ~1.04/sqrt(64) = 13% standard error — assert within 3 sigma
    spark.sql(
        "SELECT CAST(id % 3 AS INT) AS g, "
        "CASE WHEN id % 3 = 0 THEN CAST(id/3 AS LONG) % 100 "
        " WHEN id % 3 = 1 THEN CAST(id/3 AS LONG) % 1000 "
        " ELSE CAST(id/3 AS LONG) % 5000 END AS item FROM range(30000)"
    ).createOrReplaceTempView("hllbase")
    sql = hll_distinct_sql(
        "SELECT g, CAST(item AS STRING) AS item FROM hllbase", "g", "item", "spark"
    )
    rows = {r["grp"]: r.asDict() for r in spark.sql(sql).collect()}
    for g, n_true in [(0, 100), (1, 1000), (2, 5000)]:
        assert rows[g]["n_exact"] == n_true
        est = rows[g]["hll_estimate"]
        assert abs(est - n_true) / n_true < 0.40, (g, est, n_true)


def test_hll_registers_merge_invariant(spark):
    from geografir_spark.operators.sketch import hll_distinct_sql

    # register state must not depend on how rows are partitioned: same
    # items in 1 partition vs 16 partitions → identical sum_scaled
    outs = []
    for parts in (1, 16):
        spark.range(0, 2000).selectExpr(
            "CAST(0 AS INT) AS g", "CAST(id % 777 AS STRING) AS item"
        ).repartition(parts).createOrReplaceTempView("hllmerge")
        sql = hll_distinct_sql("SELECT g, item FROM hllmerge", "g", "item", "spark")
        outs.append(spark.sql(sql).collect()[0]["hll_sum_scaled"])
    assert outs[0] == outs[1]


def test_od_flows_tiny_fixture(spark):
    # two hosts; host x moves c1->c2->c2->c1, host y moves c1->c2
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [
        ("x", 1, 101), ("x", 2, 102), ("x", 3, 102), ("x", 4, 101),
        ("y", 1, 101), ("y", 2, 102),
    ]
    df = spark.createDataFrame(rows, "host string, page_id long, cell long")
    w = Window.partitionBy("host").orderBy("page_id")
    out = (
        df.withColumn("prev_cell", F.lag("cell").over(w))
        .filter(F.col("prev_cell").isNotNull() & (F.col("prev_cell") != F.col("cell")))
        .groupBy(
            F.col("prev_cell").alias("cell_from"), F.col("cell").alias("cell_to")
        )
        .agg(F.count("*").alias("n_moves"), F.countDistinct("host").alias("n_hosts"))
        .collect()
    )
    got = {(r["cell_from"], r["cell_to"]): (r["n_moves"], r["n_hosts"]) for r in out}
    assert got == {(101, 102): (2, 2), (102, 101): (1, 1)}


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

W = " ".join(f"w{i}" for i in range(10))  # 10 tokens -> 3 distinct 8-grams


def _decon_rows(spark, docs, bench_pred="doc_id >= 100"):
    from geografir_spark.operators.dedup import decontaminate_sql

    spark.createDataFrame(docs, "doc_id long, text string").createOrReplaceTempView(
        "ddocs"
    )
    sql = decontaminate_sql(
        f"(SELECT * FROM ddocs WHERE NOT ({bench_pred}))",
        f"(SELECT * FROM ddocs WHERE {bench_pred})",
        "doc_id",
        "text",
        "spark",
    )
    return {r["doc_id"]: r.asDict() for r in spark.sql(sql).collect()}


def test_decontaminate_exact_copy_and_partial_overlap(spark):
    # doc 1 = exact copy of benchmark doc 100 (all 3 grams contaminated);
    # doc 2 shares only the first 8 tokens (1 gram); doc 3 is clean;
    # doc 4 is shorter than 8 tokens (no grams, never flagged)
    docs = [
        (1, W),
        (2, " ".join(f"w{i}" for i in range(8)) + " x y z"),
        (3, "entirely different text with eight plus tokens here now"),
        (4, "too short"),
        (100, W),
    ]
    out = _decon_rows(spark, docs)
    assert out[1]["n_grams"] == 3 and out[1]["n_contam_grams"] == 3
    assert out[2]["n_contam_grams"] == 1
    assert 3 not in out and 4 not in out  # only contaminated docs emitted


def test_decontaminate_within_doc_repeat_counts_once(spark):
    # the shared gram appears twice in the training doc: array_distinct
    # collapses it, so n_contam_grams counts DISTINCT shared grams
    eight = " ".join(f"w{i}" for i in range(8))
    out = _decon_rows(spark, [(1, f"{eight} {eight}"), (100, eight)])
    assert out[1]["n_contam_grams"] == 1


def test_decontaminate_dialects_agree(spark):
    from geografir_spark.operators.dedup import decontaminate_sql

    docs = [
        (1, W),
        (2, " ".join(f"w{i}" for i in range(8)) + " x y z"),
        (3, "entirely different text with eight plus tokens here now"),
        (100, W),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").createOrReplaceTempView(
        "ddocs"
    )
    args = ("doc_id", "text")
    train = "(SELECT * FROM ddocs WHERE NOT (doc_id >= 100))"
    bench = "(SELECT * FROM ddocs WHERE doc_id >= 100)"
    got = sorted(
        tuple(r)
        for r in spark.sql(
            decontaminate_sql(train, bench, *args, "spark")
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE ddocs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO ddocs VALUES (?, ?)", docs)
    want = sorted(
        tuple(r)
        for r in con.execute(
            decontaminate_sql(train, bench, *args, "duckdb")
        ).fetchall()
    )
    assert got == want and len(got) == 2


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

def test_countmin_never_underestimates_and_exact_when_alone(spark):
    from geografir_spark.operators.sketch import countmin_sql

    docs = [(i % 10,) for i in range(200)] + [(99,)]
    spark.createDataFrame(docs, "k long").createOrReplaceTempView("cmitems")
    sql = countmin_sql("SELECT k FROM cmitems", "k", "spark", top_k=11)
    out = {r["item"]: r.asDict() for r in spark.sql(sql).collect()}
    assert len(out) == 11
    for row in out.values():
        assert row["overestimate"] >= 0
        assert row["cms_estimate"] >= row["n_exact"]
    assert out["99"]["n_exact"] == 1


def test_countmin_registers_are_additive(spark):
    # CMS(a ∪ b) estimate == estimate from summed registers: feed the union
    # and each half; for every item, est(union) <= est(a) + est(b) would be
    # wrong in general, but exact-count additivity must hold and the union
    # estimate must dominate each item's union exact count
    from geografir_spark.operators.sketch import countmin_sql

    rows = [(f"x{i % 7}",) for i in range(50)]
    spark.createDataFrame(rows, "k string").createOrReplaceTempView("cmu")
    spark.createDataFrame(rows * 2, "k string").createOrReplaceTempView("cmu2")
    one = {r["item"]: r for r in spark.sql(
        countmin_sql("SELECT k FROM cmu", "k", "spark", top_k=7)).collect()}
    two = {r["item"]: r for r in spark.sql(
        countmin_sql("SELECT k FROM cmu2", "k", "spark", top_k=7)).collect()}
    for k in one:
        assert two[k]["n_exact"] == 2 * one[k]["n_exact"]
        # doubling every count doubles every register, hence the estimate
        assert two[k]["cms_estimate"] == 2 * one[k]["cms_estimate"]


def test_countmin_dialects_agree(spark):
    from geografir_spark.operators.sketch import countmin_sql

    docs = [(i % 97,) for i in range(300)]
    spark.createDataFrame(docs, "k long").createOrReplaceTempView("cmd")
    got = sorted(
        tuple(r)
        for r in spark.sql(
            countmin_sql("SELECT k FROM cmd", "k", "spark", top_k=97)
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE cmd AS SELECT (i % 97) AS k FROM range(300) t(i)")
    want = sorted(
        tuple(r)
        for r in con.execute(
            countmin_sql("SELECT k FROM cmd", "k", "duckdb", top_k=97)
        ).fetchall()
    )
    assert got == want
