"""Table-diff semantics (plans/diff.py): change classification, unchanged
keys absent, NULL-vs-empty rows hash apart, XOR duplicate-pair tradeoff
pinned; registry parity is covered by
test_oracle_parity.py::test_query_matches_oracle[snapshot_table_diff]."""

from __future__ import annotations

import duckdb

from geografir_spark.plans.diff import table_diff_sql

_OLD = [
    (1, "a", "x"),
    (1, "b", "y"),
    (2, "c", "z"),   # will be content-changed
    (3, "d", "w"),   # will be removed entirely
    (4, "e", None),  # NULL payload, unchanged
    (5, "f", ""),    # empty payload vs key 6's NULL — must hash apart
]
_NEW = [
    (1, "a", "x"),
    (1, "b", "y"),        # key 1 unchanged -> absent from output
    (2, "c", "CHANGED"),
    (4, "e", None),       # unchanged
    (5, "f", ""),         # unchanged
    (9, "g", "new"),      # added key
    (2, "extra", "row"),  # key 2 also gains a row -> count_changed wins
]


def _run(old, new):
    con = duckdb.connect()
    con.execute("CREATE TABLE o (k BIGINT, a VARCHAR, b VARCHAR)")
    con.execute("CREATE TABLE n (k BIGINT, a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO o VALUES (?,?,?)", old)
    con.executemany("INSERT INTO n VALUES (?,?,?)", new)
    out = con.execute(table_diff_sql("o", "n", "k", ("a", "b"), "duckdb")).fetchdf()
    con.close()
    return dict(zip(out.part_key, out.change))


def test_change_classification():
    got = _run(_OLD, _NEW)
    assert got == {2: "count_changed", 3: "removed", 9: "added"}


def test_null_vs_empty_hash_apart():
    # swap a NULL payload for '' with same count: must surface as changed
    got = _run([(7, "a", None)], [(7, "a", "")])
    assert got == {7: "content_changed"}


def test_xor_duplicate_pair_tradeoff_documented():
    # the documented sketch limit: a row duplicated an EVEN number of times
    # XOR-cancels; equal counts + cancelled checksum -> not reported
    got = _run([(8, "a", "x"), (8, "z", "q"), (8, "z", "q")],
               [(8, "a", "x"), (8, "a", "x"), (8, "a", "x")])
    assert got == {}


def test_spark_matches_duckdb(spark):
    for rows, name in ((_OLD, "o"), (_NEW, "n")):
        spark.createDataFrame(rows, "k LONG, a STRING, b STRING").createOrReplaceTempView(name)
    got = {
        r["part_key"]: r["change"]
        for r in spark.sql(table_diff_sql("o", "n", "k", ("a", "b"), "spark")).collect()
    }
    assert got == _run(_OLD, _NEW)
