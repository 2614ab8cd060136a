"""Sequence-packing semantics on hand-built shards: exact fills, straddle
accounting, multi-sequence docs, and dialect agreement (C = 10 tokens)."""

from __future__ import annotations

import duckdb

from geografir_spark.operators.packing import pack_sequences_sql


def _words(n: int, tag: str) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


def _rows(spark, docs, C=10):
    spark.createDataFrame(
        docs, "doc_id long, text string, source string"
    ).createOrReplaceTempView("pdocs")
    sql = pack_sequences_sql("pdocs", "doc_id", "text", "source", "spark", C)
    return {(r["shard"], r["seq"]): r.asDict() for r in spark.sql(sql).collect()}


def test_packing_exact_fill_and_partial_tail(spark):
    # shard s: docs of 4+6 tokens fill seq 0 exactly; a 3-token doc opens
    # seq 1 which stays partial
    docs = [(1, _words(4, "a"), "s"), (2, _words(6, "b"), "s"), (3, _words(3, "c"), "s")]
    out = _rows(spark, docs)
    assert out[("s", 0)]["n_docs"] == 2
    assert out[("s", 0)]["n_straddle"] == 0
    assert out[("s", 0)]["n_tokens_filled"] == 10
    assert out[("s", 1)] == {
        "shard": "s", "seq": 1, "n_docs": 1, "n_straddle": 0,
        "n_tokens_filled": 3, "first_doc": 3, "last_doc": 3,
    }


def test_packing_long_doc_straddles_three_sequences(spark):
    # 25-token doc after a 2-token doc: spans seqs 0..2 (offsets 2..27)
    docs = [(1, _words(2, "a"), "s"), (2, _words(25, "b"), "s")]
    out = _rows(spark, docs)
    assert set(out) == {("s", 0), ("s", 1), ("s", 2)}
    assert out[("s", 0)]["n_docs"] == 2 and out[("s", 0)]["n_straddle"] == 1
    assert out[("s", 1)] == {
        "shard": "s", "seq": 1, "n_docs": 1, "n_straddle": 1,
        "n_tokens_filled": 10, "first_doc": 2, "last_doc": 2,
    }
    assert out[("s", 2)]["n_tokens_filled"] == 7  # 27 - 20
    # total filled tokens == total doc tokens (nothing lost or invented)
    assert sum(v["n_tokens_filled"] for v in out.values()) == 27


def test_packing_shards_are_independent(spark):
    docs = [(1, _words(7, "a"), "s1"), (2, _words(7, "b"), "s2")]
    out = _rows(spark, docs)
    assert out[("s1", 0)]["n_tokens_filled"] == 7
    assert out[("s2", 0)]["n_tokens_filled"] == 7


def test_packing_dialects_agree(spark):
    docs = [
        (1, _words(4, "a"), "s"),
        (2, _words(25, "b"), "s"),
        (3, _words(1, "c"), "s"),
        (4, _words(9, "d"), "t"),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string"
    ).createOrReplaceTempView("pdocs")
    got = sorted(
        tuple(r)
        for r in spark.sql(
            pack_sequences_sql("pdocs", "doc_id", "text", "source", "spark", 10)
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE pdocs (doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO pdocs VALUES (?, ?, ?)", docs)
    want = sorted(
        tuple(r)
        for r in con.execute(
            pack_sequences_sql("pdocs", "doc_id", "text", "source", "duckdb", 10)
        ).fetchall()
    )
    assert got == want
