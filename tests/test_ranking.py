"""BM25 ranked-retrieval semantics (operators/ranking.py): tf saturation,
rarity weighting, length normalization, and cross-engine bit-exactness on
a hand-built corpus (the registry-level sf0.01 parity is covered by
test_oracle_parity.py::test_query_matches_oracle[bm25_topk])."""

from __future__ import annotations

import duckdb
import pytest

from geografir_spark.operators.ranking import bm25_sql

# doc 1: rare term once; doc 2: common term once; doc 3: common term thrice
# (longer); doc 4: both terms; doc 5..8: filler that contains 'common' so
# df(common) >> df(rare).
_DOCS = [
    (1, "rare alpha beta"),
    (2, "common alpha beta"),
    (3, "common common common alpha beta gamma delta"),
    (4, "rare common alpha"),
    (5, "common x y"),
    (6, "common x y"),
    (7, "common x y"),
    (8, "common x y"),
]


def _duck(sql: str):
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", _DOCS)
    out = con.execute(sql).fetchdf()
    con.close()
    return out


def test_bm25_rarity_and_saturation_and_length_norm():
    sql = bm25_sql("docs", "doc_id", "text", ("rare", "common"), "duckdb", k=8)
    df = _duck(sql)
    score = dict(zip(df.doc_id, df.score_micro))
    nterms = dict(zip(df.doc_id, df.n_terms))
    # matching both terms beats either alone
    assert score[4] > score[1] > score[2]
    assert nterms[4] == 2 and nterms[1] == 1
    # rarity: one 'rare' (df=2) outweighs one 'common' (df=7)
    assert score[1] > score[2]
    # tf saturation + length norm: tf=3 in a longer doc gains less than 3x
    assert score[2] < score[3] < 3 * score[2]
    # top-1 is the both-terms doc
    assert df.iloc[0].doc_id == 4


def test_bm25_spark_duckdb_bit_identical(spark):
    sdf = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    sdf.createOrReplaceTempView("docs")
    got = (
        spark.sql(bm25_sql("docs", "doc_id", "text", ("rare", "common"), "spark", k=8))
        .toPandas()
    )
    exp = _duck(bm25_sql("docs", "doc_id", "text", ("rare", "common"), "duckdb", k=8))
    assert got.score_micro.tolist() == exp.score_micro.tolist()
    assert got.doc_id.tolist() == exp.doc_id.tolist()


def test_bm25_empty_terms_rejected():
    with pytest.raises(ValueError):
        bm25_sql("docs", "doc_id", "text", (), "spark")


def test_editdist_pairs_semantics(spark):
    """Blocked fuzzy join: same-block near strings pair, cross-block and
    beyond-tau pairs don't; dist is the exact Levenshtein value."""
    from geografir_spark.operators.text import editdist_pairs_sql

    rows = [
        (1, "kitten", "x"),
        (2, "sitting", "x"),   # dist 3 from kitten, same block
        (3, "kitten", "x"),    # exact dup of 1
        (4, "kittenzzzzz", "x"),  # dist 5 from kitten -> beyond tau
        (5, "kitten", "y"),    # near 1 but different block
    ]
    spark.createDataFrame(rows, ["id", "s", "blk"]).createOrReplaceTempView("t")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in spark.sql(
            editdist_pairs_sql("t", "id", "s", ("blk",), 3, "spark")
        ).collect()
    }
    assert got == {(1, 2): 3, (1, 3): 0, (2, 3): 3}
