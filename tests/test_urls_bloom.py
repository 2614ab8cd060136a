"""URL canonicalization and Bloom pre-join operator semantics.

The registry queries are value-checked against DuckDB by
test_oracle_parity.py; these tests pin the operator-level contracts:
canonicalization collapses exactly the nuisance variations (and nothing
more), and the Bloom filter admits every inserted key (zero false
negatives — the property that makes it safe as a pre-join filter).
"""

from __future__ import annotations

import duckdb
import pytest

from geografir_spark.geo.cells import nested_sql
from geografir_spark.operators import bloom, urls

VARIANTS = [
    "https://site7.example/d/7",
    "HTTPS://site7.example/d/7",
    "https://Site7.Example/d/7",
    "https://site7.example:443/d/7",
    "https://site7.example/d/7/",
    "https://site7.example/d/7#frag",
]
DISTINCT = [
    "https://site7.example/d/7?a=1&b=2",   # query present ≠ no query
    "https://site7.example/d/7?a=2&b=2",   # different param value
    "https://site8.example/d/7",           # different host
    "http://site7.example/d/7",            # different scheme
]


def _canon_duck(raw: list[str]) -> list[str]:
    vals = ", ".join(f"('{u}')" for u in raw)
    q = nested_sql(
        f"SELECT * FROM (VALUES {vals}) t(raw_url)",
        urls.canonical_url_steps("raw_url", "duckdb"),
    )
    return [r[0] for r in duckdb.sql(f"SELECT canonical_url FROM ({q})").fetchall()]


def _canon_spark(spark, raw: list[str]) -> list[str]:
    vals = ", ".join(f"('{u}')" for u in raw)
    q = nested_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(raw_url)",
        urls.canonical_url_steps("raw_url", "spark"),
    )
    return [r[0] for r in spark.sql(f"SELECT canonical_url FROM ({q})").collect()]


def test_canonical_collapses_nuisance_variants(spark):
    for got in (_canon_duck(VARIANTS), _canon_spark(spark, VARIANTS)):
        assert set(got) == {"https://site7.example/d/7"}


def test_canonical_preserves_distinctions(spark):
    for got in (_canon_duck(DISTINCT), _canon_spark(spark, DISTINCT)):
        assert len(set(got)) == len(DISTINCT)


def test_canonical_sorts_query_params(spark):
    pair = [
        "https://h.example/p?b=2&a=1&c=3",
        "https://h.example/p?c=3&a=1&b=2",
    ]
    for got in (_canon_duck(pair), _canon_spark(spark, pair)):
        assert set(got) == {"https://h.example/p?a=1&b=2&c=3"}


def test_canonical_dialects_agree(spark):
    allu = VARIANTS + DISTINCT
    assert _canon_duck(allu) == _canon_spark(spark, allu)


@pytest.mark.parametrize("dialect", ["duckdb", "spark"])
def test_bloom_zero_false_negatives(spark, dialect):
    keys = "SELECT * FROM (VALUES (3), (17), (99), (1024), (65537)) t(k)"
    if dialect == "spark":
        keys = keys.replace(") t(", ") AS t(")
    build = bloom.build_sql(keys, "k", dialect)
    member = bloom.member_expr("p.k", dialect, "f")
    q = (
        f"SELECT p.k, {member} AS m FROM ({keys}) p CROSS JOIN ({build}) f"
    )
    rows = (
        spark.sql(q).collect() if dialect == "spark" else duckdb.sql(q).fetchall()
    )
    assert len(rows) == 5 and all(bool(r[1]) for r in rows)


def test_bloom_words_stay_positive():
    """Bit 63 is never set (63 usable bits/word) so every word is a valid
    positive BIGINT in both engines — DuckDB range-checks `<< 63`."""
    keys = "SELECT range AS k FROM range(0, 2000)"
    build = bloom.build_sql(keys, "k", "duckdb")
    row = duckdb.sql(build).fetchone()
    assert len(row) == bloom.N_WORDS
    assert all(w >= 0 for w in row)
    # a saturated filter is all-ones below bit 63
    assert max(row) < (1 << 63)
