"""PII scrubber: both dialects must agree byte-for-byte on adversarial
fixtures — multiple matches per row, matches at string edges, near-misses
that must NOT be redacted, and category-ordering interactions."""

from __future__ import annotations

import duckdb
import pytest

FIXTURES = [
    "plain text with no pii at all",
    "write to alice.smith+spam@sub.example.co.uk today",
    "two mails a@b.io and c_d%e@f-g.org in one line",
    "server at 192.168.0.1 and 10.0.0.255.",
    "1.2.3.4",  # whole string is an IP (edge anchors)
    "call +1-800-555-0199 now",
    "+12345678901",  # bare international number, whole string
    "version 1.2.3 is not an ip",  # only 3 dotted groups
    "a@b is not an email (no tld)",
    "price +100-200 is not a phone (too short)",
    "ip then mail 8.8.8.8 x@y.zz then +49-30-1234567 done",
    "",
]


def _expected(s: str) -> str:
    import re

    s = re.sub(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>", s)
    s = re.sub(r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>", s)
    s = re.sub(r"\+[0-9][0-9-]{7,14}[0-9]", "<PHONE>", s)
    return s


@pytest.fixture(scope="module")
def scrubbed_duckdb():
    from geografir_spark.operators.text import pii_scrub_expr

    con = duckdb.connect()
    expr = pii_scrub_expr("t", "duckdb")
    return [
        con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [s]).fetchone()[0]
        for s in FIXTURES
    ]


def test_duckdb_scrub_matches_python_re(scrubbed_duckdb):
    assert scrubbed_duckdb == [_expected(s) for s in FIXTURES]


def test_spark_scrub_matches_duckdb(spark, scrubbed_duckdb):
    from geografir_spark.operators.text import pii_scrub_expr

    df = spark.createDataFrame([(i, s) for i, s in enumerate(FIXTURES)], "i INT, t STRING")
    got = {
        r["i"]: r["s"]
        for r in df.selectExpr("i", f"{pii_scrub_expr('t', 'spark')} AS s").collect()
    }
    assert [got[i] for i in range(len(FIXTURES))] == scrubbed_duckdb


def test_near_misses_untouched(scrubbed_duckdb):
    for idx in (0, 7, 8, 9, 11):
        assert scrubbed_duckdb[idx] == FIXTURES[idx]


def test_counts_match_tags(spark):
    from geografir_spark.operators.text import pii_count_expr, pii_scrub_expr

    df = spark.createDataFrame([(FIXTURES[10],)], "t STRING")
    row = df.selectExpr(
        f"{pii_scrub_expr('t', 'spark')} AS s"
    ).selectExpr(
        f"{pii_count_expr('s', '<EMAIL>', 'spark')} AS e",
        f"{pii_count_expr('s', '<IP>', 'spark')} AS i",
        f"{pii_count_expr('s', '<PHONE>', 'spark')} AS p",
    ).collect()[0]
    assert (row["e"], row["i"], row["p"]) == (1, 1, 1)
