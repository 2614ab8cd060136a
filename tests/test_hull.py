"""Convex hull semantics (operators/hull.py): collinear boundary
retention, degenerate sets, duplicates, and randomized equivalence
between the distributed monotone-chain reduction and the quadratic
all-left SQL oracle; registry parity is covered by
test_oracle_parity.py::test_query_matches_oracle[customer_hull]."""

from __future__ import annotations

import duckdb
import numpy as np

from geografir_spark.operators.hull import (
    convex_hull,
    hull_edges_sql,
    monotone_chain,
)


def _oracle(pts):
    con = duckdb.connect()
    con.execute("CREATE TABLE p (xm BIGINT, ym BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", [(int(a), int(b)) for a, b in pts])
    out = con.execute(hull_edges_sql("p", "xm", "ym", "duckdb")).fetchall()
    con.close()
    return sorted(out)


def _chain(pts):
    h = monotone_chain(np.asarray(pts, dtype=np.int64))
    return sorted((int(a), int(b)) for a, b in h)


def test_square_with_collinear_midpoints_and_interior():
    pts = [(0, 0), (4, 0), (4, 4), (0, 4), (2, 0), (0, 2), (2, 2), (1, 3)]
    want = [(0, 0), (0, 2), (0, 4), (2, 0), (4, 0), (4, 4)]
    assert _chain(pts) == want
    assert _oracle(pts) == want


def test_degenerate_collinear_and_duplicates():
    pts = [(0, 0), (1, 1), (2, 2), (3, 3), (1, 1), (2, 2)]
    want = [(0, 0), (1, 1), (2, 2), (3, 3)]  # all on the boundary segment
    assert _chain(pts) == want
    assert _oracle(pts) == want
    assert _chain([(5, 5)]) == [(5, 5)]
    assert _chain([(5, 5), (5, 5)]) == [(5, 5)]


def test_randomized_chain_matches_quadratic_oracle():
    rng = np.random.default_rng(1234)
    for _ in range(6):
        pts = rng.integers(-50, 50, size=(60, 2))
        assert _chain(pts) == _oracle(pts)


def test_distributed_reduction_matches_single_machine(spark):
    rng = np.random.default_rng(7)
    pts = [(int(a), int(b)) for a, b in rng.integers(-1000, 1000, size=(500, 2))]
    df = spark.createDataFrame(pts, "xm bigint, ym bigint").repartition(13)
    got = sorted((r["xm"], r["ym"]) for r in convex_hull(df, "xm", "ym").collect())
    assert got == _chain(pts)


def test_candidate_cap_guard(spark):
    import pytest as _pytest

    pts = [(i, i * i) for i in range(50)]  # strictly convex: all on hull
    df = spark.createDataFrame(pts, "xm bigint, ym bigint")
    with _pytest.raises(ValueError, match="max_candidates"):
        convex_hull(df, "xm", "ym", max_candidates=10)
    # and with an adequate cap the hull is all 50 points
    assert convex_hull(df, "xm", "ym").count() == 50
