"""Physical-plan audits: the scale properties the engine promises must be
visible in `.explain` output, not just claimed.

- filter pushdown + column pruning reach the parquet scan
- dimension joins broadcast; big aggregations are partial+final
- NO query in the registry ever plans a row-at-a-time Python node
  (BatchEvalPython) — Arrow-batched nodes (ArrowEvalPython, MapInPandas,
  FlatMapGroupsInPandas) are the only Python allowed (north_star).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushdown(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .filter(F.col("l_orderkey") > 1000)
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    # (no IsNotNull: session disables constraint propagation, session.py)
    assert "PushedFilters: [GreaterThan(l_orderkey,1000)]" in plan
    # column pruning: the scan reads exactly the two projected columns
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_comment" not in rs and "l_partkey" not in rs


def test_dimension_join_broadcasts(spark):
    from geografir_spark.queries import QUERIES

    plan = _plan(QUERIES["nation_envelope"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_flagship_agg_is_partial_plus_final(spark):
    from geografir_spark.queries import QUERIES

    plan = _plan(QUERIES["pages_per_cell"].fn(spark, SF_DIR))
    # map-side partial agg before the exchange, final after
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning(cell" in plan


@pytest.mark.parametrize("name", sorted(
    __import__("geografir_spark.queries", fromlist=["QUERIES"]).QUERIES
))
def test_no_row_python_anywhere(spark, name):
    """north_star: zero per-row Python on any hot path, for EVERY query."""
    from geografir_spark.queries import QUERIES

    plan = _plan(QUERIES[name].fn(spark, SF_DIR))
    assert "BatchEvalPython" not in plan, f"{name} plans row-at-a-time Python"
