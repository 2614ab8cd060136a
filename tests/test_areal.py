"""Areal interpolation semantics (operators/areal.py): exact overlap
weights on hand-built rectangles, measure conservation, boundary-touch
exclusion; registry parity is covered by
test_oracle_parity.py::test_query_matches_oracle[areal_interp]."""

from __future__ import annotations

import duckdb

from geografir_spark.operators.areal import areal_interp_sql

# src 1: 10x10 at (0,0), pop 1000 — split 60/40 between targets A and B
# src 2: 4x5 at (20,0), pop 500 — fully inside target B
# src 3: touches target A only along an edge (zero-area overlap: excluded)
_SRC = "(VALUES (1, 0.0, 0.0, 10.0, 10.0, 1000), (2, 20.0, 0.0, 24.0, 5.0, 500), (3, -8.0, 0.0, 0.0, 4.0, 700)) s(src_id, minx, miny, maxx, maxy, pop)"
_TGT = "(VALUES (10, 0.0, 0.0, 6.0, 10.0), (20, 6.0, 0.0, 30.0, 10.0)) t(tgt_id, minx, miny, maxx, maxy)"


def test_areal_weights_exact_and_conserving():
    con = duckdb.connect()
    df = con.execute(
        areal_interp_sql(_SRC, _TGT, "pop", "duckdb")
    ).fetchdf().set_index("tgt_id")
    con.close()
    # target 10: 60% of src 1 = 600.0 exactly representable
    assert df.loc[10, "est_micro"] == 600 * 1_000_000
    assert df.loc[10, "n_src_parts"] == 1  # src 3 edge-touch excluded
    # target 20: 40% of src 1 + 100% of src 2 = 400 + 500
    assert df.loc[20, "est_micro"] == 900 * 1_000_000
    assert df.loc[20, "n_src_parts"] == 2
    # conservation: fully-covered sources' mass is preserved across targets
    assert df.est_micro.sum() == 1500 * 1_000_000


def test_areal_spark_matches_duckdb(spark):
    sql_s = areal_interp_sql(_SRC, _TGT, "pop", "spark")
    got = spark.sql(sql_s).toPandas().sort_values("tgt_id").reset_index(drop=True)
    con = duckdb.connect()
    exp = (
        con.execute(areal_interp_sql(_SRC, _TGT, "pop", "duckdb"))
        .fetchdf().sort_values("tgt_id").reset_index(drop=True)
    )
    con.close()
    assert got.est_micro.tolist() == exp.est_micro.tolist()
    assert got.n_src_parts.tolist() == exp.n_src_parts.tolist()
