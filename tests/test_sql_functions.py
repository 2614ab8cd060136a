"""SQL-facing function registry: every registered SQL UDF must agree with
the DataFrame-operator fragment it is folded from."""

from __future__ import annotations

import numpy as np


def test_sql_functions_match_operators(spark):
    from geografir_spark.functions import register_sql_functions
    from geografir_spark.geo import cells

    names = register_sql_functions(spark)
    assert "cell_encode" in names

    pts = spark.createDataFrame(
        [(i, -179.9 + i * 7.3, -89.9 + i * 3.7) for i in range(49)],
        "i LONG, lon DOUBLE, lat DOUBLE",
    )
    pts.createOrReplaceTempView("pts")
    for res in (3, 9, 14):
        got = {
            r["i"]: r["c"]
            for r in spark.sql(
                f"SELECT i, cell_encode(lon, lat, {res}) AS c FROM pts"
            ).collect()
        }
        exp_df = cells.with_cell(pts, "lon", "lat", res)
        exp = {r["i"]: r["cell"] for r in exp_df.collect()}
        assert got == exp, f"res {res}"
        # numpy third implementation agrees too
        rows = sorted(exp_df.collect(), key=lambda r: r["i"])
        np_cells = cells.encode_np(
            np.array([r["lon"] for r in rows]),
            np.array([r["lat"] for r in rows]),
            res,
        )
        assert [r["cell"] for r in rows] == list(np_cells)

    row = spark.sql(
        "SELECT cell_res(cell_encode(10.0, 20.0, 9)) AS r,"
        " cell_parent(cell_encode(10.0, 20.0, 9), 4) AS p,"
        " cell_encode(10.0, 20.0, 4) AS p_direct,"
        " doc_fingerprint('hello world') AS fp,"
        " n_tokens('a b  c') AS nt,"
        " s3_uri('b', 'k/x.tif') AS uri,"
        " is_directory('k/') AS isdir,"
        " path_extend('k/', '/a.bin') AS ext"
    ).collect()[0]
    assert row["r"] == 9
    assert row["p"] == row["p_direct"]
    import hashlib
    assert row["fp"] == hashlib.md5(b"hello world").hexdigest()[:16]
    assert row["uri"] == "s3://b/k/x.tif"
    assert row["isdir"] is True
    assert row["ext"] == "k/a.bin"
