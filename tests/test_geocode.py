"""Geocode parity + semantics tests."""

from __future__ import annotations

import duckdb
import pytest

from geografir_spark.geo import cells, geocode

DOCS = [
    (0, "office at 37.7749, -122.4194 near the bay"),
    (1, "plain text with no coordinates at all"),
    (2, "bad pair 95.0, 10.0 is invalid latitude"),  # |lat|>90 → fallback
    (3, "negative -33.8688, 151.2093 sydney"),
    (4, "int pair 37, -122 does not match (needs decimals)"),
    (5, "edge 90.0, 180.0 valid extreme"),
    (6, "two pairs 10.5, 20.5 then 30.5, 40.5 takes the first"),
]


def _duck_geocode():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (SELECT unnest(?) AS doc_id, unnest(?) AS text)",
        [[d[0] for d in DOCS], [d[1] for d in DOCS]],
    )
    q = cells.nested_sql(
        "SELECT doc_id, text FROM docs",
        geocode.geocode_steps("text", "doc_id", "duckdb"),
    )
    rows = con.execute(f"SELECT doc_id, lon, lat FROM ({q}) ORDER BY doc_id").fetchall()
    con.close()
    return rows


def test_geocode_semantics_duckdb():
    rows = _duck_geocode()
    by_id = {r[0]: (r[1], r[2]) for r in rows}
    assert by_id[0] == (-122.4194, 37.7749)
    assert by_id[3] == (151.2093, -33.8688)
    assert by_id[5] == (180.0, 90.0)
    assert by_id[6] == (20.5, 10.5)
    # fallback rows: deterministic pseudo-coords in range
    for i in (1, 2, 4):
        lon, lat = by_id[i]
        assert -180 <= lon < 180 and -90 <= lat < 90
    # fallback formula pinned
    assert by_id[1] == ((1 * 40503 % 360000) / 1000.0 - 180.0,
                        (1 * 69069 % 180000) / 1000.0 - 90.0)


def test_geocode_spark_matches_duckdb(spark):
    expected = _duck_geocode()
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    out = geocode.with_geocode(df, "text", "doc_id")
    got = [
        (r.doc_id, r.lon, r.lat)
        for r in out.select("doc_id", "lon", "lat").orderBy("doc_id").collect()
    ]
    assert got == expected
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_geocode_preserves_text(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    out = geocode.with_geocode(df, "text", "doc_id")
    assert [r.text for r in out.orderBy("doc_id").collect()] == [d[1] for d in DOCS]
