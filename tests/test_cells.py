"""Cell-index correctness: three independent implementations must agree.

1. numpy (used inside pandas-UDF kernels),
2. Spark native SQL steps (the hot path),
3. DuckDB running the *identical* SQL fragments (the oracle).

Plus golden hand-computed cases and hierarchy/ring invariants.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from geografir_spark.geo import cells

rng = np.random.default_rng(42)


def _random_lonlat(n: int) -> tuple[np.ndarray, np.ndarray]:
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-90, 90, n)
    # sprinkle exact edges and boundaries
    lon[:4] = [-180.0, 180.0, 0.0, -0.0]
    lat[:4] = [-90.0, 90.0, 0.0, 45.0]
    return lon, lat


# -- golden hand-computed cases ------------------------------------------------

def test_encode_golden_res0():
    # res 0: single cell, morton 0 → cell = 0<<5 | 0
    assert cells.encode_np(0.0, 0.0, 0)[()] == 0


def test_encode_golden_res1():
    # res 1: 2x2 grid. (lon=1, lat=1) → xi=1, yi=1 → morton=3 → 3<<5|1 = 97
    assert cells.encode_np(1.0, 1.0, 1)[()] == 97
    # (lon=-1, lat=1) → xi=0, yi=1 → morton=2 → 2<<5|1 = 65
    assert cells.encode_np(-1.0, 1.0, 1)[()] == 65
    # (lon=1, lat=-1) → xi=1, yi=0 → morton=1 → 1<<5|1 = 33
    assert cells.encode_np(1.0, -1.0, 1)[()] == 33
    # (lon=-1, lat=-1) → morton=0 → 0<<5|1 = 1
    assert cells.encode_np(-1.0, -1.0, 1)[()] == 1


def test_parent_is_prefix():
    lon, lat = _random_lonlat(500)
    c9 = cells.encode_np(lon, lat, 9)
    c5 = cells.encode_np(lon, lat, 5)
    # parent via bit math == re-encode at coarser res
    got = ((c9 >> cells.RES_BITS) >> (2 * (9 - 5)) << cells.RES_BITS) | 5
    np.testing.assert_array_equal(got, c5)


def test_decode_roundtrip():
    lon, lat = _random_lonlat(1000)
    for res in (0, 1, 5, 9, 16, 26):
        c = cells.encode_np(lon, lat, res)
        xi, yi, r = cells.decode_np(c)
        np.testing.assert_array_equal(r, res)
        np.testing.assert_array_equal(
            c, cells.encode_idx_np(xi, yi, res)
        )
        # the decoded cell's bounds contain the point (clamped coords)
        minx, miny, maxx, maxy = cells.cell_bounds_np(c)
        lon_c = np.clip(lon, -180.0, np.nextafter(180.0, -np.inf))
        lat_c = np.clip(lat, -90.0, np.nextafter(90.0, -np.inf))
        assert ((lon_c >= minx - 1e-9) & (lon_c <= maxx + 1e-9)).all()
        assert ((lat_c >= miny - 1e-9) & (lat_c <= maxy + 1e-9)).all()


def test_ring_and_disk():
    c = int(cells.encode_np(10.0, 20.0, 9)[()])
    assert list(cells.ring_np(c, 0)) == [c]
    r1 = cells.ring_np(c, 1)
    assert len(r1) == 8 and len(set(r1.tolist())) == 8
    d2 = cells.disk_np(c, 2)
    assert len(d2) == 25
    assert set(cells.ring_np(c, 2).tolist()) == set(d2.tolist()) - set(
        cells.disk_np(c, 1).tolist()
    )
    # edge clipping: corner cell at res 1 has 3 neighbors
    corner = int(cells.encode_np(-179.9, -89.9, 1)[()])
    assert len(cells.ring_np(corner, 1)) == 3


def test_cover_bbox():
    res = 9
    cw, ch = cells.cell_size(res)
    cover = cells.cover_bbox_np(0.0, 0.0, 2.5 * cw, 1.5 * ch, res)
    assert len(cover) == 6  # 3 x 2 cells
    # every covered cell's bounds intersect the bbox
    minx, miny, maxx, maxy = cells.cell_bounds_np(cover)
    assert (minx < 2.5 * cw).all() and (maxx > 0).all()


# -- cross-engine parity --------------------------------------------------------

def test_duckdb_matches_numpy():
    lon, lat = _random_lonlat(2000)
    for res in (1, 9, 15, 26):
        expected = cells.encode_np(lon, lat, res)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE pts AS SELECT * FROM (SELECT unnest(?) lon, unnest(?) lat)",
            [lon.tolist(), lat.tolist()],
        )
        q = cells.nested_sql(
            "SELECT lon, lat FROM pts", cells.encode_steps("lon", "lat", res)
        )
        got = np.asarray(
            [r[0] for r in con.execute(f"SELECT cell FROM ({q})").fetchall()]
        )
        np.testing.assert_array_equal(got, expected)
        # parent expr parity
        pq = f"SELECT {cells.parent_sql('cell', max(res - 3, 0))} FROM ({q})"
        gotp = np.asarray([r[0] for r in con.execute(pq).fetchall()])
        np.testing.assert_array_equal(
            gotp, cells.encode_np(lon, lat, max(res - 3, 0))
        )
        con.close()


def test_spark_matches_numpy(spark):
    lon, lat = _random_lonlat(2000)
    expected = cells.encode_np(lon, lat, 9)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)], "lon double, lat double"
    )
    out = cells.with_cell(df, "lon", "lat", 9)
    got = np.asarray([r.cell for r in out.orderBy("lon", "lat").collect()])
    order = np.lexsort((lat, lon))
    np.testing.assert_array_equal(got, expected[order])
    # no Python in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # decode parity through with_xy
    xy = cells.with_xy(cells.with_cell(df, "lon", "lat", 9), "cell")
    rows = xy.orderBy("lon", "lat").collect()
    xi, yi, _ = cells.decode_np(expected[order])
    np.testing.assert_array_equal(np.asarray([r.cell_x for r in rows]), xi)
    np.testing.assert_array_equal(np.asarray([r.cell_y for r in rows]), yi)


def test_compact_uncompact_roundtrip():
    """compact/uncompact (H3 semantics): minimal multi-res set, identical
    union — uncompacting the compacted cover at the original res returns
    exactly the original cell set; a complete quad promotes to its parent."""
    from geografir_spark.geo.cells import (
        RES_MASK, compact_np, cover_bbox_np, uncompact_np,
    )

    res = 8
    cover = cover_bbox_np(-10.0, -10.0, 25.0, 20.0, res)
    compacted = compact_np(cover)
    assert len(compacted) < len(cover) / 2      # interior actually collapses
    assert len(np.unique(compacted & RES_MASK)) > 1  # multi-resolution
    back = uncompact_np(compacted, res)
    np.testing.assert_array_equal(back, np.sort(cover))

    # a single complete quad promotes to exactly its parent
    quad = cover_bbox_np(0.0, 0.0, 1e-9, 1e-9, 6)  # one res-6 cell
    children = uncompact_np(quad, 7)
    assert len(children) == 4
    np.testing.assert_array_equal(compact_np(children), np.sort(quad))

    # finer-than-target uncompact rejects
    import pytest as _pytest
    with _pytest.raises(ValueError):
        uncompact_np(children, 6)


def test_geohash_canonical_values():
    """Canonical geohashes (the Wikipedia reference point and the classic
    ezs42 example) + edge corners + prefix stability, via DuckDB so the
    shared fragment is exercised in the oracle dialect too."""
    import duckdb

    from geografir_spark.geo import cells

    cases = [
        (10.40744, 57.64911, 6, "u4pruy"),
        (10.40744, 57.64911, 11, "u4pruydqqvj"),
        (-5.603, 42.605, 5, "ezs42"),
        (-180.0, -90.0, 6, "000000"),
        (179.9999, 89.9999, 6, "zzzzzz"),
    ]
    con = duckdb.connect()
    for lon, lat, p, want in cases:
        sql = cells.nested_sql(
            f"SELECT {lon} AS lon, {lat} AS lat",
            cells.geohash_steps("lon", "lat", p),
        )
        assert con.execute(f"SELECT geohash FROM ({sql})").fetchone()[0] == want
    # prefix stability: p-char hash is the prefix of the (p+1)-char hash
    for p in (1, 2, 3, 4, 5):
        sqls = [
            cells.nested_sql(
                "SELECT 10.40744 AS lon, 57.64911 AS lat",
                cells.geohash_steps("lon", "lat", q),
            )
            for q in (p, p + 1)
        ]
        a, b = (con.execute(f"SELECT geohash FROM ({s})").fetchone()[0] for s in sqls)
        assert b.startswith(a)
    con.close()


def test_geohash_spark_matches_duckdb(spark):
    import duckdb

    from geografir_spark.geo import cells

    sql = cells.nested_sql(
        "SELECT -5.603 AS lon, 42.605 AS lat",
        cells.geohash_steps("lon", "lat", 7),
    )
    got = spark.sql(f"SELECT geohash FROM ({sql})").collect()[0][0]
    exp = duckdb.connect().execute(f"SELECT geohash FROM ({sql})").fetchone()[0]
    assert got == exp


def test_geohash_precision_bounds():
    import pytest as _pytest

    from geografir_spark.geo import cells

    for bad in (0, 13):
        with _pytest.raises(ValueError):
            cells.geohash_steps("lon", "lat", bad)


def test_hilbert_bijective_adjacent_and_cross_engine(spark):
    """Hilbert index: bijective over the lattice, consecutive indices are
    ALWAYS 4-adjacent cells (the property Morton lacks), numpy == DuckDB
    == Spark on the shared step list."""
    import duckdb
    import numpy as np

    from geografir_spark.geo import cells

    for res in (1, 2, 3):
        n = 1 << res
        xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        d = cells.hilbert_np(xs.ravel(), ys.ravel(), res)
        assert sorted(d.tolist()) == list(range(n * n))  # bijective
        pos = {int(dd): (int(a), int(b)) for dd, a, b in zip(d, xs.ravel(), ys.ravel())}
        assert all(
            abs(pos[k][0] - pos[k + 1][0]) + abs(pos[k][1] - pos[k + 1][1]) == 1
            for k in range(n * n - 1)
        )  # unit-step adjacency
    # canonical res-1 order
    assert cells.hilbert_np(
        np.array([0, 0, 1, 1]), np.array([0, 1, 1, 0]), 1
    ).tolist() == [0, 1, 2, 3]
    # cross-engine on res 4
    res, n = 4, 16
    sql = cells.nested_sql(
        "SELECT t1.xi, t2.yi FROM (SELECT unnest(range(0, 16)) AS xi) t1,"
        " (SELECT unnest(range(0, 16)) AS yi) t2",
        cells.hilbert_steps("xi", "yi", res),
    )
    duck = {
        (r[0], r[1]): r[2]
        for r in duckdb.connect().execute(
            f"SELECT xi, yi, hilbert FROM ({sql})"
        ).fetchall()
    }
    grid = (
        spark.range(0, 16).selectExpr("id AS xi")
        .crossJoin(spark.range(0, 16).selectExpr("id AS yi"))
    )
    sdf = cells.apply_steps(grid, cells.hilbert_steps("xi", "yi", res))
    got = {(r["xi"], r["yi"]): r["hilbert"] for r in sdf.select("xi", "yi", "hilbert").collect()}
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ref = dict(zip(zip(xs.ravel().tolist(), ys.ravel().tolist()),
                   cells.hilbert_np(xs.ravel(), ys.ravel(), res).tolist()))
    assert got == duck == ref
