"""Focal-stats halo exchange vs a single-array brute force: assemble the
whole mosaic in numpy, compute masked 3×3 sums directly, and require the
distributed (strip-exchange) results to match per tile — including mosaic-
boundary tiles whose outer pixels lack kernel support."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiles_df(spark):
    # 3×4 tile mosaic, deterministic values, nodata sprinkled
    rows = []
    for xi in range(3):
        for yi in range(4):
            cell = xi * 100 + yi
            px = [
                -1.0 if (i * 7 + xi + yi) % 11 == 0 else float(cell % 17 + i)
                for i in range(64)
            ]
            rows.append((cell, xi, yi, px))
    return spark.createDataFrame(
        rows, "cell LONG, xi LONG, yi LONG, pixels ARRAY<DOUBLE>"
    )


def _mosaic(rows):
    # global lattice: gx = xi*8 + c, gy = yi*8 + (7 - r); build array indexed
    # [gy][gx] then compute focal sums directly
    G = np.full((4 * 8, 3 * 8), np.nan)
    for cell, xi, yi, px in rows:
        arr = np.asarray(px).reshape(8, 8)
        for r in range(8):
            for c in range(8):
                G[yi * 8 + (7 - r), xi * 8 + c] = arr[r, c]
    return G


def test_focal_matches_bruteforce(spark, tiles_df):
    from geografir_spark.raster.focal import focal_stats_tiles

    rows = [(r["cell"], r["xi"], r["yi"], r["pixels"]) for r in tiles_df.collect()]
    G = _mosaic(rows)
    H, W = G.shape
    contrib = np.where(np.isnan(G) | (G == -1.0), 0.0, G)

    expected = {}
    for cell, xi, yi, _ in rows:
        n_px, s, mx = 0, 0.0, None
        for r in range(8):
            for c in range(8):
                gy, gx = yi * 8 + (7 - r), xi * 8 + c
                if gy - 1 < 0 or gy + 1 >= H or gx - 1 < 0 or gx + 1 >= W:
                    continue  # no full 3×3 support at the mosaic edge
                f = contrib[gy - 1 : gy + 2, gx - 1 : gx + 2].sum()
                n_px += 1
                s += f
                mx = f if mx is None else max(mx, f)
        expected[cell] = (n_px, s, mx)

    got = {
        r["cell"]: (r["n_px"], r["sum_focal"], r["max_focal"])
        for r in focal_stats_tiles(tiles_df).collect()
    }
    assert set(got) == set(expected)
    for cell in expected:
        en, es, em = expected[cell]
        gn, gs, gm = got[cell]
        assert gn == en, cell
        assert gs == es, cell
        assert gm == em, cell
    # interior tiles have all 64 pixels supported; corner tiles only 49
    assert got[101][0] == 64  # xi=1, yi=1 interior
    assert got[0][0] == 49    # xi=0, yi=0 corner


def test_halo_messages_shape(spark, tiles_df):
    from geografir_spark.raster.focal import halo_messages

    msgs = halo_messages(tiles_df)
    assert msgs.count() == 12 * 8  # 8 messages per tile
    # strips are perimeter-sized: 4 edges of 8 + 4 corners of 1 per tile
    sizes = sorted(
        r["n"] for r in msgs.selectExpr("size(vals) AS n").groupBy("n").count()
        .selectExpr("n").collect()
    )
    assert sizes == [1, 8]


def test_slope_matches_bruteforce(spark, tiles_df):
    """Horn squared-gradient via halo exchange vs whole-mosaic numpy brute
    force — including the stricter support rule (any nodata in the 3×3
    window voids the pixel, unlike focal sum's zero-fill)."""
    from geografir_spark.raster.focal import slope_stats_tiles

    rows = [(r["cell"], r["xi"], r["yi"], r["pixels"]) for r in tiles_df.collect()]
    G = _mosaic(rows)
    H, W = G.shape
    bad = np.isnan(G) | (G == -1.0)
    wx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=float)

    expected = {}
    for cell, xi, yi, _ in rows:
        n_px, s, mx = 0, 0, None
        for r in range(8):
            for c in range(8):
                gy, gx = yi * 8 + (7 - r), xi * 8 + c
                if gy - 1 < 0 or gy + 1 >= H or gx - 1 < 0 or gx + 1 >= W:
                    continue
                win = G[gy - 1 : gy + 2, gx - 1 : gx + 2]
                if bad[gy - 1 : gy + 2, gx - 1 : gx + 2].any():
                    continue  # derivative over a hole = fabricated cliff
                # note G is indexed [gy][gx] with gy increasing NORTH, so
                # win rows run south→north; wx is symmetric under row flip
                # and wx.T under column flip, so the squared sums agree
                gxn = int((wx * win).sum())
                gyn = int((wx.T * win).sum())
                s2 = gxn * gxn + gyn * gyn
                n_px += 1
                s += s2
                mx = s2 if mx is None else max(mx, s2)
        expected[cell] = (n_px, s, mx)

    got = {
        r["cell"]: (r["n_px"], r["sum_slope2"], r["max_slope2"])
        for r in slope_stats_tiles(tiles_df).collect()
    }
    assert got == expected


def test_slope_flat_surface_is_zero(spark):
    """A constant mosaic has zero gradient everywhere supported."""
    from geografir_spark.raster.focal import slope_stats_tiles

    rows = [
        (xi * 10 + yi, xi, yi, [5.0] * 64)
        for xi in range(2)
        for yi in range(2)
    ]
    df = spark.createDataFrame(
        rows, "cell LONG, xi LONG, yi LONG, pixels ARRAY<DOUBLE>"
    )
    out = slope_stats_tiles(df).collect()
    assert all(r["sum_slope2"] == 0 and r["max_slope2"] == 0 for r in out)
    assert sum(r["n_px"] for r in out) == (16 - 2) * (16 - 2)
