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
