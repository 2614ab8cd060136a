"""Pyramid (2×2 max-pool overview) semantics — quadrant placement, partial
parents at the mosaic edge, nodata pooling; registry parity is covered by
test_oracle_parity.py::test_query_matches_oracle[tile_pyramid]."""

from __future__ import annotations

import numpy as np

from geografir_spark.geo.cells import encode_idx_np
from geografir_spark.raster.pyramid import pyramid_stats


def _tiles(spark, rows):
    return spark.createDataFrame(
        rows, "cell LONG, xi LONG, yi LONG, pixels ARRAY<DOUBLE>"
    )


def test_quadrant_placement_and_checksum(spark):
    # 4 children of parent (xi,yi)=(1,1) at res 4: (2,2),(3,2),(2,3),(3,3).
    # Each child is constant-valued, so every pooled quadrant is flat and
    # the checksum isolates WHERE each quadrant landed.
    rows = [
        (0, 2, 2, [1.0] * 64),  # SW child -> parent rows 4-7, cols 0-3
        (1, 3, 2, [2.0] * 64),  # SE child -> rows 4-7, cols 4-7
        (2, 2, 3, [3.0] * 64),  # NW child -> rows 0-3, cols 0-3
        (3, 3, 3, [4.0] * 64),  # NE child -> rows 0-3, cols 4-7
    ]
    out = pyramid_stats(_tiles(spark, rows), res_child=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r["cell"] == int(encode_idx_np(np.array([1]), np.array([1]), 3)[0])
    assert r["n_px"] == 64 and r["n_valid"] == 64
    assert r["sum_valid"] == 16 * (1 + 2 + 3 + 4)
    assert r["max_val"] == 4
    # checksum = sum over pos of (pos+1)*val with the quadrant layout above
    expect = 0
    for pr in range(8):
        for pc in range(8):
            val = (3 if pc < 4 else 4) if pr < 4 else (1 if pc < 4 else 2)
            expect += (pr * 8 + pc + 1) * val
    assert r["checksum"] == expect


def test_partial_parent_and_nodata_pooling(spark):
    # single child (xi=3, yi=2): parent (1,1) gets only its SE quadrant ->
    # n_px = 16; one 2x2 block all-nodata pools to nodata
    px = [5.0] * 64
    for i in (0, 1, 8, 9):  # top-left 2x2 block (pooled j=0) -> all nodata
        px[i] = -1.0
    out = pyramid_stats(_tiles(spark, [(0, 3, 2, px)]), res_child=4).collect()
    r = out[0]
    assert r["cell"] == int(encode_idx_np(np.array([1]), np.array([1]), 3)[0])
    assert r["n_px"] == 16
    assert r["n_valid"] == 15  # the all-nodata block stays nodata
    assert r["sum_valid"] == 15 * 5
    assert r["max_val"] == 5
    # a mixed block (some nodata, some valid) pools to the valid max
    px2 = [7.0] * 64
    px2[0] = -1.0  # one nodata inside an otherwise-valid block
    r2 = pyramid_stats(_tiles(spark, [(0, 3, 2, px2)]), res_child=4).collect()[0]
    assert r2["n_valid"] == 16 and r2["max_val"] == 7
