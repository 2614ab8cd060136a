"""Cubic + average resampling goldens for the conform kernel (r4 verdict
next-round item #3).

The reference's ``conform_to`` accepts any ``rasterio.warp.Resampling``
(raster_array/src/raster_array/raster_array.py:163,209); after nearest (r1)
and bilinear (r4) these pin the two modes a raster user reaches for next —
``cubic`` (Keys a=-0.5 4×4 convolution, GDAL's default coefficient) and
``average`` (box mean over the transformed footprint, the COG-overview
mode). Matrix per mode: identity / shift / up-down-sample / nodata
renormalization / integer rounding, mirroring test_conform_bilinear.py.
The nearest + bilinear goldens in that module are untouched by r5.
"""

from __future__ import annotations

import numpy as np
import pytest

from geografir_spark.raster import model
from geografir_spark.raster.conform import conform_np, conform_tiles

from tests.test_conform_bilinear import _conform, _nup


# ---------------------------------------------------------------- cubic --

def test_cubic_identity_grid_is_exact():
    """Keys kernel is exact at integer offsets (w(0)=1, w(±1)=w(±2)=0):
    same grid reproduces the source bit-for-bit."""
    src = np.arange(1, 26, dtype=np.float64).reshape((1, 5, 5))
    ref = np.ones((1, 5, 5))
    out, nodata, dtype = _conform(src, -1, ref, 0, resampling="cubic")
    assert np.array_equal(out, src)
    assert nodata == -1 and dtype == "float64"


def test_cubic_interior_ramp_interpolates_linearly():
    """Catmull-Rom (a=-0.5) reproduces linear ramps exactly wherever the
    full 4-tap stencil is in-grid: a +0.5-pixel-shifted window over a ramp
    returns the ramp's midpoint values. Hand check of the tap weights at
    fx=0.5: [-0.0625, 0.5625, 0.5625, -0.0625] (sum 1)."""
    src = np.array([[np.arange(0.0, 80.0, 10.0)]])  # 1×1×8, bounds (0,0,8,1)
    ref = np.ones((1, 1, 4))
    out, _, _ = _conform(
        src, -1, ref, -1,
        ref_bounds=(2.5, 0.0, 6.5, 1.0),  # samples at x = 3,4,5,6
        resampling="cubic",
    )
    assert out[0, 0].tolist() == pytest.approx([25.0, 35.0, 45.0, 55.0])


def test_cubic_undershoots_at_step_edge_float():
    """The negative lobe is real: sampling 0.25 px left of a 0→100 step
    (fx=0.75 → tap weights [-0.0234375, 0.2265625, 0.8671875, -0.0703125])
    lands at -7.03125 — below the source minimum."""
    src = np.array([[[0.0, 0.0, 0.0, 100.0, 100.0, 100.0]]])
    ref = np.ones((1, 1, 1))
    out, _, _ = _conform(
        src, -999, ref, -999,
        ref_bounds=(1.75, 0.0, 2.75, 1.0),  # sample at x=2.25 → gx=1.75
        resampling="cubic",
    )
    assert out[0, 0, 0] == pytest.approx(-7.03125)


def test_cubic_integer_output_rounds_and_clips_overshoot():
    """Same undershoot with a uint8 output: round half away from zero gives
    -7, which must clip to the dtype lattice (0), never wrap to 249."""
    src = np.array([[[0, 0, 0, 100, 100, 100]]], dtype=np.uint8)
    ref = np.ones((1, 1, 1))
    out, _, dtype = _conform(
        src, 255, ref, -1,
        ref_bounds=(1.75, 0.0, 2.75, 1.0),
        resampling="cubic",
    )
    assert dtype == "uint8"
    assert out[0, 0, 0] == 0


def test_cubic_nodata_taps_renormalize_on_constant_field():
    """Surviving-weight renormalization: on a constant-valued source with
    nodata holes, every output with ANY surviving support is exactly the
    constant (acc = v·wsum), never a value dragged toward nodata."""
    src = np.full((1, 6, 6), 7.0)
    src[0, 2, 3] = -1.0  # hole
    src[0, 4, 1] = -1.0
    ref = np.ones((1, 6, 6))
    out, _, _ = _conform(
        src, -1, ref, -1,
        src_bounds=(0.0, 0.0, 6.0, 6.0),
        ref_bounds=(0.25, 0.25, 6.25, 6.25),  # fractional shift
        resampling="cubic",
    )
    valid = out != -1.0
    assert valid.any()
    assert np.allclose(out[valid], 7.0)


def test_cubic_disjoint_grid_is_all_nodata():
    src = np.array([[[1.0, 2.0], [3.0, 4.0]]])
    ref = np.ones((1, 2, 2))
    out, _, _ = _conform(
        src, -5, ref, -1,
        ref_bounds=(10.0, 10.0, 12.0, 12.0),
        resampling="cubic",
    )
    assert np.all(out == -5)


# -------------------------------------------------------------- average --

def test_average_identity_grid_is_exact():
    """Each 1×1 footprint holds exactly its own pixel center."""
    src = np.arange(1, 17, dtype=np.float64).reshape((1, 4, 4))
    ref = np.ones((1, 4, 4))
    out, _, _ = _conform(src, -1, ref, 0, resampling="average")
    assert np.array_equal(out, src)


def test_average_2x_downsample_is_block_mean():
    src = np.arange(1, 17, dtype=np.float64).reshape((1, 4, 4))
    ref = np.ones((1, 2, 2))
    out, _, _ = _conform(
        src, -1, ref, -1,
        ref_bounds=(0.0, 0.0, 4.0, 4.0),
        resampling="average",
    )
    assert out[0].tolist() == [[3.5, 5.5], [11.5, 13.5]]


def test_average_excludes_nodata_and_empty_block_is_nodata():
    """One hole in a block → mean of the surviving 3; an all-nodata block
    → nodata out."""
    src = np.array([[
        [2.0, 4.0, -1.0, -1.0],
        [6.0, -1.0, -1.0, -1.0],
        [1.0, 1.0, 5.0, 5.0],
        [1.0, 1.0, 5.0, 5.0],
    ]])
    ref = np.ones((1, 2, 2))
    out, _, _ = _conform(
        src, -1, ref, -1,
        ref_bounds=(0.0, 0.0, 4.0, 4.0),
        resampling="average",
    )
    assert out[0].tolist() == [[4.0, -1.0], [1.0, 5.0]]


def test_average_upsample_degrades_to_nearest():
    """2× upsample: every sub-pixel footprint is empty or single-center —
    output equals the nearest-neighbor result, GDAL's average behavior."""
    src = np.array([[[10.0, 20.0], [30.0, 40.0]]])
    ref = np.ones((1, 4, 4))
    kw = dict(ref_bounds=(0.0, 0.0, 2.0, 2.0))
    avg, _, _ = _conform(src, -1, ref, -1, resampling="average", **kw)
    near, _, _ = _conform(src, -1, ref, -1, resampling="nearest", **kw)
    assert np.array_equal(avg, near)


def test_average_integer_output_rounds_half_away_from_zero():
    src = np.array([[[1, 2], [3, 4]]], dtype=np.int16)  # mean 2.5
    ref = np.ones((1, 1, 1))
    out, _, dtype = _conform(
        src, -1, ref, -1,
        ref_bounds=(0.0, 0.0, 2.0, 2.0),
        resampling="average",
    )
    assert dtype == "int16" and out[0, 0, 0] == 3


def test_average_ref_mask_burns_through():
    src = np.arange(1, 17, dtype=np.float64).reshape((1, 4, 4))
    ref = np.array([[[1.0, -9.0], [1.0, 1.0]]])
    out, _, _ = _conform(
        src, -1, ref, -9.0,
        ref_bounds=(0.0, 0.0, 4.0, 4.0),
        resampling="average",
    )
    assert out[0].tolist() == [[3.5, -1.0], [11.5, 13.5]]


# -------------------------------------------------- distributed plumbing --

@pytest.mark.parametrize(
    ("mode", "want"),
    [
        ("cubic", [25.0, 35.0, 45.0, 55.0]),
        ("average", [1.5, 3.5, 5.5, 7.5]),
    ],
)
def test_conform_tiles_threads_new_modes(spark, mode, want):
    """The distributed operator accepts and threads the r5 modes; values
    match the kernel goldens above."""
    if mode == "cubic":
        src = np.array([[np.arange(0.0, 80.0, 10.0)]])
        src_bounds, ref_bounds = (0.0, 0.0, 8.0, 1.0), (2.5, 0.0, 6.5, 1.0)
        ref = np.ones((1, 1, 4))
    else:
        src = np.array([[np.arange(1.0, 9.0)]])  # 1×1×8
        src_bounds, ref_bounds = (0.0, 0.0, 8.0, 1.0), (0.0, 0.0, 8.0, 1.0)
        ref = np.ones((1, 1, 4))  # 2× downsample → pair means

    def row(tid, data, bounds):
        data = np.asarray(data)
        c, h, w = data.shape
        return {
            "tile_id": tid, "cell": 0, "crs": "EPSG:4326",
            "count": c, "width": w, "height": h,
            "dtype": data.dtype.name, "nodata": -1.0,
            "transform": list(_nup(w, h, bounds)),
            "pixels": data.astype(np.float64).ravel().tolist(),
        }

    src_df = spark.createDataFrame([row(1, src, src_bounds)], model.TILE_SCHEMA)
    ref_df = spark.createDataFrame([row(1, ref, ref_bounds)], model.TILE_SCHEMA)
    got = conform_tiles(src_df, ref_df, resampling=mode).collect()[0]
    assert got.pixels == pytest.approx(want)
