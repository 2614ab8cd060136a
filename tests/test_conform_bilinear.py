"""Bilinear resampling goldens for the conform kernel (r3 verdict item #7).

The reference's ``conform_to`` accepts any ``rasterio.warp.Resampling``
(raster_array/src/raster_array/raster_array.py:163,209) but its own test
matrix exercises only nearest; this module pins the vendored bilinear kernel
against hand-computed expectations of the GDAL convention: 4-corner
center-weighted average, nodata/out-of-grid corners excluded with weight
renormalization, all-invalid → nodata, integer outputs rounded half away
from zero.
"""

from __future__ import annotations

import numpy as np
import pytest

from geografir_spark.raster import model
from geografir_spark.raster.conform import conform_np, conform_tiles


def _nup(width, height, bounds=(None,) * 4):
    minx, miny, maxx, maxy = bounds
    if minx is None:
        minx, miny, maxx, maxy = 0.0, 0.0, float(width), float(height)
    return ((maxx - minx) / width, 0.0, minx, 0.0, -(maxy - miny) / height, maxy)


def _conform(src_data, src_nodata, ref_data, ref_nodata, src_bounds=None,
             ref_bounds=None, **kw):
    src = np.asarray(src_data)
    ref = np.asarray(ref_data)
    return conform_np(
        src,
        _nup(src.shape[2], src.shape[1], src_bounds or (None,) * 4),
        "EPSG:4326",
        src_nodata,
        model.mask_np(ref, ref_nodata),
        _nup(ref.shape[2], ref.shape[1], ref_bounds or (None,) * 4),
        "EPSG:4326",
        ref.shape[1],
        ref.shape[2],
        **kw,
    )


def test_bilinear_identity_grid_is_exact():
    """Same grid: every sample lands exactly on a pixel center → bilinear
    reproduces the source bit-for-bit (and matches nearest)."""
    src = np.arange(1, 17, dtype=np.float64).reshape((1, 4, 4))
    ref = np.ones((1, 4, 4))
    out, nodata, dtype = _conform(src, -1, ref, 0, resampling="bilinear")
    assert np.array_equal(out, src)
    assert nodata == -1 and dtype == "float64"


def test_bilinear_half_pixel_shift_averages_neighbors():
    """Target grid shifted +0.5 px in x: each interior sample is the mean
    of two horizontal neighbors; the last column has only its left
    neighbor in-grid → renormalizes to the edge value."""
    src = np.array([[[0.0, 10.0, 20.0, 30.0]]])  # (1,1,4), bounds (0,0,4,1)
    ref = np.ones((1, 1, 4))
    out, _, _ = _conform(
        src, -1, ref, -1,
        ref_bounds=(0.5, 0.0, 4.5, 1.0),
        resampling="bilinear",
    )
    assert out[0, 0].tolist() == [5.0, 15.0, 25.0, 30.0]


def test_bilinear_2x_upsample_weights():
    """2× upsample of a 2×2 ramp: corner output pixels coincide with source
    centers after renormalization at the border; the interior carries
    exact 0.75/0.25 weights."""
    src = np.array([[[0.0, 4.0], [8.0, 12.0]]])  # bounds (0,0,2,2)
    ref = np.ones((1, 4, 4))
    out, _, _ = _conform(
        src, -1, ref, -1,
        ref_bounds=(0.0, 0.0, 2.0, 2.0),
        resampling="bilinear",
    )
    # sample xs at source-pixel coords 0.25/0.75/1.25/1.75 → gx -0.25..1.25
    row0 = out[0, 0].tolist()
    assert row0 == pytest.approx([0.0, 1.0, 3.0, 4.0])
    # row weights mirror column weights on the y axis
    col0 = out[0, :, 0].tolist()
    assert col0 == pytest.approx([0.0, 2.0, 6.0, 8.0])


def test_bilinear_nodata_neighbor_renormalizes():
    """A nodata corner drops out and the remaining weights renormalize —
    the half-shift sample next to the hole returns its sole valid
    neighbor, not a value dragged toward nodata."""
    src = np.array([[[0.0, -1.0, 20.0, 30.0]]])
    ref = np.ones((1, 1, 4))
    out, _, _ = _conform(
        src, -1, ref, -1,
        ref_bounds=(0.5, 0.0, 4.5, 1.0),
        resampling="bilinear",
    )
    # sample between 0 and -1(nodata) → 0; between -1 and 20 → 20
    assert out[0, 0].tolist() == [0.0, 20.0, 25.0, 30.0]


def test_bilinear_all_invalid_is_nodata_and_ref_mask_merges():
    """Samples mapping wholly outside the source grid are nodata; the
    reference mask still burns through afterwards."""
    src = np.array([[[1.0, 2.0], [3.0, 4.0]]])
    ref = np.array([[[1.0, -9.0], [1.0, 1.0]]])
    out, _, _ = _conform(
        src, -5, ref, -9.0,
        ref_bounds=(10.0, 10.0, 12.0, 12.0),  # disjoint from source
        resampling="bilinear",
    )
    assert np.all(out == -5)


def test_bilinear_integer_rounds_half_away_from_zero():
    src = np.array([[[1, 2, 2, 3]]], dtype=np.int16)
    ref = np.ones((1, 1, 4))
    out, _, dtype = _conform(
        src, -1, ref, -1,
        ref_bounds=(0.5, 0.0, 4.5, 1.0),
        resampling="bilinear",
    )
    # midpoints 1.5, 2.0, 2.5 → GDAL-style round half away from zero
    assert out[0, 0].tolist() == [2, 2, 3, 3]
    assert dtype == "int16"


def test_unknown_resampling_raises():
    src = np.ones((1, 2, 2))
    with pytest.raises(ValueError, match="resampling"):
        _conform(src, -1, src, -1, resampling="lanczos")


def test_conform_tiles_bilinear_distributed(spark):
    """The distributed operator threads resampling through to the kernel:
    a half-pixel-shifted ref tile yields the neighbor averages."""
    src = np.array([[[0.0, 10.0, 20.0, 30.0]]])
    ref = np.ones((1, 1, 4))

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

    src_df = spark.createDataFrame(
        [row(1, src, (0.0, 0.0, 4.0, 1.0))], model.TILE_SCHEMA
    )
    ref_df = spark.createDataFrame(
        [row(1, ref, (0.5, 0.0, 4.5, 1.0))], model.TILE_SCHEMA
    )
    got = conform_tiles(src_df, ref_df, resampling="bilinear").collect()[0]
    assert got.pixels == [5.0, 15.0, 25.0, 30.0]
    with pytest.raises(ValueError, match="resampling"):
        conform_tiles(src_df, ref_df, resampling="lanczos")
