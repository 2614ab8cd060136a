"""Raster model + conform kernel tests — direct ports of the reference's
golden matrix (raster_array/tests/test_raster_array.py:192-465,
test_raster_metadata.py:162-202), run through both the numpy kernel and the
distributed conform_tiles operator."""

from __future__ import annotations

import numpy as np
import pytest

from geografir_spark.raster import model
from geografir_spark.raster.conform import conform_np, conform_tiles


def _nup(width, height, bounds=(None,) * 4):
    """north-up transform for bounds (minx,miny,maxx,maxy) defaulting to
    the reference's generate_raster grid (0, 0, width, height)."""
    minx, miny, maxx, maxy = bounds
    if minx is None:
        minx, miny, maxx, maxy = 0.0, 0.0, float(width), float(height)
    return ((maxx - minx) / width, 0.0, minx, 0.0, -(maxy - miny) / height, maxy)


def _conform(src_data, src_nodata, ref_data, ref_nodata, **kw):
    src = np.asarray(src_data)
    ref = np.asarray(ref_data)
    out, out_nodata, out_dtype = conform_np(
        src,
        _nup(src.shape[2], src.shape[1]),
        "EPSG:4326",
        src_nodata,
        model.mask_np(ref, ref_nodata),
        _nup(ref.shape[2], ref.shape[1]),
        "EPSG:4326",
        ref.shape[1],
        ref.shape[2],
        **kw,
    )
    return out, out_nodata, out_dtype


# -- conform golden matrix (test_raster_array.py:192-465) ----------------------

def test_conform_simple():
    src = np.arange(1, 17).reshape((1, 4, 4)).astype(np.int16)
    ref = np.ones((1, 2, 2), dtype=np.uint8)
    out, nodata, dtype = _conform(src, 0, ref, 0)
    np.testing.assert_array_equal(out, [[[9, 10], [13, 14]]])
    assert nodata == 0 and dtype == "int16"


def test_conform_src_mask():
    src = np.array([[[0, 1, 1, 0]] * 4], dtype=np.int16)
    ref = np.ones((1, 2, 4), dtype=np.uint8)
    out, _, _ = _conform(src, 0, ref, 0)
    np.testing.assert_array_equal(out, [[[0, 1, 1, 0], [0, 1, 1, 0]]])
    np.testing.assert_array_equal(
        model.mask_np(out, 0), [[[True, False, False, True]] * 2]
    )


def test_conform_ref_mask():
    src = np.full((1, 4, 4), 99, dtype=np.int16)
    ref = np.array([[[0, 0, 0, 0], [0, 1, 1, 0], [0, 1, 1, 0], [0, 0, 0, 0]]], dtype=np.uint8)
    out, _, _ = _conform(src, 0, ref, 0)
    exp = np.array([[[0, 0, 0, 0], [0, 99, 99, 0], [0, 99, 99, 0], [0, 0, 0, 0]]])
    np.testing.assert_array_equal(out, exp)


def test_conform_both_masked():
    src = np.array(
        [[[0, 99, 99, 99], [0, 99, 99, 99], [0, 99, 99, 99], [0, 0, 0, 0]]],
        dtype=np.int16,
    )
    ref = np.array(
        [[[0, 0, 0, 0], [1, 1, 1, 0], [1, 1, 1, 0], [1, 1, 1, 0]]], dtype=np.uint8
    )
    out, _, _ = _conform(src, 0, ref, 0)
    exp = np.array([[[0, 0, 0, 0], [0, 99, 99, 0], [0, 99, 99, 0], [0, 0, 0, 0]]])
    np.testing.assert_array_equal(out, exp)


def test_conform_multiband_ref_broadcast():
    src = np.full((2, 4, 4), 99, dtype=np.int16)
    ref = np.array(
        [[[0, 0, 0, 0], [0, 1, 1, 0], [0, 1, 1, 0], [0, 0, 0, 0]]], dtype=np.uint8
    )
    out, _, _ = _conform(src, 0, ref, 0)
    band = np.array([[0, 0, 0, 0], [0, 99, 99, 0], [0, 99, 99, 0], [0, 0, 0, 0]])
    np.testing.assert_array_equal(out, np.stack([band] * 2))
    assert out.shape == (2, 4, 4)


def test_conform_multiband_different_masks():
    src = np.array(
        [
            [[99, 0], [0, 0]],
            [[0, 99], [99, 0]],
            [[0, 0], [0, 99]],
            [[0, 0], [0, 0]],
        ],
        dtype=np.int16,
    )
    ref = np.array([[[1, 0], [0, 1]]], dtype=np.uint8)
    out, _, _ = _conform(src, 0, ref, 0)
    exp = np.array(
        [
            [[99, 0], [0, 0]],
            [[0, 0], [0, 0]],
            [[0, 0], [0, 99]],
            [[0, 0], [0, 0]],
        ],
        dtype=np.int16,
    )
    np.testing.assert_array_equal(out, exp)


def test_conform_override_nodata():
    src = np.array([[[1, 0], [0, 1]]], dtype=np.int16)
    ref = np.ones((1, 2, 2), dtype=np.uint8)
    out, nodata, _ = _conform(src, 0, ref, 0, target_nodata=-99)
    assert nodata == -99
    np.testing.assert_array_equal(out, [[[1, -99], [-99, 1]]])


def test_conform_override_dtype():
    src = np.array([[[1, 0], [0, 1]]], dtype=np.int16)
    ref = np.ones((1, 2, 2), dtype=np.uint8)
    out, _, dtype = _conform(src, 0, ref, 0, target_dtype=np.float32)
    assert dtype == "float32" and out.dtype == np.float32
    np.testing.assert_array_equal(out, np.array([[[1.0, 0.0], [0.0, 1.0]]], dtype=np.float32))


def test_conform_cross_crs_reprojects_resamples():
    """test_raster_array.py:416-429: 4326 10×10 grid conformed onto a 26910
    25×25 grid covering the source's center — values land in (20, 80)."""
    src = np.arange(100, dtype=np.int16).reshape((1, 10, 10))
    src_transform = _nup(10, 10, (-120, 36, -119, 37))
    ref_transform = _nup(
        25, 25,
        (790160.7511689162, 4016578.305503206, 836981.5460881409, 4073700.8147444506),
    )
    ref_mask = np.zeros((1, 25, 25), dtype=bool)
    out, _, _ = conform_np(
        src, src_transform, "EPSG:4326", -99,
        ref_mask, ref_transform, "EPSG:26910", 25, 25,
    )
    assert out.min() > 20 and out.max() < 80
    assert out.shape == (1, 25, 25)


# -- metadata bounds goldens (test_raster_metadata.py:162-202) ------------------

@pytest.mark.parametrize(
    "width,height,transform,bounds",
    [
        (10, 10, (1.0, 0.0, 0.0, 0.0, -1.0, 10.0), (0.0, 0.0, 10.0, 10.0)),
        (5, 5, (8.0, 0.0, -20.0, 0.0, -8.0, 20.0), (-20.0, -20.0, 20.0, 20.0)),
        (2, 2, (4.0, 0.0, 4.0, 0.0, -4.0, 12.0), (4.0, 4.0, 12.0, 12.0)),
        (11, 11, (3.0, 0.0, -3.0, 0.0, -3.0, 36.0), (-3.0, 3.0, 30.0, 36.0)),
    ],
)
def test_bounds_from_transform(width, height, transform, bounds):
    assert model.bounds_from_transform(width, height, transform) == bounds


# -- nodata lattice (test_raster_array.py:569-596 semantics) --------------------

def test_ensure_valid_nodata():
    assert model.ensure_valid_nodata(0, np.int16) == 0
    assert model.ensure_valid_nodata(-99.0, np.int16) == -99
    assert isinstance(model.ensure_valid_nodata(-99.0, np.int16), int)
    assert model.ensure_valid_nodata(-99, np.float32) == -99.0
    assert isinstance(model.ensure_valid_nodata(-99, np.float32), float)
    assert np.isnan(model.ensure_valid_nodata(np.nan, np.float32))
    with pytest.raises(ValueError, match="nodata cannot be None."):
        model.ensure_valid_nodata(None, np.int16)
    with pytest.raises(ValueError, match="should be an integer for an integer dtype"):
        model.ensure_valid_nodata(np.nan, np.int16)
    with pytest.raises(ValueError, match="is not a whole number for an integer dtype"):
        model.ensure_valid_nodata(-99.5, np.int16)
    with pytest.raises(ValueError, match="is not between the min and max of dtype uint8"):
        model.ensure_valid_nodata(9999, np.uint8)


def test_ensure_band_index():
    assert model.ensure_band_index(None) is None
    assert model.ensure_band_index(3) == [3]
    assert model.ensure_band_index([1, 2]) == [1, 2]
    for bad in ("1", [], [1, "2"], 1.5, (1, 2)):
        with pytest.raises(TypeError, match="band_index must be an integer"):
            model.ensure_band_index(bad)


def test_validate_tile():
    arr = np.zeros((1, 2, 2), dtype=np.int16)
    model.validate_tile(arr, 1, 2, 2, "int16")
    with pytest.raises(model.RasterShapeError, match="must have 3 dimensions"):
        model.validate_tile(np.zeros((2, 2)), 1, 2, 2, "int16")
    with pytest.raises(model.RasterShapeError, match="does not match metadata shape"):
        model.validate_tile(arr, 1, 4, 4, "int16")
    with pytest.raises(model.RasterDtypeError, match="does not match metadata dtype"):
        model.validate_tile(arr, 1, 2, 2, "float32")


# -- distributed conform (Spark) -------------------------------------------------

def _tile_row(tile_id, data, nodata, bounds=None):
    data = np.asarray(data)
    c, h, w = data.shape
    return {
        "tile_id": tile_id,
        "cell": 0,
        "crs": "EPSG:4326",
        "count": c,
        "width": w,
        "height": h,
        "dtype": data.dtype.name,
        "nodata": float(nodata),
        "transform": list(_nup(w, h, bounds or (None,) * 4)),
        "pixels": data.astype(np.float64).ravel().tolist(),
    }


def test_band_slice_expr(spark):
    """R4 contract: 1-indexed, returns exactly one band's pixels."""
    src = np.arange(24, dtype=np.float64).reshape((3, 2, 4))
    df = spark.createDataFrame([_tile_row(1, src, -1)], model.TILE_SCHEMA)
    for b in range(1, 4):
        got = df.selectExpr(f"{model.band_slice_expr('pixels', b)} AS band").collect()[0].band
        assert got == src[b - 1].ravel().tolist()
    with pytest.raises(ValueError, match="1-based"):
        model.band_slice_expr("pixels", 0)


def test_conform_tiles_spark(spark):
    from geografir_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    src = np.arange(1, 17).reshape((1, 4, 4)).astype(np.int16)
    ref = np.ones((1, 2, 2), dtype=np.uint8)
    src_df = spark.createDataFrame([_tile_row(1, src, 0)], model.TILE_SCHEMA)
    ref_df = spark.createDataFrame([_tile_row(1, ref, 0)], model.TILE_SCHEMA)
    out = conform_tiles(src_df, ref_df).collect()
    assert len(out) == 1
    row = out[0]
    assert row.dtype == "int16" and row.nodata == 0.0
    assert row.width == 2 and row.height == 2 and row["count"] == 1
    assert row.pixels == [9.0, 10.0, 13.0, 14.0]


def test_copy_tile_meta_unknown_key_tolerance():
    """R16: RasterMetadata.copy ignores invalid kwargs (reference
    raster_metadata.py:156-182, pinned by test_raster_metadata.py:287)."""
    from geografir_spark.raster.model import copy_tile_meta

    meta = {
        "crs": "EPSG:4326", "count": 3, "width": 3, "height": 3,
        "dtype": "float32", "nodata": 0.0,
        "transform": [5.0, 0.0, 0.0, 0.0, -5.0, 5.0],
    }
    got = copy_tile_meta(meta, nodata=-9999, count=4, band_tags={})
    assert got["nodata"] == -9999 and got["count"] == 4
    assert "band_tags" not in got          # unknown key silently dropped
    assert meta["nodata"] == 0.0           # original untouched
    # all-parameters override round-trip
    new = dict(
        crs="EPSG:5070", count=2, width=5, height=9, dtype="int32",
        nodata=99, transform=[15.0, 10.0, -10.0, 0.0, -15.0, 80.0],
    )
    assert copy_tile_meta(meta, **new) == new
