"""Tiled raster data model — the reference's RasterArray/RasterMetadata
lifted to one-row-per-tile DataFrames (SURVEY.md §1.5).

Tile row schema::

    tile_id    bigint
    cell       bigint            -- engine cell id of the tile origin
    crs        string            -- canonical authority string ("EPSG:4326")
    count, width, height  int    -- band/pixel grid (reference shape contract
                                    (count, height, width), raster_metadata.py:146-153)
    dtype      string            -- numpy dtype name
    nodata     double            -- NaN allowed for float dtypes
    transform  array<double>(6)  -- affine (a, b, c, d, e, f) row-major, the
                                    rasterio/GDAL convention: x = a*col + b*row + c,
                                    y = d*col + e*row + f
    pixels     array<double>     -- band-major flattened, len = count*height*width

Pixels travel as double and are cast to ``dtype`` inside kernels — parquet
stores one physical type per column; the dtype column preserves the logical
type exactly as the reference's metadata does.

Default tile size is 512×512, the reference's block-size constant
(raster_array/src/raster_array/profiles.py:81).
"""

from __future__ import annotations

import numpy as np

TILE_SIZE = 512  # profiles.py:81 BLOCK_SIZE

TILE_SCHEMA = (
    "tile_id bigint, cell bigint, crs string, count int, width int, height int,"
    " dtype string, nodata double, transform array<double>, pixels array<double>"
)


class RasterShapeError(ValueError):
    """Mirrors RasterArrayShapeError (raster_array/src/raster_array/exceptions.py)."""


class RasterDtypeError(ValueError):
    """Mirrors RasterArrayDtypeError."""


# ---------------------------------------------------------------------------
# Scalar/metadata helpers (reference-parity validation semantics)
# ---------------------------------------------------------------------------

def mask_np(array: np.ndarray, nodata: float) -> np.ndarray:
    """True where pixel == nodata; NaN nodata uses isnan (the exact rule of
    RasterArray.mask, raster_array/src/raster_array/raster_array.py:106-118)."""
    return np.isnan(array) if np.isnan(nodata) else array == nodata


def ensure_band_index(band_index) -> "list[int] | None":
    """Coerce band index(es) to a list (reference raster_array.py:331-355:
    int → [int]; non-empty all-int list passes; anything else TypeError with
    the same message)."""
    if band_index is None:
        return None
    if isinstance(band_index, int) and not isinstance(band_index, bool):
        return [band_index]
    if type(band_index) is list and len(band_index) > 0 and all(
        isinstance(i, int) and not isinstance(i, bool) for i in band_index
    ):
        return band_index
    raise TypeError("band_index must be an integer or a list of integers or None.")


def ensure_valid_nodata(nodata, dtype) -> "int | float":
    """nodata/dtype compatibility lattice with the reference's exact error
    messages (raster_array.py:358-437): None → error; NaN-with-int-dtype →
    error; fractional-float-with-int-dtype → error; out-of-range → error;
    int↔float coercion otherwise."""
    if nodata is None:
        raise ValueError("nodata cannot be None.")
    dtype = np.dtype(dtype)
    is_dtype_integer = np.issubdtype(dtype, np.integer)
    dtype_info = np.iinfo(dtype) if is_dtype_integer else np.finfo(dtype)
    is_nodata_integer = isinstance(nodata, (int, np.integer)) and not isinstance(
        nodata, bool
    )
    if not is_nodata_integer and np.isnan(nodata) and is_dtype_integer:
        raise ValueError("nodata value should be an integer for an integer dtype.")
    if is_dtype_integer and (nodata % 1 != 0):
        raise ValueError(
            f"nodata value of {str(nodata)} is not a whole number for an integer dtype."
        )
    if not (not is_nodata_integer and np.isnan(nodata)) and not (
        dtype_info.min <= nodata <= dtype_info.max
    ):
        raise ValueError(
            f"nodata value of {str(nodata)} is not between the min and max of dtype {dtype.name}"
        )
    if is_nodata_integer and not is_dtype_integer:
        return float(nodata)
    if not is_nodata_integer and is_dtype_integer:
        return int(nodata)
    return nodata


def validate_tile(array: np.ndarray, count: int, height: int, width: int, dtype) -> None:
    """Constructor invariants of RasterArray.__init__ (raster_array.py:85-103,
    440-461), same messages."""
    if array.ndim != 3:
        raise RasterShapeError(f"Array must have 3 dimensions, has {array.ndim}")
    if array.shape != (count, height, width):
        raise RasterShapeError(
            f"Array shape {array.shape} does not match metadata shape {(count, height, width)}"
        )
    if np.dtype(array.dtype).name != np.dtype(dtype).name:
        raise RasterDtypeError(
            f"Array dtype {array.dtype} does not match metadata dtype {np.dtype(dtype).name}"
        )


def bounds_from_transform(width: int, height: int, transform) -> tuple[float, float, float, float]:
    """(left, bottom, right, top) of a north-up-or-rotated affine grid — the
    contract of RasterMetadata.bounds (raster_metadata.py:117-124, golden
    quadruples at raster_array/tests/test_raster_metadata.py:162-202).
    Equivalent of rasterio.transform.array_bounds for the general affine:
    corners of the (0,0)..(width,height) pixel rectangle."""
    a, b, c, d, e, f = transform
    xs = [c, c + a * width, c + b * height, c + a * width + b * height]
    ys = [f, f + d * width, f + e * height, f + d * width + e * height]
    return (min(xs), min(ys), max(xs), max(ys))


def pixels_to_array(row_pixels, count: int, height: int, width: int, dtype) -> np.ndarray:
    arr = np.asarray(row_pixels, dtype=np.float64).reshape((count, height, width))
    return arr.astype(np.dtype(dtype))


def band_slice_expr(pixels_col: str, band_index: int, height_col: str = "height",
                    width_col: str = "width") -> str:
    """SQL expr: 1-indexed band slice of a band-major pixels array — the
    columnar lift of RasterArray.band (raster_array.py:136-145, 1-based
    contract pinned by tests/test_raster_array.py:165-169). Native Catalyst
    ``slice`` (1-based), no UDF."""
    if band_index < 1:
        raise ValueError("band_index is 1-based (reference contract)")
    start = f"(({band_index} - 1) * {height_col} * {width_col} + 1)"
    return f"slice({pixels_col}, {start}, {height_col} * {width_col})"


# ---------------------------------------------------------------------------
# GeoTIFF/COG profile defaults (reference profiles.py:81-160) → writer options
# ---------------------------------------------------------------------------

GTIFF_PROFILE_DEFAULTS = {
    "blockxsize": 512,
    "blockysize": 512,
    "interleave": "pixel",
    "tiled": True,
    "zlevel": 9,
    "compress": "deflate",
}
COG_PROFILE_DEFAULTS = {
    "bigtiff": "YES",
    "blocksize": 512,
    "compress": "deflate",
    "level": 9,
    "overview_resampling": "nearest",
    "predictor": "standard",
}
COG_INCOMPATIBLE_KEYS = ["blockxsize", "blockysize", "tiled", "interleave"]


def copy_tile_meta(meta: dict, **kwargs) -> dict:
    """``RasterMetadata.copy`` semantics (reference
    raster_metadata.py:156-182): a new metadata dict with the given
    overrides applied; kwargs whose keys are NOT existing metadata fields
    are silently ignored (the unknown-key tolerance the reference pins at
    test_raster_metadata.py:287 — e.g. ``copy(nodata=-9999, band_tags={})``
    applies nodata and drops band_tags)."""
    allowed = set(meta) & set(kwargs)
    return {**meta, **{k: kwargs[k] for k in allowed}}


def apply_geotiff_profile(profile: dict) -> dict:
    """Merge GTiff defaults, defaults win (profiles.py:148-160)."""
    return {**profile, **GTIFF_PROFILE_DEFAULTS}


def apply_cog_profile(profile: dict) -> dict:
    """Merge COG defaults and strip COG-incompatible keys (profiles.py:124-145)."""
    out = {k: v for k, v in profile.items() if k not in COG_INCOMPATIBLE_KEYS}
    return {**out, **COG_PROFILE_DEFAULTS}


def tile_meta_repr(meta: dict) -> str:
    """Debug repr of tile metadata — ``RasterMetadata.__repr__``
    (raster_metadata.py:220-224); the affine transform renders in the
    reference's post-replace single-line form."""
    a, b, c, d, e, f = (float(v) for v in meta["transform"])
    transform_repr = f"Affine({a!r}, {b!r}, {c!r}, {d!r}, {e!r}, {f!r})"
    res = meta.get("resolution", abs(a))
    return (
        f"RasterMetadata(crs={meta['crs']}, count={meta['count']},"
        f" width={meta['width']}, height={meta['height']},"
        f" dtype={meta['dtype']!r}, nodata={meta['nodata']},"
        f" transform={transform_repr}, resolution={res})"
    )
