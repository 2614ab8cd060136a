"""Pure-stdlib GeoTIFF codec: tiled, deflate-compressed, GeoTIFF-tagged.

The reference does raster file I/O through rasterio/GDAL
(``RasterArray.to_raster`` raster_array/src/raster_array/raster_array.py:222-241,
``from_raster`` :244-273). rasterio is not available in this environment, so
the engine ships its own minimal TIFF 6.0 + GeoTIFF 1.1 codec — numpy + zlib
only — honoring the reference's GTiff profile constants
(512×512 tiles, deflate level 9, profiles.py:81-88):

- writer: little-endian classic TIFF, tiled layout, PlanarConfiguration=2
  (band-separate tile planes — the natural layout for the band-major tile
  rows of ``model.py``), Compression=8 (zlib/"Adobe" deflate, level 9),
  ModelPixelScale + ModelTiepoint + GeoKeyDirectory (EPSG code), GDAL-style
  ASCII nodata tag.
- reader: full IFD parse, tile reassembly with edge-padding crop, band
  subset / dtype cast / nodata re-code **on read** with the reference's
  ``_from_datasetreader`` semantics (raster_array.py:277-327): pixels equal
  to the source nodata (NaN-aware) are rewritten to the output nodata after
  an optional dtype cast.

Scope: north-up affine transforms only (rotation terms must be 0 — all
reference fixtures and COG tiling layouts are north-up); classic (non-BigTIFF)
offsets, which bounds one *file* at 4 GiB — at engine scale each file is one
512² tile (≤ a few MiB), a million-file dataset is the normal case. COG
extras (overview pyramids, ghost area) are not emitted; ``apply_cog_profile``
in ``model.py`` still normalizes the option map for when a GDAL-backed writer
is present.
"""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np

TILE = 512          # profiles.py:81
DEFLATE_LEVEL = 9   # profiles.py:82 / :88

# TIFF tag ids
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259          # 8 = zlib deflate
_PHOTOMETRIC = 262          # 1 = BlackIsZero
_SAMPLES_PER_PIXEL = 277
_PLANAR_CONFIG = 284        # 2 = planar (band-separate)
_TILE_WIDTH = 322
_TILE_LENGTH = 323
_TILE_OFFSETS = 324
_TILE_BYTE_COUNTS = 325
_SAMPLE_FORMAT = 339        # 1 = uint, 2 = int, 3 = ieee float
_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922
_GEO_KEY_DIRECTORY = 34735
_GDAL_NODATA = 42113

# TIFF field types
_T_SHORT, _T_LONG, _T_DOUBLE, _T_ASCII = 3, 4, 12, 2
_TYPE_SIZE = {_T_SHORT: 2, _T_LONG: 4, _T_DOUBLE: 8, _T_ASCII: 1}
_TYPE_FMT = {_T_SHORT: "H", _T_LONG: "I", _T_DOUBLE: "d"}

# GeoKey ids
_GT_MODEL_TYPE = 1024       # 1 projected, 2 geographic
_GEOGRAPHIC_TYPE = 2048
_PROJECTED_CS_TYPE = 3072

_GEOGRAPHIC_EPSG = {4326, 4269, 4267}  # geographic codes the engine emits


def _sample_format(dtype: np.dtype) -> int:
    if np.issubdtype(dtype, np.unsignedinteger):
        return 1
    if np.issubdtype(dtype, np.signedinteger):
        return 2
    if np.issubdtype(dtype, np.floating):
        return 3
    raise ValueError(f"unsupported dtype for GeoTIFF: {dtype}")


def _epsg_of(crs: str) -> int:
    s = str(crs).strip().upper()
    if s.startswith("EPSG:"):
        return int(s.split(":", 1)[1])
    if s.isdigit():
        return int(s)
    raise ValueError(f"codec requires an EPSG crs string, got {crs!r}")


def encode_geotiff(
    array: np.ndarray,
    *,
    crs: str,
    transform: "tuple[float, ...]",
    nodata: "int | float",
    tile: int = TILE,
) -> bytes:
    """Encode a (count, height, width) array as tiled deflate GeoTIFF bytes."""
    if array.ndim != 3:
        raise ValueError(f"array must be 3-D (count, height, width), got {array.ndim}-D")
    a, b, c, d, e, f = [float(v) for v in transform]
    if b != 0.0 or d != 0.0:
        raise ValueError("codec supports north-up transforms only (b == d == 0)")
    count, height, width = array.shape
    dtype = array.dtype
    ntx, nty = math.ceil(width / tile), math.ceil(height / tile)

    # compress tile planes: bands outer, tile rows inner (row-major per band)
    blobs: list[bytes] = []
    for bi in range(count):
        for ty in range(nty):
            for tx in range(ntx):
                block = np.zeros((tile, tile), dtype=dtype)
                ys, xs = ty * tile, tx * tile
                sub = array[bi, ys : ys + tile, xs : xs + tile]
                block[: sub.shape[0], : sub.shape[1]] = sub
                blobs.append(zlib.compress(block.tobytes(), DEFLATE_LEVEL))

    epsg = _epsg_of(crs)
    model_type = 2 if epsg in _GEOGRAPHIC_EPSG else 1
    cs_key = _GEOGRAPHIC_TYPE if model_type == 2 else _PROJECTED_CS_TYPE
    geokeys = [
        (1, 1, 0, 2),               # KeyDirectoryVersion, revision, minor, count
        (_GT_MODEL_TYPE, 0, 1, model_type),
        (cs_key, 0, 1, epsg),
    ]
    geokey_shorts = [v for row in geokeys for v in row]
    nodata_ascii = (f"{nodata}").encode() + b"\x00"

    n_tiles = len(blobs)
    entries: list[tuple[int, int, int, "bytes | int"]] = [
        (_IMAGE_WIDTH, _T_LONG, 1, width),
        (_IMAGE_LENGTH, _T_LONG, 1, height),
        (_BITS_PER_SAMPLE, _T_SHORT, count,
         struct.pack(f"<{count}H", *([dtype.itemsize * 8] * count))),
        (_COMPRESSION, _T_SHORT, 1, 8),
        (_PHOTOMETRIC, _T_SHORT, 1, 1),
        (_SAMPLES_PER_PIXEL, _T_SHORT, 1, count),
        (_PLANAR_CONFIG, _T_SHORT, 1, 2),
        (_TILE_WIDTH, _T_SHORT, 1, tile),
        (_TILE_LENGTH, _T_SHORT, 1, tile),
        (_TILE_OFFSETS, _T_LONG, n_tiles, None),      # filled below
        (_TILE_BYTE_COUNTS, _T_LONG, n_tiles,
         struct.pack(f"<{n_tiles}I", *[len(x) for x in blobs])),
        (_SAMPLE_FORMAT, _T_SHORT, count,
         struct.pack(f"<{count}H", *([_sample_format(dtype)] * count))),
        (_MODEL_PIXEL_SCALE, _T_DOUBLE, 3, struct.pack("<3d", a, -e, 0.0)),
        (_MODEL_TIEPOINT, _T_DOUBLE, 6,
         struct.pack("<6d", 0.0, 0.0, 0.0, c, f, 0.0)),
        (_GEO_KEY_DIRECTORY, _T_SHORT, len(geokey_shorts),
         struct.pack(f"<{len(geokey_shorts)}H", *geokey_shorts)),
        (_GDAL_NODATA, _T_ASCII, len(nodata_ascii), nodata_ascii),
    ]

    # layout: header(8) | IFD | out-of-line values | tile data
    ifd_offset = 8
    ifd_size = 2 + 12 * len(entries) + 4
    value_offset = ifd_offset + ifd_size
    oversize: dict[int, int] = {}  # tag -> file offset of out-of-line value
    values_blob = b""
    for tag, typ, cnt, val in entries:
        if tag == _TILE_OFFSETS:
            continue
        size = _TYPE_SIZE[typ] * cnt
        if size > 4:
            oversize[tag] = value_offset + len(values_blob)
            values_blob += val if isinstance(val, bytes) else struct.pack(
                f"<{_TYPE_FMT[typ]}", val
            )
            values_blob += b"\x00" * (len(values_blob) % 2)  # word-align
    # tile offsets array itself lives out-of-line (unless single tile)
    tile_offsets_pos = value_offset + len(values_blob)
    tile_offsets_size = 4 * n_tiles if n_tiles > 1 else 0
    data_start = tile_offsets_pos + tile_offsets_size
    offsets = []
    pos = data_start
    for blob in blobs:
        offsets.append(pos)
        pos += len(blob)
    if n_tiles > 1:
        values_blob += struct.pack(f"<{n_tiles}I", *offsets)
        oversize[_TILE_OFFSETS] = tile_offsets_pos

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_offset)
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in sorted(entries, key=lambda t: t[0]):
        size = _TYPE_SIZE[typ] * cnt
        if tag == _TILE_OFFSETS:
            inline = offsets[0] if n_tiles == 1 else oversize[tag]
            out += struct.pack("<HHII", tag, typ, cnt, inline)
        elif size > 4:
            out += struct.pack("<HHII", tag, typ, cnt, oversize[tag])
        else:
            if isinstance(val, bytes):
                out += struct.pack("<HHI", tag, typ, cnt) + val.ljust(4, b"\x00")
            else:
                packed = struct.pack(f"<{_TYPE_FMT[typ]}", val).ljust(4, b"\x00")
                out += struct.pack("<HHI", tag, typ, cnt) + packed
    out += struct.pack("<I", 0)  # next-IFD = none
    out += values_blob
    assert len(out) == data_start, (len(out), data_start)
    for blob in blobs:
        out += blob
    return bytes(out)


def _read_entry_values(data: bytes, typ: int, cnt: int, raw: bytes):
    size = _TYPE_SIZE[typ] * cnt
    buf = raw[:size] if size <= 4 else None
    if buf is None:
        (off,) = struct.unpack("<I", raw)
        buf = data[off : off + size]
    if typ == _T_ASCII:
        return buf
    return struct.unpack(f"<{cnt}{_TYPE_FMT[typ]}", buf)


def decode_geotiff(
    data: bytes,
    *,
    band_index: "int | list[int] | None" = None,
    target_nodata: "int | float | None" = None,
    target_dtype: "str | np.dtype | None" = None,
) -> "tuple[np.ndarray, dict]":
    """Decode GeoTIFF bytes → (array (count, height, width), metadata dict).

    ``band_index`` (1-based, int or list), ``target_dtype`` and
    ``target_nodata`` reproduce the reference's read-side coercions
    (raster_array.py:277-327): subset bands, cast, then re-code pixels equal
    to the source nodata (NaN-aware) as the output nodata.
    Metadata keys: crs, count, width, height, dtype, nodata, transform.
    """
    from geografir_spark.raster.model import ensure_band_index, ensure_valid_nodata, mask_np

    if data[:4] not in (b"II*\x00",):
        raise ValueError("not a little-endian classic TIFF")
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n_entries,) = struct.unpack_from("<H", data, ifd_off)
    tags: dict[int, tuple] = {}
    for i in range(n_entries):
        tag, typ, cnt = struct.unpack_from("<HHI", data, ifd_off + 2 + 12 * i)
        raw = data[ifd_off + 2 + 12 * i + 8 : ifd_off + 2 + 12 * i + 12]
        tags[tag] = _read_entry_values(data, typ, cnt, raw)

    width, height = tags[_IMAGE_WIDTH][0], tags[_IMAGE_LENGTH][0]
    count = tags[_SAMPLES_PER_PIXEL][0]
    bits = tags[_BITS_PER_SAMPLE][0]
    fmt = tags[_SAMPLE_FORMAT][0]
    kind = {1: "u", 2: "i", 3: "f"}[fmt]
    dtype = np.dtype(f"<{kind}{bits // 8}")
    if tags[_COMPRESSION][0] != 8:
        raise ValueError(f"unsupported compression {tags[_COMPRESSION][0]}")
    if tags[_PLANAR_CONFIG][0] != 2:
        raise ValueError("codec reads planar (band-separate) layout only")
    tw, th = tags[_TILE_WIDTH][0], tags[_TILE_LENGTH][0]
    offsets, counts_b = tags[_TILE_OFFSETS], tags[_TILE_BYTE_COUNTS]
    ntx, nty = math.ceil(width / tw), math.ceil(height / th)

    sx, sy, _ = tags[_MODEL_PIXEL_SCALE]
    _, _, _, ox, oy, _ = tags[_MODEL_TIEPOINT]
    transform = (sx, 0.0, ox, 0.0, -sy, oy)

    gk = tags[_GEO_KEY_DIRECTORY]
    epsg = None
    for i in range(gk[3]):
        key, _loc, _cnt, val = gk[4 + 4 * i : 8 + 4 * i]
        if key in (_GEOGRAPHIC_TYPE, _PROJECTED_CS_TYPE):
            epsg = val
    crs = f"EPSG:{epsg}" if epsg else None

    nod_raw = tags.get(_GDAL_NODATA, b"\x00").split(b"\x00")[0].decode()
    src_nodata = float(nod_raw) if any(ch in nod_raw for ch in ".ena") else int(nod_raw)

    array = np.empty((count, height, width), dtype=dtype)
    per_band = ntx * nty
    for bi in range(count):
        for t in range(per_band):
            idx = bi * per_band + t
            blob = zlib.decompress(data[offsets[idx] : offsets[idx] + counts_b[idx]])
            block = np.frombuffer(blob, dtype=dtype).reshape(th, tw)
            ty, tx = divmod(t, ntx)
            ys, xs = ty * th, tx * tw
            h = min(th, height - ys)
            w = min(tw, width - xs)
            array[bi, ys : ys + h, xs : xs + w] = block[:h, :w]

    # --- reference read-side coercions (raster_array.py:287-316) ---
    bands = ensure_band_index(band_index)
    if bands is not None:
        array = array[[b - 1 for b in bands], :, :]
        count = len(bands)
    out_dtype = np.dtype(target_dtype) if target_dtype is not None else array.dtype
    out_nodata = (
        ensure_valid_nodata(target_nodata, out_dtype)
        if target_nodata is not None
        else src_nodata
    )
    src_mask = mask_np(array, src_nodata)
    array = array.astype(out_dtype, copy=True)
    array[src_mask] = out_nodata

    meta = {
        "crs": crs,
        "count": count,
        "width": width,
        "height": height,
        "dtype": array.dtype.name,
        "nodata": out_nodata,
        "transform": transform,
    }
    return array, meta
