"""Distributed GeoTIFF ↔ tile-row DataFrame I/O.

Sparkized ``RasterArray.from_raster`` / ``to_raster``
(raster_array/src/raster_array/raster_array.py:222-273): each GeoTIFF file
becomes one tile row (the engine's unit is one 512² file per tile — a
trillion-row dataset is a file-per-tile object store layout, listed by the
catalog/manifest, not a directory walk).

- ``read_geotiff_tiles``: ``binaryFile`` source → Arrow-batched
  ``mapInPandas`` decode (geotiff.py codec) → TILE_SCHEMA rows. Band subset
  / dtype cast / nodata re-code happen *inside the decode batch* — the
  engine's read-side projection pushdown, same semantics as the reference's
  ``_from_datasetreader`` (raster_array.py:277-327).
- ``write_geotiff_tiles``: one .tif per tile row via ``foreachPartition``
  (a sink: per-file Python I/O cost is the file write itself, not per-pixel
  work — pixel encoding is vectorized numpy + zlib inside the codec).

tile_id is derived from the file name stem (``<tile_id>.tif``), so a
write→read roundtrip is identity on the id.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from geografir_spark.raster.model import TILE_SCHEMA


def write_geotiff_tiles(
    df: DataFrame, out_dir: str, *, cog: bool = False, tags_col: "str | None" = None
) -> None:
    """Write each TILE_SCHEMA row as ``<out_dir>/<tile_id>.tif``.

    ``cog=True`` emits Cloud-Optimized layout: an overview pyramid of
    chained reduced-resolution IFDs (stride-2 nearest per level, matching
    the reference COG profile's overview_resampling=nearest,
    profiles.py:103).

    ``tags_col``: optional map<int, map<string,string>> column (the
    raster.tags BandTags shape) persisted as per-band GDAL_METADATA —
    the reference's BandTags.write_tags (band_tags.py:286-325)."""
    os.makedirs(out_dir, exist_ok=True)

    def _write_partition(rows) -> None:
        from geografir_spark.raster.geotiff import encode_cog, encode_geotiff

        encode = encode_cog if cog else encode_geotiff
        for r in rows:
            arr = (
                np.asarray(r["pixels"], dtype=np.float64)
                .reshape(r["count"], r["height"], r["width"])
                .astype(np.dtype(r["dtype"]))
            )
            band_tags = None
            if tags_col is not None and r[tags_col] is not None:
                band_tags = {
                    int(b): dict(t) for b, t in r[tags_col].items() if t
                }
            data = encode(
                arr,
                crs=r["crs"],
                transform=tuple(r["transform"]),
                nodata=r["nodata"],
                band_tags=band_tags,
            )
            with open(os.path.join(out_dir, f"{r['tile_id']}.tif"), "wb") as f:
                f.write(data)

    df.foreachPartition(_write_partition)


def read_geotiff_tiles(
    spark: SparkSession,
    path: str,
    *,
    band_index: "int | list[int] | None" = None,
    target_nodata: "int | float | None" = None,
    target_dtype: "str | None" = None,
    cell_res: "int | None" = None,
    overview: "int | None" = None,
    with_tags: bool = False,
) -> DataFrame:
    """Read ``*.tif`` files under ``path`` into TILE_SCHEMA rows.

    ``cell_res``: when set and the file CRS is EPSG:4326, the ``cell``
    column is the engine cell id of the tile origin at that resolution
    (the join key for raster↔vector ops); otherwise 0.
    ``overview``: read pyramid level k of COG files instead of full
    resolution — a 4^k cheaper scan for zoomed-out zonal/visual passes
    (each file's decode touches only that level's tile blobs).
    ``with_tags``: append a ``tags`` map<int, map<string,string>> column of
    per-band GDAL_METADATA — BandTags.from_raster (band_tags.py:328-377)."""
    bin_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tif")
        .load(path)
        .select("path", "content")
    )
    schema = TILE_SCHEMA
    if with_tags:
        schema = TILE_SCHEMA + ", tags map<int, map<string,string>>"

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from geografir_spark.geo import cells
        from geografir_spark.raster.geotiff import decode_geotiff, read_band_tags

        for pdf in batches:
            out = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                raw = bytes(blob)
                arr, meta = decode_geotiff(
                    raw,
                    band_index=band_index,
                    target_nodata=target_nodata,
                    target_dtype=target_dtype,
                    overview=overview,
                )
                stem = os.path.splitext(os.path.basename(p))[0]
                cell = 0
                if cell_res is not None and meta["crs"] == "EPSG:4326":
                    t = meta["transform"]
                    cell = int(
                        cells.encode_np(
                            np.array([t[2]]), np.array([t[5]]), cell_res
                        )[0]
                    )
                rec = {
                    "tile_id": int(stem) if stem.isdigit() else -1,
                    "cell": cell,
                    "crs": meta["crs"],
                    "count": meta["count"],
                    "width": meta["width"],
                    "height": meta["height"],
                    "dtype": meta["dtype"],
                    "nodata": float(meta["nodata"]),
                    "transform": list(meta["transform"]),
                    "pixels": arr.astype(np.float64).ravel(),
                }
                if with_tags:
                    rec["tags"] = read_band_tags(raw)
                out.append(rec)
            yield pd.DataFrame(out)

    return bin_df.mapInPandas(_decode, schema=schema)
