"""Pure-stdlib GeoTIFF codec: byte-level roundtrips, read-side coercion
semantics mirroring the reference's from_raster matrix
(raster_array/tests/test_raster_array.py:481-519), and the distributed
binaryFile → mapInPandas → TILE_SCHEMA read path."""

from __future__ import annotations

import numpy as np
import pytest

from geografir_spark.raster.geotiff import decode_geotiff, encode_geotiff

TRANSFORM = (0.25, 0.0, -10.0, 0.0, -0.5, 48.0)  # north-up, non-square pixels


def _arr(dtype, shape=(2, 5, 7), nodata=0):
    rng = np.random.RandomState(42)
    a = rng.randint(1, 100, size=shape).astype(dtype)
    a[0, 0, 0] = nodata
    a[-1, min(2, shape[1] - 1), min(3, shape[2] - 1)] = nodata
    return a


@pytest.mark.parametrize("dtype", ["uint8", "int16", "uint16", "int32", "float32", "float64"])
def test_roundtrip_dtypes(dtype):
    a = _arr(dtype)
    data = encode_geotiff(a, crs="EPSG:4326", transform=TRANSFORM, nodata=0)
    out, meta = decode_geotiff(data)
    np.testing.assert_array_equal(out, a)
    assert out.dtype == np.dtype(dtype)
    assert meta["crs"] == "EPSG:4326"
    assert meta["transform"] == pytest.approx(TRANSFORM)
    assert meta["nodata"] == 0
    assert (meta["count"], meta["height"], meta["width"]) == a.shape


def test_roundtrip_multi_tile_projected():
    # array larger than the tile size → 4 tile planes per band, edge crop
    a = _arr("int16", shape=(1, 70, 90))
    data = encode_geotiff(
        a, crs="EPSG:5070", transform=TRANSFORM, nodata=0, tile=64
    )
    out, meta = decode_geotiff(data)
    np.testing.assert_array_equal(out, a)
    assert meta["crs"] == "EPSG:5070"


def test_band_subset_is_1_indexed():
    a = _arr("int32", shape=(3, 4, 4))
    data = encode_geotiff(a, crs="EPSG:4326", transform=TRANSFORM, nodata=0)
    out, meta = decode_geotiff(data, band_index=2)
    np.testing.assert_array_equal(out, a[1:2])
    assert meta["count"] == 1
    out2, _ = decode_geotiff(data, band_index=[3, 1])
    np.testing.assert_array_equal(out2, a[[2, 0]])
    with pytest.raises(TypeError, match="band_index must be an integer"):
        decode_geotiff(data, band_index=[])


def test_read_recode_nodata_and_dtype():
    # reference semantics (raster_array.py:310-316): pixels equal to the
    # source nodata become the target nodata AFTER the dtype cast
    a = np.array([[[5, 0], [7, 0]]], dtype="int16")
    data = encode_geotiff(a, crs="EPSG:4326", transform=TRANSFORM, nodata=0)
    out, meta = decode_geotiff(data, target_nodata=-1.5, target_dtype="float32")
    np.testing.assert_array_equal(
        out, np.array([[[5.0, -1.5], [7.0, -1.5]]], dtype="float32")
    )
    assert meta["nodata"] == -1.5 and meta["dtype"] == "float32"


def test_read_recode_nan_nodata():
    a = np.array([[[1.5, np.nan], [np.nan, 4.0]]], dtype="float64")
    data = encode_geotiff(a, crs="EPSG:4326", transform=TRANSFORM, nodata=np.nan)
    out, meta = decode_geotiff(data, target_nodata=-9999.0)
    np.testing.assert_array_equal(
        out, np.array([[[1.5, -9999.0], [-9999.0, 4.0]]])
    )
    # invalid lattice combos raise exactly like the reference
    with pytest.raises(ValueError):
        decode_geotiff(data, target_nodata=np.nan, target_dtype="int16")


def test_rotated_transform_rejected():
    a = _arr("uint8", shape=(1, 2, 2))
    with pytest.raises(ValueError, match="north-up"):
        encode_geotiff(a, crs="EPSG:4326", transform=(1, 0.1, 0, 0, -1, 0), nodata=0)


def test_cog_overview_pyramid():
    """COG: overview chain until a level fits one tile; each level is the
    deterministic stride-2 nearest downsample (COG profile pins
    overview_resampling=nearest, reference profiles.py:103)."""
    from geografir_spark.raster.geotiff import cog_info, encode_cog

    a = _arr("uint16", shape=(2, 700, 1100), nodata=0)
    data = encode_cog(a, crs="EPSG:4326", transform=TRANSFORM, nodata=0, tile=256)
    info = cog_info(data)
    # 1100 → 550 → 275 → 138(≤256 stop): levels 0..3, overviews flagged
    assert [(d["width"], d["height"]) for d in info] == [
        (1100, 700), (550, 350), (275, 175), (138, 88)
    ]
    assert [d["overview"] for d in info] == [False, True, True, True]
    assert all(d["count"] == 2 for d in info)

    # full-res read is identity; plain (overview=None) read ignores overviews
    out0, meta0 = decode_geotiff(data)
    np.testing.assert_array_equal(out0, a)
    assert meta0["transform"] == pytest.approx(TRANSFORM)

    # overview k == a[:, ::2**k, ::2**k], transform scaled, origin unchanged
    for k in (1, 2, 3):
        outk, metak = decode_geotiff(data, overview=k)
        np.testing.assert_array_equal(outk, a[:, :: 2**k, :: 2**k])
        f = float(2**k)
        assert metak["transform"] == pytest.approx(
            (TRANSFORM[0] * f, 0.0, TRANSFORM[2], 0.0, TRANSFORM[4] * f, TRANSFORM[5])
        )
        assert metak["crs"] == "EPSG:4326" and metak["nodata"] == 0

    with pytest.raises(ValueError, match="out of range"):
        decode_geotiff(data, overview=4)


def test_cog_small_array_has_no_overviews():
    from geografir_spark.raster.geotiff import cog_info, encode_cog

    a = _arr("int16")  # 5×7 ≪ 512 tile → single IFD
    data = encode_cog(a, crs="EPSG:5070", transform=TRANSFORM, nodata=0)
    assert len(cog_info(data)) == 1
    out, meta = decode_geotiff(data)
    np.testing.assert_array_equal(out, a)
    assert meta["crs"] == "EPSG:5070"


def test_cog_overview_read_coercions():
    """Read-side band subset / dtype cast / nodata re-code apply on
    overview reads too (same _from_datasetreader lattice)."""
    from geografir_spark.raster.geotiff import encode_cog

    a = np.zeros((2, 600, 600), dtype="int16")
    a[:, ::2, ::2] = 7   # overview-1 sees all 7s
    a[1, 0, 0] = 0       # one nodata pixel surviving into the overview
    data = encode_cog(a, crs="EPSG:4326", transform=TRANSFORM, nodata=0, tile=256)
    out, meta = decode_geotiff(
        data, overview=1, band_index=2, target_nodata=-1.0, target_dtype="float32"
    )
    assert out.shape == (1, 300, 300)
    assert out[0, 0, 0] == -1.0 and out[0, 0, 1] == 7.0
    assert meta["dtype"] == "float32" and meta["nodata"] == -1.0


def test_spark_cog_write_roundtrip(spark, tmp_path):
    from geografir_spark.raster.geotiff import cog_info
    from geografir_spark.raster.io import write_geotiff_tiles
    from geografir_spark.raster.model import TILE_SCHEMA

    h, w = 20, 30
    px = np.arange(h * w, dtype=float)
    df = spark.createDataFrame(
        [(1, 0, "EPSG:4326", 1, w, h, "int32", -1.0,
          [0.5, 0.0, 2.0, 0.0, -0.5, 9.0], px.tolist())],
        TILE_SCHEMA,
    )
    out_dir = str(tmp_path / "cog")
    write_geotiff_tiles(df, out_dir, cog=True)
    with open(f"{out_dir}/1.tif", "rb") as f:
        data = f.read()
    # 30×20 with 512 tile → no overview needed, but still valid COG encode
    assert len(cog_info(data)) == 1
    arr, meta = decode_geotiff(data)
    np.testing.assert_array_equal(arr, px.reshape(1, h, w).astype("int32"))
    assert meta["nodata"] == -1.0


def test_spark_read_overview_level(spark, tmp_path):
    """Distributed pyramid read: read_geotiff_tiles(overview=1) returns the
    stride-2 decimated tiles with the scaled transform."""
    from geografir_spark.raster.geotiff import encode_cog
    from geografir_spark.raster.io import read_geotiff_tiles

    a = np.arange(600 * 600, dtype="int32").reshape(1, 600, 600) % 1000
    d = str(tmp_path / "cogs")
    import os as _os

    _os.makedirs(d)
    with open(f"{d}/7.tif", "wb") as f:
        f.write(encode_cog(
            a, crs="EPSG:4326", transform=(0.1, 0.0, 3.0, 0.0, -0.1, 50.0),
            nodata=-1, tile=256,
        ))
    r = read_geotiff_tiles(spark, d, overview=1).collect()[0]
    assert (r["height"], r["width"]) == (300, 300)
    np.testing.assert_array_equal(
        np.asarray(r["pixels"]).reshape(1, 300, 300).astype("int32"),
        a[:, ::2, ::2],
    )
    assert list(r["transform"]) == pytest.approx([0.2, 0.0, 3.0, 0.0, -0.2, 50.0])
    full = read_geotiff_tiles(spark, d).collect()[0]
    assert (full["height"], full["width"]) == (600, 600)


def test_spark_write_read_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F  # noqa: F401

    from geografir_spark.raster.io import read_geotiff_tiles, write_geotiff_tiles
    from geografir_spark.raster.model import TILE_SCHEMA

    rows = []
    rng = np.random.RandomState(7)
    for tid in range(6):
        h, w = 5, 4
        px = rng.randint(0, 50, size=2 * h * w).astype(float)
        rows.append(
            (
                tid, 0, "EPSG:4326", 2, w, h, "int16", 0.0,
                [0.1, 0.0, float(tid), 0.0, -0.1, 50.0],
                px.tolist(),
            )
        )
    df = spark.createDataFrame(rows, TILE_SCHEMA)
    out_dir = str(tmp_path / "tiles")
    write_geotiff_tiles(df, out_dir)

    back = read_geotiff_tiles(spark, out_dir, cell_res=9)
    got = {r["tile_id"]: r for r in back.collect()}
    assert sorted(got) == list(range(6))
    for orig in rows:
        r = got[orig[0]]
        assert r["crs"] == "EPSG:4326"
        assert (r["count"], r["height"], r["width"]) == (2, 5, 4)
        assert r["dtype"] == "int16"
        assert list(r["transform"]) == pytest.approx(orig[8])
        assert list(r["pixels"]) == pytest.approx(orig[9])
        assert r["cell"] != 0  # cell derived from the tile origin
    # decode is Arrow-batched (ArrowEvalPython/mapInPandas), never row-Python
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_flagship_file_pipeline(spark, tmp_path):
    """The reference's flagship eager pipeline (SURVEY.md §3.1) end-to-end
    through files: from_raster → conform_to → to_raster, distributed.
    Golden: 4×4 int16 conformed onto a 2×2 grid → [[9,10],[13,14]]
    (raster_array/tests/test_raster_array.py:192-212)."""
    from geografir_spark.raster.conform import conform_tiles
    from geografir_spark.raster.geotiff import decode_geotiff, encode_geotiff
    from geografir_spark.raster.io import read_geotiff_tiles, write_geotiff_tiles

    src = np.arange(1, 17, dtype="int16").reshape(1, 4, 4)
    ref = np.ones((1, 2, 2), dtype="uint8")
    src_dir, ref_dir, out_dir = (
        str(tmp_path / d) for d in ("src", "ref", "out")
    )
    import os as _os

    for d, arr, tf in (
        (src_dir, src, (1.0, 0.0, 0.0, 0.0, -1.0, 4.0)),
        (ref_dir, ref, (1.0, 0.0, 0.0, 0.0, -1.0, 2.0)),
    ):
        _os.makedirs(d)
        with open(f"{d}/1.tif", "wb") as f:
            f.write(encode_geotiff(arr, crs="EPSG:4326", transform=tf, nodata=0))

    src_df = read_geotiff_tiles(spark, src_dir)
    ref_df = read_geotiff_tiles(spark, ref_dir)
    out = conform_tiles(src_df, ref_df)
    write_geotiff_tiles(out, out_dir)

    with open(f"{out_dir}/1.tif", "rb") as f:
        arr, meta = decode_geotiff(f.read())
    np.testing.assert_array_equal(arr, np.array([[[9, 10], [13, 14]]], dtype="int16"))
    assert meta["transform"] == pytest.approx((1.0, 0.0, 0.0, 0.0, -1.0, 2.0))
    assert meta["dtype"] == "int16" and meta["nodata"] == 0


def test_band_tags_file_roundtrip():
    """R29/R30: write_tags → from_raster file round-trip (reference
    band_tags.py:286-377 + test_band_tags.py semantics): tags come back
    exactly; bands without tags are absent; untagged files return {}."""
    from geografir_spark.raster.geotiff import (
        encode_cog, encode_geotiff, read_band_tags,
    )

    arr = np.arange(64, dtype=np.int32).reshape(1, 8, 8)
    tags = {
        1: {"classification": "water", "confidence": "high"},
        3: {"classification": "vegeta<tion&", "year": "2024"},  # XML-escaping
    }
    for enc in (encode_geotiff, encode_cog):
        data = enc(
            arr.repeat(3, axis=0).reshape(3, 8, 8),
            crs="EPSG:4326",
            transform=(0.5, 0.0, 2.0, 0.0, -0.5, 9.0),
            nodata=-1,
            band_tags=tags,
        )
        got = read_band_tags(data)
        assert got == tags  # band 2 absent (no empty dict), values exact
        # tag payload must not disturb the pixel roundtrip
        out, meta = decode_geotiff(data)
        np.testing.assert_array_equal(out[0], arr[0])
    # no tags → {}
    plain = encode_geotiff(
        arr, crs="EPSG:4326", transform=(0.5, 0.0, 2.0, 0.0, -0.5, 9.0), nodata=-1
    )
    assert read_band_tags(plain) == {}


def test_ifd_offsets_word_aligned():
    """TIFF 6.0: every IFD must begin on a word boundary. Odd-length
    deflate blobs previously pushed chained COG overview IFDs to odd
    offsets (ADVICE r1); tile data is now padded (byte counts stay exact)."""
    import struct

    from geografir_spark.raster.geotiff import encode_cog

    rng = np.random.RandomState(11)
    # noisy data makes odd-length deflate blobs near-certain
    arr = rng.randint(0, 2**31 - 1, size=(2, 700, 700)).astype(np.int32)
    data = encode_cog(
        arr, crs="EPSG:3857", transform=(10.0, 0.0, 0.0, 0.0, -10.0, 0.0),
        nodata=-1, tile=256,
    )
    (off,) = struct.unpack_from("<I", data, 4)
    n_ifds = 0
    while off:
        assert off % 2 == 0, f"IFD at odd offset {off}"
        (n,) = struct.unpack_from("<H", data, off)
        (off,) = struct.unpack_from("<I", data, off + 2 + 12 * n)
        n_ifds += 1
    assert n_ifds >= 2  # pyramid actually chained


def test_spark_band_tags_roundtrip(spark, tmp_path):
    """tags column → files → tags column through the distributed I/O."""
    from geografir_spark.raster.io import read_geotiff_tiles, write_geotiff_tiles
    from geografir_spark.raster.model import TILE_SCHEMA

    h, w = 8, 8
    px = np.arange(h * w, dtype=float)
    schema = TILE_SCHEMA + ", tags map<int, map<string,string>>"
    df = spark.createDataFrame(
        [
            (1, 0, "EPSG:4326", 1, w, h, "int32", -1.0,
             [0.5, 0.0, 2.0, 0.0, -0.5, 9.0], px.tolist(),
             {1: {"species": "pine", "origin": "tile1"}}),
            (2, 0, "EPSG:4326", 1, w, h, "int32", -1.0,
             [0.5, 0.0, 6.0, 0.0, -0.5, 9.0], px.tolist(), None),
        ],
        schema,
    )
    out_dir = str(tmp_path / "tagged")
    write_geotiff_tiles(df, out_dir, tags_col="tags")
    back = read_geotiff_tiles(spark, out_dir, with_tags=True)
    rows = {r["tile_id"]: r["tags"] for r in back.collect()}
    assert rows[1] == {1: {"species": "pine", "origin": "tile1"}}
    assert rows[2] in (None, {})  # untagged file: empty
