"""Datum-grade reprojection: geodetic↔ECEF, position-vector Helmert
(EPSG 9606), published datum parameter sets (OSGB36 / ED50 / Tokyo), and
EPSG:27700 British National Grid end-to-end through get_transform.

Golden anchor: the Ordnance Survey worked example from "A guide to
coordinate systems in Great Britain" (projection annex) — OSGB36
φ 52°39′27.2531″N λ 1°43′4.5177″E ↔ National Grid E 651409.903
N 313177.270 — reproduced to 0.5 mm by the vendored Krüger TM on Airy
1830 with lat0 folded into the effective false northing."""

from __future__ import annotations

import numpy as np
import pytest

from geografir_spark.geo.crs import (
    AIRY1830,
    BESSEL1841,
    INTL1924,
    WGS84,
    HelmertParams,
    TransformError,
    _bng_params,
    _DATUMS,
    datum_to_wgs84,
    ecef_to_geodetic,
    geodetic_to_ecef,
    get_transform,
    helmert_apply,
    tm_forward,
    wgs84_to_datum,
)

OS_PHI = 52 + 39 / 60 + 27.2531 / 3600   # OSGB36 latitude
OS_LAM = 1 + 43 / 60 + 4.5177 / 3600     # OSGB36 longitude
OS_E, OS_N = 651409.903, 313177.270      # published National Grid coords


def test_ecef_roundtrip_machine_precision():
    rng = np.random.RandomState(0)
    lon = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-85, 85, 200)
    for ellps in (WGS84, AIRY1830, INTL1924, BESSEL1841):
        lo, la = ecef_to_geodetic(*geodetic_to_ecef(lon, lat, ellps), ellps)
        np.testing.assert_allclose(lo, lon, atol=1e-12)
        np.testing.assert_allclose(la, lat, atol=1e-12)


def test_ecef_height_is_respected():
    x0, y0, z0 = geodetic_to_ecef(10.0, 45.0, WGS84, h=0.0)
    x1, y1, z1 = geodetic_to_ecef(10.0, 45.0, WGS84, h=1000.0)
    d = np.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2 + (z1 - z0) ** 2)
    assert abs(float(d) - 1000.0) < 1e-6  # along the ellipsoid normal


def test_helmert_identity_and_pure_translation():
    ident = HelmertParams(0, 0, 0, 0, 0, 0, 0)
    x, y, z = 3875000.0, 116000.0, 5047000.0
    assert helmert_apply(x, y, z, ident) == (x, y, z)
    t = HelmertParams(-87.0, -98.0, -121.0, 0, 0, 0, 0)
    np.testing.assert_allclose(
        helmert_apply(x, y, z, t), (x - 87.0, y - 98.0, z - 121.0))
    # reversed() undoes a pure translation exactly
    np.testing.assert_allclose(
        helmert_apply(*helmert_apply(x, y, z, t), t.reversed()), (x, y, z))


def test_os_worked_example_golden():
    E, N = tm_forward(OS_LAM, OS_PHI, **_bng_params())
    assert abs(float(E) - OS_E) < 5e-4
    assert abs(float(N) - OS_N) < 5e-4


def test_osgb36_shift_magnitude_at_greenwich():
    # OSGB36's zero meridian sits ~6″ east of the WGS84 one at Greenwich
    # (the famous ~100 m offset); the mean Helmert puts it at 5.83″, within
    # OSGB36's regional distortion of the published ~5.3″ astronomic gap.
    glon, glat = datum_to_wgs84(0.0, 51.4779, 4277)
    assert -6.5 < float(glon) * 3600 < -5.0
    assert 0.5 < (float(glat) - 51.4779) * 3600 < 3.0


def test_datum_roundtrips_within_region_of_use():
    rng = np.random.RandomState(1)
    domains = {
        4277: ((-8.0, 2.0), (49.5, 61.0)),    # Britain
        4230: ((-10.0, 30.0), (35.0, 62.0)),  # Europe
        4301: ((128.0, 146.0), (30.0, 46.0)), # Japan
    }
    for code, ((lo0, lo1), (la0, la1)) in domains.items():
        lon = rng.uniform(lo0, lo1, 100)
        lat = rng.uniform(la0, la1, 100)
        lo, la = wgs84_to_datum(*datum_to_wgs84(lon, lat, code), code)
        # < 1e-6 deg ≈ 10 cm: the 2-D (h=0) convention's error bound
        np.testing.assert_allclose(lo, lon, atol=1e-6)
        np.testing.assert_allclose(la, lat, atol=1e-6)


def test_datum_shift_is_resolvable_not_cosmetic():
    # the shift must be the 50–400 m class (well above the reference's
    # 0.01° golden tolerance ~1.1 km would hide, but far from zero)
    for code, lon, lat in [(4277, -1.5, 53.0), (4230, 10.0, 50.0),
                           (4301, 139.7, 35.7)]:
        lo, la = datum_to_wgs84(lon, lat, code)
        dist_m = float(np.hypot((lo - lon) * 111320 * np.cos(np.radians(lat)),
                                (la - lat) * 110540))
        assert 40.0 < dist_m < 500.0, (code, dist_m)


def test_bng_through_get_transform_end_to_end():
    # EPSG:27700 → EPSG:4326: the OS example point lands ~1.716°E (WGS84
    # longitude WEST of the OSGB36 longitude 1.7179° — Airy vs WGS84), and
    # the inverse returns to the grid coords within 2 cm
    f = get_transform(27700, 4326)
    wl, wp = f(OS_E, OS_N)
    assert abs(float(wl) - 1.7160) < 5e-4
    assert abs(float(wp) - 52.6580) < 5e-4
    g = get_transform(4326, 27700)
    e2, n2 = g(wl, wp)
    assert abs(float(e2) - OS_E) < 0.02
    assert abs(float(n2) - OS_N) < 0.02


def test_geographic_datum_codes_via_get_transform():
    f = get_transform(4277, 4326)
    lo, la = f(np.array([OS_LAM]), np.array([OS_PHI]))
    # same point as the 27700 path (shared Helmert): consistent to ~1e-9
    g = get_transform(27700, 4326)
    lo2, la2 = g(OS_E, OS_N)
    assert abs(float(lo[0]) - float(lo2)) < 1e-7
    assert abs(float(la[0]) - float(la2)) < 1e-7
    # vectorization preserved
    many = f(np.full(50, OS_LAM), np.full(50, OS_PHI))
    assert many[0].shape == (50,)
    with pytest.raises(TransformError):
        get_transform(4277, 99999)


def test_datum_registry_is_position_vector_signed():
    # OSGB36 datum→WGS84 must be the sign-flip of the OS-published
    # WGS84→OSGB36 set — pin the actual numbers so a convention slip
    # (position-vector vs coordinate-frame) cannot pass silently
    _, p = _DATUMS[4277]
    assert (p.tx, p.ty, p.tz) == (446.448, -125.157, 542.060)
    assert (p.rx, p.ry, p.rz) == (0.1502, 0.2470, 0.8421)
    assert p.s_ppm == -20.4894


def test_conform_across_datum_shifted_crs():
    """Integration: the flagship conform operator through the r5 datum
    path — a WGS84 lon/lat ramp conformed onto a British National Grid
    (EPSG:27700) reference tile. The BNG grid covers central England;
    each output pixel must equal the value of the source pixel whose
    lon/lat contains the datum-shifted (not merely projected) target
    center, which this test recomputes independently through the same
    public transform API the kernel uses internally."""
    from geografir_spark.raster.conform import conform_np

    # source: 100×100 WGS84 grid over Britain, value = row*100+col
    src = (np.arange(100 * 100, dtype=np.int32).reshape(1, 100, 100))
    # affine (a, b, c, d, e, f): x = a*col + c, y = e*row + f
    src_transform = (0.1, 0.0, -6.0, 0.0, -0.1, 59.0)
    # reference: 20×20 BNG tile, 5 km pixels, covering ~(400k,300k)
    ref_transform = (5000.0, 0.0, 380000.0, 0.0, -5000.0, 350000.0)
    ref_mask = np.zeros((1, 20, 20), dtype=bool)
    out, nod, dt = conform_np(
        src, src_transform, "EPSG:4326", -1,
        ref_mask, ref_transform, "EPSG:27700", 20, 20,
    )
    assert out.shape == (1, 20, 20) and (out != -1).all()
    # independent expectation via the public transform
    f = get_transform(27700, 4326)
    cols = np.arange(20) + 0.5
    rows = np.arange(20) + 0.5
    cg, rg = np.meshgrid(cols, rows)
    x = 5000.0 * cg + 380000.0
    y = -5000.0 * rg + 350000.0
    lon, lat = f(x.ravel(), y.ravel())
    sc = np.floor((lon - (-6.0)) / 0.1).astype(int)
    sr = np.floor((59.0 - lat) / 0.1).astype(int)
    expect = (sr * 100 + sc).reshape(20, 20)
    np.testing.assert_array_equal(out[0], expect)
    # and the datum shift is load-bearing: a no-datum (projection-only)
    # expectation computed by zeroing the Helmert must differ somewhere
    import geografir_spark.geo.crs as crsmod
    bng = crsmod._bng_params()
    lam2, phi2 = crsmod.tm_inverse(x.ravel(), y.ravel(), **bng)
    sc2 = np.floor((lam2 - (-6.0)) / 0.1).astype(int)
    sr2 = np.floor((59.0 - phi2) / 0.1).astype(int)
    assert ((sc2 != sc) | (sr2 != sr)).any()
