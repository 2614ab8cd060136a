"""CRS normalization + vendored transform tests.

Golden reprojection pairs are the reference's own fixtures
(geometry/tests/test_geometry.py:95-138), checked with the reference's
tolerance (equals_exact 0.01, :153-155).
"""

from __future__ import annotations

import numpy as np
import pytest

from geografir_spark.geo import crs as crsmod


@pytest.mark.parametrize(
    "spec,expected",
    [
        (4326, "EPSG:4326"),
        ("EPSG:4326", "EPSG:4326"),
        ("epsg:4326", "EPSG:4326"),
        ("4326", "EPSG:4326"),
        (3857, "EPSG:3857"),
        (32633, "EPSG:32633"),
        (2154, "EPSG:2154"),
        ("urn:ogc:def:crs:EPSG::26910", "EPSG:26910"),
    ],
)
def test_ensure_crs(spec, expected):
    assert crsmod.ensure_crs(spec) == expected


def test_ensure_crs_invalid():
    with pytest.raises(crsmod.CRSError, match="Invalid target CRS specification"):
        crsmod.ensure_crs("invalid_crs")
    with pytest.raises(crsmod.CRSError):
        crsmod.ensure_crs(None)  # type: ignore[arg-type]


# golden: (src_crs, (x, y), dst_crs, (x2, y2)) — test_geometry.py:95-138
GOLDENS = [
    (4326, (-120.185, 39.3569), 26910, (742545.777, 4360163.483)),
    (26910, (742545.777, 4360163.483), 4326, (-120.185, 39.3569)),
    (4326, (-119.2265119, 47.1494626), 5070, (-1753062.53068809, 2899526.83714174)),
    (4326, (-76.8890466, 40.6633579), 5070, (1591497.34267417, 2121855.51950513)),
    (4326, (-98.5617967, 29.3224771), 5070, (-248908.09041749, 697602.45076673)),
    (5070, (-1753062.53068809, 2899526.83714174), 4326, (-119.2265119, 47.1494626)),
    (5070, (1591497.34267417, 2121855.51950513), 4326, (-76.8890466, 40.6633579)),
    (5070, (-248908.09041749, 697602.45076673), 4326, (-98.5617967, 29.3224771)),
]


@pytest.mark.parametrize("src,pt,dst,expected", GOLDENS)
def test_transform_goldens(src, pt, dst, expected):
    xform = crsmod.get_transform(src, dst)
    x, y = xform(np.asarray([pt[0]]), np.asarray([pt[1]]))
    # reference tolerance: shapely equals_exact(tolerance=0.01)
    assert abs(x[0] - expected[0]) <= 0.01, (x[0], expected[0])
    assert abs(y[0] - expected[1]) <= 0.01, (y[0], expected[1])


def test_transform_roundtrips():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-125, -67, 200)
    lat = rng.uniform(25, 49, 200)
    for code in (5070, 3857, 26910, 32610):
        fwd = crsmod.get_transform(4326, code)
        inv = crsmod.get_transform(code, 4326)
        x, y = fwd(lon, lat)
        lon2, lat2 = inv(x, y)
        # ~1e-7 deg ≈ 1 cm, matching the reference's own golden tolerance
        np.testing.assert_allclose(lon2, lon, atol=1e-7)
        np.testing.assert_allclose(lat2, lat, atol=1e-7)


def test_transform_identity_and_errors():
    ident = crsmod.get_transform(4326, "epsg:4326")
    x, y = ident([1.0], [2.0])
    assert x[0] == 1.0 and y[0] == 2.0
    with pytest.raises(crsmod.TransformError, match="Unable to create transformer"):
        crsmod.get_transform(4326, 2154)  # Lambert-93 not vendored
