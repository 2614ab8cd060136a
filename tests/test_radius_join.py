"""radius_join completeness/exactness: the banded + lon-pruned plan must
reproduce the O(n²) brute force on adversarial geometry — pole clusters
(where the lon prune must effectively disable itself), antimeridian
straddles (wrapped Δλ), and pairs that straddle a latitude band edge."""

from __future__ import annotations

import numpy as np
import pytest

from geografir_spark.operators.radius_join import _hav_np, hav_tau, radius_join

RADIUS_M = 500_000.0


def _brute(pts):
    tau = hav_tau(RADIUS_M)
    out = set()
    for i, (ia, lona, lata) in enumerate(pts):
        for ib, lonb, latb in pts[i + 1:]:
            h = float(_hav_np(np.float64(lata), np.float64(lona),
                              np.float64(latb), np.float64(lonb)))
            if h <= tau:
                out.add((min(ia, ib), max(ia, ib)))
    return out


@pytest.fixture(scope="module")
def adversarial_pts():
    pts = [
        # pole cluster: tiny metric distances, huge lon differences
        (0, 10.0, 89.7), (1, 170.0, 89.8), (2, -120.0, 89.9), (3, 0.0, -89.95),
        (4, 179.0, -89.9),
        # antimeridian straddle at mid latitude (within 500 km)
        (10, 179.9, 40.0), (11, -179.9, 40.05),
        # same lon, straddling a band edge (band width ~4.5 deg at 500 km)
        (20, 30.0, 4.4961), (21, 30.0, 4.4970),
        # equator pair just inside / just outside the radius
        (30, 0.0, 0.0), (31, 4.49, 0.0), (32, 4.51, 0.0),
        # far-apart controls
        (40, 60.0, -30.0), (41, -60.0, 30.0),
    ]
    return pts


def test_matches_brute_force_adversarial(spark, adversarial_pts):
    df = spark.createDataFrame(
        adversarial_pts, "point_id LONG, lon DOUBLE, lat DOUBLE"
    )
    a = df.selectExpr("point_id AS a_id", "lon AS a_lon", "lat AS a_lat")
    b = df.selectExpr("point_id AS b_id", "lon AS b_lon", "lat AS b_lat")
    got = {
        (min(r["a_id"], r["b_id"]), max(r["a_id"], r["b_id"]))
        for r in radius_join(a, b, RADIUS_M).filter("a_id < b_id").collect()
    }
    want = _brute(adversarial_pts)
    assert got == want
    # the adversarial cases actually fire: pole pair, antimeridian pair,
    # band-edge pair present; just-outside pair absent
    assert (1, 2) in want and (10, 11) in want and (20, 21) in want
    assert (30, 31) in want and (30, 32) not in want


def test_matches_brute_force_random_globe(spark):
    rng = np.random.RandomState(11)
    n = 300
    pts = [
        (int(i), float(lon), float(lat))
        for i, (lon, lat) in enumerate(
            zip(rng.uniform(-180, 180, n), rng.uniform(-90, 90, n))
        )
    ]
    df = spark.createDataFrame(pts, "point_id LONG, lon DOUBLE, lat DOUBLE")
    a = df.selectExpr("point_id AS a_id", "lon AS a_lon", "lat AS a_lat")
    b = df.selectExpr("point_id AS b_id", "lon AS b_lon", "lat AS b_lat")
    got = {
        (r["a_id"], r["b_id"])
        for r in radius_join(a, b, RADIUS_M).filter("a_id < b_id").collect()
    }
    assert got == _brute(pts)
