"""WKT + PIP + cover kernel unit tests (mirrors the reference's 7-type
matrix, geometry/tests/test_geometry.py:19-37, and the bbox contract,
test_bounding_box.py:77-86)."""

from __future__ import annotations

import numpy as np
import pytest

from geografir_spark.geo import cells, kernels, wkt

SEVEN_TYPES = [
    ("POINT (30 10)", (30, 10, 30, 10)),
    ("LINESTRING (30 10, 10 30, 40 40)", (10, 10, 40, 40)),
    ("POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))", (10, 10, 40, 40)),
    ("MULTIPOINT ((10 40), (40 30), (20 20), (30 10))", (10, 10, 40, 40)),
    ("MULTIPOINT (10 40, 40 30, 20 20, 30 10)", (10, 10, 40, 40)),
    (
        "MULTILINESTRING ((10 10, 20 20, 10 40), (40 40, 30 30, 40 20, 30 10))",
        (10, 10, 40, 40),
    ),
    (
        "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)),"
        " ((15 5, 40 10, 10 20, 5 10, 15 5)))",
        (5, 5, 45, 40),
    ),
    (
        "GEOMETRYCOLLECTION (POINT (40 10),"
        " LINESTRING (10 10, 20 20, 10 40),"
        " POLYGON ((40 40, 20 45, 45 30, 40 40)))",
        (10, 10, 45, 45),
    ),
]


@pytest.mark.parametrize("wkt_str,exp_bounds", SEVEN_TYPES)
def test_parse_roundtrip_and_bounds(wkt_str, exp_bounds):
    g = wkt.parse_wkt(wkt_str)
    # roundtrip: parse(to_wkt(g)) structurally equal
    g2 = wkt.parse_wkt(wkt.to_wkt(g))
    assert wkt.bounds(g) == wkt.bounds(g2)
    assert wkt.bounds(g) == pytest.approx(exp_bounds)


def test_parse_errors():
    with pytest.raises(wkt.WktError):
        wkt.parse_wkt("CIRCLE (0 0, 5)")
    with pytest.raises(wkt.WktError):
        wkt.parse_wkt("POINT 30 10")


def test_pip_square():
    poly = wkt.parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    px = np.array([5.0, 15.0, -1.0, 9.999, 0.5])
    py = np.array([5.0, 5.0, 5.0, 9.999, 0.5])
    np.testing.assert_array_equal(
        kernels.points_in_polygon(px, py, poly), [True, False, False, True, True]
    )


def test_pip_with_hole():
    poly = wkt.parse_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    )
    px = np.array([5.0, 3.0, 4.5])
    py = np.array([5.0, 3.0, 4.5])
    np.testing.assert_array_equal(
        kernels.points_in_polygon(px, py, poly), [False, True, False]
    )


def test_pip_concave():
    # concave "C" shape
    poly = wkt.parse_wkt(
        "POLYGON ((0 0, 10 0, 10 3, 3 3, 3 7, 10 7, 10 10, 0 10, 0 0))"
    )
    px = np.array([5.0, 1.5, 5.0])
    py = np.array([5.0, 5.0, 1.5])
    np.testing.assert_array_equal(
        kernels.points_in_polygon(px, py, poly), [False, True, True]
    )


def test_pip_multipolygon():
    mp = wkt.parse_wkt("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((10 10, 14 10, 14 14, 10 14, 10 10)))")
    px = np.array([2.0, 12.0, 7.0])
    py = np.array([2.0, 12.0, 7.0])
    np.testing.assert_array_equal(
        kernels.points_in_polygon(px, py, mp), [True, True, False]
    )


def test_cover_rectangle_full_classification():
    res = 6
    cw, ch = cells.cell_size(res)
    # rectangle spanning 4x4 cells exactly offset by half a cell
    minx, miny = -180 + 0.5 * cw, -90 + 0.5 * ch
    maxx, maxy = minx + 4 * cw, miny + 4 * ch
    w = f"POLYGON (({minx} {miny}, {maxx} {miny}, {maxx} {maxy}, {minx} {maxy}, {minx} {miny}))"
    cover, full = kernels.cover_geometry(w, res)
    assert len(cover) == 25  # 5x5 candidate cells
    assert full.sum() == 9   # interior 3x3 fully inside
    # every full cell's bounds within rect
    fminx, fminy, fmaxx, fmaxy = cells.cell_bounds_np(cover[full])
    assert (fminx >= minx).all() and (fmaxx <= maxx).all()


def test_cover_triangle_conservative():
    w = "POLYGON ((0 0, 20 0, 10 15, 0 0))"
    res = 7
    cover, full = kernels.cover_geometry(w, res)
    # full cells must truly be inside: all corners pass PIP
    g = wkt.parse_wkt(w)
    for c, f in zip(cover, full):
        minx, miny, maxx, maxy = cells.cell_bounds_np(np.asarray([c]))
        corners_in = all(
            kernels.points_in_polygon(np.array([x]), np.array([y]), g)[0]
            for x, y in [(minx[0], miny[0]), (minx[0], maxy[0]), (maxx[0], miny[0]), (maxx[0], maxy[0])]
        )
        if f:
            assert corners_in
