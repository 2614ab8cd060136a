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


def cover_geometry(wkt_str: str, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Covering cells of a geometry at ``res`` → (cells, full_flags).

    full=True cells are entirely inside the geometry (join rows on them skip
    the exact PIP refine — the dominant case for large zones at scale).
    Classification:
      - axis-aligned rectangle polygons: full ⟺ cell rect ⊆ bbox (exact);
      - general polygons: full ⟺ all 4 cell corners inside AND cell smaller
        than any polygon edge could cross undetected — conservatively we
        only use the corner test when no polygon vertex lies inside the
        cell; otherwise partial (safe: refine re-checks).
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
    # general polygon: corner containment test + vertex-in-cell veto
    kind, _ = geom
    if kind in ("POLYGON", "MULTIPOLYGON"):
        corners_in = np.ones(len(cover), dtype=bool)
        for cx, cy in ((cminx, cminy), (cminx, cmaxy), (cmaxx, cminy), (cmaxx, cmaxy)):
            corners_in &= points_in_polygon(cx, cy, geom)
        verts = np.vstack(wkt.polygon_rings(geom))
        vx, vy = verts[:, 0], verts[:, 1]
        has_vertex = np.zeros(len(cover), dtype=bool)
        for i in range(len(cover)):
            has_vertex[i] = (
                (vx >= cminx[i]) & (vx <= cmaxx[i]) & (vy >= cminy[i]) & (vy <= cmaxy[i])
            ).any()
        # NOTE: corner test alone can misclassify a cell crossed by an edge
        # whose endpoints are outside the cell; vetoing vertex-containing
        # cells covers the common case, and the residual risk is removed by
        # treating only rectangle-fast-path cells as skip-refine in
        # operators.pip_join (general-polygon "full" cells still go through
        # refine when strict=True, the default).
        full = corners_in & ~has_vertex
        return cover, full
    return cover, np.zeros(len(cover), dtype=bool)
