"""Vendored WKT parser/writer for the 7 geometry types the reference
supports (Point, LineString, Polygon, MultiPoint, MultiLineString,
MultiPolygon, GeometryCollection — geometry/tests/test_geometry.py:19-37).

shapely is not available in this environment (verified absent), so the
engine carries a minimal, dependency-free representation:

    Geom = (kind: str, data)
      POINT              data = (x, y)
      LINESTRING         data = ndarray (N, 2)
      POLYGON            data = [ring0, ring1, ...]   (each ndarray (N, 2),
                                closed; ring0 exterior, rest holes)
      MULTIPOINT         data = ndarray (N, 2)
      MULTILINESTRING    data = [ndarray (N, 2), ...]
      MULTIPOLYGON       data = [[rings], ...]
      GEOMETRYCOLLECTION data = [Geom, ...]

Used only inside pandas-UDF kernels (parse once per distinct WKT per batch);
never row-at-a-time on the hot path.
"""

from __future__ import annotations

import re

import numpy as np

_TYPES = (
    "GEOMETRYCOLLECTION",
    "MULTIPOLYGON",
    "MULTILINESTRING",
    "MULTIPOINT",
    "POLYGON",
    "LINESTRING",
    "POINT",
)


class WktError(ValueError):
    pass


def _coords(body: str) -> np.ndarray:
    pts = []
    for pair in body.split(","):
        parts = pair.split()
        if len(parts) < 2:
            raise WktError(f"bad coordinate pair: {pair!r}")
        pts.append((float(parts[0]), float(parts[1])))
    return np.asarray(pts, dtype=np.float64)


def _split_top(body: str) -> list[str]:
    """Split on commas at paren depth 0."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(body[start:i])
            start = i + 1
    out.append(body[start:])
    return [s.strip() for s in out]


def _strip_parens(s: str) -> str:
    s = s.strip()
    if not (s.startswith("(") and s.endswith(")")):
        raise WktError(f"expected parenthesized body: {s[:40]!r}")
    return s[1:-1].strip()


def parse_wkt(wkt: str):
    s = wkt.strip()
    up = s.upper()
    for t in _TYPES:
        if up.startswith(t):
            rest = s[len(t):].strip()
            break
    else:
        raise WktError(f"unknown geometry type in: {s[:40]!r}")
    if rest.upper() == "EMPTY":
        return (t, None)
    body = _strip_parens(rest)
    if t == "POINT":
        c = _coords(body)[0]
        return (t, (float(c[0]), float(c[1])))
    if t in ("LINESTRING", "MULTIPOINT"):
        # MULTIPOINT accepts both ((1 2), (3 4)) and (1 2, 3 4)
        if t == "MULTIPOINT" and "(" in body:
            pts = [_coords(_strip_parens(p))[0] for p in _split_top(body)]
            return (t, np.asarray(pts, dtype=np.float64))
        return (t, _coords(body))
    if t == "POLYGON":
        return (t, [_coords(_strip_parens(r)) for r in _split_top(body)])
    if t == "MULTILINESTRING":
        return (t, [_coords(_strip_parens(r)) for r in _split_top(body)])
    if t == "MULTIPOLYGON":
        polys = []
        for poly in _split_top(body):
            pb = _strip_parens(poly)
            polys.append([_coords(_strip_parens(r)) for r in _split_top(pb)])
        return (t, polys)
    if t == "GEOMETRYCOLLECTION":
        return (t, [parse_wkt(g) for g in _split_top(body)])
    raise WktError(t)


def _fmt(v: float) -> str:
    return repr(float(v))


def _ring_wkt(ring: np.ndarray) -> str:
    return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in ring) + ")"


def to_wkt(geom) -> str:
    kind, data = geom
    if data is None:
        return f"{kind} EMPTY"
    if kind == "POINT":
        return f"POINT ({_fmt(data[0])} {_fmt(data[1])})"
    if kind in ("LINESTRING", "MULTIPOINT"):
        return f"{kind} " + _ring_wkt(np.asarray(data))
    if kind in ("POLYGON", "MULTILINESTRING"):
        return f"{kind} (" + ", ".join(_ring_wkt(r) for r in data) + ")"
    if kind == "MULTIPOLYGON":
        return "MULTIPOLYGON (" + ", ".join(
            "(" + ", ".join(_ring_wkt(r) for r in poly) + ")" for poly in data
        ) + ")"
    if kind == "GEOMETRYCOLLECTION":
        return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(g) for g in data) + ")"
    raise WktError(kind)


def bounds(geom) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) — per-axis coordinate min/max, the exact
    contract of BoundingBox.from_geometry (reference
    geometry/src/geometry/bounding_box.py:138-169, pinned by
    geometry/tests/test_bounding_box.py:77-86)."""
    kind, data = geom
    if data is None:
        raise WktError("bounds of EMPTY geometry")
    if kind == "POINT":
        x, y = data
        return (x, y, x, y)
    if kind in ("LINESTRING", "MULTIPOINT"):
        a = np.asarray(data)
        return (a[:, 0].min(), a[:, 1].min(), a[:, 0].max(), a[:, 1].max())
    if kind in ("POLYGON", "MULTILINESTRING"):
        a = np.vstack(data)
        return (a[:, 0].min(), a[:, 1].min(), a[:, 0].max(), a[:, 1].max())
    if kind == "MULTIPOLYGON":
        a = np.vstack([r for poly in data for r in poly])
        return (a[:, 0].min(), a[:, 1].min(), a[:, 0].max(), a[:, 1].max())
    if kind == "GEOMETRYCOLLECTION":
        bs = np.asarray([bounds(g) for g in data])
        return (bs[:, 0].min(), bs[:, 1].min(), bs[:, 2].max(), bs[:, 3].max())
    raise WktError(kind)


def polygon_rings(geom) -> list[np.ndarray]:
    """All rings of a POLYGON/MULTIPOLYGON (even-odd PIP operates on the
    union of rings)."""
    kind, data = geom
    if kind == "POLYGON":
        return list(data)
    if kind == "MULTIPOLYGON":
        return [r for poly in data for r in poly]
    raise WktError(f"not a polygonal geometry: {kind}")


def is_axis_rectangle(geom) -> bool:
    """True when the geometry is a single-ring POLYGON identical to its own
    bbox — the fast full-cell-containment path in the spatial join."""
    kind, data = geom
    if kind != "POLYGON" or len(data) != 1:
        return False
    ring = data[0]
    if len(ring) not in (4, 5):
        return False
    xs, ys = set(ring[:, 0].tolist()), set(ring[:, 1].tolist())
    return len(xs) == 2 and len(ys) == 2


def geometry_repr(wkt_str: str, crs: str) -> str:
    """Debug repr of a (wkt, crs) pair — the reference's
    ``Geometry.__repr__`` shape (geometry.py:242-245), with the shapely
    ``<WKT>`` inner form."""
    return f"Geometry(geometry=<{wkt_str}>, crs='{crs}')"


def bbox_repr(minx: float, miny: float, maxx: float, maxy: float, crs: str) -> str:
    """Debug repr of a bounding box — ``BoundingBox.__repr__``
    (bounding_box.py:176-179)."""
    return (
        f"BoundingBox(minx={minx}, miny={miny}, maxx={maxx}, maxy={maxy},"
        f" crs='{crs}')"
    )


def simplify_ring(ring: "np.ndarray", tol: float) -> "np.ndarray":
    """Douglas-Peucker ring simplification (closed ring in, closed ring
    out; first point pinned). The pre-simplify step the PIP/cover kernels
    document for huge polygons — O(edges) work per retained vertex,
    deterministic, no RNG. Degenerate outputs (< 4 points incl. closure)
    return the original ring."""
    import numpy as np

    pts = ring[:-1]  # drop closure
    n = len(pts)
    if n <= 3:
        return ring
    keep = np.zeros(n, dtype=bool)
    keep[0] = True
    # treat the closed ring as the open polyline pts[0..n-1] + back to pts[0]
    stack = [(0, n)]  # segment from index i to index j % n
    while stack:
        i, j = stack.pop()
        a = pts[i]
        b = pts[j % n]
        seg = b - a
        idxs = np.arange(i + 1, j)
        if len(idxs) == 0:
            continue
        rel = pts[idxs] - a
        denom = float(seg[0] * seg[0] + seg[1] * seg[1])
        if denom == 0.0:
            d = np.sqrt((rel ** 2).sum(axis=1))
        else:
            d = np.abs(seg[0] * rel[:, 1] - seg[1] * rel[:, 0]) / np.sqrt(denom)
        k = int(np.argmax(d))
        if d[k] > tol:
            m = idxs[k]
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    out = pts[keep]
    if len(out) < 3:
        return ring
    return np.vstack([out, out[:1]])


def simplify_wkt(wkt_str: str, tol: float) -> str:
    """Simplify every ring of a POLYGON/MULTIPOLYGON WKT (other types pass
    through unchanged)."""
    geom = parse_wkt(wkt_str)
    kind, data = geom
    if kind == "POLYGON":
        return to_wkt((kind, [simplify_ring(r, tol) for r in data]))
    if kind == "MULTIPOLYGON":
        return to_wkt(
            (kind, [[simplify_ring(r, tol) for r in poly] for poly in data])
        )
    return wkt_str
