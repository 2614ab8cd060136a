"""Distributed convex hull — the extent/footprint operator of the
geometry family (the reference wraps per-object Shapely geometry,
geometry/src/geometry/geometry.py; it has no multi-row hull — absent
under /root/reference/ — so this is an ENGINE operator lifting the
point-SET operation to a distributed table).

Algorithm (the textbook distributed reduction): each partition computes
its LOCAL hull with Andrew's monotone chain (numpy, Arrow-batched via
mapInPandas), and only those boundary points — O(h) per partition, h =
local hull size — are collected to the driver for the final chain. The
driver-side merge is bounded metadata (Σ partition-hull sizes, ≤ a few
hundred points for any sane partition count), the same bounded-collect
class as the IVF training sample: the POINT DATA never moves, only hull
candidates.

Correctness of the reduction: a point on the global hull boundary is on
the hull boundary of every subset containing it, so partition-local
hulls never discard a global boundary point. Both chain passes RETAIN
collinear boundary points (pop only on strict right turns) — this makes
the vertex-set contract match the oracle's all-left edge test, which is
non-strict and therefore includes collinear boundary points.

Exactness: inputs are scaled to integer milli-degrees by the caller, so
every cross product is exact BIGINT arithmetic in the kernel AND in the
quadratic SQL oracle (for each ordered pair (p,q): p is a hull vertex
iff some q has ALL points on the left, cross ≥ 0) — no float orientation
hazard anywhere.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["convex_hull", "hull_edges_sql", "monotone_chain"]


def monotone_chain(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain over integer coordinates, RETAINING
    collinear boundary points. pts: (n, 2) int64. Returns the unique
    boundary points sorted by (x, y) — a canonical SET, not a ring."""
    pts = np.unique(pts, axis=0)  # sorts lexicographically by (x, y)
    if len(pts) <= 2:
        return pts

    def half(seq):
        out: list = []
        for p in seq:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                cross = (a[0] - o[0]) * (p[1] - o[1]) - (a[1] - o[1]) * (p[0] - o[0])
                if cross < 0:  # strict right turn: a is not on this chain
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = lower[:-1] + upper[:-1]
    return np.unique(np.array(ring, dtype=np.int64), axis=0)


def convex_hull(
    df: DataFrame, x: str, y: str, *, max_candidates: int = 100_000
) -> DataFrame:
    """Hull vertex set of the integer point columns (x, y) of ``df``.
    Returns a DataFrame (xm, ym) — BIGINT milli-degrees by convention.

    Boundedness caveat, stated honestly: the driver collect is
    Σ min(h_p, n_p) over partitions — tiny for real spatial data (hulls
    of uniform/clustered points grow ~log n), but an adversarial input
    with every point ON its hull (a circle) makes the OUTPUT itself
    O(n), which no algorithm avoids. The ``max_candidates`` guard turns
    that case into an explicit error instead of a silent driver OOM;
    raise it deliberately when a huge hull is genuinely wanted."""
    spark = df.sparkSession

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = []
        for pdf in batches:
            if len(pdf):
                acc.append(pdf[[x, y]].to_numpy(dtype=np.int64))
        if acc:
            h = monotone_chain(np.concatenate(acc))
            yield pd.DataFrame({"xm": h[:, 0], "ym": h[:, 1]})

    partial = df.select(x, y).mapInPandas(local, "xm bigint, ym bigint")
    # bounded collect: only partition-hull candidates reach the driver
    rows = partial.limit(max_candidates + 1).collect()  # one job, capped
    if len(rows) > max_candidates:
        raise ValueError(
            f"convex_hull: over {max_candidates} partition-hull candidates"
            " — the hull itself is huge (circle-like data); raise"
            " max_candidates deliberately if the O(hull) driver merge is"
            " acceptable"
        )
    cand = np.array([(r["xm"], r["ym"]) for r in rows], dtype=np.int64)
    final = monotone_chain(cand) if len(cand) else cand.reshape(0, 2)
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in final], "xm bigint, ym bigint"
    )


def hull_edges_sql(rel: str, x: str, y: str, dialect: str) -> str:  # noqa: ARG001
    """Quadratic oracle form: a (deduped) point is a hull vertex iff some
    ordered pair (p, q) has EVERY point on the left of p→q (cross ≥ 0,
    non-strict — collinear boundary points included). Exact BIGINT cross
    products; O(n²) pairs × anti-join — an ORACLE, not the scale path."""
    return f"""
    WITH pts AS (SELECT DISTINCT {x} AS xm, {y} AS ym FROM {rel}),
         prs AS (SELECT p.xm AS px, p.ym AS py, q.xm AS qx, q.ym AS qy
                 FROM pts p JOIN pts q
                   ON NOT (p.xm = q.xm AND p.ym = q.ym)),
         eg AS (SELECT px, py FROM prs
                WHERE NOT EXISTS (
                  SELECT 1 FROM pts r
                  WHERE (prs.qx - prs.px) * (r.ym - prs.py)
                      - (prs.qy - prs.py) * (r.xm - prs.px) < 0))
    SELECT DISTINCT px AS xm, py AS ym FROM eg
    """
