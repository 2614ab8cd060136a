"""Areal interpolation (area-weighted zone-to-zone transfer): re-aggregate
a measure known per SOURCE zone onto an unrelated TARGET zone system,
weighting each source's contribution by the fraction of its area that
overlaps the target — the census-tracts→grid / admin→watershed statistic
re-basing operator of every spatial-stats stack (GIS literature:
area-weighted interpolation, the standard first-order method).

Inputs are axis-aligned rectangle zone relations (the same fixture
discipline as the PIP/bbox queries: rect algebra keeps the oracle exact);
general polygon zones compose through the exact cell-cover path —
cover both zone systems with ``geo/kernels.cell_cover`` cells, intersect
per cell, and the boundary cells fall back to this same rect formula on
the cell lattice.

Cross-engine exactness: the overlap fraction ``(ox·oy)/src_area`` is one
fixed left-to-right IEEE chain on coordinates that are themselves exact
expression outputs, each (source, target) contribution is floored to
1e-6 measure units (floor is exact), and the per-target total is a
BIGINT sum — aggregation-order independent, so Spark partial aggregates
and DuckDB agree bit-for-bit.

Scale shape: the join is a rect-overlap range join. The registry instance
joins a 25-row source dim to a 5-row target dim (BroadcastNestedLoop —
correct for dims); for big×big zone systems compose the candidate pairs
with ``operators/bbox_join.bbox_join`` (PBSM grid partitioning + dedup)
and feed them to the same weighted aggregation — the weight/sum SQL below
is join-strategy agnostic.

Reference parity note: the reference has no zonal re-aggregation code
(absent: no matching code under /root/reference/) — ENGINE operator in
the raster/vector zonal-stats family (SURVEY.md §2B).
"""

from __future__ import annotations

__all__ = ["areal_interp_sql"]


def areal_interp_sql(
    src_rel: str,
    tgt_rel: str,
    measure: str,
    dialect: str,  # noqa: ARG001 — pure rect/int algebra, identical dialects
) -> str:
    """Area-weighted transfer of ``measure`` from ``src_rel`` onto
    ``tgt_rel``.

    ``src_rel`` columns: ``src_id, minx, miny, maxx, maxy, <measure>``
    (measure integer-exact); ``tgt_rel`` columns: ``tgt_id, minx, miny,
    maxx, maxy``. Output: ``tgt_id, est_micro (BIGINT, 1e-6 measure
    units), n_src_parts`` — zero-overlap pairs are excluded by the strict
    inequality join in BOTH engines, so boundary-touching rectangles
    never contribute a 0-area row.
    """
    frac = (
        "((least(s.maxx, t.maxx) - greatest(s.minx, t.minx))"
        " * (least(s.maxy, t.maxy) - greatest(s.miny, t.miny)))"
        " / ((s.maxx - s.minx) * (s.maxy - s.miny))"
    )
    return f"""
    WITH s AS (SELECT * FROM {src_rel}),
         t AS (SELECT * FROM {tgt_rel}),
         pairs AS (SELECT t.tgt_id, s.src_id,
                          CAST(floor(CAST(s.{measure} AS DOUBLE)
                                     * ({frac}) * 1000000.0) AS BIGINT)
                            AS c_micro
                   FROM s JOIN t
                     ON s.minx < t.maxx AND t.minx < s.maxx
                    AND s.miny < t.maxy AND t.miny < s.maxy)
    SELECT tgt_id, CAST(sum(c_micro) AS BIGINT) AS est_micro,
           CAST(count(*) AS BIGINT) AS n_src_parts
    FROM pairs GROUP BY tgt_id
    """
