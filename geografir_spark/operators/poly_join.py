"""Polygon × polygon intersects join (st_intersects) — filter-refine.

Candidates come from the cover-cell equi-join: any two genuinely
intersecting polygons contain a common point, whose cell lies in BOTH
covers, so the prefilter has no false dismissals. The refine is the exact
shared-formula test (geo.kernels.polygons_intersect): proper edge
crossings by orientation signs + first-vertex containment each way —
the identical IEEE expressions the SQL oracle evaluates.

Scale: shuffle is O(cover rows) on the int64 cell key (broadcast when one
side is small); the O(E_a × E_b) refine runs once per DISTINCT candidate
pair, Arrow-batched with parsed-geometry caching.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geografir_spark.operators.pip_join import cover_cells


def polygon_self_intersects_join(
    polys: DataFrame,
    *,
    res: int,
    id_col: str = "zone_id",
    wkt_col: str = "geom_wkt",
) -> DataFrame:
    """All pairs (id_a < id_b) of polygons that intersect under the shared
    formula contract. Output: (zone_a, zone_b)."""
    cov = cover_cells(polys, wkt_col, res).select(
        F.col(id_col).alias("__id"), F.col(wkt_col).alias("__wkt"), "cell"
    )
    a = cov.selectExpr("__id AS zone_a", "__wkt AS __wa", "cell")
    b = cov.selectExpr("__id AS zone_b", "__wkt AS __wb", "cell AS __cb")
    cand = (
        a.join(F.broadcast(b), (a["cell"] == b["__cb"]) & (F.col("zone_a") < F.col("zone_b")))
        .select("zone_a", "zone_b", "__wa", "__wb")
        .dropDuplicates(["zone_a", "zone_b"])
    )

    out_schema = "zone_a bigint, zone_b bigint"

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from geografir_spark.geo import kernels as gk
        from geografir_spark.geo import wkt as wktmod

        cache: dict = {}

        def geom(w):
            g = cache.get(w)
            if g is None:
                g = wktmod.parse_wkt(w)
                cache[w] = g
            return g

        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = [
                gk.polygons_intersect(geom(wa), geom(wb))
                for wa, wb in zip(pdf["__wa"], pdf["__wb"])
            ]
            yield pdf.loc[keep, ["zone_a", "zone_b"]]

    return cand.mapInPandas(refine, schema=out_schema)
