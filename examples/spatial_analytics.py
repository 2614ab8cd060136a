#!/usr/bin/env python
"""Spatial ANALYTICS chain — the engine's statistics composed over one
geocoded pages table, each stage an operator the registry oracle-checks
individually:

 1. density   geocode → Morton cell → pages per cell (the flagship tiling)
 2. cluster?  Moran's I of the density surface (is the crawl spatially
              clustered or random — rook adjacency, integer-exact)
 3. footprint convex hull of the hot cells' centers (distributed chain +
              bounded merge, exact integer milli-degrees)
 4. surface   IDW spend interpolation at coarse cell centers (fixed-point
              quantized weights)
 5. overview  one pyramid level of a synthetic tile mosaic (2×2 max-pool,
              checksum-pinned assembly)

Run: python examples/spatial_analytics.py [sf_dir]   (default sf0.001)
Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from geografir_spark.queries import QUERIES
    from geografir_spark.session import get_spark
    from geografir_spark.shipping import ensure_shipped

    spark = get_spark("spatial-analytics")
    ensure_shipped(spark)

    density = QUERIES["pages_per_cell"].fn(spark, sf_dir)
    top = density.orderBy("n_pages", ascending=False).limit(5).collect()
    print(json.dumps({"stage": "density", "n_cells": density.count(),
                      "hottest": [[r["cell"], r["n_pages"]] for r in top]}))

    moran = QUERIES["morans_i_pages"].fn(spark, sf_dir).collect()[0]
    print(json.dumps({"stage": "morans_i", "i": moran["morans_i"],
                      "n_cells": moran["n_cells"], "n_edges": moran["n_edges"]}))

    hull = QUERIES["customer_hull"].fn(spark, sf_dir)
    print(json.dumps({"stage": "hull",
                      "vertices": [[r["xm"], r["ym"]] for r in hull.collect()]}))

    idw = QUERIES["idw_spend_surface"].fn(spark, sf_dir)
    peak = idw.orderBy("idw", ascending=False).limit(1).collect()[0]
    print(json.dumps({"stage": "idw", "n_targets": idw.count(),
                      "peak_cell": [peak["xi"], peak["yi"]],
                      "peak_value": round(peak["idw"], 2)}))

    pyr = QUERIES["tile_pyramid"].fn(spark, sf_dir)
    print(json.dumps({"stage": "pyramid", "n_parents": pyr.count()}))

    gi = QUERIES["getis_ord_hotspots"].fn(spark, sf_dir).limit(3).collect()
    print(json.dumps({"stage": "gi_star_hotspots",
                      "top": [[r["xi"], r["yi"], round(r["gi_star"], 3)]
                              for r in gi]}))

    db = QUERIES["cell_dbscan_clusters"].fn(spark, sf_dir)
    sizes = sorted((r["n_cells"] for r in db.collect()), reverse=True)
    print(json.dumps({"stage": "dbscan", "n_clusters": len(sizes),
                      "sizes": sizes[:5]}))

    em = QUERIES["emerging_hotspots"].fn(spark, sf_dir)
    trend = {r["trend"]: r["n"] for r in
             em.groupBy("trend").count().withColumnRenamed("count", "n").collect()}
    print(json.dumps({"stage": "emerging", "trend_counts": trend}))

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
