"""Raster pyramid / COG-overview build: downsample a tiled mosaic one
cell-resolution level by 2×2 max-pooling — the overview-generation pass a
tile server or COG writer runs for every zoom level (the reference's COG
profile declares overview-bearing layouts, raster_array profiles.py; the
reference itself has no pyramid builder — absent under /root/reference/ —
so this is an ENGINE operator in the raster family).

Layout algebra: child tiles are 8×8 pixels at cell resolution R; four
children (2X..2X+1, 2Y..2Y+1) pool into one 8×8 parent tile at R−1. Each
child pools locally (2×2 blocks never straddle a tile — tile edges are
even-aligned), contributing one 4×4 quadrant; the quadrant row block is
NORTH for odd yi (pixel rows are top-down, grid yi grows north). A parent
missing a child (mosaic edge) is PARTIAL: its absent positions simply
don't exist, and n_px < 64 reports the coverage — the same contract the
focal support rule uses at mosaic edges.

Everything is built-in array SQL (transform/greatest/posexplode — zero
Python, zero UDF): the pooling fan-in is 4:1 so the shuffle is a quarter
of the input rows, grouped by parent cell. max-pooling is nodata-correct
for the engine's lattice (nodata = −1 < all valid values ≥ 0), matching
plain ``max()`` in the oracle.

Cross-engine exactness: counts, BIGINT sums of integer-valued pixels,
and a position-weighted BIGINT checksum ``Σ (pos+1)·val`` that pins the
exact quadrant assembly (a transposed or misplaced quadrant changes the
checksum even when the value multiset is identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geografir_spark.geo import cells

__all__ = ["pyramid_stats"]

# child 8×8 row-major top-down → 4×4 max-pooled (j = r'*4 + c'); element_at
# is 1-based: block base index = 16·r' + 2·c'
_POOL_EXPR = (
    "transform(sequence(0, 15), j -> greatest("
    " element_at(pixels, CAST((j DIV 4) * 16 + (j % 4) * 2 + 1 AS INT)),"
    " element_at(pixels, CAST((j DIV 4) * 16 + (j % 4) * 2 + 2 AS INT)),"
    " element_at(pixels, CAST((j DIV 4) * 16 + (j % 4) * 2 + 9 AS INT)),"
    " element_at(pixels, CAST((j DIV 4) * 16 + (j % 4) * 2 + 10 AS INT))))"
)


def pyramid_stats(tiles: DataFrame, *, res_child: int, nodata: float = -1.0) -> DataFrame:
    """One pyramid level up from ``tiles`` (cell, xi, yi, pixels — 8×8
    row-major top-down doubles at resolution ``res_child``).

    Returns per PARENT tile (cell at ``res_child − 1``): ``n_px`` (present
    positions, 64 for interior parents), ``n_valid`` (non-nodata),
    ``sum_valid``, ``max_val`` (NULL if no valid pixel), ``checksum``
    (Σ (pos+1)·val over present positions incl. nodata) — all BIGINT.
    """
    pooled = tiles.selectExpr(
        "xi DIV 2 AS pxi",
        "yi DIV 2 AS pyi",
        # quadrant row block: odd yi = north child = parent rows 0..3
        "CASE WHEN yi % 2 = 1 THEN 0 ELSE 1 END AS qr",
        "xi % 2 AS qc",
        f"{_POOL_EXPR} AS pooled",
    )
    rows = pooled.selectExpr(
        "pxi", "pyi",
        "posexplode(pooled) AS (j, val)",
        "qr", "qc",
    ).selectExpr(
        "pxi", "pyi",
        "(qr * 4 + j DIV 4) * 8 + qc * 4 + (j % 4) AS pos",
        "val",
    )
    keyed = cells.apply_steps(rows, cells.encode_idx_steps("pxi", "pyi", res_child - 1))
    return keyed.groupBy("cell").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_px"),
        F.expr(f"CAST(sum(CASE WHEN val != {nodata!r} THEN 1 ELSE 0 END) AS BIGINT)").alias("n_valid"),
        F.expr(
            f"CAST(sum(CASE WHEN val != {nodata!r} THEN CAST(val AS BIGINT) ELSE 0 END) AS BIGINT)"
        ).alias("sum_valid"),
        F.expr(
            f"max(CASE WHEN val != {nodata!r} THEN CAST(val AS BIGINT) END)"
        ).alias("max_val"),
        F.expr("CAST(sum((pos + 1) * CAST(val AS BIGINT)) AS BIGINT)").alias("checksum"),
    )
