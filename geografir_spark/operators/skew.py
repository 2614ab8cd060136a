"""Explicit spatial-skew handling (BASELINE.json north_rule: "partitioning /
shuffle / skew handled explicitly"; north_star: "salted cell-key
repartitioning and adaptive quadtree cell splitting on hot cells").

Two data-dependent rewrites Catalyst cannot do on its own (AQE's skew-join
splitting is the runtime backstop — enabled in session.py — but it only
splits at shuffle-block granularity and does nothing for hot *aggregation*
keys):

- ``salt_hot_cells``      — append a salt to cells whose row count exceeds a
  threshold, so one hot cell's rows spread over k reducers. Aggregations run
  per (cell, salt) then re-combine; joins replicate the other side per salt.
- ``split_hot_cells``     — adaptive quadtree refinement: re-encode hot
  cells' rows at a finer resolution (children of a Z-order cell are exactly
  the 4 sub-quadrants), preserving spatial semantics while quartering the
  key mass per level.

Both start from the same histogram (one groupBy-count over the cell column,
collected only for the hot head — bounded by ``max_hot``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geografir_spark.geo import cells


def hot_cell_histogram(df: DataFrame, cell_col: str = "cell", threshold: int = 100_000,
                       max_hot: int = 10_000) -> DataFrame:
    """Cells whose row count exceeds ``threshold`` (the skew head)."""
    return (
        df.groupBy(cell_col)
        .count()
        .filter(F.col("count") > threshold)
        .orderBy(F.desc("count"))
        .limit(max_hot)
    )


def salt_hot_cells(
    df: DataFrame,
    *,
    cell_col: str = "cell",
    threshold: int = 100_000,
    n_salts: int = 16,
    salt_col: str = "salt",
    hash_col: str = "page_id",
) -> DataFrame:
    """Add a salt column: 0 for cold cells, pmod(xxhash64(hash_col), n) for
    hot ones. Downstream groupBy((cell, salt)) spreads each hot cell over
    ``n_salts`` reducers; re-aggregate the partials afterwards."""
    hot = hot_cell_histogram(df, cell_col, threshold).select(
        F.col(cell_col).alias("__hot_cell")
    )
    out = df.join(
        F.broadcast(hot), df[cell_col] == F.col("__hot_cell"), "left"
    )
    return out.withColumn(
        salt_col,
        F.when(
            F.col("__hot_cell").isNotNull(),
            F.pmod(F.xxhash64(F.col(hash_col)), F.lit(n_salts)),
        ).otherwise(F.lit(0)),
    ).drop("__hot_cell")


def split_hot_cells(
    df: DataFrame,
    *,
    cell_col: str = "cell",
    lon_col: str = "lon",
    lat_col: str = "lat",
    threshold: int = 100_000,
    levels: int = 2,
) -> DataFrame:
    """Adaptive quadtree split: rows in hot cells are re-encoded ``levels``
    resolutions finer (4^levels children per hot cell); cold rows keep their
    cell. The output cell column mixes resolutions — exactly how an adaptive
    spatial index looks; ``cells.res_sql`` recovers each row's level."""
    hot = hot_cell_histogram(df, cell_col, threshold).select(
        F.col(cell_col).alias("__hot_cell")
    )
    out = df.join(F.broadcast(hot), df[cell_col] == F.col("__hot_cell"), "left")
    # res of the current cell + levels, capped at MAX_RES
    fine_res = f"least(({cells.res_sql(cell_col)}) + {levels}, {cells.MAX_RES})"
    # encode_steps needs a literal res, but fine_res varies per row — so
    # encode once at MAX_RES and take each row's ancestor at its own
    # fine_res (pure bit math, no second geocode). All in one step chain
    # (apply_steps drops __ temps at the end).
    steps = cells.encode_steps(lon_col, lat_col, cells.MAX_RES, "__max_cell")
    fine_cell = (
        f"(((( __max_cell >> {cells.RES_BITS} ) >> (2 * ({cells.MAX_RES} - ({fine_res})))) "
        f"<< {cells.RES_BITS}) | ({fine_res}))"
    )
    steps.append(
        {
            # no "__" prefix: apply_steps drops __ temps after the chain
            "split_cell_tmp": (
                f"CASE WHEN __hot_cell IS NOT NULL THEN {fine_cell}"
                f" ELSE {cell_col} END"
            )
        }
    )
    out = cells.apply_steps(out, steps)
    return (
        out.withColumn(cell_col, F.col("split_cell_tmp"))
        .drop("__hot_cell", "split_cell_tmp")
    )
