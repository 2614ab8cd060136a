"""Grid-cell kNN join via adaptive ring expansion.

Algorithm (BASELINE.json north_star: "grid-cell kNN via cell-ring
expansion"):

1. index queries and targets to cells at ``res``;
2. round r: explode each unsatisfied query to its chebyshev disk of radius
   r (mapInPandas over the vectorized ``cells.disk_vec_np``), equi-join on
   cell, take per-query top-k by exact squared-euclidean distance
   (window row_number, ties broken by target id);
3. a query is **done** when it has k candidates and its kth distance ≤
   (r · min(cell_w, cell_h))² — any target outside the disk is at least
   r·min(cw,ch) away, so the top-k cannot change;
4. unsatisfied queries double r; after ``max_rounds`` the (rare) stragglers
   are finished with an exact brute-force join.

Every round is joins + windows on integer cell keys — the shuffle pattern
scales with candidate counts, not with |targets|; only the disk explode
touches Python (Arrow-batched, vectorized).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geografir_spark.geo import cells


def _disk_explode(df: DataFrame, cell_col: str, radius: int) -> DataFrame:
    """Replace each row's cell with every cell in its radius-r disk."""
    schema = df.schema

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows, neigh = cells.disk_vec_np(pdf[cell_col].to_numpy(), radius)
            out = pdf.iloc[rows].reset_index(drop=True)
            out[cell_col] = neigh
            yield out

    return df.mapInPandas(gen, schema=schema)


def knn_join(
    queries: DataFrame,
    targets: DataFrame,
    *,
    k: int,
    res: int,
    qid: str = "qid",
    qx: str = "qx",
    qy: str = "qy",
    tid: str = "tid",
    tx: str = "tx",
    ty: str = "ty",
    max_rounds: int = 6,
) -> DataFrame:
    """k nearest targets per query → (query cols, tid, dist, rank).

    Distance = squared euclidean in coordinate units, computed as
    ((qx-tx)*(qx-tx)) + ((qy-ty)*(qy-ty)) — the literal the oracle mirrors.
    """
    spark = queries.sparkSession
    q = cells.with_cell(queries, qx, qy, res)
    t = cells.with_cell(targets, tx, ty, res).withColumnRenamed("cell", "__tcell")
    t = t.persist()
    cw, ch = cells.cell_size(res)
    gmin = min(cw, ch)

    dist_expr = f"((({qx}) - ({tx})) * (({qx}) - ({tx}))) + ((({qy}) - ({ty})) * (({qy}) - ({ty})))"
    w = Window.partitionBy(qid).orderBy(F.col("dist").asc(), F.col(tid).asc())

    out_cols = queries.columns + [tid, tx, ty, "dist", "rank"]

    def topk(cand: DataFrame) -> DataFrame:
        return (
            cand.selectExpr("*", f"{dist_expr} AS dist")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(*out_cols)
        )

    finals: list[DataFrame] = []
    remaining = q
    radius = 1
    for _ in range(max_rounds):
        exp = _disk_explode(remaining, "cell", radius)
        cand = exp.join(t, exp["cell"] == t["__tcell"], "inner")
        top = topk(cand).localCheckpoint(eager=True)
        guarantee = float((radius * gmin) ** 2)
        done = (
            top.groupBy(qid)
            .agg(F.max("dist").alias("__kth"), F.count("*").alias("__nc"))
            .filter((F.col("__nc") == k) & (F.col("__kth") <= guarantee))
            .select(qid)
        )
        finals.append(top.join(done, qid, "left_semi"))
        remaining = remaining.join(done, qid, "left_anti").localCheckpoint(eager=True)
        if remaining.isEmpty():
            break
        radius *= 2
    else:
        # exact fallback for stragglers (no cell pruning)
        cand = remaining.drop("cell").crossJoin(t.drop("__tcell"))
        finals.append(topk(cand))

    out = finals[0]
    for f in finals[1:]:
        out = out.unionByName(f)
    return out
