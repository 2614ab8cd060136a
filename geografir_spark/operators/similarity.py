"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``            exact brute-force top-k (the correctness
  baseline): probes × targets with a JVM-native fold for the dot product
  (F.aggregate/zip_with — no Python). O(P×T) — fine for small probe sets;
  the scale paths are below.
- ``lsh_bucketed_topk``      random-hyperplane LSH: each vector gets a
  b-bit signature (sign of dot with b deterministic pseudo-hyperplanes);
  candidates = same-bucket (or Hamming-adjacent) pairs, exact cosine refine
  on candidates only. Hyperplanes are derived from md5 of (plane, dim) —
  deterministic, no stored model.
- ``ivf_topk``               IVF-Flat: a coarse quantizer (spherical
  k-means trained on a deterministic hash-ordered sample, driver-side
  numpy — how FAISS trains IVF too) partitions targets into inverted
  lists; each probe scans only its ``n_probes`` nearest lists via a list-id
  equi-join + exact cosine refine. Shuffle volume is |targets| + |probes|
  × n_probes, vs LSH's n_tables× replication — the better path when a
  training pass is acceptable.

All return (probe_id, neighbor_id, rank) with rank by (cosine desc,
neighbor_id) — integer outputs, so oracle hash-compare is immune to
float-representation drift; ties are broken deterministically.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm_expr(a: str) -> str:
    return f"sqrt({_dot_expr(a, a)})"


def cosine_topk(
    probes: DataFrame,
    targets: DataFrame,
    *,
    k: int,
    probe_id: str = "probe_id",
    target_id: str = "neighbor_id",
    probe_vec: str = "pvec",
    target_vec: str = "tvec",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact brute-force cosine top-k: (probe_id, neighbor_id, rank)."""
    # broadcast the smaller side (probes are few); targets stream through
    j = F.broadcast(probes).crossJoin(targets)
    if exclude_self:
        j = j.filter(F.col(probe_id) != F.col(target_id))
    j = j.selectExpr(
        "*",
        f"({_dot_expr(probe_vec, target_vec)})"
        f" / (greatest({_norm_expr(probe_vec)} * {_norm_expr(target_vec)}, 1e-300)) AS __cos",
    )
    w = Window.partitionBy(probe_id).orderBy(F.desc("__cos"), F.asc(target_id))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, target_id, "rank")
    )


def hyperplanes(n_planes: int, dim: int) -> "np.ndarray":
    """Deterministic pseudo-random hyperplanes: coef(p, d) derived from
    md5('p<p>_d<d>') → [-1, 1). No stored model, reproducible anywhere."""
    import hashlib

    import numpy as np

    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            h = int(hashlib.md5(f"p{p}_d{d}".encode()).hexdigest()[:15], 16)
            out[p, d] = (h % 2000001) / 1000000.0 - 1.0
    return out


def with_lsh_buckets(
    df: DataFrame,
    vec_col: str,
    *,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    table_col: str = "lsh_table",
    bucket_col: str = "lsh_bucket",
) -> DataFrame:
    """Explode each row to ``n_tables`` rows with (table_idx, bucket).

    Signatures for all tables come from ONE Arrow-batched matmul
    (X @ planes.T > 0 → packed bits) — the scale path; a per-term SQL
    expression tree was measured at ~2000 codegen terms per row side."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(table_col, T.IntegerType()), T.StructField(bucket_col, T.LongType())]
    )
    planes = hyperplanes(n_planes * n_tables, dim)
    weights = (1 << (np.arange(n_planes * n_tables) % n_planes)).astype(np.int64)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]], dtype=np.float64
            )
            bits = (X @ planes.T >= 0).astype(np.int64) * weights  # (N, P*T)
            buckets = bits.reshape(len(pdf), n_tables, n_planes).sum(axis=2)  # (N, T)
            rep = pdf.iloc[np.repeat(np.arange(len(pdf)), n_tables)].reset_index(drop=True)
            rep[table_col] = np.tile(np.arange(n_tables, dtype=np.int32), len(pdf))
            rep[bucket_col] = buckets.ravel()
            yield rep

    return df.mapInPandas(gen, schema=schema)


def lsh_bucketed_topk(
    probes: DataFrame,
    targets: DataFrame,
    *,
    k: int,
    dim: int,
    n_planes: int = 4,
    n_tables: int = 8,
    probe_id: str = "probe_id",
    target_id: str = "neighbor_id",
    probe_vec: str = "pvec",
    target_vec: str = "tvec",
) -> DataFrame:
    """Approximate top-k with OR-amplified LSH: ``n_tables`` independent
    hyperplane families; a pair is a candidate when it co-buckets in ANY
    table (union of per-table bucket equi-joins, deduped), then exact
    cosine refine + per-probe top-k. Recall ≈ 1-(1-p^b)^L where p is the
    angular collision probability — tune n_planes (precision/bucket size)
    vs n_tables (recall/shuffle volume)."""
    pb = with_lsh_buckets(
        probes, probe_vec, n_planes=n_planes, n_tables=n_tables, dim=dim,
        table_col="__pt", bucket_col="__pb",
    )
    tb = with_lsh_buckets(
        targets.select(target_id, target_vec), target_vec,
        n_planes=n_planes, n_tables=n_tables, dim=dim,
        table_col="__tt", bucket_col="__tb",
    )
    cand = (
        pb.join(
            tb,
            (pb["__pt"] == tb["__tt"]) & (pb["__pb"] == tb["__tb"]),
            "inner",
        )
        .filter(F.col(probe_id) != F.col(target_id))
        .select(probe_id, probe_vec, target_id, target_vec)
        .dropDuplicates([probe_id, target_id])
    )
    cand = cand.selectExpr(
        "*",
        f"({_dot_expr(probe_vec, target_vec)})"
        f" / (greatest({_norm_expr(probe_vec)} * {_norm_expr(target_vec)}, 1e-300)) AS __cos",
    )
    w = Window.partitionBy(probe_id).orderBy(F.desc("__cos"), F.asc(target_id))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, target_id, "rank")
    )


def train_centroids_np(X: "np.ndarray", n_lists: int, n_iters: int = 8) -> "np.ndarray":
    """Deterministic spherical k-means on a sample (driver-side numpy).

    Init = evenly spaced rows of the (hash-ordered) sample; each iteration
    assigns by max dot product against unit centroids and recomputes the
    renormalized mean. Empty lists keep their previous centroid. Fully
    deterministic: no RNG anywhere."""
    X = np.asarray(X, dtype=np.float64)
    if X.size == 0:
        raise ValueError("cannot train IVF centroids on an empty sample")
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    n_lists = min(n_lists, len(Xn))
    idx = np.linspace(0, len(Xn) - 1, n_lists).astype(np.int64)
    C = Xn[idx].copy()
    for _ in range(n_iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(n_lists):
            members = Xn[assign == j]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-300:
                    C[j] = v / n
    return C


def with_ivf_lists(
    df: DataFrame,
    vec_col: str,
    centroids: "np.ndarray",
    *,
    n_probes: int = 1,
    list_col: str = "ivf_list",
) -> DataFrame:
    """Assign each row its ``n_probes`` nearest inverted lists (one
    Arrow-batched matmul against the broadcast centroid matrix); rows are
    exploded when n_probes > 1. Deterministic ties: argsort is stable."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(list_col, T.IntegerType())]
    )
    C = np.ascontiguousarray(centroids, dtype=np.float64)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]],
                dtype=np.float64,
            )
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
            sims = Xn @ C.T  # (N, L)
            if n_probes == 1:
                lists = np.argmax(sims, axis=1).astype(np.int32)[:, None]
            else:
                p = min(n_probes, sims.shape[1])
                # stable top-p by (-sim, list_id): deterministic probe order
                lists = np.argsort(-sims, axis=1, kind="stable")[:, :p].astype(np.int32)
            p = lists.shape[1]
            rep = pdf.iloc[np.repeat(np.arange(len(pdf)), p)].reset_index(drop=True)
            rep[list_col] = lists.ravel()
            yield rep

    return df.mapInPandas(gen, schema=schema)


def ivf_topk(
    probes: DataFrame,
    targets: DataFrame,
    *,
    k: int,
    n_lists: int = 64,
    n_probes: int = 8,
    train_sample: int = 4096,
    probe_id: str = "probe_id",
    target_id: str = "neighbor_id",
    probe_vec: str = "pvec",
    target_vec: str = "tvec",
) -> DataFrame:
    """Approximate top-k via IVF-Flat (coarse quantize → inverted-list
    equi-join → exact cosine refine → per-probe window top-k).

    Training: ``train_sample`` vectors taken deterministically by
    xxhash64(id) order (TakeOrderedAndProject — a top-k, not a full sort),
    clustered on the driver. At 100 TB the sample is still ~4k rows; the
    broadcast centroid matrix is n_lists × dim doubles (a few hundred KB)."""
    from pyspark.sql import functions as F

    sample = (
        targets.select(target_id, target_vec)
        .orderBy(F.xxhash64(F.col(target_id)))
        .limit(train_sample)
        .toPandas()
    )
    X = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in sample[target_vec]], dtype=np.float64
    )
    C = train_centroids_np(X, n_lists)

    tl = with_ivf_lists(
        targets.select(target_id, target_vec), target_vec, C, n_probes=1,
        list_col="__tl",
    )
    pl = with_ivf_lists(probes, probe_vec, C, n_probes=n_probes, list_col="__pl")
    cand = (
        pl.join(tl, pl["__pl"] == tl["__tl"], "inner")
        .filter(F.col(probe_id) != F.col(target_id))
        .select(probe_id, probe_vec, target_id, target_vec)
    )
    cand = cand.selectExpr(
        "*",
        f"({_dot_expr(probe_vec, target_vec)})"
        f" / (greatest({_norm_expr(probe_vec)} * {_norm_expr(target_vec)}, 1e-300)) AS __cos",
    )
    w = Window.partitionBy(probe_id).orderBy(F.desc("__cos"), F.asc(target_id))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, target_id, "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a_id < b_id) with cosine ≥ tau — exact, via one
    Arrow-batched BLAS matmul per partition against the unit-normalized
    full matrix (the broadcast side, same materialization as
    F.broadcast of this table; ~2.5 MB per 5k×64-f64).

    This replaces an O(pairs) interpreted `aggregate(zip_with(...))` fold
    with U_batch @ A.T (measured 23 s → ~2 s on 12.5M pairs at sf0.1).
    Float drift vs a sequential fold is summation-order only (~1e-15)."""
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    schema = T.StructType(
        [T.StructField("a_id", T.LongType()), T.StructField("b_id", T.LongType())]
    )
    pdf = df.select(id_col, vec_col).toPandas()
    if len(pdf) == 0:
        return spark.createDataFrame([], schema)
    ids = pdf[id_col].to_numpy()
    A = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]], dtype=np.float64
    )
    A /= np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)

    def gen(batches):
        for b in batches:
            if len(b) == 0:
                continue
            U = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in b[vec_col]],
                dtype=np.float64,
            )
            U /= np.maximum(np.linalg.norm(U, axis=1, keepdims=True), 1e-300)
            S = U @ A.T  # (batch, N)
            bids = b[id_col].to_numpy()
            rows_i, cols_j = np.nonzero(S >= tau)
            aa, bb = ids[cols_j], bids[rows_i]
            m = aa < bb
            yield pd.DataFrame(
                {"a_id": aa[m].astype("int64"), "b_id": bb[m].astype("int64")}
            )

    return df.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        gen, schema=schema
    )
