"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``            exact brute-force top-k (the correctness
  baseline): probes × targets with a JVM-native fold for the dot product
  (F.aggregate/zip_with — no Python). O(P×T) — fine for small probe sets;
  the scale path is below.
- ``lsh_bucketed_topk``      random-hyperplane LSH: each vector gets a
  b-bit signature (sign of dot with b deterministic pseudo-hyperplanes);
  candidates = same-bucket (or Hamming-adjacent) pairs, exact cosine refine
  on candidates only. Hyperplanes are derived from md5 of (plane, dim) —
  deterministic, no stored model.

Both return (probe_id, neighbor_id, rank) with rank by (cosine desc,
neighbor_id) — integer outputs, so oracle hash-compare is immune to
float-representation drift; ties are broken deterministically.
"""

from __future__ import annotations

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


def _hyperplane_sign_expr(vec: str, plane: int, dim: int) -> str:
    """sign(v · h_plane) where h_plane[d] = md5-derived value in [-1, 1).

    h_plane[d] = (hash60('p<plane>_d<d>') % 2000001) / 1000000.0 - 1.0 —
    deterministic and reproducible in any engine."""
    terms = []
    for d in range(dim):
        # precomputed python-side constant per (plane, d) — the hyperplane is
        # data-independent, so bake literals instead of hashing at runtime
        import hashlib

        h = int(hashlib.md5(f"p{plane}_d{d}".encode()).hexdigest()[:15], 16)
        coef = (h % 2000001) / 1000000.0 - 1.0
        terms.append(f"(CAST({vec}[{d}] AS DOUBLE) * {coef!r})")
    return f"(CASE WHEN ({' + '.join(terms)}) >= 0 THEN 1 ELSE 0 END)"


def with_lsh_bucket(df: DataFrame, vec_col: str, *, n_planes: int = 8, dim: int = 64,
                    out: str = "bucket") -> DataFrame:
    """b-bit random-hyperplane signature as an integer bucket id."""
    bits = [
        f"({_hyperplane_sign_expr(vec_col, p, dim)} << {p})" for p in range(n_planes)
    ]
    return df.selectExpr("*", f"({' | '.join(bits)}) AS {out}")


def lsh_bucketed_topk(
    probes: DataFrame,
    targets: DataFrame,
    *,
    k: int,
    dim: int,
    n_planes: int = 8,
    probe_id: str = "probe_id",
    target_id: str = "neighbor_id",
    probe_vec: str = "pvec",
    target_vec: str = "tvec",
) -> DataFrame:
    """Approximate top-k: bucket equi-join on the LSH signature, exact
    cosine refine within buckets. Recall rises with fewer planes (bigger
    buckets); at scale, multiple hash tables (OR of several signatures)
    trade shuffle volume for recall — single-table here."""
    pb = with_lsh_bucket(probes, probe_vec, n_planes=n_planes, dim=dim, out="__pb")
    tb = with_lsh_bucket(targets, target_vec, n_planes=n_planes, dim=dim, out="__tb")
    j = pb.join(tb, pb["__pb"] == tb["__tb"], "inner").filter(
        F.col(probe_id) != F.col(target_id)
    )
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
