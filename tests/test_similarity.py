"""ANN quality gates: both approximate paths (OR-amplified LSH, IVF-Flat)
measured against the exact brute-force baseline on the sf0.001 embeddings
table — recall@k must clear a floor, plans must stay Python-row-free, and
the IVF quantizer must be deterministic (same centroids every run)."""

from __future__ import annotations

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"
K = 5
N_PROBES = 8


def _recall(exact_rows, approx_rows) -> float:
    exact: dict[int, set] = {}
    for r in exact_rows:
        exact.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    hit = total = 0
    for pid, neigh in exact.items():
        total += len(neigh)
        got = {r["neighbor_id"] for r in approx_rows if r["probe_id"] == pid}
        hit += len(neigh & got)
    return hit / max(total, 1)


@pytest.fixture(scope="module")
def exact_rows(spark):
    from geografir_spark.queries import QUERIES

    return QUERIES["ann_cosine_topk"].fn(spark, SF_DIR).collect()


def test_ivf_recall_vs_exact(spark, exact_rows):
    from geografir_spark.queries import QUERIES

    approx = QUERIES["ann_ivf_topk"].fn(spark, SF_DIR).collect()
    rec = _recall(exact_rows, approx)
    # 8 of 32 lists probed; spherical kmeans on ~uniform synthetic vectors is
    # a weak quantizer by construction, but must still beat random scanning
    # (8/32 = 0.25) by a wide margin
    assert rec >= 0.6, f"IVF recall@{K} = {rec}"


def test_lsh_recall_vs_exact(spark, exact_rows):
    from geografir_spark.queries import QUERIES

    approx = QUERIES["ann_lsh_topk"].fn(spark, SF_DIR).collect()
    rec = _recall(exact_rows, approx)
    assert rec >= 0.5, f"LSH recall@{K} = {rec}"


def test_ivf_deterministic_and_plan_clean(spark):
    from geografir_spark.operators.similarity import train_centroids_np
    from geografir_spark.queries import QUERIES

    rng = np.random.RandomState(3)
    X = rng.normal(size=(500, 16))
    C1 = train_centroids_np(X, 8)
    C2 = train_centroids_np(X.copy(), 8)
    np.testing.assert_array_equal(C1, C2)
    assert C1.shape == (8, 16)
    np.testing.assert_allclose(np.linalg.norm(C1, axis=1), 1.0, rtol=1e-9)

    df = QUERIES["ann_ivf_topk"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # Arrow-batched only


def test_ivf_n_lists_exceeding_sample(spark):
    """n_lists larger than the training sample degrades gracefully."""
    from geografir_spark.operators.similarity import train_centroids_np

    X = np.eye(4)
    C = train_centroids_np(X, 16)
    assert C.shape == (4, 4)


def test_near_dup_pairs_driver_bounded_and_exact(spark, monkeypatch):
    """embedding_near_dup_pairs must never materialize more than the bounded
    training sample on the driver (VERDICT r1 #2: the previous version
    toPandas()'d the whole table), and must equal brute force exactly."""
    import pandas as pd

    from geografir_spark.operators import similarity

    rng = np.random.RandomState(7)
    # two tight clusters (near-dups) + uniform background
    base = rng.normal(size=(2, 16))
    members = np.concatenate(
        [b + rng.normal(scale=0.05, size=(20, 16)) for b in base]
        + [rng.normal(size=(160, 16))]
    )
    rows = [(i, [float(x) for x in members[i]]) for i in range(len(members))]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    train_cap = 64
    sizes = []
    cls = type(df)  # the concrete (classic) DataFrame class, where toPandas lives
    orig = cls.toPandas

    def counting(self):
        out = orig(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(cls, "toPandas", counting)
    got = (
        similarity.embedding_near_dup_pairs(
            df, tau=0.8, n_blocks=8, train_sample=train_cap
        )
        .toPandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    # every driver materialization is the bounded sample or the tiny result
    assert sizes and max(sizes[:-1] or [0]) <= train_cap, sizes

    U = members / np.maximum(np.linalg.norm(members, axis=1, keepdims=True), 1e-300)
    S = U @ U.T
    ii, jj = np.nonzero(np.triu(S >= 0.8, k=1))
    exp = (
        pd.DataFrame({"a_id": ii.astype("int64"), "b_id": jj.astype("int64")})
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    assert len(exp) > 0  # the fixture actually plants pairs
    pd.testing.assert_frame_equal(got, exp)


def test_semantic_dedup_drop_rule(spark):
    """The SemDeDup prune drops a doc iff SOME lower-id doc in its cluster
    is cosine-close — including lower-id docs that were themselves dropped
    (the paper's rule is EXISTS over all prior candidates, not kept ones)."""
    from geografir_spark.operators.similarity import semantic_dedup

    # 3 near-identical vectors (ids 0,1,2) + one far vector (id 3):
    # id 0 kept, ids 1 and 2 both dropped (2 is near 1 AND near 0).
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.045, 0.0, 0.0]),
        (2, [0.999, 0.0, 0.045, 0.0]),
        (3, [0.0, 0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(df, tau=0.9, n_clusters=2).collect()
    }
    assert [out[i]["kept"] for i in range(4)] == [1, 0, 0, 1]
    # the near-identical trio landed in one cluster, the far vector is
    # kept regardless of cluster
    assert out[0]["cluster_id"] == out[1]["cluster_id"] == out[2]["cluster_id"]


def test_semantic_dedup_deterministic(spark):
    """Two runs at the same sf produce identical (id, cluster, kept) rows —
    the whole pipeline (sample, k-means, assignment, prune) is RNG-free."""
    from geografir_spark.operators.similarity import semantic_dedup
    from geografir_spark.sources.pages import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    a = sorted(map(tuple, semantic_dedup(emb, tau=0.464, n_clusters=16).collect()))
    b = sorted(map(tuple, semantic_dedup(emb, tau=0.464, n_clusters=16).collect()))
    assert a == b
    assert len(a) == emb.count()
