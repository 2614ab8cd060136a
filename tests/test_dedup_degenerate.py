"""Degenerate LSH buckets and the jaccard-recall contract.

r3 verdict items #5 and #3:

* ``minhash_pairs_sql``'s per-(band,sig) bucket expansion must survive a
  bucket of 10k IDENTICAL documents (the boilerplate-page case) without a
  single-task n²/2 pair array — the ``max_bucket`` cap bounds it to
  n·max_bucket pairs while preserving transitive-dedup connectivity exactly
  (every doc still pairs with the bucket minimum).
* the quadratic blocked-pair jaccard is demoted to a TEST-ONLY oracle: the
  registry's ``ngram_jaccard_pairs`` is the LSH-fed refine, and this module
  pins its recall against the exhaustive form.
"""

from __future__ import annotations

import time

import pytest

from geografir_spark.operators.dedup import minhash_pairs_sql

N_IDENTICAL = 10_000
MAX_BUCKET = 256


@pytest.fixture(scope="module")
def degenerate_view(spark):
    """10k byte-identical docs + a couple of distinct ones."""
    df = spark.range(N_IDENTICAL).selectExpr(
        "id AS doc_id",
        "'the same boilerplate navigation header text repeated' AS text",
    )
    extra = spark.createDataFrame(
        [(N_IDENTICAL, "a genuinely unique document about rivers"),
         (N_IDENTICAL + 1, "another unique document about mountains")],
        "doc_id: long, text: string",
    )
    df.unionAll(extra).createOrReplaceTempView("degen_docs")
    return "degen_docs"


def test_degenerate_bucket_completes_and_is_capped(spark, degenerate_view):
    """10k identical docs: the uncapped form would expand ~5·10⁷ pairs per
    band in one task's array; the capped form emits n·max_bucket and
    finishes in seconds."""
    sql = minhash_pairs_sql(degenerate_view, "doc_id", "text", "spark",
                            max_bucket=MAX_BUCKET)
    t0 = time.monotonic()
    n = spark.sql(sql).count()
    elapsed = time.monotonic() - t0
    # pairs = Σ_{i<cap} (n-1-i) = cap·n − cap·(cap+1)/2 − … exact:
    cap, n_docs = MAX_BUCKET, N_IDENTICAL
    expected = sum(n_docs - 1 - i for i in range(cap))
    assert n == expected, (n, expected)
    assert elapsed < 120, f"degenerate bucket took {elapsed:.0f}s"


def test_cap_preserves_connectivity(spark, degenerate_view):
    """Every doc in the oversized bucket still pairs with the bucket's
    minimum doc id — transitive dedup components are unchanged by the cap."""
    sql = minhash_pairs_sql(degenerate_view, "doc_id", "text", "spark",
                            max_bucket=MAX_BUCKET)
    pairs = spark.sql(sql)
    pairs.createOrReplaceTempView("degen_pairs")
    touched = spark.sql(
        "SELECT count(DISTINCT d) AS n FROM ("
        "  SELECT doc_a AS d FROM degen_pairs WHERE doc_a = 0"
        "  UNION ALL SELECT doc_b AS d FROM degen_pairs WHERE doc_a = 0)"
    ).first()["n"]
    # doc 0 (the bucket minimum) reaches every other member directly
    assert touched == N_IDENTICAL


def test_small_buckets_unchanged_by_cap(spark):
    """For buckets ≤ max_bucket the capped generator emits EXACTLY the
    uncapped pair set (cap chosen far above any real near-dup bucket)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("cap_docs")
    capped = spark.sql(
        minhash_pairs_sql("cap_docs", "doc_id", "text", "spark", max_bucket=256)
    )
    uncapped = spark.sql(
        minhash_pairs_sql("cap_docs", "doc_id", "text", "spark",
                          max_bucket=10_000_000)
    )
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, uncapped.collect())
    )


def _exact_shingle_jaccard(spark, sf_dir: str, pct: int):
    """TEST-ONLY quadratic oracle: exhaustive all-pairs CHARACTER-3-shingle
    jaccard ≥ pct/100 — the similarity MinHash actually estimates (the
    r2/r3 verdicts demoted the quadratic form from the registry; it
    survives only here as the recall oracle).

    NOT token-set jaccard: the synthetic fixture has a ~31-token
    vocabulary, so 9% of ALL doc pairs exceed token-jaccard 0.9 while
    their shingle similarity (what 4×4 LSH banding is tuned for,
    threshold (1/4)^(1/4) ≈ 0.71) is far lower — measured at sf0.001:
    117,863 pairs at token-τ 0.3 vs 28 pairs at shingle-τ 0.7."""
    from geografir_spark.operators.dedup import _shingles_expr

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "jr_docs"
    )
    sh = _shingles_expr("text", 3, "spark")
    return spark.sql(f"""
        WITH t AS (SELECT doc_id, array_distinct({sh}) AS tk FROM jr_docs)
        SELECT doc_a, doc_b FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 size(array_intersect(a.tk, b.tk)) AS i,
                 size(array_union(a.tk, b.tk)) AS u
          FROM t a JOIN t b ON a.doc_id < b.doc_id)
        WHERE i * 100 >= u * {pct}
    """)


def test_lsh_fed_jaccard_recall(spark):
    """The registry's LSH-fed candidate set finds ≥90% of the exhaustive
    shingle-jaccard-≥0.7 pairs at sf0.001 (measured 28/28 = 1.0 — banding
    4×4 detects s=0.7 with p≈0.67 per independent pair, and the fixture's
    near-dups sit well above the knee)."""
    from geografir_spark.operators.dedup import minhash_pairs_sql

    sf = "/root/testdata/sf0.001"
    spark.read.parquet(f"{sf}/documents.parquet").createOrReplaceTempView(
        "jr_docs"
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in spark.sql(
            minhash_pairs_sql("jr_docs", "doc_id", "text", "spark")
        ).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in _exact_shingle_jaccard(spark, sf, 70).collect()
    }
    recall = len(got & exact) / len(exact) if exact else 1.0
    assert recall >= 0.9, f"LSH recall {recall:.2f} over {len(exact)} pairs"
