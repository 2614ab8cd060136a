#!/usr/bin/env python
"""End-to-end training-data CURATION pipeline over a documents table — the
full pre-training hygiene chain, each stage an operator the engine
oracle-checks individually:

1.  quality gate      — length / repetition / rare-char-bigram filters
2.  language balance  — equal-mixture downsample per language
3.  exact dedup       — content-hash keeper map
4.  near-dup dedup    — MinHash-LSH pairs → connected components → keepers
5.  decontamination   — drop docs sharing any 8-token n-gram with the
                        benchmark split
6.  split + audit     — host-hash train/eval split, cross-split near-dup
                        leakage report
7.  packing manifest  — fixed-512-token training sequences per shard

Run locally:
    python examples/curation_pipeline.py --input /root/testdata/sf0.01 \
        --output /tmp/curation_out

Run on a cluster:
    spark-submit --py-files geografir_spark.zip examples/curation_pipeline.py \
        --input s3a://bucket/docs --output s3a://bucket/docs_curated

Every stage is pure DataFrame/SQL (no per-row Python); stage outputs are
written as parquet plus a one-line JSON funnel report on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

try:  # running from a checkout without installation
    import geografir_spark  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir with documents.parquet")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from geografir_spark.operators.dedup import connected_components
    from geografir_spark.queries import QUERIES
    from geografir_spark.session import get_spark
    from geografir_spark.shipping import ensure_shipped

    spark = get_spark("curation-pipeline")
    ensure_shipped(spark)

    docs = spark.read.parquet(f"{args.input}/documents.parquet")
    funnel: dict[str, int] = {"input": docs.count()}

    # 1. quality gate: cheap map-only filters (the registry's quality /
    # repetition / rare-ngram scores all derive from these expressions)
    q = docs.filter(
        (F.length("text") >= 40)
        & (F.size(F.split("text", " ")) >= 8)
    )
    funnel["quality"] = q.count()
    # distinct view name per stage: re-registering one name over its own
    # lineage makes the analyzer chase a self-referential temp view
    q.createOrReplaceTempView("docs_quality")

    # 2. language balance: keep only docs the equal-mixture sample admits.
    # The registry query reports per-lang stats; here we need the kept doc
    # ids, so re-run its phase-1/2 windows directly.
    from geografir_spark.operators.text import hash60_expr

    h = hash60_expr("CAST(doc_id AS STRING)", "spark")
    balanced = spark.sql(f"""
        WITH p AS (SELECT *, ({h}) AS __hsh FROM docs_quality),
             q AS (SELECT min(cnt) AS quota
                   FROM (SELECT count(*) AS cnt FROM p GROUP BY lang)),
             r1 AS (SELECT *, row_number() OVER (
                        PARTITION BY lang, pmod(__hsh, 16)
                        ORDER BY __hsh, doc_id) AS __rn1 FROM p),
             c AS (SELECT r1.* FROM r1, q WHERE __rn1 <= q.quota),
             r AS (SELECT *, row_number() OVER (
                       PARTITION BY lang ORDER BY __hsh, doc_id) AS __rn
                   FROM c)
        SELECT * FROM r, q WHERE __rn <= q.quota
    """).drop("__hsh", "__rn1", "__rn", "quota")
    funnel["lang_balanced"] = balanced.count()

    # 3. exact dedup: one keeper per content hash
    exact = balanced.selectExpr("doc_id", "md5(text) AS __h")
    keepers = exact.groupBy("__h").agg(F.min("doc_id").alias("doc_id"))
    ex_kept = balanced.join(keepers.select("doc_id"), "doc_id")
    funnel["exact_dedup"] = ex_kept.count()

    # 4. near-dup dedup: LSH pairs -> components -> keep group minimum
    pairs = QUERIES["dedup_minhash_pairs"].fn(spark, args.input).join(
        ex_kept.select(F.col("doc_id").alias("doc_a")), "doc_a"
    ).join(ex_kept.select(F.col("doc_id").alias("doc_b")), "doc_b")
    labels = connected_components(pairs, src="doc_a", dst="doc_b")
    losers = labels.filter(F.col("id") != F.col("label")).select(
        F.col("id").alias("doc_id")
    )
    nd_kept = ex_kept.join(losers, "doc_id", "left_anti")
    funnel["near_dedup"] = nd_kept.count()
    nd_kept.createOrReplaceTempView("docs_nd")

    # 5. decontamination: drop docs sharing an 8-gram with the benchmark
    # split (stand-in: doc_id % 5 == 0 — swap for the real eval suite)
    from geografir_spark.operators.dedup import decontaminate_sql

    contam = spark.sql(
        decontaminate_sql(
            "(SELECT * FROM docs_nd WHERE NOT (doc_id % 5 = 0))",
            "(SELECT * FROM docs_nd WHERE doc_id % 5 = 0)",
            "doc_id", "text", "spark", n=8,
        )
    ).select("doc_id")
    clean = nd_kept.filter(~F.expr("doc_id % 5 = 0")).join(
        contam, "doc_id", "left_anti"
    )
    funnel["decontaminated"] = clean.count()

    # 6. host-hash split + cross-split leakage audit
    hs = hash60_expr("source", "spark")
    split = clean.selectExpr(
        "*", f"CASE WHEN ({hs}) % 10 = 0 THEN 'eval' ELSE 'train' END AS split"
    ).localCheckpoint()  # stage barrier: split feeds 3 counts, the leak
    # join, the pack manifest, and the final write — and truncating the
    # dedup lineage here keeps the packing view's plan shallow
    leak = (
        pairs.join(split.selectExpr("doc_id AS doc_a", "split AS sa"), "doc_a")
        .join(split.selectExpr("doc_id AS doc_b", "split AS sb"), "doc_b")
        .filter("sa <> sb")
    )
    funnel["train"] = split.filter("split = 'train'").count()
    funnel["eval"] = split.filter("split = 'eval'").count()
    funnel["cross_split_leaks"] = leak.count()

    # 7. packing manifest for the train split
    from geografir_spark.operators.packing import pack_sequences_sql

    split.filter("split = 'train'").createOrReplaceTempView("train_docs")
    manifest = spark.sql(
        pack_sequences_sql("train_docs", "doc_id", "text", "source", "spark")
    )
    funnel["train_sequences"] = manifest.count()

    split.write.mode("overwrite").parquet(f"{args.output}/curated")
    manifest.write.mode("overwrite").parquet(f"{args.output}/pack_manifest")
    print(json.dumps(funnel))


if __name__ == "__main__":
    main()
