#!/usr/bin/env python
"""End-to-end training-data dedup pipeline over a documents table:

1. exact dedup (content-hash keeper map),
2. MinHash-LSH near-duplicate candidate pairs,
3. connected components → duplicate GROUPS with one keeper each,
4. the deduplicated corpus (exact-unique docs minus non-keeper near-dups),
written to parquet.

Run locally:
    python examples/dedup_pipeline.py --input /root/testdata/sf0.01 \
        --output /tmp/dedup_out

Run on a cluster:
    spark-submit --py-files geografir_spark.zip examples/dedup_pipeline.py \
        --input s3a://bucket/docs --output s3a://bucket/docs_dedup
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

    spark = get_spark("dedup-pipeline")
    ensure_shipped(spark)

    docs = spark.read.parquet(f"{args.input}/documents.parquet")
    n_in = docs.count()

    # 1. exact: one keeper per distinct content hash
    exact = docs.selectExpr("doc_id", "md5(text) AS h").groupBy("h").agg(
        F.min("doc_id").alias("keeper_id")
    )
    exact_keepers = exact.select(F.col("keeper_id").alias("doc_id"))

    # 2-3. near-dup candidate pairs -> components -> keeper per group
    pairs = QUERIES["dedup_minhash_pairs"].fn(spark, args.input)
    labels = connected_components(pairs, src="doc_a", dst="doc_b")
    near_dup_losers = labels.filter(F.col("id") != F.col("label")).select(
        F.col("id").alias("doc_id")
    )

    # 4. final corpus: exact keepers minus near-dup non-keepers
    kept = (
        docs.join(exact_keepers, "doc_id", "left_semi")
        .join(near_dup_losers, "doc_id", "left_anti")
    )
    kept.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()
    print(json.dumps({"docs_in": n_in, "docs_kept": n_out}))
    spark.stop()


if __name__ == "__main__":
    main()
