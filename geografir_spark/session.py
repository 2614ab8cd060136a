"""SparkSession factory with scale-oriented defaults.

Local-mode settings mirror what we would set on a real cluster: AQE with
skew-join splitting (the data-dependent half of our skew story lives in
``operators.skew``), Arrow-batched pandas UDFs for every Python kernel, and
shuffle partitions sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "geografir-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cores`` pins ``local[N]`` — used by the scaling benchmark to compare
    N vs 4N parallelism on the same input (the sandbox proxy for the
    two-cluster-size requirement).
    """
    n = cores or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        # shuffle partitions ≈ 2× cores locally; on a real cluster this is
        # sized by AQE's coalesce from an intentionally high initial value.
        .config("spark.sql.shuffle.partitions", str(max(2 * n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # local test files are single small parquets — split them finer so
        # all cores get scan tasks. Production (100 TB, many files) keeps the
        # 128m default: override with SPARK_GRAFT_MAX_PARTITION_BYTES.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # constraint propagation infers isnotnull(...) predicates from join
        # keys and pushes them below projection chains, re-inlining expensive
        # expressions exponentially (each Morton spread step references its
        # input twice → 2^k copies of the regexp geocode per inferred
        # predicate). Measured 10-50× slowdown on the PIP join; disabling
        # costs us nothing because engine join keys are always non-null by
        # construction.
        .config("spark.sql.constraintPropagation.enabled", "false")
        # NOTE: a 48g heap measured 7× SLOWER on allocation-heavy stages
        # (regexp geocode) than 16g — oversized G1 young gen + fresh-page
        # zeroing. Don't raise this without re-running bench.py.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # bucketed-table metadata (plans/layout.py) needs a metastore; keep
        # derby + warehouse out of the repo tree
        .config("spark.sql.warehouse.dir", "/tmp/geografir_warehouse")
        .config("spark.driver.extraJavaOptions", "-Dderby.system.home=/tmp/geografir_derby")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
