"""Self-shipping: make the package importable on executor Python workers.

In production the job runs ``spark-submit --py-files geografir_spark.zip``.
When the engine is driven as a plain library (the driver contract, bench,
notebooks), executors have no such zip — mapInPandas kernels that import
``geografir_spark`` would fail with ModuleNotFoundError on any driver whose
working directory isn't the repo root. ``ensure_shipped`` zips the package
once per process and registers it with ``SparkContext.addPyFile`` once per
context; every operator entry point calls it.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SENTINEL = "_geografir_spark_shipped"
_zip_path: str | None = None


def package_zip() -> str:
    """Build (once per process) a zip of the geografir_spark package."""
    global _zip_path
    if _zip_path is not None and os.path.exists(_zip_path):
        return _zip_path
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(
        tempfile.gettempdir(), f"geografir_spark_pyfiles_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(path, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, os.path.dirname(pkg_dir)))
    _zip_path = path
    return path


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SENTINEL, False):
        return
    sc.addPyFile(package_zip())
    setattr(sc, _SENTINEL, True)
