"""Catalog seam (r3 verdict item #10): the SpatialCatalog interface, the
manifest binding end-to-end, and the Iceberg binding's config-only gate."""

from __future__ import annotations

import inspect

import pytest

from geografir_spark.plans.catalog import (
    IcebergCatalog,
    ManifestCatalog,
    SpatialCatalog,
    get_catalog,
)

METHODS = (
    "write_table", "read_table", "snapshot", "read_snapshot",
    "optimize", "prune_stats",
)


def test_bindings_expose_identical_signatures():
    """A jar drop-in is a config change only if both bindings agree on the
    call surface — pin it."""
    for m in METHODS:
        sig_manifest = inspect.signature(getattr(ManifestCatalog, m))
        sig_iceberg = inspect.signature(getattr(IcebergCatalog, m))
        assert sig_manifest.parameters.keys() == sig_iceberg.parameters.keys(), m
        assert getattr(SpatialCatalog, m).__isabstractmethod__


def test_manifest_catalog_roundtrip(spark, tmp_path):
    """write → pruned read → snapshot → zero-copy snapshot read → optimize
    through the interface (the engine-facing path, not layout.py direct)."""
    cat = get_catalog(spark, "manifest")
    df = spark.range(1000).selectExpr("id", "id * 7 % 512 AS cell")
    table = str(tmp_path / "t")
    cat.write_table(df, table, n_ranges=8)

    sel, total = cat.prune_stats(table, [(0, 63)])
    assert total == 8 and 1 <= sel < total

    got = cat.read_table(table, [(0, 63)])
    assert got.count() == df.filter("cell BETWEEN 0 AND 63").count()
    assert cat.read_table(table).count() == 1000

    snap = str(tmp_path / "snap1")
    n_files = cat.snapshot(table, snap)
    assert n_files == total
    again = cat.read_snapshot(snap, [(0, 63)])
    assert again.count() == got.count()

    before, after = cat.optimize(table, target_rows_per_file=500)
    assert before == 8 and after == 2
    assert cat.read_table(table).count() == 1000


def test_iceberg_snapshot_id_format_contract():
    """The composite 'table@tag' form snapshot() records is the form
    read_snapshot() parses (r5, ADVICE fix — they previously disagreed).
    NOTE: the Iceberg method BODIES have never executed in this sandbox
    (no runtime jar; the ctor gates) — what is tested here is the id
    format contract both directions share, plus signature parity above;
    body behavior awaits a real catalog (VERDICT r4 next-round #7)."""
    from geografir_spark.plans.catalog import split_snapshot_id

    # snapshot(table, id): bare tag or matching composite both resolve
    assert split_snapshot_id("v1", "db.pages") == ("db.pages", "v1")
    assert split_snapshot_id("db.pages@v1", "db.pages") == ("db.pages", "v1")
    with pytest.raises(ValueError, match="names table"):
        split_snapshot_id("other.t@v1", "db.pages")
    # read_snapshot(id): composite required, parse is the inverse of record
    assert split_snapshot_id("db.pages@v1") == ("db.pages", "v1")
    with pytest.raises(ValueError, match="table@tag"):
        split_snapshot_id("v1")
    with pytest.raises(ValueError, match="malformed"):
        split_snapshot_id("@v1")


def test_iceberg_binding_gates_on_classpath(spark):
    """Without the runtime jar the Iceberg binding refuses to construct and
    says exactly which spark-submit configs activate it; auto selection
    falls back to the manifest binding."""
    with pytest.raises(RuntimeError, match="spark.sql.catalog"):
        IcebergCatalog(spark)
    assert isinstance(get_catalog(spark), ManifestCatalog)
    assert isinstance(get_catalog(spark, "auto"), ManifestCatalog)
    with pytest.raises(ValueError, match="unknown catalog kind"):
        get_catalog(spark, "delta")
