"""ObjectLocation algebra (O2-O6): the reference's test suite replayed
verbatim against the scalar twin (object_storage/tests/
test_object_location.py), plus the columnar-expression form verified on
Spark AND DuckDB so both dialects implement the same algebra."""

from __future__ import annotations

import duckdb
import pytest

from geografir_spark.sources.locations import (
    ObjectLocation,
    extend_expr,
    is_directory_expr,
    parse_s3_uri_exprs,
    s3_uri_expr,
)


def test_object_location():
    loc = ObjectLocation(bucket="test-bucket", path="test-key")
    assert loc.bucket == "test-bucket"
    assert loc.path == "test-key"
    assert not loc.is_directory
    assert loc.s3_uri == "s3://test-bucket/test-key"


def test_object_location_is_directory():
    assert ObjectLocation(bucket="test-bucket", path="test-key/").is_directory
    # empty path is NOT a directory (object_location.py:90-93)
    assert not ObjectLocation(bucket="test-bucket", path="").is_directory


def test_object_location_s3_uri():
    assert (
        ObjectLocation(bucket="test-bucket", path="test-key.tif").s3_uri
        == "s3://test-bucket/test-key.tif"
    )
    assert (
        ObjectLocation(bucket="test-bucket", path="test-key/").s3_uri
        == "s3://test-bucket/test-key/"
    )


def test_object_location_extend():
    base = ObjectLocation(bucket="test-bucket", path="test-key/")
    assert base.extend("new-key.tif") == ObjectLocation(
        bucket="test-bucket", path="test-key/new-key.tif"
    )
    assert base.extend("/another-key.tif") == ObjectLocation(
        bucket="test-bucket", path="test-key/another-key.tif"
    )
    # chaining (object_location.py docstring example)
    final = (
        ObjectLocation(bucket="project", path="src")
        .extend("components")
        .extend("utils/helper.py")
    )
    assert final.s3_uri == "s3://project/src/components/utils/helper.py"


def test_object_location_from_s3_uri():
    assert ObjectLocation.from_s3_uri(
        "s3://test-bucket/test-key/test-key.tif"
    ) == ObjectLocation(bucket="test-bucket", path="test-key/test-key.tif")
    directory = ObjectLocation.from_s3_uri("s3://backup/daily/")
    assert directory.is_directory


def test_from_s3_uri_rejections():
    with pytest.raises(Exception, match="must begin with 's3'"):
        ObjectLocation.from_s3_uri("gs://bucket/path")
    with pytest.raises(ValueError, match="`//` in its path portion"):
        ObjectLocation.from_s3_uri("s3://bucket/a//b")
    with pytest.raises(ValueError, match="`//` in its path portion"):
        ObjectLocation.from_s3_uri("s3://bucket//a")


def test_file_location_eq_and_hash():
    a = ObjectLocation(bucket="test-bucket", path="test/dummy.txt")
    b = ObjectLocation(bucket="test-bucket", path="test/dummy.txt")
    c = ObjectLocation(bucket="test-bucket", path="test/works2.txt")
    assert a == b and a != c
    assert a != "s3://test-bucket/test/dummy.txt"
    assert hash(a) == hash(b) and hash(a) != hash(c)


_URIS = [
    "s3://analytics/reports/2024/q1.json",
    "s3://backup/daily/",
    "s3://bucket/a//b",    # invalid: internal //
    "s3://bucket//a",      # invalid: // right after bucket
    "gs://bucket/path",    # invalid scheme
    "s3://only-bucket",
]


def _columnar_rows(run_sql):
    p = parse_s3_uri_exprs("uri")
    part_lit = "'x/y.bin'"
    rows = run_sql(
        "SELECT uri, "
        f"{p['bucket']} AS bucket, {p['path']} AS path, {p['valid']} AS valid, "
        f"{is_directory_expr(p['path'])} AS is_dir, "
        f"{s3_uri_expr(p['bucket'], p['path'])} AS roundtrip, "
        f"{extend_expr(p['path'], part_lit)} AS extended "
        "FROM uris"
    )
    return {r[0]: r[1:] for r in rows}


def _check_columnar(got):
    for uri in _URIS:
        bucket, path, valid, is_dir, roundtrip, extended = got[uri]
        try:
            loc = ObjectLocation.from_s3_uri(uri)
            assert valid, uri
            assert (bucket, path) == (loc.bucket, loc.path), uri
            assert is_dir == loc.is_directory, uri
            assert roundtrip == loc.s3_uri, uri
            assert extended == loc.extend("x/y.bin").path, uri
        except (ValueError, Exception) as e:
            if isinstance(e, AssertionError):
                raise
            assert not valid, uri


def test_columnar_algebra_spark(spark):
    df = spark.createDataFrame([(u,) for u in _URIS], "uri STRING")
    df.createOrReplaceTempView("uris")
    got = _columnar_rows(lambda q: [tuple(r) for r in spark.sql(q).collect()])
    _check_columnar(got)


def test_columnar_algebra_duckdb():
    con = duckdb.connect()
    con.execute("CREATE TABLE uris AS SELECT * FROM (VALUES "
                + ", ".join(f"('{u}')" for u in _URIS) + ") t(uri)")
    got = _columnar_rows(lambda q: con.execute(q).fetchall())
    _check_columnar(got)
