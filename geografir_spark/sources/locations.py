"""Object-storage location algebra (reference object_storage/src/
object_storage/object_location.py:54-233).

Two forms of the same semantics:

- ``ObjectLocation``: a frozen scalar twin for driver-side path math —
  construction, ``is_directory``, ``s3_uri``, ``extend``, ``from_s3_uri``
  (with the reference's scheme check and ``//``-rejection), equality and
  hashing. No pydantic: a stdlib frozen dataclass carries the same
  contract, and every reference test (tests/test_object_location.py)
  replays against it verbatim in tests/test_locations.py.

- Column expressions (``s3_uri_expr``/``is_directory_expr``/
  ``extend_expr``/``parse_s3_uri_exprs``): the engine's Spark-first form.
  A trillion-row manifest keeps locations as (bucket, path) STRING columns
  and computes the algebra inside whole-stage codegen — no Python objects
  per row. The same expressions run in DuckDB (shared dialect subset), so
  the oracle can verify the columnar algebra end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import urlparse


@dataclass(frozen=True)
class ObjectLocation:
    """Scalar location: (bucket, path). Same observable behavior as the
    reference pydantic model (object_location.py:54-233)."""

    bucket: str
    path: str

    @property
    def is_directory(self) -> bool:
        """Trailing slash ⟺ directory; the empty path is NOT a directory
        (object_location.py:71-95 incl. the root_location example)."""
        return self.path.endswith("/")

    @property
    def s3_uri(self) -> str:
        return f"s3://{self.bucket}/{self.path}"

    def extend(self, new_part: str) -> "ObjectLocation":
        """Join with exactly one separator: trailing slash of self.path and
        leading slash of new_part are both stripped (object_location.py:
        131-167)."""
        path = self.path[:-1] if self.path.endswith("/") else self.path
        ext = new_part[1:] if new_part.startswith("/") else new_part
        return ObjectLocation(bucket=self.bucket, path=f"{path}/{ext}")

    @staticmethod
    def from_s3_uri(s3_uri: str) -> "ObjectLocation":
        """Parse s3://bucket/path. Non-s3 scheme raises Exception with the
        reference's message; ``//`` inside the path portion raises
        ValueError (object_location.py:169-218)."""
        parsed = urlparse(s3_uri)
        if parsed.scheme != "s3":
            msg = "Argument to ObjectLocation.from_s3_uri must begin with 's3'"
            raise Exception(msg)
        if "//" in parsed.path:
            msg = "s3_uri contains `//` in its path portion, which is not supported."
            raise ValueError(msg)
        return ObjectLocation(bucket=parsed.netloc, path=parsed.path[1:])

    def __str__(self) -> str:
        return self.s3_uri


# ---------------------------------------------------------------------------
# Columnar form: the same algebra as codegen'd SQL expressions
# ---------------------------------------------------------------------------

def s3_uri_expr(bucket_col: str, path_col: str) -> str:
    return f"concat('s3://', {bucket_col}, '/', {path_col})"


def is_directory_expr(path_col: str) -> str:
    return f"({path_col} LIKE '%/')"


def extend_expr(path_col: str, part_expr: str) -> str:
    """Columnar ``extend``: strip the base's trailing and the part's
    leading slash, join with one '/'."""
    base = (
        f"CASE WHEN {path_col} LIKE '%/' THEN"
        f" substring({path_col}, 1, length({path_col}) - 1)"
        f" ELSE {path_col} END"
    )
    part = (
        f"CASE WHEN {part_expr} LIKE '/%' THEN"
        f" substring({part_expr}, 2, length({part_expr}) - 1)"
        f" ELSE {part_expr} END"
    )
    return f"concat({base}, '/', {part})"


def parse_s3_uri_exprs(uri_col: str) -> dict[str, str]:
    """Columnar ``from_s3_uri``: {bucket, path, valid} expressions. Rows
    with a non-s3 scheme or a ``//`` in the path portion get valid=false
    (a column can't raise; callers filter or assert on it — the engine's
    row-level twin of the reference's exceptions)."""
    after = f"substring({uri_col}, 6, length({uri_col}) - 5)"  # strip 's3://'
    bucket = f"CASE WHEN instr({after}, '/') = 0 THEN {after} ELSE substring({after}, 1, instr({after}, '/') - 1) END"
    path = f"CASE WHEN instr({after}, '/') = 0 THEN '' ELSE substring({after}, instr({after}, '/') + 1, length({after})) END"
    return {
        "bucket": bucket,
        "path": path,
        # the reference checks urlparse(...).path — the '/'+path form — so
        # a path STARTING with '/' (uri 's3://b//a') is also a '//' hit
        "valid": (
            f"({uri_col} LIKE 's3://%' AND NOT ({path}) LIKE '%//%'"
            f" AND NOT ({path}) LIKE '/%')"
        ),
    }
