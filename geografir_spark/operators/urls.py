"""URL canonicalization — the crawl-side normalization a Common-Crawl-style
pipeline runs before URL-keyed dedup (the reference's `object_location.py`
normalizes S3 URIs the same way: scheme check, slash normalization,
`object_storage/src/object_storage/object_location.py:172-218`; this module
is the web-URL analog lifted to a columnar operator).

Rules (a practical subset of RFC 3986 §6 normalization):
  1. scheme and host lowercased;
  2. default https port ``:443`` stripped from the authority;
  3. fragment (``#...``) stripped;
  4. trailing slash stripped from a non-root path;
  5. query parameters sorted bytewise (``?b=2&a=1`` == ``?a=1&b=2``).

Everything is generated dual-dialect SQL (no Python on the hot path; the
DuckDB oracle replays the identical formula). String positions use
``instr``/``substr`` — never regex — because regex literals differ by one
backslash level between the dialects (see geo/geocode.py).

Scale: pure per-row string expressions inside whole-stage codegen — map-only,
no shuffle; the dedup that follows is one hash aggregation on the canonical
key.
"""

from __future__ import annotations


def _split_parts(dialect: str, arr: str, sep: str) -> tuple[str, str, str]:
    """(split, sort, join) function names per dialect."""
    if dialect == "spark":
        return (
            f"split({arr}, '{sep}')",
            "array_sort",
            f"array_join({{}}, '{sep}')",
        )
    return (
        f"string_split({arr}, '{sep}')",
        "list_sort",
        f"array_to_string({{}}, '{sep}')",
    )


def canonical_url_steps(url: str, dialect: str, out: str = "canonical_url"):
    """Step dicts (cells.nested_sql / cells.apply_steps convention) adding
    ``out`` = canonicalized form of the ``url`` column."""
    split_q, sort_fn, join_tpl = _split_parts(dialect, "__q", "&")
    sorted_q = join_tpl.format(f"{sort_fn}({split_q})")
    return [
        {  # strip fragment
            "__nf": (
                f"CASE WHEN instr({url}, '#') > 0"
                f" THEN substr({url}, 1, instr({url}, '#') - 1)"
                f" ELSE {url} END"
            ),
        },
        {  # split off the query string
            "__qp": "instr(__nf, '?')",
        },
        {
            "__pre": "CASE WHEN __qp > 0 THEN substr(__nf, 1, __qp - 1) ELSE __nf END",
            "__q": "CASE WHEN __qp > 0 THEN substr(__nf, __qp + 1) ELSE '' END",
        },
        {  # scheme :// rest
            "__sp": "instr(__pre, '://')",
        },
        {
            "__scheme": "lower(substr(__pre, 1, __sp - 1))",
            "__rest": "substr(__pre, __sp + 3)",
        },
        {  # authority / path
            "__sl": "instr(__rest, '/')",
        },
        {
            "__auth": (
                "lower(CASE WHEN __sl > 0"
                " THEN substr(__rest, 1, __sl - 1) ELSE __rest END)"
            ),
            "__path": "CASE WHEN __sl > 0 THEN substr(__rest, __sl) ELSE '/' END",
        },
        {  # default-port strip; trailing-slash strip (keep root '/')
            "__auth2": (
                "CASE WHEN __auth LIKE '%:443'"
                " THEN substr(__auth, 1, length(__auth) - 4) ELSE __auth END"
            ),
            "__path2": (
                "CASE WHEN length(__path) > 1 AND __path LIKE '%/'"
                " THEN substr(__path, 1, length(__path) - 1) ELSE __path END"
            ),
        },
        {
            out: (
                "__scheme || '://' || __auth2 || __path2 ||"
                f" CASE WHEN __q = '' THEN '' ELSE '?' || {sorted_q} END"
            ),
        },
    ]


# Deterministic messy-URL synthesis for tests/oracle: several doc_ids map to
# one canonical URL through independent nuisance variations (case, default
# port, trailing slash, fragment, query-param order). Dialect-independent SQL.
def messy_url_expr(doc_id: str = "doc_id") -> str:
    dup = f"({doc_id} % 120)"
    return (
        f"(CASE WHEN {doc_id} % 6 = 0 THEN 'HTTPS' ELSE 'https' END || '://'"
        f" || CASE WHEN {doc_id} % 3 = 0 THEN 'Site' ELSE 'site' END"
        f" || CAST({dup} % 50 AS STRING) || '.example'"
        f" || CASE WHEN {doc_id} % 7 = 0 THEN ':443' ELSE '' END"
        f" || '/d/' || CAST({dup} AS STRING)"
        f" || CASE WHEN {doc_id} % 2 = 0 THEN '/' ELSE '' END"
        f" || CASE {doc_id} % 5 WHEN 0 THEN '?b=2&a=1' WHEN 1 THEN '?a=1&b=2'"
        f" ELSE '' END"
        f" || CASE WHEN {doc_id} % 11 = 0 THEN '#s' || CAST({doc_id} % 4 AS STRING)"
        f" ELSE '' END)"
    )
