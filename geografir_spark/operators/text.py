"""Text-analysis operators for the pages/documents corpus: language-ID
heuristic, quality scoring, token counting, document fingerprinting.

These are the training-data-pipeline primitives the engine provides beyond
the reference's surface (the reference has no text ops — absent under
/root/reference/ — but the north_star input is Common-Crawl text, so a real
deployment tiles *and* filters/scores pages in one pass).

Each op is emitted per-dialect ("spark" | "duckdb") because the two SQL
dialects diverge on list/regexp function names (split vs string_split,
regexp_replace global-flag arg). Semantics are kept value-identical; the
driver's oracle gate enforces it.
"""

from __future__ import annotations

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# tiny deterministic language lexicons (heuristic language-ID over the
# sandbox's 5 langs; real deployments plug a fastText-style model in a
# pandas UDF behind the same column contract)
LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "los", "las", "es", "una", "que"),
    "pt": ("o", "os", "um", "uma", "não", "são"),
}


def tokens_expr(text: str, dialect: str) -> str:
    if dialect == "spark":
        return f"split({text}, ' ')"
    return f"string_split({text}, ' ')"


def n_tokens_expr(text: str, dialect: str) -> str:
    if dialect == "spark":
        return f"size({tokens_expr(text, dialect)})"
    return f"len({tokens_expr(text, dialect)})"


def regexp_strip_expr(text: str, pattern: str, dialect: str) -> str:
    """Remove all matches of pattern (global)."""
    if dialect == "spark":
        return f"regexp_replace({text}, '{pattern}', '')"
    return f"regexp_replace({text}, '{pattern}', '', 'g')"


def punct_ratio_expr(text: str, dialect: str) -> str:
    """non-[a-z0-9 space] characters / total characters (0 for empty)."""
    stripped = regexp_strip_expr(text, "[a-zA-Z0-9 ]", dialect)
    return (
        f"(CAST(length({stripped}) AS DOUBLE)"
        f" / CAST(greatest(length({text}), 1) AS DOUBLE))"
    )


def _count_in_set_expr(text: str, words: tuple, dialect: str) -> str:
    wl = ", ".join(f"'{w}'" for w in words)
    toks = tokens_expr(text, dialect)
    if dialect == "spark":
        return f"size(filter({toks}, w -> w IN ({wl})))"
    return f"len(list_filter({toks}, w -> w IN ({wl})))"


def stopword_ratio_expr(text: str, dialect: str) -> str:
    return (
        f"(CAST({_count_in_set_expr(text, STOPWORDS, dialect)} AS DOUBLE)"
        f" / CAST(greatest({n_tokens_expr(text, dialect)}, 1) AS DOUBLE))"
    )


def fingerprint_expr(text: str, dialect: str) -> str:
    """64-bit-ish deterministic document fingerprint (hex). md5 agrees
    byte-for-byte across both engines."""
    return f"substr(md5({text}), 1, 16)"


def hash60_expr(s: str, dialect: str) -> str:
    """Shared 60-bit integer hash: first 15 hex chars of md5 as a BIGINT.
    The cross-engine hash primitive for minhash/simhash (xxhash64 exists
    only in Spark; DuckDB's hash() is engine-specific)."""
    if dialect == "spark":
        return f"CAST(conv(substr(md5({s}), 1, 15), 16, 10) AS BIGINT)"
    return f"CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"


def quality_exprs(text: str, dialect: str) -> dict[str, str]:
    """Column set for the quality-score op (aliased identically on both
    sides so the oracle hash matches)."""
    n_tok = n_tokens_expr(text, dialect)
    return {
        "n_tokens": n_tok,
        "n_chars_txt": f"length({text})",
        "avg_token_len": (
            f"(CAST(length({regexp_strip_expr(text, ' ', dialect)}) AS DOUBLE)"
            f" / CAST(greatest({n_tok}, 1) AS DOUBLE))"
        ),
        "punct_ratio": punct_ratio_expr(text, dialect),
        "stopword_ratio": stopword_ratio_expr(text, dialect),
        "fingerprint": fingerprint_expr(text, dialect),
    }


def lang_id_expr(text: str, dialect: str) -> str:
    """Marker-word-count language heuristic: the language with the most
    marker hits wins; 'en' when nothing beats zero. Deterministic tie-break
    by fixed evaluation order (de, fr, es, pt)."""
    counts = {
        lang: _count_in_set_expr(text, markers, dialect)
        for lang, markers in LANG_MARKERS.items()
    }
    # greatest-count winner via chained CASE (order fixes ties)
    g = f"greatest({', '.join(counts.values())})"
    case = f"CASE WHEN {g} = 0 THEN 'en' "
    for lang in ("de", "fr", "es", "pt"):
        case += f"WHEN {counts[lang]} = {g} THEN '{lang}' "
    return case + "ELSE 'en' END"


def winnow_exprs(
    text: str, dialect: str, *, k: int = 3, w: int = 4
) -> "list[dict[str, str]]":
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    rolling-hash scheme): hash every k-token shingle, then keep the minimum
    hash of each length-``w`` window of consecutive shingle hashes; the
    distinct selected minima are the document's fingerprint set.

    Guarantees (from the paper): any shared token run of length ≥ k+w-1
    contributes at least one COMMON selected fingerprint to both documents,
    so fingerprint-set intersection detects containment/overlap robustly —
    unlike whole-doc hashing — while storing ~2/(w+1) of the shingle
    hashes.

    Emitted as step dicts for ``nested_sql``: __hs (shingle hashes, shared
    with minhash), then __fps (distinct window minima, array<bigint>).
    Pure SQL in BOTH dialects — at scale this is whole-stage codegen over
    arrays, no UDF."""
    from geografir_spark.operators.dedup import _P, _shingles_expr

    hs = (
        f"transform({_shingles_expr(text, k, dialect)},"
        f" s -> {hash60_expr('s', dialect)} % {_P})"
        if dialect == "spark"
        else f"list_transform({_shingles_expr(text, k, dialect)},"
        f" s -> {hash60_expr('s', dialect)} % {_P})"
    )
    if dialect == "spark":
        fps = (
            f"CASE WHEN size(__hs) >= {w} THEN"
            f" array_distinct(transform(sequence(0, size(__hs) - {w}),"
            f" i -> array_min(slice(__hs, i + 1, {w}))))"
            f" WHEN size(__hs) > 0 THEN array(array_min(__hs))"
            f" ELSE CAST(array() AS array<bigint>) END"
        )
    else:
        # DuckDB list slicing is 1-based inclusive: __hs[i+1 : i+w]
        fps = (
            f"CASE WHEN len(__hs) >= {w} THEN"
            f" list_distinct(list_transform(range(0, len(__hs) - {w} + 1),"
            f" i -> list_min(__hs[i + 1 : i + {w}])))"
            f" WHEN len(__hs) > 0 THEN [list_min(__hs)]"
            f" ELSE CAST([] AS BIGINT[]) END"
        )
    return [{"__hs": hs}, {"__fps": fps}]


# --- PII scrubbing -----------------------------------------------------------
# Conservative, deterministic redaction patterns. Kept to regex features with
# identical semantics in Java regex (Spark) and RE2 (DuckDB): literal classes,
# bounded/unbounded greedy repetition, \b word boundaries — no backreferences
# or lookaround (RE2 has neither). Order matters: emails first (their local
# parts contain dots and digits), then dotted IPv4 runs, then +phone runs.
PII_PATTERNS: tuple = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9-]{7,14}[0-9]", "<PHONE>"),
)


def regexp_sub_expr(text: str, pattern: str, repl: str, dialect: str) -> str:
    """Replace ALL matches of pattern with repl (global) — Spark's
    regexp_replace is global by default; DuckDB needs the 'g' flag. Spark
    SQL string literals eat one backslash level, so the pattern is
    re-escaped there (same convention as geo.geocode._pattern_literal)."""
    if dialect == "spark":
        pat = pattern.replace("\\", "\\\\")
        return f"regexp_replace({text}, '{pat}', '{repl}')"
    return f"regexp_replace({text}, '{pattern}', '{repl}', 'g')"


def pii_scrub_expr(text: str, dialect: str) -> str:
    """text with every PII_PATTERNS category replaced by its tag, applied
    in declaration order. Map-only: one codegen'd projection, no shuffle."""
    out = text
    for _, pattern, repl in PII_PATTERNS:
        out = regexp_sub_expr(out, pattern, repl, dialect)
    return out


def pii_count_expr(scrubbed: str, tag: str, dialect: str) -> str:
    """Occurrences of a redaction tag in already-scrubbed text (tags contain
    no regex metacharacters, so Spark's regex split == DuckDB's literal
    split)."""
    if dialect == "spark":
        return f"size(split({scrubbed}, '{tag}')) - 1"
    return f"len(string_split({scrubbed}, '{tag}')) - 1"


def editdist_pairs_sql(
    rel: str,
    id_col: str,
    str_expr: str,
    block_exprs: tuple,
    tau: int,
    dialect: str,
) -> str:
    """Blocked edit-distance similarity self-join — fuzzy record linkage
    (typo'd titles/urls/names): candidate pairs share every blocking key
    and are kept when ``levenshtein(str_a, str_b) <= tau``. Levenshtein is
    built-in and integer-exact in BOTH engines, so the whole join is
    oracle-checkable with no float hazard.

    Scale shape: the self-join is equi on the block keys (hash join, no
    cross product); comparisons are O(Σ block²), so blocks must be
    selective — length buckets + a cheap categorical here; production
    corpora add prefix q-gram blocking (Ed-Join) for the same contract.
    Equal-bucket blocking deliberately misses cross-bucket pairs whose
    lengths straddle a boundary — the standard candidate-generation
    tradeoff; use overlapping buckets when recall must be total.

    Output: ``id_a, id_b (id_a < id_b), dist (BIGINT)``.
    """
    blk = " AND ".join(f"a.b{i} = b.b{i}" for i in range(len(block_exprs)))
    bcols = ", ".join(f"{e} AS b{i}" for i, e in enumerate(block_exprs))
    return f"""
    WITH d AS (SELECT {id_col} AS id, {str_expr} AS s, {bcols} FROM {rel})
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
    FROM d a JOIN d b ON {blk} AND a.id < b.id
    WHERE levenshtein(a.s, b.s) <= {tau}
    """
