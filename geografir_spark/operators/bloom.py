"""Bloom-filter pre-join pruning — build a compact bitset over the small
side's join keys, broadcast it, and drop non-matching big-side rows BEFORE
the shuffle. The distributed runtime-filter pattern (Spark's own
``spark.sql.optimizer.runtime.bloomFilter`` does this opportunistically;
this operator is the explicit, engine-controlled form whose false-positive
behavior is deterministic and oracle-checkable).

Layout: ``N_WORDS`` BIGINT words × 63 usable bits each (bit 63 is never set,
keeping every word positive — DuckDB range-checks ``<< 63``). ``K`` hash
functions derive positions from the shared md5-based ``hash60`` primitive,
so DuckDB replays the exact same filter bit-for-bit.

Scale: the build is one partial+final ``bit_or`` aggregation (a few hundred
bytes of state per task, any key count); the filter is W×8 bytes broadcast
to every probe task; the probe is a map-only bitmask test inside codegen.
At 100 TB the win is shuffle volume: rows failing the membership test never
enter the join exchange, at a false-positive cost of
``(1 - e^(-K·n/M))^K`` — measured and reported by the demo query.
"""

from __future__ import annotations

from geografir_spark.operators.text import hash60_expr

N_WORDS = 16
BITS = 63               # usable bits per word (sign bit left clear)
M = N_WORDS * BITS      # total filter positions
K = 3                   # hash functions


def _div(dialect: str, a: str, b: int) -> str:
    return f"({a} DIV {b})" if dialect == "spark" else f"({a} // {b})"


def _shift(dialect: str, bits: str) -> str:
    if dialect == "spark":
        return f"shiftleft(CAST(1 AS BIGINT), {bits})"
    return f"(CAST(1 AS BIGINT) << ({bits}))"


def pos_expr(key: str, i: int, dialect: str) -> str:
    """Position of hash function ``i`` for ``key`` (0 ≤ pos < M)."""
    h = hash60_expr(f"('bf{i}|' || CAST({key} AS STRING))", dialect)
    return f"({h} % {M})"


def build_sql(keys_sql: str, key: str, dialect: str) -> str:
    """One-row relation (w0..w{N_WORDS-1}) — the filter, via bit_or agg."""
    pos_cols = ", ".join(
        f"{pos_expr(key, i, dialect)} AS __p{i}" for i in range(K)
    )
    words = []
    for w in range(N_WORDS):
        per_hash = " | ".join(
            f"(CASE WHEN {_div(dialect, f'__p{i}', BITS)} = {w}"
            f" THEN {_shift(dialect, f'(__p{i} % {BITS})')}"
            f" ELSE CAST(0 AS BIGINT) END)"
            for i in range(K)
        )
        words.append(f"bit_or({per_hash}) AS w{w}")
    return (
        f"SELECT {', '.join(words)}"
        f" FROM (SELECT {pos_cols} FROM ({keys_sql}))"
    )


def test_expr(p: str, dialect: str, filter_alias: str = "f") -> str:
    """True when position ``p``'s bit is set in the broadcast filter row."""
    word = " ".join(
        f"WHEN {w} THEN {filter_alias}.w{w}" for w in range(N_WORDS)
    )
    return (
        f"((CASE {_div(dialect, p, BITS)} {word} END"
        f" & {_shift(dialect, f'({p} % {BITS})')}) <> CAST(0 AS BIGINT))"
    )


def member_expr(key: str, dialect: str, filter_alias: str = "f") -> str:
    """Full K-way membership test for ``key`` against the filter row."""
    return " AND ".join(
        test_expr(pos_expr(key, i, dialect), dialect, filter_alias)
        for i in range(K)
    )
