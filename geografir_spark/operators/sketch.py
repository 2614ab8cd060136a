"""Distributed cardinality sketch: a deterministic, dual-dialect HyperLogLog.

The engine's "novel sketch" operator: per-group approximate distinct counts
whose register state is mergeable across partitions (max is associative and
commutative, so Spark's partial aggregation combines registers map-side —
the sketch shuffles at most ``m`` rows per group no matter how many items a
group holds). Native ``approx_count_distinct`` can't be oracle-checked
(its HLL++ register layout is engine-internal); this one is built from the
repo's shared md5-derived 60-bit hash, so Spark and DuckDB compute
BIT-IDENTICAL registers and the driver's value-hash gate verifies the full
sketch, not just row counts.

Determinism discipline (the whole point of the design):
- register index = hash60 % m, remaining 54 hash bits give the rank;
  rank via ``length(bin(w))`` — integer bit-length, no float log2.
- per-register state and the final register sum are BIGINTs: each register
  contributes 2^(55 - rank) (a power of two, exact in int64; m * 2^55 <
  2^63), absent registers contribute 2^55. Summation order cannot change
  an integer sum.
- the only float op is the LAST one: estimate = alpha_m * m² * 2^55 /
  sum_scaled — one literal-by-integer IEEE division, identical in both
  engines. Raw HLL estimate, no small/large-range corrections (documented;
  the oracle replays the same formula so the check is exact).

At 100 TB: one scan, one shuffle keyed (group, register) with map-side
combine, then a tiny per-group fold — the same plan shape at any scale.
"""

from __future__ import annotations

from geografir_spark.operators.text import hash60_expr

M_REGISTERS = 64
_SCALE = 1 << 55  # 2^55: rank r contributes 2^(55-r); empty register 2^55
_ALPHA_M = 0.7213 / (1.0 + 1.079 / M_REGISTERS)
# alpha * m^2 * 2^55 as one repr-exact literal (both engines parse the same
# double); the estimate is this literal divided by the integer register sum.
_EST_NUMERATOR = repr(_ALPHA_M * M_REGISTERS * M_REGISTERS * _SCALE)


def hll_distinct_sql(
    base_sql: str,
    group_expr: str,
    item_expr: str,
    dialect: str,
    group_name: str = "grp",
) -> str:
    """Per-group HLL distinct estimate + exact distinct for comparison.

    ``base_sql`` is any relation-producing SELECT; ``group_expr`` /
    ``item_expr`` are column expressions over it. The exact count rides the
    same single pass: distinct items partition across registers (the
    register is a function of the item hash), so Σ per-register exact
    distincts = the group's exact distinct — no second scan of the base
    (Spark inlines CTEs; a separate count(DISTINCT) branch would recompute
    the geocode pipeline).

    Output: ``grp, n_exact, hll_sum_scaled, hll_estimate, hll_regs_used``.
    """
    h = hash60_expr("__item", dialect)
    idiv = "__h DIV 64" if dialect == "spark" else "__h // 64"
    rank = (
        "CASE WHEN __w > 0 THEN 55 - length(bin(__w)) ELSE 55 END"
    )
    return f"""
    WITH b AS (SELECT {group_expr} AS {group_name}, {item_expr} AS __item
               FROM ({base_sql})),
         hashed AS (SELECT {group_name}, __item, __h % 64 AS __reg,
                           {idiv} AS __w
                    FROM (SELECT {group_name}, __item, {h} AS __h FROM b)),
         regs AS (SELECT {group_name}, __reg,
                         max({rank}) AS __rank,
                         count(DISTINCT __item) AS __n_u
                  FROM hashed GROUP BY {group_name}, __reg)
    SELECT {group_name},
           CAST(sum(__n_u) AS BIGINT) AS n_exact,
           CAST(sum(CAST(pow(2, 55 - __rank) AS BIGINT))
                + ({M_REGISTERS} - count(*)) * {_SCALE} AS BIGINT)
             AS hll_sum_scaled,
           {_EST_NUMERATOR} / CAST(sum(CAST(pow(2, 55 - __rank) AS BIGINT))
                + ({M_REGISTERS} - count(*)) * {_SCALE} AS DOUBLE)
             AS hll_estimate,
           count(*) AS hll_regs_used
    FROM regs GROUP BY {group_name}
    """


# ---------------------------------------------------------------------------
# Count-Min sketch (heavy-hitter frequency estimation)
# ---------------------------------------------------------------------------

CM_DEPTH = 3
CM_WIDTH = 64


def countmin_sql(
    base_sql: str,
    item_expr: str,
    dialect: str,
    top_k: int = 20,
) -> str:
    """Count-Min heavy hitters: estimate per-item frequencies from a fixed
    d×w integer register table and report, for the top-``top_k`` items by
    exact count, the exact count, the CMS estimate (min over the item's d
    registers), and the collision overestimate (always ≥ 0 — CMS never
    underestimates).

    Determinism discipline (same as the HLL above): register position =
    shared md5-derived 60-bit hash of ``'cm<r>:' || item`` mod w; registers
    are BIGINT sums, so partial aggregation combines them map-side and
    summation order can't change them; the estimate is an integer min —
    zero float ops anywhere, Spark and DuckDB agree bit-for-bit.

    Plan shape at 100 TB: ONE scan of the base → groupBy(item) (the only
    data-sized shuffle; CMS registers are additive, so they are built from
    the compact per-item counts instead of re-scanning raw rows), then a
    d×w≤768-row register table that broadcasts back onto the item counts
    for the min-estimate, and a distributed TakeOrdered for the total-order
    top-k (exact count desc, item asc — deterministic under ties).
    """
    seeds = " UNION ALL ".join(f"SELECT {r} AS r" for r in range(CM_DEPTH))
    h = hash60_expr("concat('cm', CAST(r AS STRING), ':', item)", dialect)
    return f"""
    WITH b AS (SELECT CAST({item_expr} AS STRING) AS item FROM ({base_sql})),
         items AS (SELECT item, CAST(count(*) AS BIGINT) AS n
                   FROM b GROUP BY item),
         pos AS (SELECT item, n, r, {h} % {CM_WIDTH} AS p
                 FROM items CROSS JOIN ({seeds}) seeds),
         regs AS (SELECT r, p, CAST(sum(n) AS BIGINT) AS reg
                  FROM pos GROUP BY r, p),
         est AS (SELECT pos.item, pos.n, min(regs.reg) AS cms
                 FROM pos JOIN regs ON pos.r = regs.r AND pos.p = regs.p
                 GROUP BY pos.item, pos.n)
    SELECT item, n AS n_exact,
           CAST(cms AS BIGINT) AS cms_estimate,
           CAST(cms - n AS BIGINT) AS overestimate
    FROM est
    ORDER BY n_exact DESC, item ASC
    LIMIT {top_k}
    """
