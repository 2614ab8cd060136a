"""Interval (time-range) join: pair left rows with right rows whose
timestamp falls in ``(left_ts + lower, left_ts + upper]`` on matching keys.

The reference has no join operator of any kind (absent: no matching code
under ``/root/reference/``); this is the temporal sibling of the cell-key
spatial joins — the same filter-refine strategy applied to the time axis.

Scale design
------------
A naive theta join ``l.ts < r.ts AND r.ts <= l.ts + W`` compiles to a
BroadcastNestedLoopJoin (O(N×M) comparisons, single broadcast side) — dead
at 10^12 rows. Instead we *bucket* the time axis exactly like ``cells.py``
buckets the plane:

- width = ``upper - lower`` (the window length), so any left probe window
  spans at most **two** consecutive buckets;
- right rows get one bucket each: ``floor(epoch_us(ts) / width_us)``;
- left rows explode to the ≤2 candidate buckets covering their window;
- equi-join on ``(keys..., bucket)`` — a plain shuffled hash join Catalyst
  can plan, prune, and AQE-skew-split — then the exact range predicate
  refines candidates.

Each (left, right) pair meets in exactly one bucket (the right row's own),
so no dedup pass is needed. All timestamp math is integer microseconds —
bit-exact, no float drift. Hot keys (one user with millions of events)
are handled by the same salting machinery as hot cells
(``operators/skew.py``) since the join is a plain equi-join after bucketing.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows where ``right.ts - left.ts`` ∈ ``(lower_us, upper_us]``.

    Columns from both sides are kept; ambiguous names must be aliased by
    the caller (only ``keys`` may be shared — they're coalesced).
    ``lower_us``/``upper_us`` are integer microsecond offsets,
    ``lower_us < upper_us``. ``how`` ∈ {"inner", "left"}; "left" keeps
    unmatched left rows with nulls on the right.
    """
    if not lower_us < upper_us:
        raise ValueError(f"lower_us must be < upper_us, got {lower_us}, {upper_us}")
    width_us = upper_us - lower_us

    # parquet timestamps load as TIMESTAMP_NTZ; unix_micros wants TIMESTAMP.
    # The session runs UTC so the cast is an identity relabel, and the refine
    # predicate uses *differences*, which are offset-invariant regardless.
    def _us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    l_us = _us(left_ts)
    r_us = _us(right_ts)

    # right: exactly one bucket per row
    r = right.withColumn("__bucket", F.floor(r_us / F.lit(width_us)))

    # left: the probe window (l+lower, l+upper] spans <= 2 buckets
    lo_b = F.floor((l_us + F.lit(lower_us)) / F.lit(width_us))
    hi_b = F.floor((l_us + F.lit(upper_us)) / F.lit(width_us))
    l = left.withColumn(
        "__bucket", F.explode(F.array_distinct(F.array(lo_b, hi_b)))
    )

    on = [l[k] == r[k] for k in keys] + [l["__bucket"] == r["__bucket"]]
    delta = F.unix_micros(r[right_ts].cast("timestamp")) - F.unix_micros(
        l[left_ts].cast("timestamp")
    )
    cond = reduce(lambda a, b: a & b, on)
    refine = (delta > F.lit(lower_us)) & (delta <= F.lit(upper_us))

    if how == "inner":
        j = l.join(r, cond & refine, "inner")
        return j.drop(l["__bucket"]).drop(r["__bucket"]).drop(*[r[k] for k in keys])

    if how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    # left join: a left row matched in *either* of its 2 probe buckets must
    # not produce a second null row from the other bucket — so do the inner
    # bucket join first, then re-attach unmatched left rows via anti-join.
    inner = interval_join(
        left, right, keys=keys, left_ts=left_ts, right_ts=right_ts,
        lower_us=lower_us, upper_us=upper_us, how="inner",
    )
    matched_keys = inner.select(*[F.col(k) for k in keys], F.col(left_ts)).distinct()
    unmatched = left.join(matched_keys, on=keys + [left_ts], how="left_anti")
    for c in inner.columns:
        if c not in unmatched.columns:
            unmatched = unmatched.withColumn(c, F.lit(None))
    return inner.unionByName(unmatched.select(*inner.columns))
