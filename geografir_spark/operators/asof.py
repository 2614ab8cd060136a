"""As-of (most-recent-event) join — the custom temporal operator Spark's
built-in joins lack.

``asof_join(left, right)`` attaches to every left row the LATEST right row
of the same key with ``right.ts <= left.ts`` (pandas ``merge_asof`` /
DuckDB ``ASOF JOIN`` semantics, ties included).

Scale shape: the naive formulation (equi-join on key + windowed max over
the joined pairs) materializes |left| × |right-per-key| rows before
pruning. This implementation is the single-shuffle union trick instead:

1. tag both sides and UNION them (right payload packed into one struct,
   null on left rows);
2. one window over (key) ordered by (ts, side) — right sorts before left
   at equal ts, so ties match — forward-fills the last non-null right
   struct onto every left row;
3. keep left rows, unpack the struct.

Cost: ONE hash exchange on key + an in-partition sort of |left| + |right|
rows — no pair blowup, no second shuffle. Skewed keys hit the same
sort-straggler bound as any keyed window; salt via operators.skew if a
single key's history exceeds an executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: "list[str]",
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """All left columns + every non-key right column (null-filled when no
    right row matches a left row; such rows are dropped when
    ``how='inner'``, kept when ``how='left'``).

    ``direction='backward'`` (default) attaches the LATEST right row with
    ``right.ts <= left.ts``; ``'forward'`` attaches the EARLIEST right row
    with ``right.ts >= left.ts`` (both tie-inclusive) — the same
    single-shuffle union trick with the scan order reversed."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )
    rpay = [c for c in right.columns if c not in keys and c != right_ts]
    # fail fast on silent-overwrite hazards: a left column sharing a right
    # payload name would be replaced by the right value, and the internal
    # union-alignment columns assume they are free on both sides
    clash = sorted(set(left.columns) & set(rpay))
    if clash:
        raise ValueError(
            f"asof_join: left columns {clash} collide with right payload"
            " columns — rename one side (right payload overwrites left)"
        )
    reserved = {"__ts", "__side", "__r", "__last_r", "__asof_ts"}
    bad = sorted(reserved & (set(left.columns) | set(right.columns)))
    if bad:
        raise ValueError(f"asof_join: reserved column names in inputs: {bad}")
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in rpay], F.col(right_ts).alias("__rts")).alias(
            "__r"
        ),
    )
    lcols = left.columns
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
    )
    # align schemas for the union: left keeps its payload, right nulls it
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(zip(left.columns, [f.dataType for f in left.schema.fields]))[c]))
    u = l.unionByName(r.select(*l.columns))
    # at equal ts the right row must precede the left row in scan order so
    # ties match — __side (right=0, left=1) ascending does that for both
    # directions; forward simply scans time descending
    ts_order = F.asc("__ts") if direction == "backward" else F.desc("__ts")
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
    out = filled.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__last_r").isNotNull())
    for c in rpay:
        out = out.withColumn(c, F.col("__last_r")[c])
    out = out.withColumn("__asof_ts", F.col("__last_r")["__rts"])
    return out.drop("__ts", "__side", "__r", "__last_r")
