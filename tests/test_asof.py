"""asof_join operator unit semantics: ties at equal ts match, rows with no
preceding right row drop (inner) or null-fill (left), per-key isolation.
(The corpus-level check runs against DuckDB's native ASOF JOIN via the
asof_join_checkpoints oracle query.)"""

from __future__ import annotations

from datetime import datetime

from geografir_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),   # after r@09, before r@11
            (1, _ts("2024-01-01T11:00:00"), "b"),   # ties r@11 exactly
            (1, _ts("2024-01-01T08:00:00"), "c"),   # before any right row
            (2, _ts("2024-01-01T10:00:00"), "d"),   # other key, own history
            (3, _ts("2024-01-01T10:00:00"), "e"),   # key with no right rows
        ],
        "k LONG, ts TIMESTAMP, tag STRING",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 90),
            (1, _ts("2024-01-01T11:00:00"), 110),
            (2, _ts("2024-01-01T09:30:00"), 930),
        ],
        "k LONG, ts TIMESTAMP, v LONG",
    )

    inner = {
        (r["k"], r["tag"]): (r["v"], r["__asof_ts"])
        for r in asof_join(left, right, keys=["k"], how="inner").collect()
    }
    assert inner[(1, "a")] == (90, _ts("2024-01-01T09:00:00"))
    assert inner[(1, "b")] == (110, _ts("2024-01-01T11:00:00"))  # tie matches
    assert inner[(2, "d")] == (930, _ts("2024-01-01T09:30:00"))
    assert (1, "c") not in inner and (3, "e") not in inner

    outer = {
        (r["k"], r["tag"]): r["v"]
        for r in asof_join(left, right, keys=["k"], how="left").collect()
    }
    assert len(outer) == 5
    assert outer[(1, "c")] is None and outer[(3, "e")] is None

    import pytest
    with pytest.raises(ValueError, match="how must be"):
        asof_join(left, right, keys=["k"], how="full")


def test_asof_join_rejects_colliding_and_reserved_columns(spark):
    """ADVICE r2: a left column named like a right payload column was
    silently overwritten; internal __ts/__side/__r names were silently
    assumed free. Both now raise up front."""
    import pytest

    from geografir_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, 5)], "k INT, ts INT, v INT")
    right = spark.createDataFrame([(1, 9, 7)], "k INT, ts INT, v INT")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, keys=["k"])

    left2 = spark.createDataFrame([(1, 10, 5)], "k INT, ts INT, `__side` INT")
    right2 = spark.createDataFrame([(1, 9, 7)], "k INT, ts INT, w INT")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left2, right2, keys=["k"])


def test_asof_join_forward_direction(spark):
    """Forward attaches the EARLIEST right row at-or-after, tie-inclusive;
    left rows after the last right row drop under how='inner' and null-fill
    under how='left'."""
    from geografir_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 15, "c"), (2, 1, "d")],
        "k INT, ts INT, tag STRING",
    )
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 12, 120), (2, 0, 5)], "k INT, ts INT, v INT"
    )
    got = {
        r["tag"]: (r["v"], r["__asof_ts"])
        for r in asof_join(
            left, right, keys=["k"], how="inner", direction="forward"
        ).collect()
    }
    assert got == {"a": (100, 10), "b": (100, 10)}  # tie at 10 matches; c, d drop
    outer = {
        r["tag"]: r["v"]
        for r in asof_join(
            left, right, keys=["k"], how="left", direction="forward"
        ).collect()
    }
    assert outer == {"a": 100, "b": 100, "c": None, "d": None}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="direction"):
        asof_join(left, right, keys=["k"], direction="nearest")
