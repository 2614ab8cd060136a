"""interval_join unit semantics: (lower, upper] boundary inclusion, bucket
crossing, key isolation, and left-join null rows — on hand-computed rows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F  # noqa: F401

from geografir_spark.operators.interval_join import interval_join

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)
MIN_US = 60 * 1_000_000


def _df(spark, rows, id_col, ts_col):
    return spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(minutes=m)) for i, k, m in rows],
        [id_col, "user_id", ts_col],
    )


def test_inner_boundaries_and_buckets(spark):
    # probe at t=0 with window (0, 10] minutes; bucket width = 10 min, so
    # candidates span buckets 0 and 1 — targets at 5 (bucket 0) and 10
    # (bucket 1, exactly on the inclusive upper bound) must both match;
    # 0 (delta=0, exclusive lower) and 11 (out of range) must not.
    left = _df(spark, [(100, 1, 0)], "lid", "lts")
    right = _df(
        spark,
        [(0, 1, 0), (1, 1, 5), (2, 1, 10), (3, 1, 11), (4, 2, 5)],
        "rid",
        "rts",
    )
    out = interval_join(
        left, right, keys=["user_id"], left_ts="lts", right_ts="rts",
        lower_us=0, upper_us=10 * MIN_US,
    )
    assert sorted(r["rid"] for r in out.collect()) == [1, 2]


def test_left_join_unmatched_and_no_dup(spark):
    # probe A matches one target (must appear exactly once despite the
    # 2-bucket probe explode); probe B matches nothing (null row).
    left = _df(spark, [(100, 1, 0), (200, 9, 0)], "lid", "lts")
    right = _df(spark, [(1, 1, 7)], "rid", "rts")
    out = interval_join(
        left, right, keys=["user_id"], left_ts="lts", right_ts="rts",
        lower_us=0, upper_us=10 * MIN_US, how="left",
    ).collect()
    by_lid = {}
    for r in out:
        by_lid.setdefault(r["lid"], []).append(r["rid"])
    assert by_lid == {100: [1], 200: [None]}


def test_negative_window_asof_style(spark):
    # window (-10, 0] minutes: targets strictly BEFORE the probe (as-of
    # lookback). Target at -10 exclusive-excluded? lower=-10 exclusive,
    # upper=0 inclusive: delta in (-10*60e6, 0] — so -10 is out, 0 is in.
    left = _df(spark, [(100, 1, 0)], "lid", "lts")
    right = _df(
        spark, [(0, 1, -10), (1, 1, -9), (2, 1, 0), (3, 1, 1)], "rid", "rts"
    )
    out = interval_join(
        left, right, keys=["user_id"], left_ts="lts", right_ts="rts",
        lower_us=-10 * MIN_US, upper_us=0,
    )
    assert sorted(r["rid"] for r in out.collect()) == [1, 2]
