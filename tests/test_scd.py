"""SCD2 interval-build semantics (operators/scd.py) on a hand-built
changelog; registry-level parity is covered by
test_oracle_parity.py::test_query_matches_oracle[scd2_priority_history]."""

from __future__ import annotations

import duckdb

from geografir_spark.operators.scd import scd2_sql

# entity 1: A -> A -> B -> A (re-appearing value opens a NEW interval);
# entity 2: single observation (one open interval);
# entity 1 has two rows on 2024-01-03 — tiebreak (seq) orders B before A.
_ROWS = [
    (1, "A", "2024-01-01", 10),
    (1, "A", "2024-01-02", 11),
    (1, "B", "2024-01-03", 12),
    (1, "A", "2024-01-03", 13),
    (2, "X", "2024-02-01", 14),
]


def _duck(sql: str):
    con = duckdb.connect()
    con.execute("CREATE TABLE log (ent BIGINT, attr VARCHAR, ts DATE, seq BIGINT)")
    con.executemany("INSERT INTO log VALUES (?, ?, ?, ?)", _ROWS)
    out = con.execute(sql).fetchdf()
    con.close()
    return out


def test_scd2_intervals_versions_and_reappearing_values():
    df = _duck(scd2_sql("log", "ent", "attr", "ts", "seq", "duckdb"))
    e1 = df[df.ent == 1].sort_values("version").reset_index(drop=True)
    assert e1.attr.tolist() == ["A", "B", "A"]
    assert e1.valid_from.tolist() == ["2024-01-01", "2024-01-03", "2024-01-03"]
    assert e1.valid_to.tolist()[:2] == ["2024-01-03", "2024-01-03"]
    assert e1.valid_to.isna().tolist() == [False, False, True]
    assert e1.is_current.tolist() == [0, 0, 1]
    e2 = df[df.ent == 2].reset_index(drop=True)
    assert len(e2) == 1 and e2.is_current[0] == 1 and e2.version[0] == 1


def test_scd2_spark_matches_duckdb_and_single_exchange(spark):
    import datetime as dt

    rows = [(e, a, dt.date.fromisoformat(t), s) for e, a, t, s in _ROWS]
    sdf = spark.createDataFrame(rows, ["ent", "attr", "ts", "seq"])
    sdf.createOrReplaceTempView("log")
    q = spark.sql(scd2_sql("log", "ent", "attr", "ts", "seq", "spark"))
    got = q.toPandas().sort_values(["ent", "version"]).reset_index(drop=True)
    exp = (
        _duck(scd2_sql("log", "ent", "attr", "ts", "seq", "duckdb"))
        .sort_values(["ent", "version"])
        .reset_index(drop=True)
    )
    assert got.attr.tolist() == exp.attr.tolist()
    assert got.valid_from.tolist() == exp.valid_from.tolist()
    assert [v if isinstance(v, str) else None for v in got.valid_to] == [
        v if isinstance(v, str) else None for v in exp.valid_to
    ]
    # one shuffle serves both windows: the change filter preserves the
    # (k) hash partitioning, so exactly one Exchange (and one Sort — the
    # second window reuses the first's order) in the static plan. Assert
    # with AQE off: at test scale AQE's partition coalescing re-inserts
    # an ENSURE_REQUIREMENTS exchange that production-size stages don't.
    adaptive = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = (
            spark.sql(scd2_sql("log", "ent", "attr", "ts", "seq", "spark"))
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", adaptive)
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Sort") == 1, plan
