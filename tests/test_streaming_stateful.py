"""applyInPandasWithState: per-cell cumulative state across microbatches.

Pins (1) batching-invariance of the event SET — the same (cell, threshold)
events whether the backlog arrives as one file or three, (2) equality with
the batch-computed oracle {(c, 2^k): 2^k <= final count(c)}, (3) state
survival across a checkpointed stop/restart (events are never re-emitted,
and a later file only emits newly-crossed thresholds)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.test_streaming import SF_DIR, _write_doc_files

RES = 4  # coarse cells → counts big enough to cross several thresholds


def _expected_events(spark, src_dir):
    from geografir_spark.geo import cells, geocode
    from geografir_spark.sources.pages import PAGES_COLS_SQL

    pages = spark.read.parquet(src_dir).selectExpr(
        *[f"{e} AS {n}" for n, e in PAGES_COLS_SQL.items()]
    )
    p = geocode.with_geocode(pages, "text", "page_id")
    p = cells.with_cell(p, "lon", "lat", RES)
    counts = {r["cell"]: r["n"] for r in p.groupBy("cell").agg(F.count("*").alias("n")).collect()}
    exp = set()
    for cell, n in counts.items():
        t = 1
        while t <= n:
            exp.add((cell, t))
            t <<= 1
    return exp, counts


def _run(spark, src, out, ckpt):
    from geografir_spark.streaming.ingest import pages_stream, run_available_now
    from geografir_spark.streaming.stateful import stream_hot_cell_events

    sdf = stream_hot_cell_events(pages_stream(spark, src), res=RES)
    run_available_now(sdf, out_dir=out, checkpoint_dir=ckpt)
    return spark.read.parquet(out)


def test_threshold_events_match_batch_oracle(spark, tmp_path):
    src, out, ckpt = f"{tmp_path}/src", f"{tmp_path}/out", f"{tmp_path}/ckpt"
    _write_doc_files(spark, src, [(0, 150), (150, 300), (300, 500)])
    events = _run(spark, src, out, ckpt)
    got = {(r["cell"], r["threshold"]) for r in events.collect()}
    exp, counts = _expected_events(spark, src)
    assert got == exp
    # each event fired at a cumulative count >= its threshold, <= final
    for r in events.collect():
        assert r["threshold"] <= r["n_at_emit"] <= counts[r["cell"]]
    # no duplicate events
    assert events.count() == len(exp)


def test_event_set_is_batching_invariant(spark, tmp_path):
    srcA, outA, ckA = f"{tmp_path}/a_src", f"{tmp_path}/a_out", f"{tmp_path}/a_ck"
    srcB, outB, ckB = f"{tmp_path}/b_src", f"{tmp_path}/b_out", f"{tmp_path}/b_ck"
    _write_doc_files(spark, srcA, [(0, 500)])                       # one batch
    _write_doc_files(spark, srcB, [(0, 100), (100, 400), (400, 500)])  # three
    a = {(r["cell"], r["threshold"]) for r in _run(spark, srcA, outA, ckA).collect()}
    b = {(r["cell"], r["threshold"]) for r in _run(spark, srcB, outB, ckB).collect()}
    assert a == b and len(a) > 0


def test_state_survives_checkpoint_restart(spark, tmp_path):
    src, out, ckpt = f"{tmp_path}/src", f"{tmp_path}/out", f"{tmp_path}/ckpt"
    _write_doc_files(spark, src, [(0, 250)])
    first = _run(spark, src, out, ckpt)
    n_first = first.count()
    got_first = {(r["cell"], r["threshold"]) for r in first.collect()}

    # backlog grows; restart from the same checkpoint: counts continue from
    # restored state (not from zero), already-fired thresholds stay silent
    _write_doc_files(spark, src, [(250, 500)], start_index=1)
    both = _run(spark, src, out, ckpt)
    got_all = {(r["cell"], r["threshold"]) for r in both.collect()}
    exp, _ = _expected_events(spark, src)
    assert got_all == exp
    assert both.count() == len(exp), "restart must not re-emit fired events"
    assert got_first <= got_all and both.count() > n_first
