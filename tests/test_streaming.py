"""Structured Streaming ingest: streamed tiling == batch tiling on the same
files; checkpoint resume processes only newly-arrived files; watermarked
streaming url-dedup drops replays.

The reference has no streaming (absent under /root/reference/); these tests
pin the engine's continuous-ingest path (geografir_spark/streaming/).
"""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
RES = 6
WINDOW = "1 hour"
WATERMARK = "2 hours"


def _write_doc_files(spark, dst, ranges, start_index=0):
    """Write documents split into one parquet file per doc_id range, with
    strictly increasing mtimes so the file source processes them in order
    (warc_ts is monotone in doc_id — no late data across batches)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    os.makedirs(dst, exist_ok=True)
    for i, (lo, hi) in enumerate(ranges, start=start_index):
        part = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        tmp = f"{dst}/__tmp_{i}"
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.move(f"{tmp}/{src}", f"{dst}/batch_{i}.parquet")
        shutil.rmtree(tmp)
        mtime = time.time() - 100 + 10 * i
        os.utime(f"{dst}/batch_{i}.parquet", (mtime, mtime))


def _batch_expected(spark, src_dir):
    """The batch-computed windowed cell counts, restricted to windows the
    stream's final watermark (max warc_ts - 2h) has closed."""
    from geografir_spark.geo import cells, geocode
    from geografir_spark.sources.pages import PAGES_COLS_SQL
    from geografir_spark.streaming.ingest import _WARC_TS_EXPR

    pages = (
        spark.read.parquet(src_dir)
        .selectExpr(*[f"{e} AS {n}" for n, e in PAGES_COLS_SQL.items()])
        .selectExpr("*", f"{_WARC_TS_EXPR} AS warc_ts")
    )
    p = geocode.with_geocode(pages, "text", "page_id")
    p = cells.with_cell(p, "lon", "lat", RES)
    agg = (
        p.groupBy(F.window("warc_ts", WINDOW).alias("win"), "cell")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "cell",
            "n_pages",
        )
    )
    wm = p.agg(
        (F.max("warc_ts") - F.expr("INTERVAL 2 HOURS")).alias("wm")
    ).collect()[0]["wm"]
    return agg.filter(F.col("win_end") <= F.lit(wm))


def _rows(df):
    return sorted(
        (r["win_start"], r["win_end"], r["cell"], r["n_pages"])
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stream"))
    src, out, ckpt = f"{root}/src", f"{root}/out", f"{root}/ckpt"
    _write_doc_files(spark, src, [(0, 200), (200, 400)])
    return src, out, ckpt


def test_stream_matches_batch_then_resumes(spark, stream_dirs):
    from geografir_spark.streaming import (
        pages_stream,
        run_available_now,
        stream_cell_counts,
    )

    src, out, ckpt = stream_dirs

    sdf = stream_cell_counts(
        pages_stream(spark, src), res=RES, window=WINDOW, watermark=WATERMARK
    )
    run_available_now(sdf, out_dir=out, checkpoint_dir=ckpt)
    got = _rows(spark.read.parquet(out))
    assert got == _rows(_batch_expected(spark, src))
    assert len(got) > 0

    # a new file arrives; re-running with the same checkpoint must process
    # ONLY the new file (exactly-once) yet emit the correct newly-closed
    # windows — including windows whose counts straddle old and new files.
    _write_doc_files(spark, src, [(400, 500)], start_index=2)
    sdf2 = stream_cell_counts(
        pages_stream(spark, src), res=RES, window=WINDOW, watermark=WATERMARK
    )
    run_available_now(sdf2, out_dir=out, checkpoint_dir=ckpt)
    got2 = _rows(spark.read.parquet(out))
    assert got2 == _rows(_batch_expected(spark, src))
    assert len(got2) > len(got)


def test_stream_dedup_drops_replays(spark, tmp_path):
    from geografir_spark.streaming import (
        pages_stream,
        run_available_now,
        stream_dedup_latest,
    )

    src, out, ckpt = f"{tmp_path}/src", f"{tmp_path}/out", f"{tmp_path}/ckpt"
    # batch_0 = docs [0, 100); batch_1 replays the same rows
    _write_doc_files(spark, src, [(0, 100), (0, 100)])
    sdf = stream_dedup_latest(pages_stream(spark, src), watermark=WATERMARK)
    run_available_now(sdf, out_dir=out, checkpoint_dir=ckpt)
    result = spark.read.parquet(out)
    assert result.count() == 100
    assert result.select("url").distinct().count() == 100


def test_stream_pip_join_matches_batch(spark, tmp_path):
    """The stateless batch PIP operator runs unmodified on a stream:
    windowed per-zone counts from the stream equal the batch join's counts
    restricted to watermark-closed windows."""
    from geografir_spark.geo import cells, geocode
    from geografir_spark.operators.pip_join import spatial_join_pip
    from geografir_spark.queries import PIP_RES, _zones_df
    from geografir_spark.sources.pages import PAGES_COLS_SQL
    from geografir_spark.streaming.ingest import (
        _WARC_TS_EXPR,
        pages_stream,
        run_available_now,
        stream_pip_zone_counts,
    )

    src, out, ckpt = f"{tmp_path}/src", f"{tmp_path}/out", f"{tmp_path}/ckpt"
    _write_doc_files(spark, src, [(0, 250), (250, 500)])
    zones = _zones_df(spark, SF_DIR).drop("minx", "miny", "maxx", "maxy")

    sdf = stream_pip_zone_counts(
        pages_stream(spark, src), zones, res=PIP_RES,
        window=WINDOW, watermark=WATERMARK,
    )
    run_available_now(sdf, out_dir=out, checkpoint_dir=ckpt)
    got = sorted(
        (r["win_start"], r["win_end"], r["zone_id"], r["n_pages"])
        for r in spark.read.parquet(out).collect()
    )

    pages = (
        spark.read.parquet(src)
        .selectExpr(*[f"{e} AS {n}" for n, e in PAGES_COLS_SQL.items()])
        .selectExpr("*", f"{_WARC_TS_EXPR} AS warc_ts")
    )
    p = geocode.with_geocode(pages, "text", "page_id")
    pts = cells.with_cell(p, "lon", "lat", PIP_RES)
    joined = spatial_join_pip(pts, zones, res=PIP_RES)
    wm = p.agg(
        (F.max("warc_ts") - F.expr("INTERVAL 2 HOURS")).alias("wm")
    ).collect()[0]["wm"]
    exp = sorted(
        (r["win_start"], r["win_end"], r["zone_id"], r["n_pages"])
        for r in joined.groupBy(
            F.window("warc_ts", WINDOW).alias("win"), "zone_id"
        )
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "zone_id", "n_pages",
        )
        .filter(F.col("win_end") <= F.lit(wm))
        .collect()
    )
    assert got == exp and len(got) > 0


def _write_event_files(spark, dst, n_files=3):
    """Split events into time-range parquet files with increasing mtimes so
    the file source feeds them in time order (watermark then only ever
    advances)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").selectExpr(
        "*", "unix_micros(CAST(ts AS TIMESTAMP)) AS __us"
    )
    fracs = ", ".join(str((i + 1) / n_files) for i in range(n_files - 1))
    bounds = [r[0] for r in ev.selectExpr(
        f"percentile(__us, array({fracs})) AS p"
    ).selectExpr("explode(p)").collect()]
    os.makedirs(dst, exist_ok=True)
    lo = None
    for i in range(n_files):
        hi = bounds[i] if i < n_files - 1 else None
        part = ev
        if lo is not None:
            part = part.filter(F.expr(f"__us >= {lo}"))
        if hi is not None:
            part = part.filter(F.expr(f"__us < {hi}"))
        part = part.drop("__us")
        tmp = f"{dst}/__tmp_{i}"
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.move(f"{tmp}/{src}", f"{dst}/batch_{i}.parquet")
        shutil.rmtree(tmp)
        mtime = time.time() - 100 + 10 * i
        os.utime(f"{dst}/batch_{i}.parquet", (mtime, mtime))
        lo = hi


def test_stream_sessions_match_batch_sessionization(spark, tmp_path):
    """Native session-window streaming == the batch lag→flag→running-sum
    sessionization (queries.user_sessions) on every session the final
    watermark has closed: same (user, n_events, duration) multiset."""
    from geografir_spark.queries import QUERIES
    from geografir_spark.streaming import (
        pages_stream, run_available_now, stream_user_sessions,
    )

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write_event_files(spark, src)

    schema = spark.read.parquet(src).schema
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        # watermarks require TIMESTAMP; the fixture is TIMESTAMP_NTZ and the
        # session TZ is pinned UTC, so the cast is value-preserving
        .withColumn("ts", F.expr("CAST(ts AS TIMESTAMP)"))
    )
    sdf = stream_user_sessions(ev, gap="30 minutes", watermark="2 hours")
    run_available_now(sdf, out_dir=out, checkpoint_dir=ckpt)
    got_df = spark.read.parquet(out)

    def _td_us(td):
        # exact integer microseconds (total_seconds() is a float and
        # truncates at ~2^31 us)
        return (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds

    got = sorted(
        (r["user_id"],
         r["n_events"],
         _td_us(r["sess_end"] - r["sess_start"]) - 30 * 60 * 1_000_000)
        for r in got_df.collect()
    )

    batch = QUERIES["user_sessions"].fn(spark, SF_DIR)
    # sessions are identical where both closed; every streamed session must
    # appear in the batch multiset, and the stream must have closed >90% of
    # batch sessions (only the final 2h watermark horizon stays open)
    batch_all = sorted(
        (r["user_id"], r["n_events"], r["duration_us"]) for r in batch.collect()
    )
    assert len(got) > 0
    from collections import Counter
    cg, cb = Counter(got), Counter(batch_all)
    assert all(cg[k] <= cb[k] for k in cg), "streamed session not in batch set"
    assert sum(cg.values()) >= 0.9 * sum(cb.values())


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join == the batch error_followups
    pair set on fully drained inputs: every (error, follow-up within 10
    min) pair emits exactly once."""
    from geografir_spark.streaming import run_available_now, stream_interval_join

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write_event_files(spark, src)

    schema = spark.read.parquet(src).schema

    def _stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withColumn("ts", F.expr("CAST(ts AS TIMESTAMP)"))
        )

    errors = _stream().filter("event_type = 'error'").selectExpr(
        "user_id", "ts", "event_id"
    )
    others = _stream().filter("event_type <> 'error'").selectExpr(
        "user_id AS fuser", "ts AS fts", "event_id AS fid"
    )
    j = stream_interval_join(
        errors, others, left_key="user_id", right_key="fuser",
        left_ts="ts", right_ts="fts", upper="10 minutes",
    ).select("event_id", "fid")
    run_available_now(j, out_dir=out, checkpoint_dir=ckpt)
    got = sorted(
        (r["event_id"], r["fid"]) for r in spark.read.parquet(out).collect()
    )

    ev = spark.read.parquet(src)
    be = ev.filter("event_type = 'error'").selectExpr("user_id", "ts", "event_id")
    bo = ev.filter("event_type <> 'error'").selectExpr(
        "user_id AS fuser", "ts AS fts", "event_id AS fid"
    )
    exp = sorted(
        (r["event_id"], r["fid"])
        for r in be.join(
            bo,
            (be["user_id"] == bo["fuser"])
            & (bo["fts"] > be["ts"])
            & (bo["fts"] <= be["ts"] + F.expr("INTERVAL 10 minutes")),
            "inner",
        ).select("event_id", "fid").collect()
    )
    assert len(exp) > 0
    assert got == exp


def test_stream_tile_pyramid_matches_batch_and_resumes(spark, tmp_path):
    """Incremental overview maintenance: per-batch pyramid appends over
    parent-block-aligned tile files equal the batch pyramid over all
    tiles; a later file is processed exactly once on resume."""
    from geografir_spark.raster.pyramid import pyramid_stats
    from geografir_spark.streaming import run_tile_pyramid_stream

    src, out, ckpt = f"{tmp_path}/tsrc", f"{tmp_path}/tout", f"{tmp_path}/tckpt"

    def tile_rows(parents):
        rows = []
        for pxi, pyi in parents:
            for xi in (2 * pxi, 2 * pxi + 1):
                for yi in (2 * pyi, 2 * pyi + 1):
                    px = [float((xi * 31 + yi * 17 + i) % 97) for i in range(64)]
                    rows.append((xi * 100 + yi, xi, yi, px))
        return rows

    schema = "cell LONG, xi LONG, yi LONG, pixels ARRAY<DOUBLE>"
    # two parent-aligned files
    spark.createDataFrame(tile_rows([(0, 0), (1, 0)]), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(tile_rows([(0, 1)]), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    run_tile_pyramid_stream(
        spark, src, out_dir=out, checkpoint_dir=ckpt, res_child=4
    )
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    want = {
        tuple(r)
        for r in pyramid_stats(
            spark.createDataFrame(
                tile_rows([(0, 0), (1, 0), (0, 1)]), schema
            ),
            res_child=4,
        ).collect()
    }
    assert got == want and len(got) == 3

    # resume: one new parent block arrives; only it is processed
    spark.createDataFrame(tile_rows([(1, 1)]), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_tile_pyramid_stream(
        spark, src, out_dir=out, checkpoint_dir=ckpt, res_child=4
    )
    got2 = spark.read.parquet(out)
    assert got2.count() == 4                      # no duplicates from replay
    assert got2.select("cell").distinct().count() == 4


def test_stream_media_decode_matches_batch_then_resumes(spark, tmp_path):
    """Streaming multimodal ingest (r5): parquet batches of binary media
    payloads decoded by the real pure-stdlib codecs inside the unchanged
    decoded_stats Arrow kernel. The drained stream equals a batch run over
    the same files, and a resume after a new batch lands processes ONLY
    the new file (exactly-once via the checkpoint file log)."""
    import numpy as np
    import pandas as pd

    from geografir_spark.operators.media_codecs import (
        encode_netpbm, encode_wav,
    )
    from geografir_spark.operators.multimodal import decode_media, decoded_stats
    from geografir_spark.streaming.ingest import (
        media_stream, run_available_now, stream_media_stats,
    )

    src = tmp_path / "media_in"
    out = tmp_path / "media_out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def batch_file(path, rows):
        pd.DataFrame(
            rows, columns=["page_id", "media_type", "payload"]
        ).to_parquet(path)

    wav = lambda seed: encode_wav(
        (np.arange(100) * seed % 199 - 99).astype(np.int16), 8000)
    img = lambda seed: encode_netpbm(
        (np.arange(27) * seed % 251).astype(np.uint8).reshape(3, 3, 3))
    batch_file(src / "b0.parquet",
               [(1, "audio", wav(3)), (2, "image", img(5))])
    batch_file(src / "b1.parquet",
               [(3, "audio", wav(7)), (4, "image", img(11))])

    run_available_now(
        stream_media_stats(media_stream(spark, str(src))),
        out_dir=str(out), checkpoint_dir=str(ckpt),
    )
    got = spark.read.parquet(str(out))
    batch = decoded_stats(spark.read.parquet(str(src)), decode_media)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect()))

    # a new batch arrives; the resumed drain decodes ONLY the new rows
    batch_file(src / "b2.parquet", [(5, "image", img(13))])
    run_available_now(
        stream_media_stats(media_stream(spark, str(src))),
        out_dir=str(out), checkpoint_dir=str(ckpt),
    )
    got2 = spark.read.parquet(str(out))
    assert got2.count() == 5  # 4 old (not re-decoded/duplicated) + 1 new
    assert sorted(r["page_id"] for r in got2.collect()) == [1, 2, 3, 4, 5]
