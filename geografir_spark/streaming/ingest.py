"""Structured Streaming ingest: continuous tiling of arriving page batches.

The reference has no streaming of any kind (absent: no matching code under
``/root/reference/``), and the north rule's resumability requirement is met
by batch + lineage (``plans/lineage.py``). This module adds the *continuous*
ingest path a production crawl pipeline needs on top: new parquet files
landing in a directory (the sandbox stand-in for an Iceberg/Kafka feed of
WARC batches) are tiled incrementally with exactly-once file tracking via
the streaming checkpoint — the same geocode→cell kernels as batch, so
streamed results are row-identical to a batch run over the same files.

Scale notes
-----------
- The per-microbatch plan is the batch flagship plan (regexp geocode + cell
  bit math + hash agg) — whole-stage codegen, no Python on the hot path.
- Watermarking bounds the window-agg state store: late pages beyond the
  watermark are dropped instead of growing state without bound (at 10^12
  rows, unbounded state is the first thing that dies).
- ``dropDuplicatesWithinWatermark`` gives streaming url-dedup with bounded
  state — the streaming sibling of the batch as-of pattern
  (``queries.py:q_asof_latest_event``).
- ``Trigger.AvailableNow`` drains the backlog in rate-limited microbatches
  and stops — the deploy mode for catch-up reprocessing; a live deployment
  drops the trigger and runs the identical code continuously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geografir_spark.geo import cells, geocode
from geografir_spark.sources.pages import PAGES_COLS_SQL

# warc_ts synthesis: deterministic timestamp per page (2024-01-01 base +
# one minute per page_id). The sandbox documents table has no timestamp;
# production pages carry a real warc_ts and this projection is dropped.
_WARC_TS_EXPR = "timestamp_seconds(1704067200 + page_id * 60)"


def pages_stream(
    spark: SparkSession,
    src_dir: str,
    *,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming pages relation from a directory of documents parquet files.

    Schema is inferred from the existing files (a production table gets it
    from the catalog). ``maxFilesPerTrigger`` paces microbatches.
    """
    schema = spark.read.parquet(src_dir).schema
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    return docs.selectExpr(
        *[f"{expr} AS {name}" for name, expr in PAGES_COLS_SQL.items()],
    ).selectExpr("*", f"{_WARC_TS_EXPR} AS warc_ts")


def stream_cell_counts(
    pages: DataFrame,
    *,
    res: int,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed per-cell page counts over a streaming pages
    relation: geocode → cell_encode → window(warc_ts) × cell hash agg.

    Output columns: (win_start, win_end, cell, n_pages). State per key is
    one count; watermark bounds the number of live windows.
    """
    p = geocode.with_geocode(pages, "text", "page_id")
    p = cells.with_cell(p, "lon", "lat", res)
    return (
        p.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), F.col("cell"))
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "cell",
            "n_pages",
        )
    )


def stream_dedup_latest(
    pages: DataFrame,
    *,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming url-dedup with bounded state: first occurrence of each url
    within the watermark horizon passes, replays are dropped."""
    return pages.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )


def run_available_now(
    sdf: DataFrame,
    *,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Drain the source backlog into parquet and stop (exactly-once per file
    via the checkpoint's file log; re-running after new files arrive
    processes only the new files — streaming's resume semantics)."""
    q = (
        sdf.writeStream.format("parquet")
        .outputMode(output_mode)
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_pip_zone_counts(
    pages: DataFrame,
    zones: DataFrame,
    *,
    res: int,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming point-in-polygon spatial join + windowed per-zone counts.

    The batch PIP operator (operators/pip_join.py) is stateless end-to-end
    (cover explode, broadcast stream-static equi-join, Arrow-batched exact
    refine), so the SAME operator runs unmodified on a streaming pages
    relation; only the windowed aggregation carries state, bounded by the
    watermark. Output: (win_start, win_end, zone_id, n_pages)."""
    from geografir_spark.operators.pip_join import spatial_join_pip

    p = geocode.with_geocode(pages, "text", "page_id")
    pts = cells.with_cell(p, "lon", "lat", res)
    joined = spatial_join_pip(pts, zones, res=res)
    return (
        joined.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), F.col("zone_id"))
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "zone_id",
            "n_pages",
        )
    )


def stream_user_sessions(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming gap-based sessionization via the native session window:
    state merges events separated by less than ``gap``; the watermark
    closes a session once it passes the session's end (last event + gap)
    and bounds live state to the horizon.

    The streaming twin of the batch lag → flag → running-sum chain
    (queries.user_sessions): a closed session's (user, n_events,
    end − start − gap) equals the batch session's (user, n_events,
    duration) — asserted in tests/test_streaming.py. Catalyst's session
    window is the merge-on-update stateful operator a hand-rolled
    applyInPandasWithState sessionizer would reimplement; at scale state
    is partitioned by user and windows merge without a shuffle beyond the
    groupBy's own."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"), F.col(user_col)
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("win.start").alias("sess_start"),
            F.col("win.end").alias("sess_end"),
            "n_events",
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_ts: str = "ts",
    right_ts: str = "fts",
    upper: str = "10 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: pairs where
    ``right_ts ∈ (left_ts, left_ts + upper]`` on the same key — the
    streaming twin of operators.interval_join (the error→follow-up shape).

    Both sides carry event-time watermarks and the join predicate bounds
    right_ts to a window AFTER left_ts, so Spark's symmetric hash join can
    evict state once the watermark passes a row's last possible match:
    state per side is O(rate × (watermark + upper)), not unbounded. Inner
    join: every match emits exactly once as the later side arrives — with
    an availableNow drain of complete inputs the output equals the batch
    join exactly (asserted in tests)."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[left_key] == r[right_key])
        & (r[right_ts] > l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, "inner")


def run_tile_pyramid_stream(
    spark: SparkSession,
    src_dir: str,
    *,
    out_dir: str,
    checkpoint_dir: str,
    res_child: int,
) -> None:
    """Incremental COG-overview maintenance: tile batches arrive as
    parquet files and each micro-batch's parent-level overview rows are
    appended — the streaming form of ``raster/pyramid.pyramid_stats``.

    Ingestion contract (asserted by the stream==batch test): a parent's
    four children arrive in the SAME file — spatial writers emit
    parent-block-aligned batches for exactly this reason — so a per-batch
    pyramid is exact and no cross-batch parent state is needed. Writers
    that can't align batches compose the same operator behind a
    parent-cell repartition in a foreachBatch compaction instead.

    Exactly-once per file via the checkpoint file log (re-running after
    new tiles arrive processes only the new files).
    """
    from geografir_spark.raster.pyramid import pyramid_stats

    tiles = (
        spark.readStream.schema(
            "cell LONG, xi LONG, yi LONG, pixels ARRAY<DOUBLE>"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def emit(batch_df: DataFrame, _batch_id: int) -> None:
        pyramid_stats(batch_df, res_child=res_child).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        tiles.writeStream.foreachBatch(emit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def media_stream(
    spark: SparkSession,
    src_dir: str,
    *,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming media relation from a directory of parquet batches of
    (id, media_type, payload binary) rows — the arrival feed of a
    multimodal crawl (Spark's ``binaryFile`` source is batch-only, so the
    raw objects are framed into parquet batches upstream, the same
    Kafka/Iceberg stand-in as ``pages_stream``)."""
    schema = spark.read.parquet(src_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def stream_media_stats(
    media: DataFrame,
    decoder=None,
    *,
    id_col: str = "page_id",
) -> DataFrame:
    """Streaming decode: the UNCHANGED ``decoded_stats`` Arrow kernel
    (operators/multimodal.py) applied to a streaming media relation —
    mapInPandas is stateless, so each microbatch decodes with the real
    codecs (WAV/netpbm/BMP, operators/media_codecs.py) under the batch
    plan, and the streaming checkpoint's file log gives exactly-once
    per-file decode across restarts. Stream output is row-identical to a
    batch ``decoded_stats`` over the same files (pinned in
    tests/test_streaming.py)."""
    from geografir_spark.operators.multimodal import decode_media, decoded_stats

    return decoded_stats(media, decoder or decode_media, id_col=id_col)
