"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with metadata structs; the
Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. The actual media decode is STUBBED — the
codec libraries are not in this environment — behind
``decode_media`` (NotImplementedError) and ``fake_decode`` (deterministic
byte-level features), exactly the seam where a real deployment plugs
Pillow/ffmpeg into the same mapInPandas kernel.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image/audio/video
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def decode_media(payload: bytes, media_type: str) -> np.ndarray:
    """Real decode seam — image/audio libs are absent in this environment.

    A deployment replaces this with PIL.Image.open / soundfile / pyav while
    keeping every Spark-side contract (binary in, ndarray out, called only
    from Arrow-batched kernels) unchanged."""
    raise NotImplementedError(
        f"media decode for {media_type!r} requires codec libraries not "
        "present in this environment; use fake_decode for plumbing tests"
    )


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decode: the payload's byte histogram (256
    bins) — shaped like a feature vector so downstream plumbing (schema,
    batching, aggregation) is exercised for real."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    return np.bincount(arr, minlength=256).astype(np.float64)


def extract_binary_features(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "page_id",
) -> DataFrame:
    """(id, n_bytes, byte_sum, n_distinct_bytes, features array<double>) via
    one Arrow-batched kernel over the binary column."""
    schema = (
        f"{id_col} bigint, n_bytes bigint, byte_sum bigint,"
        " n_distinct_bytes int, features array<double>"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = np.arange(256)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            recs = []
            for rid, raw in zip(pdf[id_col], pdf[binary_col]):
                payload = bytes(raw)
                hist = fake_decode(payload)
                recs.append(
                    (
                        rid,
                        len(payload),
                        int(hist @ weights),
                        int((hist > 0).sum()),
                        hist.tolist(),
                    )
                )
            yield pd.DataFrame.from_records(
                recs,
                columns=[id_col, "n_bytes", "byte_sum", "n_distinct_bytes", "features"],
            )

    return df.mapInPandas(kernel, schema=schema)


def decode_text_from_html(
    df: DataFrame, html_col: str = "html", id_col: str = "page_id", out: str = "decoded_text"
) -> DataFrame:
    """The html→text extraction seam (input_hint: text is byte-identical per
    url). The sandbox html shape is b'<html>' + text + b'</html>'
    (FIXTURES.md §1); real deployments swap in a proper extractor behind the
    same kernel signature."""
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out, T.StringType())]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            decoded = []
            for v in pdf[html_col]:
                b = bytes(v)
                if b.startswith(b"<html>") and b.endswith(b"</html>"):
                    b = b[6:-7]
                decoded.append(b.decode("utf-8"))
            pdf = pdf.copy()
            pdf[out] = decoded
            yield pdf

    return df.mapInPandas(kernel, schema=schema)


def frame_offsets(n_bytes: int, n_frames: int, frame_size: int) -> "list[int]":
    """Deterministic evenly-spaced frame offsets over a payload: frame i of
    n starts at floor(i * (n_bytes - frame_size) / max(n-1, 1)), clamped to
    0 — the byte-level analog of sampling n frames from a video's timeline
    (first and last frames always included)."""
    span = max(n_bytes - frame_size, 0)
    if n_frames == 1:
        return [0]
    return [span * i // (n_frames - 1) for i in range(n_frames)]


def sample_frames(
    df: DataFrame,
    *,
    n_frames: int = 4,
    frame_size: int = 1024,
    binary_col: str = "payload",
    id_col: str = "page_id",
) -> DataFrame:
    """Explode each media payload to ``n_frames`` frame rows:
    (id, frame_idx, frame_offset, frame_bytes, features array<double>) — the
    video frame-sampling plumbing. Frames are fixed-size byte windows here
    (decode is stubbed); a deployment replaces the window slice with a
    demuxer seek inside the SAME kernel, preserving schema/batch shape."""
    schema = (
        f"{id_col} bigint, frame_idx int, frame_offset bigint,"
        " frame_bytes int, features array<double>"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            recs = []
            for rid, raw in zip(pdf[id_col], pdf[binary_col]):
                payload = bytes(raw)
                for i, off in enumerate(frame_offsets(len(payload), n_frames, frame_size)):
                    frame = payload[off : off + frame_size]
                    recs.append((rid, i, off, len(frame), fake_decode(frame).tolist()))
            yield pd.DataFrame.from_records(
                recs,
                columns=[id_col, "frame_idx", "frame_offset", "frame_bytes", "features"],
            )

    return df.mapInPandas(kernel, schema=schema)


def resize_nearest_np(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w) or (c, h, w) array — the real
    image-resize kernel (pixel-center index mapping, the same rule as the
    raster conform resampler). Works today on fake_decode feature maps and
    unchanged on real decoded frames once a codec is plugged in."""
    if img.ndim == 2:
        img = img[None, :, :]
        squeeze = True
    elif img.ndim == 3:
        squeeze = False
    else:
        raise ValueError(f"expected (h, w) or (c, h, w), got {img.ndim}-D")
    _, h, w = img.shape
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    out = img[:, ys[:, None], xs[None, :]]
    return out[0] if squeeze else out


def resize_frames(
    df: DataFrame,
    *,
    out_h: int,
    out_w: int,
    features_col: str = "features",
    id_cols: "tuple[str, ...]" = ("page_id", "frame_idx"),
) -> DataFrame:
    """Resize each frame's feature map (256-vector viewed as 16×16) to
    (out_h, out_w) with the nearest kernel — the distributed resize stage:
    id columns pass through, one Arrow batch per partition."""
    ids_schema = ", ".join(f"{c} bigint" for c in id_cols)
    schema = f"{ids_schema}, resized array<double>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            recs = []
            for vals in zip(*(pdf[c] for c in id_cols), pdf[features_col]):
                *ids, feat = vals
                v = np.asarray(feat, dtype=np.float64)
                side = int(np.sqrt(len(v)))
                resized = resize_nearest_np(v.reshape(side, side), out_h, out_w)
                recs.append(tuple(ids) + (resized.ravel().tolist(),))
            yield pd.DataFrame.from_records(recs, columns=[*id_cols, "resized"])

    return df.mapInPandas(kernel, schema=schema)
