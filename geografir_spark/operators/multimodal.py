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
        for pdf in batches:
            if len(pdf) == 0:
                continue
            recs = []
            for _, row in pdf.iterrows():
                payload = bytes(row[binary_col])
                hist = fake_decode(payload)
                recs.append(
                    (
                        row[id_col],
                        len(payload),
                        int(hist @ np.arange(256)),
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
