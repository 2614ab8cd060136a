"""Multimodal plumbing: frame sampling, nearest resize, binary features —
deterministic kernels over opaque binary columns (decode itself is the
documented stub seam)."""

from __future__ import annotations

import numpy as np
import pytest

from geografir_spark.operators.multimodal import (
    decode_media,
    fake_decode,
    frame_offsets,
    resize_nearest_np,
)


def test_frame_offsets_deterministic_and_spanning():
    offs = frame_offsets(10000, 4, 1000)
    assert offs[0] == 0 and offs[-1] == 9000
    assert offs == sorted(offs)
    assert frame_offsets(10000, 4, 1000) == offs
    # payload shorter than a frame → all offsets 0
    assert frame_offsets(500, 3, 1000) == [0, 0, 0]
    assert frame_offsets(500, 1, 100) == [0]


def test_decode_media_is_a_stub():
    with pytest.raises(NotImplementedError, match="codec libraries"):
        decode_media(b"\x00\x01", "video")


def test_resize_nearest_shapes_and_values():
    img = np.arange(16, dtype=np.float64).reshape(4, 4)
    up = resize_nearest_np(img, 8, 8)
    assert up.shape == (8, 8)
    # each source pixel appears as a 2×2 block
    np.testing.assert_array_equal(up[0:2, 0:2], np.full((2, 2), img[0, 0]))
    down = resize_nearest_np(img, 2, 2)
    # pixel-center mapping: centers 0.5,1.5 of out → src rows/cols 1 and 3
    np.testing.assert_array_equal(down, img[[1, 3]][:, [1, 3]])
    # identity resize
    np.testing.assert_array_equal(resize_nearest_np(img, 4, 4), img)
    # channel axis passes through
    cimg = np.stack([img, img * 2])
    out = resize_nearest_np(cimg, 2, 2)
    assert out.shape == (2, 2, 2)
    np.testing.assert_array_equal(out[1], down * 2)
    with pytest.raises(ValueError, match="expected"):
        resize_nearest_np(np.zeros(4), 2, 2)


def test_sample_and_resize_frames_spark(spark):
    from geografir_spark.operators.multimodal import resize_frames, sample_frames
    from geografir_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    payloads = [
        (1, bytes(range(256)) * 8),     # 2048 bytes
        (2, b"abcd" * 100),             # 400 bytes — shorter than 2 frames
    ]
    df = spark.createDataFrame(payloads, "page_id bigint, payload binary")
    frames = sample_frames(df, n_frames=3, frame_size=512)
    rows = {(r["page_id"], r["frame_idx"]): r for r in frames.collect()}
    assert len(rows) == 6
    # offsets match the pure function; features match fake_decode locally
    for pid, payload in payloads:
        offs = frame_offsets(len(payload), 3, 512)
        for i, off in enumerate(offs):
            r = rows[(pid, i)]
            assert r["frame_offset"] == off
            frame = payload[off : off + 512]
            assert r["frame_bytes"] == len(frame)
            np.testing.assert_array_equal(
                np.array(r["features"]), fake_decode(frame)
            )

    resized = resize_frames(frames, out_h=8, out_w=8)
    out = {(r["page_id"], r["frame_idx"]): np.array(r["resized"]) for r in resized.collect()}
    assert all(v.shape == (64,) for v in out.values())
    # spot-check one frame against the local kernel chain
    frame0 = payloads[0][1][0:512]
    exp = resize_nearest_np(fake_decode(frame0).reshape(16, 16), 8, 8).ravel()
    np.testing.assert_array_equal(out[(1, 0)], exp)

    plan = resized._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_frame_samples_query(spark):
    from geografir_spark.queries import QUERIES

    rows = QUERIES["frame_samples"].fn(spark, "/root/testdata/sf0.001").collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    assert all(r["n_frames"] == 500 for r in rows)  # 500 docs, 4 frames each
    assert all(r["total_mass"] > 0 for r in rows)


# -- decode-seam contract (r3 verdict #6) -------------------------------------
# A real codec must satisfy exactly these checks; plug it in as `decoder`
# and this suite pins the plumbing without any other change.

from geografir_spark.operators.multimodal import contract_decoder as _contract_decoder  # noqa: E501


def test_decoded_contract_accepts_conforming_arrays():
    from geografir_spark.operators.multimodal import validate_decoded

    payload = bytes(range(48))
    for mt in ("image", "audio", "video"):
        arr = _contract_decoder(payload, mt)
        assert validate_decoded(arr, mt) is arr
    # metadata shape agreement
    img = _contract_decoder(payload, "image")
    h, w = img.shape[:2]
    validate_decoded(img, "image", {"height": h, "width": w})
    vid = _contract_decoder(payload, "video")
    validate_decoded(vid, "video", {"height": h, "width": w})


def test_decoded_contract_rejects_violations():
    from geografir_spark.operators.multimodal import validate_decoded

    with pytest.raises(ValueError, match="ndim"):
        validate_decoded(np.zeros((4, 4), dtype=np.uint8), "image")
    with pytest.raises(ValueError, match="dtype"):
        validate_decoded(np.zeros((4, 4, 3), dtype=np.float64), "image")
    with pytest.raises(ValueError, match="channel"):
        validate_decoded(np.zeros((4, 4, 2), dtype=np.uint8), "image")
    with pytest.raises(ValueError, match="C-contiguous"):
        validate_decoded(
            np.zeros((4, 4, 3), dtype=np.uint8)[:, ::2], "image"
        )
    with pytest.raises(ValueError, match=r"\[-1, 1\]"):
        validate_decoded(
            np.full((8, 1), 2.0, dtype=np.float32), "audio"
        )
    with pytest.raises(ValueError, match="metadata"):
        validate_decoded(
            np.zeros((4, 4, 3), dtype=np.uint8), "image",
            {"height": 8, "width": 8},
        )
    with pytest.raises(ValueError, match="unknown media_type"):
        validate_decoded(np.zeros((4, 4, 3), dtype=np.uint8), "text")


def test_decoded_stats_kernel_runs_decoder_distributed(spark):
    """The pluggable decode stage end-to-end on Spark: schema, Arrow batch
    shape, per-type array stats — swap `_contract_decoder` for a real codec
    and nothing else changes."""
    from geografir_spark.operators.multimodal import decoded_stats

    rows = [
        (1, "image", bytes(range(27))),
        (2, "audio", bytes([0, 64, 128, 192, 255])),
        (3, "video", bytes(range(12))),
    ]
    df = spark.createDataFrame(
        rows, "page_id: long, media_type: string, payload: binary"
    )
    got = {r["page_id"]: r for r in decoded_stats(df, _contract_decoder).collect()}
    assert got[1]["shape"] == [3, 3, 3] and got[1]["dtype"] == "uint8"
    assert got[2]["shape"] == [5, 1] and got[2]["dtype"] == "float32"
    assert got[3]["shape"][0] == 2 and got[3]["dtype"] == "uint8"
    # value_sum is exact on these deterministic fakes
    assert got[1]["value_sum"] == float(sum(range(27)))
    assert got[2]["n_elems"] == 5
    # a contract-violating decoder fails loudly inside the kernel
    def bad(payload, mt):
        return np.zeros((2, 2), dtype=np.uint8)  # wrong ndim for any type

    with pytest.raises(Exception) as ei:
        decoded_stats(df, bad).collect()
    # Spark truncates the nested message; the validator frame survives
    assert "validate_decoded" in str(ei.value)
