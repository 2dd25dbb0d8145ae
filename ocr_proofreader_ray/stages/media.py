"""Multimodal (image/audio/video) column stages.

Large-scale training-data pipelines carry media as **opaque binary columns
with typed metadata** next to the text columns.  This module provides the
Ray-side plumbing for that pattern:

* a deterministic synthesizer that derives a media table from ``documents``
  (no external data — the sandbox has no image/audio libraries or files);
* actor-pool ``map_batches`` stages for decode / thumbnail-resize /
  video-frame-sampling / audio feature extraction.

The actual codecs (PIL / libjpeg / ffmpeg) are **not in this container**, so
``DecodeStage`` decodes only the self-describing ``FAKE`` container written
by the synthesizer and raises ``NotImplementedError`` for real formats
(JPEG/PNG/WAV magic) — the schema, batch sizing, actor signature and output
layout are real and tested; only the codec call is stubbed.

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

# magic prefixes of real formats the stub refuses to decode
_REAL_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"RIFF": "wav/avi",
    b"\x00\x00\x00\x18ftyp": "mp4",
    b"\x00\x00\x00\x20ftyp": "mp4",
}


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


def synthesize_media_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text) -> media(doc_id, kind, payload, meta...).

    Pure per-row function: payload = 20-byte header + UTF-8 text.  Kind
    cycles image/audio/video by doc_id so every batch exercises all three.
    """
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    kinds, payloads, widths, heights, frames_col = [], [], [], [], []
    for doc_id, text in zip(doc_ids, texts):
        kind = doc_id % 3
        w, h, frames = _dims_for(doc_id, kind)
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
    """Parse one payload -> (kind, w, h, frames, body bytes as uint8)."""
    for magic, fmt in _REAL_MAGIC.items():
        if payload[: len(magic)] == magic:
            raise NotImplementedError(
                f"real {fmt} decode needs an image/audio codec library, "
                "which is not available in this environment; only the "
                "deterministic FAKE container is supported"
            )
    if payload[:4] != MAGIC or len(payload) < HEADER_LEN:
        raise ValueError("not a FAKE media container")
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
