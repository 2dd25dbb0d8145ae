"""Multimodal binary-column plumbing (SURVEY.md §2 extension; stubbed codec).

The codec is a deterministic FAKE container (no image/audio libs in this
environment) but the Ray-side plumbing — schema, actor-pool stages, batch
sizing, output layout — is real and exercised here.
"""

import struct

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from ocr_proofreader_ray.stages.media import (
    HEADER_LEN,
    MAGIC,
    DecodeStage,
    FrameSampleStage,
    ThumbnailStage,
    _dims_for,
    synthesize_media_batch,
)

SF = "/root/testdata/sf0.001"


def _docs_batch(n=30):
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"doc {i} " + "x" * (i * 7 % 50) for i in range(n)]),
    })


def test_synthesize_schema_and_header():
    media = synthesize_media_batch(_docs_batch())
    assert media.schema.names == [
        "doc_id", "kind", "payload", "media_w", "media_h", "n_frames"]
    assert media.schema.field("payload").type == pa.binary()
    assert media.schema.field("media_w").type == pa.uint32()
    for row in media.to_pylist():
        p = row["payload"]
        assert p[:4] == MAGIC
        kind, w, h, frames = struct.unpack_from("<B3xIII", p, 4)
        assert (w, h, frames) == _dims_for(row["doc_id"], kind)
        assert (row["media_w"], row["media_h"], row["n_frames"]) == (w, h, frames)
        # body is the document text
        text = _docs_batch().column("text")[row["doc_id"]].as_py()
        assert p[HEADER_LEN:] == text.encode()


def test_decode_stage_roundtrip_and_state():
    media = synthesize_media_batch(_docs_batch())
    stage = DecodeStage(strict=True)
    out = stage(media)
    assert "payload" not in out.schema.names  # payload dropped for memory
    assert out.num_rows == media.num_rows
    assert stage.decoded == media.num_rows  # actor state accumulates
    for row in out.to_pylist():
        assert row["dec_w"] == row["media_w"]
        assert row["dec_h"] == row["media_h"]
        assert row["body_bytes"] > 0


def test_decode_rejects_real_formats():
    jpeg = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "payload": pa.array([b"\xff\xd8\xff\xe0" + b"\x00" * 64], pa.binary()),
    })
    with pytest.raises(NotImplementedError, match="jpeg"):
        DecodeStage(strict=True)(jpeg)
    # lenient mode flags instead of failing the batch
    out = DecodeStage(strict=False)(jpeg)
    assert out.column("dec_w").to_pylist() == [0]


def test_thumbnail_fixed_size_and_deterministic():
    media = synthesize_media_batch(_docs_batch())
    out1 = ThumbnailStage(side=8)(media)
    out2 = ThumbnailStage(side=8)(media)
    assert all(len(t) == 64 for t in out1.column("thumbnail").to_pylist())
    assert out1.equals(out2)


def test_frame_sampling_counts():
    media = synthesize_media_batch(_docs_batch(60))
    videos = media.filter(pc.equal(media.column("kind"), "video"))
    out = FrameSampleStage(stride=4)(videos)
    by_doc: dict[int, int] = {}
    for row in out.to_pylist():
        by_doc[row["doc_id"]] = by_doc.get(row["doc_id"], 0) + 1
    for row in videos.to_pylist():
        expect = -(-row["n_frames"] // 4)  # ceil
        assert by_doc[row["doc_id"]] == expect


def test_media_queries_via_ray(ray_session):
    """End-to-end through the registered query surface (actor pools)."""
    from ocr_proofreader_ray.pipelines.registry import all_queries

    q = all_queries()
    meta = q["q_media_metadata"](SF).to_pandas()
    assert sorted(meta["kind"]) == ["audio", "image", "video"]
    assert (meta["total_bytes"] > meta["n_items"] * HEADER_LEN).all()

    feats = q["q_image_features"](SF).to_pandas()
    assert len(feats) > 0 and (feats["dec_w"] > 0).all()

    frames = q["q_video_frames"](SF).to_pandas()
    assert len(frames) > len(feats)  # multiple frames per video
    assert set(frames["kind"]) == {"video"}


def test_fused_image_stage_matches_split_stages():
    """ImageFeatureStage (one decode) must equal DecodeStage + ThumbnailStage
    run separately on the same payloads (VERDICT r01 #6 fusion)."""
    import pyarrow as pa

    from ocr_proofreader_ray.stages.media import (
        DecodeStage,
        ImageFeatureStage,
        ThumbnailStage,
        synthesize_media_batch,
    )

    docs = pa.table({
        "doc_id": pa.array([0, 3, 6, 9], pa.int64()),  # doc_id%3==0 -> image
        "text": pa.array(["alpha beta", "", "gamma", "delta epsilon zeta"]),
    })
    media = synthesize_media_batch(docs)
    fused = ImageFeatureStage(8, True)(media)
    dec = DecodeStage(True)(media)
    thumb = ThumbnailStage(8)(media)
    for col in ("dec_w", "dec_h", "dec_frames", "body_bytes",
                "mean_val", "std_val"):
        assert fused.column(col).equals(dec.column(col)), col
    assert fused.column("thumbnail").equals(thumb.column("thumbnail"))


def test_fused_stage_matches_split_on_decode_failure():
    """Equivalence must hold on the non-strict error path too (code-review
    r02 finding #5): undecodable payloads get the same substitute body."""
    import pyarrow as pa

    from ocr_proofreader_ray.stages.media import DecodeStage, ImageFeatureStage

    media = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "payload": pa.array([b"%PDF-not-an-image"], pa.binary()),
    })
    fused = ImageFeatureStage(8, False)(media)
    dec = DecodeStage(False)(media)
    for col in ("dec_w", "dec_h", "dec_frames", "body_bytes",
                "mean_val", "std_val"):
        assert fused.column(col).equals(dec.column(col)), col


def test_audio_feature_stage_windows_and_determinism():
    from ocr_proofreader_ray.stages.media import AudioFeatureStage, _decode_one

    media = synthesize_media_batch(_docs_batch(30))
    audio = media.filter(pc.equal(media.column("kind"), "audio"))
    stage = AudioFeatureStage(win=16)
    out = stage(audio)
    assert out.num_rows == audio.num_rows
    assert out.schema.names == ["doc_id", "sample_rate", "duration_ms",
                                "n_windows", "rms_milli", "zcr_milli"]
    for row, payload in zip(out.to_pylist(),
                            audio.column("payload").to_pylist()):
        _k, rate, n_samples, _f, body = _decode_one(payload)
        assert row["sample_rate"] == rate
        assert row["duration_ms"] == n_samples * 1000 // rate
        assert row["n_windows"] == max(1, len(body) // 16)
        assert row["rms_milli"] >= 0
    # deterministic across instances
    again = AudioFeatureStage(win=16)(audio)
    assert again.equals(out)


def test_audio_features_query_via_ray(ray_session):
    from ocr_proofreader_ray.pipelines.multimodal import q_audio_features

    rows = q_audio_features(SF).take_all()
    assert rows and all(r["duration_ms"] > 0 for r in rows)
    # audio kind = doc_id % 3 == 1
    assert all(r["doc_id"] % 3 == 1 for r in rows)


def test_ahash_planted_near_dup_pair(ray_session):
    import numpy as np

    import ray

    from ocr_proofreader_ray.pipelines.dedup import simhash_hamming_pairs
    from ocr_proofreader_ray.pipelines.multimodal import _ahash_batch

    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, size=64, dtype=np.uint8)
    near = base.copy()
    # flip two pixels across the mean -> hamming 2 between aHashes
    m = base.mean()
    above = np.where(base > m)[0]
    below = np.where(base <= m)[0]
    near[above[0]] = 0
    near[below[0]] = 255
    other = rng.integers(0, 256, size=64, dtype=np.uint8)

    tab = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "thumbnail": pa.array([base.tobytes(), near.tobytes(),
                               other.tobytes()], pa.binary()),
    })
    fps = ray.data.from_arrow(_ahash_batch(tab))
    pairs = simhash_hamming_pairs(max_hamming=6, corpus_size=3,
                                  fingerprints=fps)
    got = {(a, b) for a, b in zip(pairs.column("doc_a").to_pylist(),
                                  pairs.column("doc_b").to_pylist())}
    assert (1, 2) in got
    assert all(p in {(1, 2)} or 3 not in p for p in got)


def test_media_phash_dups_runs_clean_corpus(ray_session):
    from ocr_proofreader_ray.pipelines.multimodal import q_media_phash_dups

    out = q_media_phash_dups("/root/testdata/sf0.001")
    n = out.num_rows if hasattr(out, "num_rows") else out.count()
    assert n == 0  # synthetic corpus has no near-identical images


# ---------------------------------------------------------------------------
# pure-stdlib codecs for uncompressed formats (VERDICT r04 #5)
# ---------------------------------------------------------------------------

def test_bmp_roundtrip_bit_exact():
    import numpy as np

    from ocr_proofreader_ray.stages.media import _decode_one, encode_bmp

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (11, 7, 3), np.int64).astype(np.uint8)
    kind, w, h, frames, body = _decode_one(encode_bmp(px))
    assert (kind, w, h, frames) == (0, 7, 11, 1)
    assert body.tobytes() == px.tobytes()  # padding stripped, top-down


def test_ppm_roundtrip_and_comment_header():
    import numpy as np

    from ocr_proofreader_ray.stages.media import _decode_one, encode_ppm

    rng = np.random.RandomState(6)
    px = rng.randint(0, 256, (5, 9, 3), np.int64).astype(np.uint8)
    kind, w, h, _f, body = _decode_one(encode_ppm(px))
    assert (kind, w, h) == (0, 9, 5)
    assert body.tobytes() == px.tobytes()
    # header comments (emitted by many tools) must parse
    with_comment = b"P6\n# made by a tool\n9 5\n255\n" + px.tobytes()
    kind, w, h, _f, body = _decode_one(with_comment)
    assert (w, h) == (9, 5) and body.tobytes() == px.tobytes()


def test_wav_roundtrip_16bit_and_8bit():
    import numpy as np

    from ocr_proofreader_ray.stages.media import (
        _decode_one,
        encode_wav,
    )

    u8 = np.arange(256, dtype=np.uint8)
    payload = encode_wav((u8.astype(np.int16) - 128) << 8, rate=8000)
    kind, rate, n, _f, body = _decode_one(payload)
    assert (kind, rate, n) == (1, 8000, 256)
    assert body.tobytes() == u8.tobytes()  # hi-byte+128 inverts the encode


def test_riff_avi_still_refuses():
    from ocr_proofreader_ray.stages.media import _decode_one

    avi = b"RIFF" + b"\x00\x00\x00\x00" + b"AVI " + b"\x00" * 64
    with pytest.raises(NotImplementedError, match="AVI"):
        _decode_one(avi)


def test_decode_stage_strict_over_mixed_real_containers():
    """A batch mixing FAKE, BMP, PPM and WAV rows decodes strictly — the
    real formats are no longer stubbed."""
    import numpy as np

    from ocr_proofreader_ray.stages.media import synthesize_media_batch

    docs = pa.table({
        # doc_id%3 picks kind, doc_id%5 picks container:
        # 15->BMP image, 3->PPM image, 10->WAV audio, 1->FAKE audio
        "doc_id": pa.array([15, 3, 10, 1], pa.int64()),
        "text": pa.array(["alpha beta", "gamma", "delta epsilon", "zeta"]),
    })
    media = synthesize_media_batch(docs, real_containers=True)
    payloads = media.column("payload").to_pylist()
    assert payloads[0][:2] == b"BM"
    assert payloads[1][:2] == b"P6"
    assert payloads[2][:4] == b"RIFF"
    assert payloads[3][:4] == b"FAKE"
    out = DecodeStage(strict=True)(media)
    assert out.column("dec_w").to_pylist() == [
        8 + 15 % 16, 8 + 3 % 16, 8000 + (10 % 3) * 4000, 12000]
    # decoded dims must match the synthesizer's metadata columns
    assert (out.column("dec_w").to_pylist()[:2]
            == media.column("media_w").to_pylist()[:2])
    assert (out.column("dec_h").to_pylist()
            == media.column("media_h").to_pylist())
