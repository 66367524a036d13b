"""Multimodal columns: real pure-Python BMP codec (encode / decode /
resize / stats) running inside the mapInPandas plumbing, plus the
pluggable-kernel stages for lossy formats."""

import hashlib

import pytest

from silk_spark.operators.multimodal import (
    FRAME_SCHEMA,
    IMAGE_FEATURE_SCHEMA,
    IMAGE_SCHEMA,
    MEDIA_STATS_SCHEMA,
    bmp_decode,
    bmp_encode,
    bmp_feature_decoder,
    bmp_media_from_ids,
    bmp_resize_nearest,
    bmp_stats,
    extract_image_features,
    media_stats,
    resize_images,
    sample_frames,
    synthetic_media,
)


# ---------- pure codec (no Spark) ----------


def _rgb(w, h, seed=0):
    return bytes((seed + i * 37) % 256 for i in range(w * h * 3))


@pytest.mark.parametrize("w,h", [(8, 8), (5, 3), (1, 1), (7, 2)])
def test_bmp_roundtrip(w, h):
    """Encode→decode is the identity, including odd widths whose rows
    need 4-byte padding."""
    rgb = _rgb(w, h)
    blob = bmp_encode(w, h, rgb)
    assert blob[:2] == b"BM"
    dw, dh, drgb = bmp_decode(blob)
    assert (dw, dh) == (w, h)
    assert drgb == rgb


def test_bmp_decode_topdown_negative_height():
    rgb = _rgb(4, 2)
    blob = bytearray(bmp_encode(4, 2, rgb))
    # flip to top-down: negate height, reverse the stored row order
    import struct

    struct.pack_into("<i", blob, 22, -2)
    off = struct.unpack_from("<I", blob, 10)[0]
    stride = 4 * 3  # already 4-byte aligned
    r0, r1 = blob[off : off + stride], blob[off + stride : off + 2 * stride]
    blob[off : off + 2 * stride] = r1 + r0
    assert bmp_decode(bytes(blob)) == (4, 2, rgb)


def test_bmp_resize_nearest_picks_expected_pixels():
    w, h = 8, 8
    rgb = _rgb(w, h, seed=5)
    resized = bmp_resize_nearest(bmp_encode(w, h, rgb), 4, 4)
    rw, rh, rrgb = bmp_decode(resized)
    assert (rw, rh) == (4, 4)
    for y in range(4):
        for x in range(4):
            src = rgb[((2 * y) * 8 + 2 * x) * 3 : ((2 * y) * 8 + 2 * x) * 3 + 3]
            assert rrgb[(y * 4 + x) * 3 : (y * 4 + x) * 3 + 3] == src


def test_bmp_stats_and_features():
    rgb = bytes([10, 20, 30] * 4)  # 2x2, R=10 G=20 B=30 everywhere
    blob = bmp_encode(2, 2, rgb)
    w, h, mean, mn, mx = bmp_stats(blob)
    assert (w, h, mn, mx) == (2, 2, 10, 30)
    assert mean == pytest.approx(20.0)
    feat = bmp_feature_decoder(blob)
    assert feat == pytest.approx([2.0, 2.0, 10.0, 20.0, 30.0, 20.0, 10.0, 30.0])


def test_bmp_decode_rejects_garbage():
    with pytest.raises(ValueError):
        bmp_decode(b"GIF89a not a bmp")


# ---------- Spark plumbing ----------


def test_synthetic_media_deterministic(spark):
    a = synthetic_media(spark, 8).collect()
    b = synthetic_media(spark, 8).collect()
    assert [bytes(r.data) for r in a] == [bytes(r.data) for r in b]
    assert all(r.width >= 1 and r.height >= 1 for r in a)


def test_feature_extraction_shapes(spark):
    media = synthetic_media(spark, 16)
    feats = extract_image_features(media)
    assert feats.schema == IMAGE_FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 16
    assert all(r.feat_dim == len(r.feature) == 8 for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r.feature)


def test_frame_sampling_fanout(spark):
    media = synthetic_media(spark, 4)
    frames = sample_frames(media, every_n=10, max_frames=3)
    assert frames.schema == FRAME_SCHEMA
    rows = frames.collect()
    assert len(rows) == 12
    assert {r.frame_idx for r in rows} == {0, 10, 20}


def test_bmp_media_pipeline_end_to_end(spark):
    """ids → BMP blobs → resize → stats, all distributed; stats match
    the locally recomputed digest byte math."""
    ids = spark.range(0, 12).withColumnRenamed("id", "media_id")
    media = bmp_media_from_ids(ids, width=8, height=8)
    assert media.schema == IMAGE_SCHEMA
    small = resize_images(media, 4, 4)
    stats = media_stats(small)
    assert stats.schema == MEDIA_STATS_SCHEMA
    got = {r.media_id: r for r in stats.collect()}
    assert len(got) == 12
    for mid in range(12):
        digest = hashlib.md5(f"silk-media:{mid}".encode()).digest()
        rgb = (digest * 12)[: 8 * 8 * 3]
        picked = []
        for y in range(4):
            for x in range(4):
                picked += rgb[((2 * y) * 8 + 2 * x) * 3 : ((2 * y) * 8 + 2 * x) * 3 + 3]
        r = got[mid]
        assert (r.width, r.height) == (4, 4)
        assert r.min_byte == min(picked) and r.max_byte == max(picked)
        assert r.mean_byte == pytest.approx(sum(picked) / len(picked))


def test_real_decoder_slots_into_feature_stage(spark):
    ids = spark.range(0, 6).withColumnRenamed("id", "media_id")
    media = bmp_media_from_ids(ids, width=5, height=3)
    feats = extract_image_features(media, real_decoder=bmp_feature_decoder)
    rows = feats.collect()
    assert all(r.feat_dim == 8 for r in rows)
    assert all(r.feature[0] == 5.0 and r.feature[1] == 3.0 for r in rows)


# ---------- WAV codec + audio pipeline ----------


from silk_spark.operators.multimodal import (  # noqa: E402
    AUDIO_STATS_SCHEMA,
    audio_stats,
    downsample_audio,
    wav_decode,
    wav_downsample_nearest,
    wav_encode,
    wav_media_from_ids,
    wav_stats,
)


@pytest.mark.parametrize("samples", [[0], [1, -1, 32767, -32768], list(range(-50, 50, 7))])
def test_wav_roundtrip(samples):
    rate, got = wav_decode(wav_encode(8000, samples))
    assert rate == 8000 and got == samples


def test_wav_decode_skips_foreign_chunks():
    """Real encoders insert LIST/fact chunks between fmt and data; the
    chunk walker must skip them (including odd-size word alignment)."""
    import struct as _s

    blob = wav_encode(8000, [5, -6, 7])
    # splice a 3-byte junk chunk (odd size -> 1 pad byte) before 'data'
    di = blob.index(b"data")
    junk = b"LIST" + _s.pack("<I", 3) + b"xyz" + b"\x00"
    spliced = blob[:di] + junk + blob[di:]
    assert wav_decode(spliced) == (8000, [5, -6, 7])


def test_wav_downsample_picks_expected_samples():
    samples = [100 * i - 300 for i in range(16)]
    rate, out = wav_decode(wav_downsample_nearest(wav_encode(8000, samples), 8))
    assert out == [samples[(j * 16) // 8] for j in range(8)]
    assert rate == 4000  # duration preserved


def test_wav_stats():
    rate, n, mean, rms, peak = wav_stats(wav_encode(16000, [3, -3, 3, -3]))
    assert (rate, n, peak) == (16000, 4, 3)
    assert mean == pytest.approx(0.0)
    assert rms == pytest.approx(3.0)


def test_wav_decode_rejects_garbage():
    with pytest.raises(ValueError):
        wav_decode(b"OggS not a wav file at all....")


def test_wav_media_pipeline_end_to_end(spark):
    """ids → WAV blobs → downsample → stats, all distributed; stats
    match the locally recomputed digest int16 math."""
    import struct as _s

    ids = spark.range(0, 10).withColumnRenamed("id", "media_id")
    media = wav_media_from_ids(ids, n_samples=16, sample_rate=8000)
    stats = audio_stats(downsample_audio(media, 8))
    assert stats.schema == AUDIO_STATS_SCHEMA
    got = {r.media_id: r for r in stats.collect()}
    assert len(got) == 10
    for mid in range(10):
        digest = hashlib.md5(f"silk-audio:{mid}".encode()).digest()
        src = list(_s.unpack("<16h", (digest * 2)[:32]))
        kept = [src[(j * 16) // 8] for j in range(8)]
        r = got[mid]
        assert (r.sample_rate, r.n_samples) == (4000, 8)
        assert r.peak_abs == max(abs(v) for v in kept)
        assert r.mean_sample == pytest.approx(sum(kept) / 8)
        assert r.rms == pytest.approx((sum(v * v for v in kept) / 8) ** 0.5)
