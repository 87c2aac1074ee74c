import numpy as np
import pytest

import ray.data

from cardinality_estimation_evaluation_framework_ray.stages.multimodal import (
    DecodeImage,
    ResizeImage,
    SampleFrames,
    decode_features,
    make_fake_media_table,
)


def test_compressed_formats_still_raise():
    """PPM/PGM/WAV decode is real; compressed formats (and video) remain
    honest NotImplementedError paths."""
    import pyarrow as pa

    from cardinality_estimation_evaluation_framework_ray.stages.multimodal import (
        DecodeAudio,
        decode_ppm,
        decode_wav_pcm16,
    )

    from cardinality_estimation_evaluation_framework_ray.stages.multimodal import (
        decode_y4m,
    )

    with pytest.raises(NotImplementedError):
        decode_ppm(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises(NotImplementedError):
        decode_wav_pcm16(b"ID3\x04 mp3-ish tag")
    with pytest.raises(NotImplementedError):
        decode_y4m(b"\x00\x00\x00\x18ftypmp42 mp4-ish")
    jpeg_batch = pa.table({
        "media_id": pa.array([1], type=pa.int64()),
        "media": pa.array([b"\xff\xd8\xff\xe0"], type=pa.binary()),
    })
    with pytest.raises(NotImplementedError):
        DecodeImage(feature_dim=16)(jpeg_batch)
    with pytest.raises(NotImplementedError):
        DecodeAudio()(jpeg_batch)


def test_ppm_codec_roundtrip():
    from cardinality_estimation_evaluation_framework_ray.stages.multimodal import (
        decode_ppm,
        encode_ppm,
    )

    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (13, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    gray = rs.randint(0, 256, (9, 5), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(gray)), gray)
    # netpbm comment in the header
    blob = b"P5\n# comment line\n5 9\n255\n" + gray.tobytes()
    assert np.array_equal(decode_ppm(blob), gray)


def test_resize_semantics():
    from cardinality_estimation_evaluation_framework_ray.stages.multimodal import (
        resize_image,
    )

    const = np.full((64, 48, 3), 77, dtype=np.uint8)
    assert np.all(resize_image(const, 8, 8) == 77)       # area-average down
    assert np.all(resize_image(const, 100, 90) == 77)    # bilinear up
    # exact-multiple downscale preserves the mean
    rs = np.random.RandomState(1)
    x = rs.randint(0, 256, (32, 32), dtype=np.uint8)
    assert abs(resize_image(x, 8, 8).astype(float).mean() - x.mean()) < 1.0
    # checkerboard at 2x downscale averages to ~127.5
    cb = (np.indices((8, 8)).sum(0) % 2 * 255).astype(np.uint8)
    r = resize_image(cb, 4, 4)
    assert np.all((r >= 127) & (r <= 128))


def test_wav_codec_roundtrip_and_stereo():
    import struct

    from cardinality_estimation_evaluation_framework_ray.stages.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    rs = np.random.RandomState(2)
    s = rs.randint(-32768, 32768, 1000).astype(np.int16)
    dec, rate = decode_wav_pcm16(encode_wav_pcm16(s, 8000))
    assert rate == 8000 and np.allclose(dec, s / 32768.0)
    # stereo: channels are averaged
    inter = np.empty(20, dtype="<i2")
    inter[0::2], inter[1::2] = 100, 300
    data = inter.tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE",
                      b"fmt ", 16, 1, 2, 16000, 16000 * 4, 4, 16, b"data",
                      len(data))
    dec2, rate2 = decode_wav_pcm16(hdr + data)
    assert rate2 == 16000 and np.allclose(dec2, 200 / 32768.0)


def test_real_image_decode_stage_stats():
    """DecodeImage real path: thumbnail feature + exact pixel stats."""
    import pyarrow as pa

    from cardinality_estimation_evaluation_framework_ray.stages.multimodal import (
        encode_ppm,
    )

    rs = np.random.RandomState(3)
    imgs = [rs.randint(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in ((12, 20), (33, 7), (8, 8))]
    batch = pa.table({
        "media_id": pa.array(np.arange(3, dtype=np.int64)),
        "media": pa.array([encode_ppm(i) for i in imgs], type=pa.binary()),
    })
    out = DecodeImage(feature_dim=16)(batch)
    assert out.column("width").to_pylist() == [20, 7, 8]
    assert out.column("height").to_pylist() == [12, 33, 8]
    for got, img in zip(out.column("mean_pixel").to_pylist(), imgs):
        assert got == pytest.approx(img.mean(), abs=1e-12)
    feats = np.asarray(out.column("feature").combine_chunks().flatten()
                       .to_numpy()).reshape(3, 16)
    # thumbnail of a whole image preserves the grayscale mean closely
    gray_means = np.array([i.mean() for i in imgs]) / 255.0
    assert np.allclose(feats.mean(axis=1), gray_means, atol=0.02)


def test_fake_decode_deterministic():
    tbl = make_fake_media_table(10)
    d = DecodeImage(feature_dim=32, fake=True)
    out1, out2 = d(tbl), d(tbl)
    assert out1.equals(out2)
    feats = np.asarray(out1.column("feature").combine_chunks().flatten()
                       .to_numpy()).reshape(10, 32)
    assert feats.shape == (10, 32)
    assert np.all((feats >= 0) & (feats < 1))
    # distinct payloads -> distinct features
    assert not np.allclose(feats[0], feats[1])


@pytest.mark.usefixtures("ray_session")
def test_decode_features_actor_pool_small_batches():
    tbl = make_fake_media_table(100)
    ds = ray.data.from_arrow(tbl)
    out = decode_features(ds, feature_dim=16, fake=True, media_batch_size=16,
                          concurrency=(1, 2)).to_pandas()
    assert len(out) == 100
    assert "media" not in out.columns  # raw bytes dropped before any shuffle
    assert set(out.columns) == {"media_id", "feature", "n_bytes",
                                "width", "height", "mean_pixel"}


def test_y4m_codec_roundtrip():
    from cardinality_estimation_evaluation_framework_ray.stages.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    rs = np.random.RandomState(4)
    frames = rs.randint(0, 256, (7, 6, 10), dtype=np.uint8)
    got, num, den = decode_y4m(encode_y4m(frames, fps=(30, 1)))
    assert (num, den) == (30, 1)
    assert np.array_equal(got, frames)
    # C420 stream from another tool: luma plane comes back, chroma skipped
    luma = rs.randint(0, 256, (2, 4, 6), dtype=np.uint8)
    blob = b"YUV4MPEG2 W6 H4 F25:1 C420jpeg\n" + b"".join(
        b"FRAME\n" + f.tobytes() + bytes(2 * (3 * 2)) for f in luma)
    got, num, den = decode_y4m(blob)
    assert (num, den) == (25, 1)
    assert np.array_equal(got, luma)


def test_real_frame_sampling_stride_and_luma():
    import pyarrow as pa

    from cardinality_estimation_evaluation_framework_ray.stages.multimodal import (
        encode_y4m,
    )

    # 8 frames at 4 fps (250 ms apart); every_ms=500 -> stride 2 -> 0,2,4,6
    frames = np.stack([np.full((4, 8), 10 * i, dtype=np.uint8)
                       for i in range(8)])
    batch = pa.table({
        "media_id": pa.array([5], type=pa.int64()),
        "media": pa.array([encode_y4m(frames, fps=(4, 1))], type=pa.binary()),
    })
    out = SampleFrames(every_ms=500)(batch).to_pandas()
    assert out.frame_index.tolist() == [0, 2, 4, 6]
    assert out.ts_ms.tolist() == [0, 500, 1000, 1500]
    assert out.mean_luma.tolist() == [0.0, 20.0, 40.0, 60.0]


@pytest.mark.usefixtures("ray_session")
def test_frame_sampling_fanout():
    tbl = make_fake_media_table(20)
    ds = ray.data.from_arrow(tbl)
    out = ds.map_batches(SampleFrames(every_ms=1000, fake=True),
                         batch_format="pyarrow").to_pandas()
    dur = {r["media_id"]: r["duration_ms"] for r in tbl.to_pylist()}
    counts = out.groupby("media_id").size()
    for mid, c in counts.items():
        assert c == max(dur[mid] // 1000, 1)


def test_malformed_media_raises_valueerror_not_assert():
    """Untrusted media bytes must fail with real exceptions (asserts are
    stripped under ``python -O``): truncated payloads, absurd header dims,
    missing RIFF chunks, unsupported sample formats."""
    import struct

    from cardinality_estimation_evaluation_framework_ray.stages.multimodal import (
        decode_ppm,
        decode_wav_pcm16,
        encode_ppm,
        encode_wav_pcm16,
    )

    # PPM whose header claims more pixels than the payload carries
    good = encode_ppm(np.zeros((4, 5, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_ppm(good[:-8])
    # header dims of zero
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n0 0\n255\n")
    # 16-bit netpbm is unsupported, not silently misparsed
    with pytest.raises(NotImplementedError):
        decode_ppm(b"P5\n2 2\n65535\n" + b"\x00" * 8)

    # WAV with a float32 fmt chunk (fmt tag 3) is unsupported
    f32 = bytearray(encode_wav_pcm16(np.zeros(16), 8000))
    struct.pack_into("<H", f32, 20, 3)  # wFormatTag lives at offset 20
    with pytest.raises(NotImplementedError):
        decode_wav_pcm16(bytes(f32))
    # RIFF/WAVE shell with no fmt/data chunks at all
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"RIFF\x04\x00\x00\x00WAVE")
