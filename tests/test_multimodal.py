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


def test_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        DecodeImage()
    with pytest.raises(NotImplementedError):
        ResizeImage()
    with pytest.raises(NotImplementedError):
        SampleFrames()


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
    assert set(out.columns) == {"media_id", "feature", "n_bytes"}


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
