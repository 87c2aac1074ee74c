"""Multimodal stages: image/audio/video as opaque binary columns.

The decode kernels themselves are STUBS (no image/audio libraries in this
container): ``DecodeImage``/``DecodeAudio`` raise ``NotImplementedError``
unless constructed with ``fake=True``, in which case a deterministic fake
decoder (content-hash -> fixed-shape array) stands in.  Everything around
them — schema, actor-pool signature, small-batch sizing for large payloads,
output layout — is real and tested, so swapping in PIL/ffmpeg later is a
one-function change.

Design notes for 100 TB media tables:
  * binary payloads are huge: these stages must run with SMALL ``batch_size``
    (``media_batch_size`` default 64) so batch x concurrency fits worker
    heaps, and with actor pools so any model/codec loads once per actor;
  * outputs carry features, not media: the media column is dropped on the
    way out, so downstream shuffles never move raw bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.hashing import hash64

MEDIA_SCHEMA = {
    "media_id": pa.int64(),
    "media": pa.binary(),
    "media_type": pa.string(),   # image | audio | video
    "width": pa.int32(),
    "height": pa.int32(),
    "duration_ms": pa.int32(),
}


def make_fake_media_table(n: int, seed: int = 3) -> pa.Table:
    """Deterministic opaque-binary media table for plumbing tests."""
    rs = np.random.RandomState(seed)
    blobs = [rs.bytes(rs.randint(200, 2000)) for _ in range(n)]
    types = np.array(["image", "audio", "video"])[rs.randint(0, 3, n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "media": pa.array(blobs, type=pa.binary()),
        "media_type": pa.array(types.tolist()),
        "width": pa.array(rs.randint(16, 512, n).astype(np.int32)),
        "height": pa.array(rs.randint(16, 512, n).astype(np.int32)),
        "duration_ms": pa.array(rs.randint(0, 60_000, n).astype(np.int32)),
    })


def _fake_feature(blob: bytes, dim: int, seed: int) -> np.ndarray:
    """Deterministic stand-in feature: hash-chain of the payload bytes."""
    h = np.frombuffer(blob[: (len(blob) // 8) * 8], dtype=np.uint64)
    if len(h) == 0:
        h = np.array([len(blob)], dtype=np.uint64)
    base = hash64(h.astype(np.int64), seed)
    reps = int(np.ceil(dim / len(base)))
    vec = np.tile(base, reps)[:dim]
    return (vec.astype(np.float64) / 2.0**64).astype(np.float32)


class DecodeImage:
    """Actor-pool stage: image binary -> feature vector (+ size metadata).

    Real decode (PIL / turbojpeg) is not available in this container; stub
    per the driver brief.  Constructor args are the actor-init state.
    """

    def __init__(self, feature_dim: int = 64, fake: bool = False, seed: int = 11):
        self.feature_dim = feature_dim
        self.fake = fake
        self.seed = seed
        if not fake:
            raise NotImplementedError(
                "image decoding requires PIL/libjpeg, absent in this container; "
                "construct with fake=True for the deterministic test decoder")

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("media").to_pylist()
        feats = np.stack([_fake_feature(b, self.feature_dim, self.seed) for b in blobs])
        feat_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1)), self.feature_dim)
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": feat_arr,
            "n_bytes": pa.array(np.array([len(b) for b in blobs], dtype=np.int64)),
        })


class ResizeImage:
    """Actor-pool stage: stub resize; emits target-size metadata row."""

    def __init__(self, target_w: int = 224, target_h: int = 224, fake: bool = False):
        self.target_w = target_w
        self.target_h = target_h
        if not fake:
            raise NotImplementedError(
                "image resize requires an image library, absent here; fake=True "
                "passes payloads through with updated size metadata")

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "media_id": batch.column("media_id"),
            "media": batch.column("media"),
            "width": pa.array(np.full(n, self.target_w, dtype=np.int32)),
            "height": pa.array(np.full(n, self.target_h, dtype=np.int32)),
        })


class SampleFrames:
    """Actor-pool stage: video -> every-Nth-frame sample (stubbed).

    Emits one row per sampled frame index; the fake path derives frame count
    from duration so the fan-out shape is realistic.
    """

    def __init__(self, every_ms: int = 1000, fake: bool = False, seed: int = 12):
        self.every_ms = every_ms
        self.seed = seed
        if not fake:
            raise NotImplementedError(
                "video frame sampling requires ffmpeg, absent here; fake=True "
                "emits deterministic frame-index rows")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        dur = batch.column("duration_ms").to_numpy(zero_copy_only=False)
        counts = np.maximum(dur // self.every_ms, 1).astype(np.int64)
        rep_ids = np.repeat(ids, counts)
        frame_idx = np.concatenate([np.arange(c) for c in counts]) if len(counts) else np.array([], dtype=np.int64)
        return pa.table({
            "media_id": pa.array(rep_ids),
            "frame_index": pa.array(frame_idx.astype(np.int64)),
            "ts_ms": pa.array((frame_idx * self.every_ms).astype(np.int64)),
        })


def decode_features(ds: "ray.data.Dataset", *, feature_dim: int = 64,
                    fake: bool = False, media_batch_size: int = 64,
                    concurrency=(1, 4)) -> "ray.data.Dataset":
    """documents-of-media -> features, actor pool, small batches (see module
    docstring for why)."""
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs=dict(feature_dim=feature_dim, fake=fake),
        batch_format="pyarrow",
        batch_size=media_batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
