"""Multimodal stages: image/audio/video as opaque binary columns.

Image (PPM/PGM), audio (WAV PCM16) and video (YUV4MPEG2/y4m) decoding is
REAL — pure-NumPy codecs for the uncompressed formats, no external
libraries — including a real area-average/bilinear resize and real
frame-stride sampling.  Compressed formats (JPEG/PNG/MP3/MP4) still require
libjpeg/ffmpeg, absent in this container: those payloads raise
``NotImplementedError`` unless the stage is constructed with ``fake=True``,
in which case a deterministic fake decoder (content-hash -> fixed-shape
array) stands in.  The Ray-side plumbing — schema, actor-pool
signature, small-batch sizing for large payloads, output layout — is
identical for both paths.

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


# ---------------------------------------------------------------------------
# pure-NumPy codecs for uncompressed formats
# ---------------------------------------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6); (h, w) uint8 -> PGM (P5)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 3:
        assert arr.shape[2] == 3, "PPM wants 3 channels"
        magic = b"P6"
    else:
        assert arr.ndim == 2
        magic = b"P5"
    h, w = arr.shape[:2]
    return b"%s\n%d %d\n255\n" % (magic, w, h) + arr.tobytes()


def decode_ppm(blob: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8; PGM (P5) -> (h, w) uint8.

    Handles the netpbm header grammar: whitespace-separated tokens with
    ``#`` comments, maxval <= 255.
    """
    if blob[:2] not in (b"P6", b"P5"):
        raise NotImplementedError(
            f"unsupported image magic {blob[:2]!r}: only uncompressed "
            "PPM (P6) / PGM (P5) decode without external codecs")
    channels = 3 if blob[:2] == b"P6" else 1
    # tokenize header: magic, width, height, maxval; '#' starts a comment
    tokens, i, n = [], 2, len(blob)
    while len(tokens) < 3:
        while i < n and blob[i : i + 1].isspace():
            i += 1
        if blob[i : i + 1] == b"#":
            while i < n and blob[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not blob[j : j + 1].isspace():
            j += 1
        tokens.append(int(blob[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    # untrusted media bytes: real validation, not assert (stripped under -O)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    if w <= 0 or h <= 0 or len(blob) - i < w * h * channels:
        raise ValueError("malformed netpbm: header dims exceed payload")
    data = np.frombuffer(blob, dtype=np.uint8, count=w * h * channels, offset=i)
    return data.reshape((h, w, 3) if channels == 3 else (h, w))


def resize_image(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Area-average downscale / bilinear upscale, separable, vectorized."""
    arr = np.asarray(arr)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    h, w, c = arr.shape

    def _axis(a: np.ndarray, src: int, dst: int) -> np.ndarray:
        # a: (src, ...) -> (dst, ...) along axis 0
        if dst == src:
            return a
        if dst < src:
            # area average: each output pixel integrates src/dst input pixels
            edges = np.linspace(0, src, dst + 1)
            cs = np.concatenate([np.zeros((1,) + a.shape[1:]),
                                 np.cumsum(a, axis=0, dtype=np.float64)])
            idx = np.floor(edges).astype(np.int64)
            frac = edges - idx
            # integral from 0 to edge e = cs[floor(e)] + frac * row(floor(e))
            row = np.concatenate([a.astype(np.float64),
                                  np.zeros((1,) + a.shape[1:])])
            integ = cs[idx] + frac.reshape((-1,) + (1,) * (a.ndim - 1)) * row[idx]
            return (integ[1:] - integ[:-1]) / (src / dst)
        # bilinear upscale, edge-aligned centers
        pos = (np.arange(dst) + 0.5) * src / dst - 0.5
        lo = np.clip(np.floor(pos).astype(np.int64), 0, src - 1)
        hi = np.clip(lo + 1, 0, src - 1)
        t = np.clip(pos - lo, 0.0, 1.0).reshape((-1,) + (1,) * (a.ndim - 1))
        return a[lo] * (1 - t) + a[hi] * t

    out = _axis(arr.astype(np.float64), h, target_h)
    out = _axis(out.transpose(1, 0, 2), w, target_w).transpose(1, 0, 2)
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """(n,) int16 mono -> RIFF/WAVE PCM16 bytes."""
    import struct

    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, 1,
        sample_rate, sample_rate * 2, 2, 16, b"data", len(data))
    return hdr + data


def decode_wav_pcm16(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> (float64 samples in [-1, 1), sample_rate).

    Walks RIFF chunks (fmt / data), mono or interleaved-averaged stereo.
    """
    import struct

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise NotImplementedError(
            "unsupported audio container: only RIFF/WAVE PCM16 decodes "
            "without external codecs")
    i, n = 12, len(blob)
    rate, channels, bits, data = None, 1, 16, None
    while i + 8 <= n:
        cid, size = blob[i : i + 4], struct.unpack("<I", blob[i + 4 : i + 8])[0]
        body = blob[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 WAV decodes without external codecs "
                    f"(got format={fmt}, bits={bits})")
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    # untrusted media bytes: real validation, not assert (stripped under -O)
    if rate is None or data is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    if channels > 1:
        samples = samples[: len(samples) // channels * channels]
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples, rate

def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (4, 1)) -> bytes:
    """(n, h, w) uint8 luma frames -> YUV4MPEG2 (y4m) bytes, Cmono.

    y4m is the standard UNCOMPRESSED video interchange container (mjpegtools
    / ffmpeg): one ASCII stream header, then per frame an ASCII ``FRAME``
    header followed by raw planes.  ``Cmono`` carries the luma plane only.
    """
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    assert frames.ndim == 3, "want (n_frames, h, w) luma"
    n, h, w = frames.shape
    hdr = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 Cmono\n" % (w, h, fps[0], fps[1])
    return hdr + b"".join(b"FRAME\n" + frames[i].tobytes() for i in range(n))


def decode_y4m(blob: bytes) -> tuple[np.ndarray, int, int]:
    """y4m bytes -> ((n, h, w) uint8 LUMA frames, fps_num, fps_den).

    Parses the stream-header parameter tags (W/H/F/C...) and per-frame
    ``FRAME`` headers.  Chroma planes of C420*/C422/C444 streams are
    validated for length but only the luma plane is returned — every decoded
    feature downstream is luma-based.  Non-y4m payloads (compressed
    containers: mp4/webm/mkv need ffmpeg) raise ``NotImplementedError``.
    """
    if not blob.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            f"unsupported video container (magic {blob[:9]!r}): only "
            "uncompressed YUV4MPEG2 (y4m) decodes without external codecs")
    eol = blob.index(b"\n")
    w = h = None
    num, den = 25, 1  # y4m default frame rate when F is absent
    chroma = "420"    # y4m default colorspace
    for tok in blob[9:eol].split():
        tag, val = tok[:1], tok[1:].decode("ascii")
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = (int(x) for x in val.split(":"))
        elif tag == b"C":
            chroma = val
    if w is None or h is None:
        # untrusted media bytes: real validation, not assert (stripped -O)
        raise ValueError("malformed y4m: header missing W/H")
    if chroma.startswith("mono"):
        frame_len = w * h
    elif chroma.startswith("420"):
        frame_len = w * h + 2 * ((w // 2) * (h // 2))
    elif chroma.startswith("422"):
        frame_len = w * h + 2 * ((w // 2) * h)
    elif chroma.startswith("444"):
        frame_len = 3 * w * h
    else:
        raise NotImplementedError(f"y4m colorspace C{chroma} not supported")
    frames, i, n = [], eol + 1, len(blob)
    while i < n:
        if blob[i : i + 5] != b"FRAME":
            raise ValueError("malformed y4m: FRAME marker missing")
        i = blob.index(b"\n", i) + 1  # frame headers may carry parameters
        luma = np.frombuffer(blob, dtype=np.uint8, count=w * h, offset=i)
        frames.append(luma.reshape(h, w))
        i += frame_len
    stack = (np.stack(frames) if frames
             else np.zeros((0, h, w), dtype=np.uint8))
    return stack, num, den


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
    """Actor-pool stage: image binary -> feature vector (+ size/pixel stats).

    The REAL path decodes uncompressed PPM (P6) / PGM (P5) with the
    pure-NumPy codec above and emits an s x s area-averaged grayscale
    thumbnail as the feature vector (feature_dim must be a square), plus
    ``width``/``height``/``mean_pixel``.  Compressed formats raise
    ``NotImplementedError`` (libjpeg absent); ``fake=True`` keeps the
    deterministic content-hash feature for plumbing tests.
    """

    def __init__(self, feature_dim: int = 64, fake: bool = False, seed: int = 11):
        self.feature_dim = feature_dim
        self.fake = fake
        self.seed = seed
        if not fake:
            side = int(round(feature_dim ** 0.5))
            assert side * side == feature_dim, (
                "real decode emits a square thumbnail feature; "
                f"feature_dim={feature_dim} is not a square")
            self.side = side

    def _decode_one(self, blob: bytes) -> tuple[np.ndarray, int, int, float]:
        img = decode_ppm(blob)
        h, w = img.shape[:2]
        gray = img.mean(axis=2) if img.ndim == 3 else img.astype(np.float64)
        thumb = resize_image(gray, self.side, self.side)
        return (thumb.astype(np.float32).reshape(-1) / 255.0,
                w, h, float(img.mean()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("media").to_pylist()
        if self.fake:
            feats = np.stack([_fake_feature(b, self.feature_dim, self.seed)
                              for b in blobs])
            widths = heights = np.zeros(len(blobs), dtype=np.int32)
            means = np.zeros(len(blobs))
        else:
            decoded = [self._decode_one(b) for b in blobs]
            feats = np.stack([d[0] for d in decoded])
            widths = np.array([d[1] for d in decoded], dtype=np.int32)
            heights = np.array([d[2] for d in decoded], dtype=np.int32)
            means = np.array([d[3] for d in decoded])
        feat_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1)), self.feature_dim)
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": feat_arr,
            "n_bytes": pa.array(np.array([len(b) for b in blobs], dtype=np.int64)),
            "width": pa.array(widths),
            "height": pa.array(heights),
            "mean_pixel": pa.array(means),
        })


class ResizeImage:
    """Actor-pool stage: real PPM/PGM resize (area-average down, bilinear
    up), re-encoded in place; ``fake=True`` passes payloads through with
    updated size metadata only."""

    def __init__(self, target_w: int = 224, target_h: int = 224, fake: bool = False):
        self.target_w = target_w
        self.target_h = target_h
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if self.fake:
            media = batch.column("media")
        else:
            media = pa.array(
                [encode_ppm(resize_image(decode_ppm(b), self.target_w,
                                         self.target_h))
                 for b in batch.column("media").to_pylist()],
                type=pa.binary())
        return pa.table({
            "media_id": batch.column("media_id"),
            "media": media,
            "width": pa.array(np.full(n, self.target_w, dtype=np.int32)),
            "height": pa.array(np.full(n, self.target_h, dtype=np.int32)),
        })


class DecodeAudio:
    """Actor-pool stage: WAV PCM16 binary -> scalar audio features
    (duration, RMS, mean |amplitude|, zero-crossing rate).  Compressed
    audio raises ``NotImplementedError``; ``fake=True`` emits the
    content-hash feature instead."""

    def __init__(self, fake: bool = False, seed: int = 13):
        self.fake = fake
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("media").to_pylist()
        if self.fake:
            f = np.stack([_fake_feature(b, 4, self.seed) for b in blobs])
            dur, rms, mean_abs, zcr = (f[:, 0] * 1e3), f[:, 1], f[:, 2], f[:, 3]
        else:
            rows = []
            for b in blobs:
                s, rate = decode_wav_pcm16(b)
                zc = (np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1]))
                      / max(len(s) - 1, 1))
                rows.append((len(s) / rate * 1e3,
                             float(np.sqrt(np.mean(s ** 2))) if len(s) else 0.0,
                             float(np.mean(np.abs(s))) if len(s) else 0.0, zc))
            dur, rms, mean_abs, zcr = map(np.array, zip(*rows))
        return pa.table({
            "media_id": batch.column("media_id"),
            "duration_ms": pa.array(dur.astype(np.float64)),
            "rms": pa.array(rms.astype(np.float64)),
            "mean_abs": pa.array(mean_abs.astype(np.float64)),
            "zero_crossing_rate": pa.array(zcr.astype(np.float64)),
        })


class SampleFrames:
    """Actor-pool stage: video -> every-``every_ms`` frame sample.

    The REAL path decodes uncompressed YUV4MPEG2 (y4m) with the pure-NumPy
    codec above, keeps frames on an exact integer stride
    ``max(1, every_ms * fps_num // (1000 * fps_den))``, and emits one row per
    sampled frame with its original ``frame_index``, exact integer ``ts_ms``
    and decoded ``mean_luma``.  Compressed containers (mp4/webm) raise
    ``NotImplementedError`` at decode (ffmpeg absent); ``fake=True`` derives
    the fan-out shape from ``duration_ms`` metadata without touching bytes.
    """

    def __init__(self, every_ms: int = 1000, fake: bool = False, seed: int = 12):
        self.every_ms = every_ms
        self.fake = fake
        self.seed = seed

    def _fake_rows(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        dur = batch.column("duration_ms").to_numpy(zero_copy_only=False)
        counts = np.maximum(dur // self.every_ms, 1).astype(np.int64)
        rep_ids = np.repeat(ids, counts)
        frame_idx = (np.concatenate([np.arange(c) for c in counts])
                     if len(counts) else np.array([], dtype=np.int64))
        return pa.table({
            "media_id": pa.array(rep_ids.astype(np.int64)),
            "frame_index": pa.array(frame_idx.astype(np.int64)),
            "ts_ms": pa.array((frame_idx * self.every_ms).astype(np.int64)),
            "mean_luma": pa.array(((rep_ids * 31 + frame_idx * 17) % 256)
                                  .astype(np.float64)),
        })

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.fake:
            return self._fake_rows(batch)
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        out_ids, out_idx, out_ts, out_luma = [], [], [], []
        for mid, blob in zip(ids.tolist(), batch.column("media").to_pylist()):
            frames, num, den = decode_y4m(blob)
            stride = max(1, self.every_ms * num // (1000 * den))
            idx = np.arange(0, len(frames), stride, dtype=np.int64)
            out_ids.append(np.full(len(idx), mid, dtype=np.int64))
            out_idx.append(idx)
            out_ts.append(idx * (1000 * den) // num)
            # exact: integer pixel sum (< 2^53) then one float64 division,
            # bit-identical to any oracle computing sum(v)/(w*h)
            sums = frames[idx].astype(np.int64).sum(axis=(1, 2))
            out_luma.append(sums / float(frames.shape[1] * frames.shape[2]))
        cat = (lambda xs, dt: np.concatenate(xs).astype(dt) if xs
               else np.array([], dtype=dt))
        return pa.table({
            "media_id": pa.array(cat(out_ids, np.int64)),
            "frame_index": pa.array(cat(out_idx, np.int64)),
            "ts_ms": pa.array(cat(out_ts, np.int64)),
            "mean_luma": pa.array(cat(out_luma, np.float64)),
        })


def synth_oracle_image_batch(batch: pa.Table) -> pa.Table:
    """doc_id -> real PPM media, deterministically: w = 8 + id%9,
    h = 8 + id%5, pixel(y, x, c) = (id*7 + x + 2y + 3c) mod 256.

    The formula is chosen so a SQL oracle can compute the decoded pixel
    statistics analytically from doc_id alone (no blobs in SQL) — the
    encode -> decode -> stats chain is then hash-verified end to end.
    """
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    blobs = []
    for a in ids.tolist():
        w, h = 8 + a % 9, 8 + a % 5
        y = np.arange(h)[:, None, None]
        x = np.arange(w)[None, :, None]
        c = np.arange(3)[None, None, :]
        img = ((a * 7 + x + 2 * y + 3 * c) % 256).astype(np.uint8)
        blobs.append(encode_ppm(img))
    return pa.table({
        "media_id": pa.array(ids.astype(np.int64)),
        "media": pa.array(blobs, type=pa.binary()),
    })


def synth_oracle_wav_batch(batch: pa.Table, sample_rate: int = 8000) -> pa.Table:
    """doc_id -> real WAV PCM16 media: n = 400 + (id%7)*50 samples of
    v_i = ((id*13 + i) mod 200 - 100) * 100 at ``sample_rate`` Hz — same
    SQL-oracle-able construction as synth_oracle_image_batch."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    blobs = []
    for a in ids.tolist():
        n = 400 + (a % 7) * 50
        i = np.arange(n)
        v = (((a * 13 + i) % 200 - 100) * 100).astype(np.int16)
        blobs.append(encode_wav_pcm16(v, sample_rate))
    return pa.table({
        "media_id": pa.array(ids.astype(np.int64)),
        "media": pa.array(blobs, type=pa.binary()),
    })


def synth_oracle_video_batch(batch: pa.Table) -> pa.Table:
    """doc_id -> real y4m media, deterministically: n_frames = 2 + id%4,
    w = 8 + id%5, h = 4 + id%3, luma(t, y, x) = (id*11 + 5t + x + 3y) mod 256
    at 4 fps — the same analytically-SQL-oracle-able construction as
    synth_oracle_image_batch (no blobs cross into SQL)."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    blobs = []
    for a in ids.tolist():
        nf, w, h = 2 + a % 4, 8 + a % 5, 4 + a % 3
        t = np.arange(nf)[:, None, None]
        y = np.arange(h)[None, :, None]
        x = np.arange(w)[None, None, :]
        frames = ((a * 11 + 5 * t + x + 3 * y) % 256).astype(np.uint8)
        blobs.append(encode_y4m(frames, fps=(4, 1)))
    return pa.table({
        "media_id": pa.array(ids.astype(np.int64)),
        "media": pa.array(blobs, type=pa.binary()),
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
