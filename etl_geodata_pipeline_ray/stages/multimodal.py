"""Multimodal (image/audio/video) columns as opaque binary + metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in
this container): ``DecodeImage(mode="real")`` raises
``NotImplementedError`` at the exact point a real decoder (PIL/ffmpeg)
would plug in, and ``mode="fake"`` parses the deterministic synthetic
header instead. Everything AROUND the stub is real and tested: Arrow
``binary`` schema, actor-pool ``map_batches`` with small batches (large
payloads → small ``batch_size`` so batch × concurrency fits worker
heaps), per-actor init, and the feature-table output layout.

Synthetic payload format (``synth_media_table``):
    magic 'GIMG' | u16 width | u16 height | u8 channels | pixel bytes
    (deterministic per media_id from a seeded generator)
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_MAGIC = b"GIMG"

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("n_frames", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 21) -> pa.Table:
    """Deterministic fake media rows (image-like payloads with a
    parseable header). No external data; payload sizes vary."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    kinds = ["image", "image", "image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % len(kinds)]
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        frames = 1 if kind == "image" else int(rng.integers(2, 8))
        px = rng.integers(0, 256, size=w * h * 3 * frames, dtype=np.uint8)
        payload = _MAGIC + struct.pack("<HHB", w, h, 3) + px.tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["n_frames"].append(frames)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeImage:
    """Actor-pool decode/feature-extract stage.

    ``mode="fake"``  — parse the synthetic header, compute cheap
                       deterministic features from the payload bytes.
    ``mode="real"``  — the integration point for a real decoder:
                       pass ``decoder`` = callable(payload bytes) ->
                       (width, height, px_mean, px_std). The seam's
                       CONTRACT (signature, batch layout, actor init)
                       is pinned by test_real_decoder_contract, so a
                       PIL/cv2-backed decoder drops in unchanged;
                       without one this raises NotImplementedError
                       (no image libs in this container).
    """

    def __init__(self, mode: str = "fake", decoder=None):
        self.mode = mode
        self.decoder = decoder

    def _features(self, payload: bytes) -> tuple[int, int, float, float]:
        if self.mode == "real":
            if self.decoder is not None:
                return self.decoder(payload)
            raise NotImplementedError(
                "real image decode requires PIL/cv2, not present in this "
                "container; pass decoder=callable(bytes)->(w,h,mean,std)"
            )
        if payload[:4] != _MAGIC:
            return 0, 0, float("nan"), float("nan")
        w, h, c = struct.unpack("<HHB", payload[4:9])
        px = np.frombuffer(payload[9:], dtype=np.uint8)
        return w, h, round(float(px.mean()), 4), round(float(px.std()), 4)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = [self._features(p) for p in batch["payload"]]
        if not feats:  # zip(*[]) unpacks to nothing on an empty block
            out = batch.drop(columns=["payload"])
            for c, dt in (("dec_width", np.int32), ("dec_height", np.int32),
                          ("px_mean", np.float64), ("px_std", np.float64),
                          ("aspect", np.float64)):
                out[c] = pd.Series([], dtype=dt)
            return out
        w, h, mean, std = map(np.asarray, zip(*feats))
        out = batch.drop(columns=["payload"])  # payload dropped after decode
        out["dec_width"] = w.astype(np.int32)
        out["dec_height"] = h.astype(np.int32)
        out["px_mean"] = mean
        out["px_std"] = std
        out["aspect"] = np.round(w / np.maximum(h, 1), 4)
        return out


class ResizeImage:
    """Actor-pool resize stage (task-brief multimodal op). ``fake``
    mode deterministically subsamples the synthetic payload's pixel
    grid to (target_w, target_h) and rewrites the header — a real
    PIL/cv2 resampler drops in via ``resizer`` = callable(payload,
    target_w, target_h) -> bytes, same seam contract as DecodeImage."""

    def __init__(self, target_w: int = 16, target_h: int = 16,
                 mode: str = "fake", resizer=None):
        self.tw, self.th = target_w, target_h
        self.mode = mode
        self.resizer = resizer

    def _resize(self, payload: bytes) -> bytes:
        if self.mode == "real":
            if self.resizer is not None:
                return self.resizer(payload, self.tw, self.th)
            raise NotImplementedError(
                "real resize requires PIL/cv2; pass resizer=callable"
            )
        if payload[:4] != _MAGIC:
            return payload
        w, h, c = struct.unpack("<HHB", payload[4:9])
        px = np.frombuffer(payload[9:], dtype=np.uint8)
        n_frames = max(1, len(px) // (w * h * c))
        grid = px[: n_frames * w * h * c].reshape(n_frames, h, w, c)
        yi = np.linspace(0, h - 1, self.th).round().astype(int)
        xi = np.linspace(0, w - 1, self.tw).round().astype(int)
        out = grid[:, yi][:, :, xi]  # nearest-neighbor subsample
        return _MAGIC + struct.pack("<HHB", self.tw, self.th, c) + out.tobytes()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["payload"] = [self._resize(p) for p in batch["payload"]]
        batch["width"] = np.int32(self.tw)
        batch["height"] = np.int32(self.th)
        return batch


class FrameSampler:
    """Video-path stub: emits one row per sampled frame index (every
    ``stride``-th frame) without decoding; shows the flat_map layout."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized repeat/arange expansion — no per-row iteration
        nf = batch["n_frames"].to_numpy().astype(np.int64)
        reps = (nf + self.stride - 1) // self.stride
        media = np.repeat(batch["media_id"].to_numpy(), reps)
        ends = reps.cumsum()
        offsets = np.arange(int(ends[-1]) if len(ends) else 0) - np.repeat(ends - reps, reps)
        return pd.DataFrame(
            {"media_id": media, "frame_idx": (offsets * self.stride).astype(np.int64)}
        )


def media_feature_pipeline(n: int = 64, seed: int = 21) -> ray.data.Dataset:
    """Reference pipeline: synth media → actor-pool decode stub →
    feature table. Small batch_size on purpose: binary payloads are
    wide, so batch × concurrency stays within worker heaps."""
    ds = ray.data.from_arrow(synth_media_table(n, seed))
    return ds.map_batches(
        DecodeImage, batch_format="pandas", batch_size=8, concurrency=(1, 4)
    )
