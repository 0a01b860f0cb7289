"""Multimodal columns: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a small typed
header; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. The actual codec libraries (PIL/ffmpeg/torchaudio)
are NOT in this container, so the codec call is stubbed: payloads use a
deterministic fake container format (``NACR`` magic + struct header + raw
bytes) that the stages parse for real — schema handling, batch sizing, actor
state and output layout are the genuine Ray-side plumbing; only the
pixel/sample decode is fake. A real deployment swaps ``_decode_payload`` for
PIL/ffmpeg and nothing else changes.

Payload layout (little-endian): ``b"NACR"| kind:u8 | width:u16 | height:u16 |
channels:u8 | n_frames:u16 | payload bytes``.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
from ray.data import Dataset

_MAGIC = b"NACR"
_HEADER = struct.Struct("<4sBHHBH")
KINDS = {0: "image", 1: "audio", 2: "video"}


def encode_media(kind: int, width: int, height: int, channels: int,
                 n_frames: int, payload: bytes) -> bytes:
    return _HEADER.pack(_MAGIC, kind, width, height, channels, n_frames) + payload


def make_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table (media_id, kind, blob)."""
    rng = np.random.RandomState(seed)
    ids, kinds, blobs = [], [], []
    for i in range(n):
        kind = int(rng.randint(0, 3))
        w, h, c = int(rng.randint(8, 64)), int(rng.randint(8, 64)), 3
        frames = int(rng.randint(1, 16)) if kind == 2 else 1
        payload = rng.bytes(min(w * h, 256))
        ids.append(i)
        kinds.append(KINDS[kind])
        blobs.append(encode_media(kind, w, h, c, frames, payload))
    return pa.table({
        "media_id": pa.array(ids, type=pa.int64()),
        "kind": pa.array(kinds, type=pa.string()),
        "blob": pa.array(blobs, type=pa.binary()),
    })


def _decode_payload(blob: bytes) -> dict:
    """STUB decode: parses the deterministic fake container header.

    A real build replaces this body with PIL.Image.open / ffmpeg probe; the
    function contract (bytes → typed metadata dict) is the stable interface.
    """
    magic, kind, w, h, c, frames = _HEADER.unpack_from(blob)
    if magic != _MAGIC:
        raise NotImplementedError(
            "real codec decode not available in this container; "
            "payload is not in the NACR fake-container format"
        )
    return {"kind_id": kind, "width": w, "height": h, "channels": c,
            "n_frames": frames, "payload_bytes": len(blob) - _HEADER.size}


class MediaDecodeStage:
    """Actor: blob → typed metadata columns. State = (stub) codec handle.

    Use small ``batch_size`` for large binary payloads — a batch ×
    concurrency must fit the worker heap (SURVEY.md §4 memory notes).
    """

    def __init__(self):
        self.decoder = _decode_payload  # real build: load codec once here

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [self.decoder(b) for b in batch["blob"].to_pylist()]
        out = batch.drop_columns(["blob"])
        for name, typ in [("width", pa.int32()), ("height", pa.int32()),
                          ("channels", pa.int32()), ("n_frames", pa.int32()),
                          ("payload_bytes", pa.int64())]:
            out = out.append_column(name, pa.array([m[name] for m in metas], type=typ))
        return out


class MediaResizeStage:
    """Actor: deterministic 'resize' — rewrites the header to target dims and
    truncates the payload proportionally (stub for a pixel resampler)."""

    def __init__(self, target_w: int = 16, target_h: int = 16):
        self.tw, self.th = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_blobs = []
        for blob in batch["blob"].to_pylist():
            magic, kind, w, h, c, frames = _HEADER.unpack_from(blob)
            payload = blob[_HEADER.size:]
            scale = (self.tw * self.th) / max(1, w * h)
            cut = max(1, int(len(payload) * min(1.0, scale)))
            out_blobs.append(encode_media(kind, self.tw, self.th, c, frames, payload[:cut]))
        return batch.set_column(
            batch.schema.get_field_index("blob"), "blob",
            pa.array(out_blobs, type=pa.binary()),
        )


class FrameSampleStage:
    """Actor: video blob → one row per sampled frame (every ``stride``-th)."""

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames_out, kinds = [], [], []
        for mid, kind, blob in zip(batch["media_id"].to_pylist(),
                                   batch["kind"].to_pylist(),
                                   batch["blob"].to_pylist()):
            meta = _decode_payload(blob)
            if kind != "video":
                continue
            for f in range(0, meta["n_frames"], self.stride):
                ids.append(mid)
                frames_out.append(f)
                kinds.append(kind)
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(frames_out, type=pa.int32()),
            "kind": pa.array(kinds, type=pa.string()),
        })


def media_metadata(media: Dataset) -> Dataset:
    """media table → decoded metadata (actor pool, small batches)."""
    return media.map_batches(MediaDecodeStage, batch_format="pyarrow",
                             batch_size=64, concurrency=(1, 4), num_cpus=1)
