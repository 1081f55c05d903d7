"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Real decode libraries (PIL/ffmpeg) are not in this container, so the
DECODE KERNEL IS A STUB (`FakeImageDecoder` parses a deterministic
12-byte header; a real deployment swaps `_decode_one` for the library
call). Everything around it — binary column schema, actor-pool stage
shape, small batch size for large payloads, output layout — is the real
Ray-side plumbing and is tested.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from etl_ray.pipelines._qutil import read
from etl_ray.pipelines.queries import register

MAGIC = b"FIMG"


def encode_fake_image(doc_id: int, text: str) -> bytes:
    """Deterministic fake image payload: 12-byte header + pseudo-pixels.

    Header: MAGIC, width:uint16, height:uint16, channels:uint32.
    """
    w = 16 + (doc_id * 7) % 48
    h = 16 + (doc_id * 13) % 32
    header = MAGIC + struct.pack("<HHI", w, h, 3)
    rng = np.random.RandomState(doc_id % (2**31))
    body = rng.randint(0, 256, min(w * h * 3, 4096), dtype=np.uint8).tobytes()
    return header + body


class FakeImageDecoder:
    """Actor-pool decode stage (STUB — see module docstring).

    __init__ is where a real decoder loads its library/model once per
    actor; __call__ decodes a batch. Batches are kept small
    (batch_size≤256) because each row carries a binary payload.
    """

    def __init__(self):
        self.magic = MAGIC  # stands in for expensive library init

    def _decode_one(self, payload: bytes) -> tuple[int, int, int]:
        if payload[:4] != self.magic:
            raise NotImplementedError(
                "real image decoding not available in this environment; "
                "only FIMG fake payloads are supported")
        w, h, c = struct.unpack("<HHI", payload[4:12])
        return w, h, c

    def __call__(self, t: pa.Table) -> pa.Table:
        dims = [self._decode_one(p.as_py()) for p in t["image"]]
        w, h, c = (np.array(x, dtype=np.int64) for x in zip(*dims))
        sizes = pa.array([len(p.as_py()) for p in t["image"]], pa.int64())
        return pa.table({
            "doc_id": t["doc_id"],
            "width": pa.array(w),
            "height": pa.array(h),
            "channels": pa.array(c),
            "n_bytes": sizes,
        })


VIDEO_MAGIC = b"FVID"
FRAME_BYTES = 64


def encode_fake_video(doc_id: int) -> bytes:
    """Deterministic fake video payload: 8-byte header (magic +
    uint32 frame count) + n_frames × FRAME_BYTES pseudo-frames."""
    n_frames = 8 + (doc_id * 5) % 56
    rng = np.random.RandomState((doc_id * 31) % (2**31))
    body = rng.randint(0, 256, n_frames * FRAME_BYTES,
                       dtype=np.uint8).tobytes()
    return VIDEO_MAGIC + struct.pack("<I", n_frames) + body


class FrameSampler:
    """Actor-pool frame-sampling stage (STUB decode — real ffmpeg swap
    point is `_frames_of`): emits every k-th frame as its own row
    (binary column explode), the layout a caption/embedding stage
    downstream would consume. Small batch_size — each row is a payload.
    """

    def __init__(self, stride: int = 8):
        self.stride = stride

    def _frames_of(self, payload: bytes) -> list[bytes]:
        if payload[:4] != VIDEO_MAGIC:
            raise NotImplementedError("only FVID fake payloads supported "
                                      "in this environment")
        (n,) = struct.unpack("<I", payload[4:8])
        body = payload[8:]
        return [body[i * FRAME_BYTES:(i + 1) * FRAME_BYTES]
                for i in range(0, n, self.stride)]

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for doc_id, payload in zip(t["doc_id"].to_pylist(),
                                   t["video"].to_pylist()):
            for j, fr in enumerate(self._frames_of(payload)):
                ids.append(doc_id)
                fidx.append(j * self.stride)
                frames.append(fr)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "frame_index": pa.array(fidx, pa.int64()),
            "frame": pa.array(frames, pa.binary()),
        })


def multimodal_frame_sample(sf_dir: str):
    """Video-column pipeline: attach fake video payloads, explode every
    8th frame via an actor pool. Rows-only oracle (deterministic count:
    sum over docs of ceil(n_frames/8))."""
    ds = read(sf_dir, "documents", ["doc_id"])

    def _attach(t: pa.Table) -> pa.Table:
        payloads = [encode_fake_video(i) for i in t["doc_id"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "video": pa.array(payloads, pa.binary())})

    with_vid = ds.map_batches(_attach, batch_format="pyarrow")
    return with_vid.map_batches(FrameSampler, batch_format="pyarrow",
                                batch_size=128, concurrency=2)


def multimodal_decode(sf_dir: str):
    """Binary-column pipeline: attach fake payloads, decode via actor
    pool, emit typed metadata. Rows-only oracle (decode is a stub)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def _attach(t: pa.Table) -> pa.Table:
        payloads = [encode_fake_image(i, s)
                    for i, s in zip(t["doc_id"].to_pylist(),
                                    t["text"].to_pylist())]
        return pa.table({"doc_id": t["doc_id"],
                         "image": pa.array(payloads, pa.binary())})

    with_img = ds.map_batches(_attach, batch_format="pyarrow")
    return with_img.map_batches(FakeImageDecoder, batch_format="pyarrow",
                                batch_size=256, concurrency=2)


class _DecoderKeepVideo(FakeImageDecoder):
    """Image decode that passes the video payload column through."""

    def __call__(self, t: pa.Table) -> pa.Table:
        return super().__call__(t).append_column("video", t["video"])


class _FrameSamplerKeepMeta(FrameSampler):
    """Frame sampler that carries per-doc image metadata onto every
    emitted frame row (vectorized index_in + take against the batch's
    own doc rows)."""

    META_COLS = ("width", "height", "channels", "n_bytes")

    def __call__(self, t: pa.Table) -> pa.Table:
        frames = super().__call__(t.select(["doc_id", "video"]))
        keys = t["doc_id"].combine_chunks()
        idx = pc.index_in(frames["doc_id"], value_set=keys)
        for c in self.META_COLS:
            frames = frames.append_column(c, pc.take(t[c].combine_chunks(), idx))
        return frames


@register("multimodal_pipeline")
def multimodal_pipeline(sf_dir: str):
    """End-to-end multimodal pipeline (T12): attach image + video binary
    payloads, decode image metadata (actor pool, STUB kernel), then
    explode sampled frames with the metadata carried per frame — the
    layout a caption/embedding stage downstream would consume.
    Rows-only oracle (deterministic frame count)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def _attach(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        imgs = [encode_fake_image(i, s)
                for i, s in zip(ids, t["text"].to_pylist())]
        vids = [encode_fake_video(i) for i in ids]
        return pa.table({"doc_id": t["doc_id"],
                         "image": pa.array(imgs, pa.binary()),
                         "video": pa.array(vids, pa.binary())})

    withm = ds.map_batches(_attach, batch_format="pyarrow")
    # fractional num_cpus: two chained actor pools at full-CPU
    # reservations starve the read/attach tasks on small sessions
    # (4-CPU pytest fixture) — the pools are I/O-light stub decoders
    dec = withm.map_batches(_DecoderKeepVideo, batch_format="pyarrow",
                            batch_size=128, concurrency=2, num_cpus=0.5)
    return dec.map_batches(_FrameSamplerKeepMeta, batch_format="pyarrow",
                           batch_size=128, concurrency=2, num_cpus=0.5)
