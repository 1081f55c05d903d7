"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Decode kernels, by format:

- **PNG — REAL decoder** (`PngCodec`): full chunk parse, zlib inflate,
  scanline unfilter (all five PNG filter types), pixel recovery —
  pure stdlib (zlib/struct), no PIL needed. The attach stage writes
  real spec-conformant PNGs; the decode stage recovers the exact pixel
  array (round-trip asserted in tests).
- **WAV/PCM audio — REAL decoder** (`WavCodec`): RIFF header parse via
  the stdlib ``wave`` module, int16 frame decode, duration + RMS
  feature extraction. Attach writes real playable WAV bytes.
- **Video — STUB** (`FrameSampler` over `FVID` fake payloads): no
  ffmpeg in this container; the frame-sampling plumbing (binary
  explode, stride, actor pool) is real and a deployment swaps
  ``_frames_of`` for the library call.

Everything around the kernels — binary column schema, actor-pool stage
shape, small batch size for large payloads, output layout — is the
real Ray-side plumbing and is tested.
"""

from __future__ import annotations

import struct
import zlib

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


# ------------------------------------------------ REAL PNG codec (stdlib)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


class PngCodec:
    """Real PNG encode/decode in pure stdlib (zlib + struct).

    Encoder emits spec-conformant 8-bit RGB PNGs (filter type 0 per
    scanline, correct CRCs); the decoder handles ANY baseline
    non-interlaced 8-bit RGB/RGBA/grayscale PNG including all five
    scanline filter types (None/Sub/Up/Average/Paeth) — i.e. it decodes
    foreign PNGs too, not just its own output. Used as an actor-pool
    ``__call__`` stage: per-actor state is just method dispatch, but the
    class shape is where a GPU/SIMD decoder would hold its context.
    """

    _CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples/pixel

    @staticmethod
    def _chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    @classmethod
    def encode(cls, pixels: np.ndarray) -> bytes:
        """(h, w, 3) uint8 → PNG bytes (8-bit RGB, filter 0)."""
        h, w, _ = pixels.shape
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
        return (_PNG_SIG + cls._chunk(b"IHDR", ihdr)
                + cls._chunk(b"IDAT", zlib.compress(raw, 6))
                + cls._chunk(b"IEND", b""))

    @classmethod
    def decode(cls, data: bytes) -> tuple[int, int, int, np.ndarray]:
        """PNG bytes → (width, height, channels, (h, w, c) uint8)."""
        if data[:8] != _PNG_SIG:
            raise ValueError("not a PNG (bad signature)")
        pos, idat, meta = 8, [], None
        while pos < len(data):
            (ln,) = struct.unpack(">I", data[pos:pos + 4])
            tag = data[pos + 4:pos + 8]
            body = data[pos + 8:pos + 8 + ln]
            if tag == b"IHDR":
                w, h, depth, color, _, _, interlace = struct.unpack(
                    ">IIBBBBB", body)
                if depth != 8 or interlace != 0 or color not in cls._CHANNELS:
                    raise NotImplementedError(
                        f"baseline 8-bit non-interlaced only "
                        f"(depth={depth}, color={color})")
                meta = (w, h, cls._CHANNELS[color])
            elif tag == b"IDAT":
                idat.append(body)
            elif tag == b"IEND":
                break
            pos += 12 + ln
        if meta is None:
            raise ValueError("PNG missing IHDR")
        w, h, c = meta
        raw = zlib.decompress(b"".join(idat))
        stride = w * c
        rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
        fts = rows[:, 0]
        lines = rows[:, 1:]
        if not fts.any():  # all filter 0 (our own encoder's output):
            return w, h, c, lines.copy().reshape(h, w, c)
        if (bad := fts[fts > 4]).size:
            raise ValueError(f"bad PNG filter type {int(bad[0])}")
        # Sub is an exact per-channel modular prefix sum (uint8 cumsum
        # wraps mod 256); Up is one vectorized add. Average/Paeth have a
        # true sequential dependence along the scanline — those run as
        # plain-list inner loops (several times faster than per-element
        # numpy indexing); a SIMD/C codec is the production stand-in for
        # exactly those two branches.
        out = np.zeros((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for y in range(h):
            ft = fts[y]
            f = lines[y]
            if ft == 0:
                line = f.copy()
            elif ft == 1:  # Sub
                line = f.reshape(-1, c).cumsum(
                    axis=0, dtype=np.uint8).reshape(-1)
            elif ft == 2:  # Up
                line = f + prev  # uint8 wraparound == mod-256 add
            elif ft == 3:  # Average
                lf, lp, lr = f.tolist(), prev.tolist(), [0] * stride
                for x in range(c):
                    lr[x] = (lf[x] + (lp[x] >> 1)) & 0xFF
                for x in range(c, stride):
                    lr[x] = (lf[x] + ((lr[x - c] + lp[x]) >> 1)) & 0xFF
                line = np.array(lr, dtype=np.uint8)
            else:  # Paeth
                lf, lp, lr = f.tolist(), prev.tolist(), [0] * stride
                for x in range(c):
                    lr[x] = (lf[x] + lp[x]) & 0xFF  # a=cc=0 → predictor b
                for x in range(c, stride):
                    a = lr[x - c]
                    b = lp[x]
                    cc = lp[x - c]
                    p = a + b - cc
                    pa_, pb, pcc = abs(p - a), abs(p - b), abs(p - cc)
                    pr = a if pa_ <= pb and pa_ <= pcc else \
                        (b if pb <= pcc else cc)
                    lr[x] = (lf[x] + pr) & 0xFF
                line = np.array(lr, dtype=np.uint8)
            out[y] = line
            prev = line
        return w, h, c, out.reshape(h, w, c)

    def __call__(self, t: pa.Table) -> pa.Table:
        dims, sums = [], []
        for p in t["image"]:
            w, h, c, px = self.decode(p.as_py())
            dims.append((w, h, c))
            sums.append(int(px.sum()))
        w, h, c = (np.array(x, dtype=np.int64) for x in zip(*dims))
        return pa.table({
            "doc_id": t["doc_id"],
            "width": pa.array(w), "height": pa.array(h),
            "channels": pa.array(c),
            "pixel_sum": pa.array(sums, pa.int64()),
            "n_bytes": pc.cast(pc.binary_length(t["image"]), pa.int64()),
        })


def encode_png_for_doc(doc_id: int) -> tuple[bytes, np.ndarray]:
    """Deterministic small RGB image for a doc → (png bytes, pixels)."""
    w = 8 + (doc_id * 7) % 24
    h = 8 + (doc_id * 13) % 16
    rng = np.random.RandomState(doc_id % (2**31))
    px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    return PngCodec.encode(px), px


# ------------------------------------------------ REAL WAV codec (stdlib)


class WavCodec:
    """Real PCM WAV encode/decode via the stdlib ``wave`` module: attach
    writes playable 8 kHz mono int16 audio; decode extracts duration
    and RMS energy — the feature-extraction stage an audio-quality
    filter in a training-data pipeline runs."""

    RATE = 8000

    @classmethod
    def encode(cls, doc_id: int) -> bytes:
        import io
        import wave

        n = 200 + (doc_id * 37) % 600  # 25-100 ms
        freq = 100.0 + (doc_id % 40) * 20.0
        ts = np.arange(n) / cls.RATE
        amp = 0.1 + (doc_id % 8) * 0.1
        samples = (np.sin(2 * np.pi * freq * ts) * amp * 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wv:
            wv.setnchannels(1)
            wv.setsampwidth(2)
            wv.setframerate(cls.RATE)
            wv.writeframes(samples.tobytes())
        return buf.getvalue()

    @staticmethod
    def decode(data: bytes) -> tuple[int, int, float]:
        """WAV bytes → (n_samples, rate, rms in [0, 1])."""
        import io
        import wave

        with wave.open(io.BytesIO(data), "rb") as wv:
            n = wv.getnframes()
            rate = wv.getframerate()
            pcm = np.frombuffer(wv.readframes(n), dtype="<i2")
        rms = float(np.sqrt(np.mean((pcm / 32768.0) ** 2))) if n else 0.0
        return n, rate, rms

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = [self.decode(p.as_py()) for p in t["audio"]]
        n, rate, rms = zip(*rows)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_samples": pa.array(n, pa.int64()),
            "duration_ms": pa.array(
                [int(x * 1000 / r) for x, r in zip(n, rate)], pa.int64()),
            "rms_e4": pa.array([int(round(x * 10000)) for x in rms],
                               pa.int64()),
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


class _PngDecodeKeep(PngCodec):
    """REAL PNG decode that passes the audio/video payloads through."""

    def __call__(self, t: pa.Table) -> pa.Table:
        meta = super().__call__(t)
        return (meta.append_column("audio", t["audio"])
                .append_column("video", t["video"]))


class _WavDecodeKeep(WavCodec):
    """REAL WAV decode that carries the image metadata + video along."""

    KEEP = ("width", "height", "channels", "pixel_sum", "n_bytes", "video")

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = super().__call__(t)
        for c in self.KEEP:
            feats = feats.append_column(c, t[c])
        return feats


class _FrameSamplerKeepMeta(FrameSampler):
    """Frame sampler that carries per-doc image/audio metadata onto
    every emitted frame row (vectorized index_in + take against the
    batch's own doc rows)."""

    META_COLS = ("width", "height", "channels", "pixel_sum", "n_bytes",
                 "n_samples", "duration_ms", "rms_e4")

    def __call__(self, t: pa.Table) -> pa.Table:
        frames = super().__call__(t.select(["doc_id", "video"]))
        keys = t["doc_id"].combine_chunks()
        idx = pc.index_in(frames["doc_id"], value_set=keys)
        for c in self.META_COLS:
            frames = frames.append_column(c, pc.take(t[c].combine_chunks(), idx))
        return frames


@register(
    "multimodal_pipeline",
    # the attach kernels are deterministic closed forms of doc_id, so
    # the decode outputs ARE DuckDB-expressible: frame indexes, image
    # dims and audio duration check value-for-value against SQL. The
    # non-closed-form outputs (pixel_sum, rms, png bytes, raw frames)
    # stay in the unregistered pipeline surface, pinned by the
    # roundtrip/RMS pytest suite.
    """WITH m AS (
           SELECT doc_id,
                  8 + (doc_id * 5) % 56 AS n_frames,
                  8 + (doc_id * 7) % 24 AS width,
                  8 + (doc_id * 13) % 16 AS height,
                  200 + (doc_id * 37) % 600 AS n_samples
           FROM documents
       )
       SELECT m.doc_id,
              CAST(8 * g.i AS BIGINT) AS frame_index,
              CAST(m.width AS BIGINT) AS width,
              CAST(m.height AS BIGINT) AS height,
              CAST(3 AS BIGINT) AS channels,
              CAST(m.n_samples AS BIGINT) AS n_samples,
              CAST((m.n_samples * 1000) // 8000 AS BIGINT) AS duration_ms
       FROM m, generate_series(0, 7) AS g(i)
       WHERE 8 * g.i < m.n_frames""",
)
def multimodal_pipeline(sf_dir: str):
    """End-to-end multimodal pipeline (T12) — VALUE-LEVEL oracle: the
    registered output projects :func:`multimodal_frames_full` to the
    decode outputs that are closed forms of doc_id (frame indexes,
    decoded image dims, audio sample count/duration), checked
    cell-for-cell against DuckDB."""
    frames = multimodal_frames_full(sf_dir)
    return frames.select_columns(["doc_id", "frame_index", "width",
                                  "height", "channels", "n_samples",
                                  "duration_ms"])


def multimodal_frames_full(sf_dir: str):
    """Attach a REAL PNG image, a REAL WAV audio clip and a (stub)
    video payload per document, decode image pixels and audio features
    through chained actor-pool stages, then explode sampled video
    frames with all per-doc metadata (incl. the raw frame payload,
    pixel sums and RMS energy) carried per frame — the layout a
    caption/embedding stage downstream would consume. PNG + WAV
    decoding is real (pure stdlib, see module docstring); only the
    video kernel is stubbed. Unregistered full surface (binary frames
    and non-closed-form features aren't SQL-expressible); pytest pins
    the frame payloads + metadata carry."""
    ds = read(sf_dir, "documents", ["doc_id"])

    def _attach(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        imgs = [encode_png_for_doc(i)[0] for i in ids]
        auds = [WavCodec.encode(i) for i in ids]
        vids = [encode_fake_video(i) for i in ids]
        return pa.table({"doc_id": t["doc_id"],
                         "image": pa.array(imgs, pa.binary()),
                         "audio": pa.array(auds, pa.binary()),
                         "video": pa.array(vids, pa.binary())})

    withm = ds.map_batches(_attach, batch_format="pyarrow")
    # fractional num_cpus: three chained actor pools at full-CPU
    # reservations would starve the read/attach tasks on small sessions
    # (4-CPU pytest fixture)
    img = withm.map_batches(_PngDecodeKeep, batch_format="pyarrow",
                            batch_size=128, concurrency=2, num_cpus=0.5)
    aud = img.map_batches(_WavDecodeKeep, batch_format="pyarrow",
                          batch_size=128, concurrency=2, num_cpus=0.5)
    return aud.map_batches(_FrameSamplerKeepMeta, batch_format="pyarrow",
                           batch_size=128, concurrency=2, num_cpus=0.5)
