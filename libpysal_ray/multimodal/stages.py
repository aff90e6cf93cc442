"""Multimodal columns — image/audio payloads as opaque binary + typed
metadata, processed by actor-pool ``map_batches`` stages.

The image/audio codec libraries are not in this container, so the DECODE
kernels are deterministic fakes (documented below); everything Ray-side is
real and tested: the binary column schema, the broadcast-once model/config
state in actor ``__init__``, small batch sizes for wide payloads, the
fixed-shape ndarray output layout (flat float32 + shape columns — the
Arrow-friendly tensor encoding), and the per-stage resource hints.

Fake-decode contract (so tests are exact): an "image" payload is the bytes
of ``b"IMG" + height:uint16 + width:uint16 + seed:uint32``; the decoded
pixel array is ``splitmix64`` noise seeded by (seed, pixel index), shaped
(h, w). An "audio" payload is ``b"AUD" + n_samples:uint32 + seed:uint32``
→ 1-D waveform. A real deployment swaps ``_decode_payload`` for
PIL/libsndfile and nothing else changes.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data

from libpysal_ray.core.hashing import splitmix64

_MAX_DECODED = 1 << 22  # 4M elements — refuse absurd payload headers


def fake_image_bytes(h: int, w: int, seed: int) -> bytes:
    return b"IMG" + struct.pack("<HHI", h, w, seed)


def fake_audio_bytes(n: int, seed: int) -> bytes:
    return b"AUD" + struct.pack("<II", n, seed)


def fake_video_bytes(nf: int, h: int, w: int, seed: int) -> bytes:
    return b"VID" + struct.pack("<HHHI", nf, h, w, seed)


def _noise(n: int, seed: int) -> np.ndarray:
    idx = np.arange(n, dtype=np.uint64) + (np.uint64(seed) << np.uint64(32))
    return (splitmix64(idx) >> np.uint64(40)).astype(np.float32) / 16777216.0


def _decode_payload(raw: bytes) -> tuple[np.ndarray, tuple[int, ...]]:
    """THE stub: replace with PIL.Image.open / soundfile.read in a real
    deployment. Raises NotImplementedError for real codec magic bytes."""
    if raw[:3] == b"IMG":
        h, w, seed = struct.unpack("<HHI", raw[3:11])
        if h * w > _MAX_DECODED:
            raise ValueError("image too large")
        return _noise(h * w, seed), (h, w)
    if raw[:3] == b"AUD":
        n, seed = struct.unpack("<II", raw[3:11])
        if n > _MAX_DECODED:
            raise ValueError("audio too long")
        return _noise(n, seed), (n,)
    if raw[:3] == b"VID":
        nf, h, w, seed = struct.unpack("<HHHI", raw[3:13])
        if nf * h * w > _MAX_DECODED:
            raise ValueError("video too large")
        return _noise(nf * h * w, seed), (nf, h, w)
    raise NotImplementedError(
        "real image/audio codecs are not available in this environment; "
        "payload must use the deterministic fake encoding"
    )


class ImageDecoder:
    """Actor-pool stage: (id, media: binary) → (id, pixels: list<float>,
    h, w). Decoder state (codec config) is built once per actor."""

    def __init__(self, media_col: str = "media", id_col: str = "doc_id"):
        self.media_col = media_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, flat, offs, hs, ws = [], [], [0], [], []
        for i, raw in enumerate(t.column(self.media_col).to_pylist()):
            arr, shape = _decode_payload(raw)
            flat.append(arr)
            offs.append(offs[-1] + len(arr))
            hs.append(shape[0])
            ws.append(shape[1] if len(shape) > 1 else 1)
        vals = np.concatenate(flat) if flat else np.empty(0, np.float32)
        pixels = pa.ListArray.from_arrays(
            pa.array(np.asarray(offs, np.int32)), pa.array(vals)
        )
        return pa.table(
            {
                self.id_col: t.column(self.id_col),
                "pixels": pixels,
                "h": pa.array(np.asarray(hs, np.int32)),
                "w": pa.array(np.asarray(ws, np.int32)),
            }
        )


class ImageResizer:
    """Actor-pool stage: nearest-neighbor resize to (out_h, out_w) —
    vectorized gather per image; real resampling would swap the kernel."""

    def __init__(self, out_h: int, out_w: int, id_col: str = "doc_id"):
        self.oh, self.ow = out_h, out_w
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        pix = t.column("pixels")
        if isinstance(pix, pa.ChunkedArray):
            pix = pix.combine_chunks()
        hs = t.column("h").to_numpy(zero_copy_only=False).astype(np.int64)
        ws = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        poffs = np.asarray(pix.offsets, dtype=np.int64)
        starts = (poffs - poffs[0])[:-1]
        flat = pix.flatten().to_numpy(zero_copy_only=False)
        # one broadcast gather for the whole batch (no per-image Python):
        # idx[i, r, c] = start_i + (r*h_i // oh)*w_i + (c*w_i // ow)
        ri = (np.arange(self.oh)[None, :] * hs[:, None]) // self.oh
        ci = (np.arange(self.ow)[None, :] * ws[:, None]) // self.ow
        idx = (
            starts[:, None, None]
            + ri[:, :, None] * ws[:, None, None]
            + ci[:, None, :]
        )
        out = flat[idx.reshape(t.num_rows, -1)].astype(np.float32)
        offs = np.arange(t.num_rows + 1, dtype=np.int32) * (self.oh * self.ow)
        return pa.table(
            {
                self.id_col: t.column(self.id_col),
                "pixels": pa.ListArray.from_arrays(
                    pa.array(offs), pa.array(out.ravel())
                ),
                "h": pa.array(np.full(t.num_rows, self.oh, np.int32)),
                "w": pa.array(np.full(t.num_rows, self.ow, np.int32)),
            }
        )


class AudioFrameSampler:
    """Actor-pool stage: decode audio + take every ``stride``-th sample."""

    def __init__(self, stride: int = 4, media_col: str = "media",
                 id_col: str = "doc_id"):
        self.stride = stride
        self.media_col = media_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids_out, flat, offs = [], [], [0]
        for raw in t.column(self.media_col).to_pylist():
            arr, _ = _decode_payload(raw)
            s = arr[:: self.stride]
            flat.append(s)
            offs.append(offs[-1] + len(s))
        vals = np.concatenate(flat) if flat else np.empty(0, np.float32)
        return pa.table(
            {
                self.id_col: t.column(self.id_col),
                "frames": pa.ListArray.from_arrays(
                    pa.array(np.asarray(offs, np.int32)), pa.array(vals)
                ),
            }
        )


class VideoFrameSampler:
    """Actor-pool stage: decode video + keep every ``stride``-th FRAME,
    emitting the flat float32 samples plus (n_frames_kept, h, w) shape
    columns — the Arrow-friendly tensor layout shared with ImageDecoder.
    A real deployment swaps the decode for pyav/ffmpeg frame extraction;
    the Ray plumbing (actor state, small batches for wide payloads,
    per-frame stride selection) is the real thing."""

    def __init__(self, stride: int = 2, media_col: str = "media",
                 id_col: str = "doc_id"):
        self.stride = stride
        self.media_col = media_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        flat, offs = [], [0]
        nfk, hh, ww = [], [], []
        for raw in t.column(self.media_col).to_pylist():
            arr, shape = _decode_payload(raw)
            nf, h, w = shape
            frames = arr.reshape(nf, h * w)[:: self.stride]
            flat.append(frames.ravel())
            offs.append(offs[-1] + frames.size)
            nfk.append(frames.shape[0])
            hh.append(h)
            ww.append(w)
        vals = np.concatenate(flat) if flat else np.empty(0, np.float32)
        return pa.table(
            {
                self.id_col: t.column(self.id_col),
                "frames": pa.ListArray.from_arrays(
                    pa.array(np.asarray(offs, np.int32)), pa.array(vals)
                ),
                "n_frames": pa.array(np.asarray(nfk, np.int64)),
                "height": pa.array(np.asarray(hh, np.int64)),
                "width": pa.array(np.asarray(ww, np.int64)),
            }
        )


def attach_fake_media(
    ds: ray.data.Dataset, kind: str = "image", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Append a deterministic binary ``media`` column derived from the id —
    the test/bench source for the multimodal stages."""

    def _mk(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if kind == "image":
            payload = [
                fake_image_bytes(16 + int(i) % 17, 16 + int(i) % 13, int(i))
                for i in ids
            ]
        elif kind == "video":
            payload = [
                fake_video_bytes(
                    8 + int(i) % 9, 8 + int(i) % 5, 8 + int(i) % 7, int(i)
                )
                for i in ids
            ]
        else:
            payload = [
                fake_audio_bytes(256 + int(i) % 301, int(i)) for i in ids
            ]
        return t.append_column(
            "media", pa.array(payload, pa.large_binary())
        )

    return ds.map_batches(_mk, batch_format="pyarrow")


def decode_images(
    ds: ray.data.Dataset,
    concurrency: int | tuple = (2, 8),
    batch_size: int = 256,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Wide binary payloads ⇒ SMALL batches (batch_size × concurrency must
    fit worker heap), actor pool for decoder state."""
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_images(
    ds: ray.data.Dataset,
    out_h: int = 8,
    out_w: int = 8,
    concurrency: int | tuple = (2, 8),
    batch_size: int = 256,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    return ds.map_batches(
        ImageResizer,
        fn_constructor_args=(out_h, out_w),
        fn_constructor_kwargs={"id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_audio_frames(
    ds: ray.data.Dataset,
    stride: int = 4,
    concurrency: int | tuple = (2, 8),
    batch_size: int = 256,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    return ds.map_batches(
        AudioFrameSampler,
        fn_constructor_args=(stride,),
        fn_constructor_kwargs={"id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_video_frames(
    ds: ray.data.Dataset,
    stride: int = 2,
    concurrency: int | tuple = (2, 8),
    batch_size: int = 128,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Video payloads are the widest — smaller batches than image/audio."""
    return ds.map_batches(
        VideoFrameSampler,
        fn_constructor_args=(stride,),
        fn_constructor_kwargs={"id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def extract_features(
    ds: ray.data.Dataset, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Stateless feature stage over decoded pixels: mean/std/p95 per image
    (the batched-model-inference slot — a real model swaps in here)."""

    def _f(t: pa.Table) -> pa.Table:
        pix = t.column("pixels")
        if isinstance(pix, pa.ChunkedArray):
            pix = pix.combine_chunks()
        poffs = np.asarray(pix.offsets, dtype=np.int64)
        lens = np.diff(poffs)
        flat = pix.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        feats = np.empty((t.num_rows, 3), np.float64)
        if t.num_rows and (lens == lens[0]).all():
            # uniform-length fast path: one 2-D reduction per feature —
            # numpy's axis reduction applies the identical per-row
            # pairwise sum, so values match the scalar path bit-for-bit
            m = flat.reshape(t.num_rows, int(lens[0]))
            feats[:, 0] = m.mean(axis=1)
            feats[:, 1] = m.std(axis=1)
            feats[:, 2] = np.percentile(m, 95, axis=1)
        else:
            starts = poffs - poffs[0]
            for i in range(t.num_rows):
                a = flat[starts[i]: starts[i + 1]]
                feats[i] = (a.mean(), a.std(), np.percentile(a, 95))
        return pa.table(
            {
                id_col: t.column(id_col),
                "f_mean": pa.array(feats[:, 0]),
                "f_std": pa.array(feats[:, 1]),
                "f_p95": pa.array(feats[:, 2]),
            }
        )

    return ds.map_batches(_f, batch_format="pyarrow")


class ImageAHasher:
    """Actor-pool stage: 64-bit average-hash (aHash) per image — decode →
    8×8 nearest-neighbor sample → threshold at the sample mean → pack 64
    bits row-major. The sample mean is an EXACT double (64 values that
    are multiples of 2⁻²⁴), so the bit pattern is order-independent and
    SQL-mirrorable. Emits (id, ahash:int64 — the uint64 bit pattern)."""

    def __init__(self, media_col: str = "media", id_col: str = "doc_id"):
        self.media_col = media_col
        self.id_col = id_col
        self.weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column(self.id_col).to_numpy(zero_copy_only=False)
        out = np.empty(t.num_rows, dtype=np.uint64)
        for i, raw in enumerate(t.column(self.media_col).to_pylist()):
            flat, shape = _decode_payload(raw)
            h, w = shape
            ri = (np.arange(8) * h) // 8
            ci = (np.arange(8) * w) // 8
            sample = flat[(ri[:, None] * w + ci[None, :]).ravel()]
            mean = sample.astype(np.float64).sum() / 64.0
            out[i] = np.sum(self.weights[sample > mean])
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "ahash": pa.array(out.view(np.int64)),
            }
        )


def image_ahash(
    ds: ray.data.Dataset,
    media_col: str = "media",
    id_col: str = "doc_id",
    concurrency: int | tuple = (2, 8),
    batch_size: int = 64,
) -> ray.data.Dataset:
    return ds.map_batches(
        ImageAHasher,
        fn_constructor_kwargs={"media_col": media_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def ahash_dedup(
    ds: ray.data.Dataset,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Perceptual-hash image dedup: (ahash, keep_id, n_dups) — exact-hash
    grouping (identical aHash ⇒ visually-identical under the 8×8/mean
    signature), survivor = lowest id. ONE groupby on the 64-bit hash —
    the exact_dedup shuffle shape over a multimodal signature."""
    g = (
        image_ahash(ds, media_col=media_col, id_col=id_col)
        .groupby("ahash")
        .aggregate(
            ray.data.aggregate.Min(id_col),
            ray.data.aggregate.Count(id_col),
        )
    )
    return g.rename_columns(
        {f"min({id_col})": "keep_id", f"count({id_col})": "n_dups"}
    )
