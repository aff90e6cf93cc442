"""Multimodal stage plumbing: schema, actor pools, deterministic fakes."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from libpysal_ray.multimodal import (
    attach_fake_media,
    decode_images,
    extract_features,
    resize_images,
    sample_audio_frames,
)
from libpysal_ray.multimodal.stages import _decode_payload, fake_image_bytes


def _ids(n):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    )


def test_image_decode_schema_and_determinism():
    ds = decode_images(attach_fake_media(_ids(20), "image"),
                       concurrency=2)
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(df.columns) == ["doc_id", "pixels", "h", "w"]
    assert (df["h"] == 16 + df["doc_id"] % 17).all()
    assert (df["w"] == 16 + df["doc_id"] % 13).all()
    for _, row in df.iterrows():
        assert len(row["pixels"]) == row["h"] * row["w"]
    # decode is deterministic
    arr1, shape1 = _decode_payload(fake_image_bytes(4, 5, 42))
    arr2, _ = _decode_payload(fake_image_bytes(4, 5, 42))
    assert shape1 == (4, 5) and np.array_equal(arr1, arr2)
    assert (arr1 >= 0).all() and (arr1 <= 1).all()


def test_resize_and_features():
    ds = resize_images(
        decode_images(attach_fake_media(_ids(10), "image"), concurrency=2),
        out_h=8, out_w=8, concurrency=2,
    )
    df = ds.to_pandas()
    assert (df["h"] == 8).all() and (df["w"] == 8).all()
    assert all(len(p) == 64 for p in df["pixels"])
    feats = extract_features(ds).to_pandas()
    assert set(feats.columns) == {"doc_id", "f_mean", "f_std", "f_p95"}
    assert ((feats["f_mean"] >= 0) & (feats["f_mean"] <= 1)).all()


def test_audio_frame_sampling():
    ds = sample_audio_frames(attach_fake_media(_ids(12), "audio"),
                             stride=4, concurrency=2)
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    n = 256 + df["doc_id"] % 301
    expected = (n + 3) // 4
    assert all(len(f) == e for f, e in zip(df["frames"], expected))


def test_unknown_codec_raises():
    with pytest.raises(NotImplementedError):
        _decode_payload(b"\x89PNG\r\n\x1a\n....")


def test_video_frame_sampler(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from libpysal_ray.multimodal import attach_fake_media, sample_video_frames

    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(20, dtype=np.int64))})
    )
    out = sample_video_frames(attach_fake_media(docs, "video"), stride=2)
    rows = {int(r["doc_id"]): r for r in out.take_all()}
    assert len(rows) == 20
    for i, r in rows.items():
        nf = 8 + i % 9
        kept = (nf + 1) // 2
        h, w = 8 + i % 5, 8 + i % 7
        assert r["n_frames"] == kept and r["height"] == h and r["width"] == w
        assert len(r["frames"]) == kept * h * w


def test_image_ahash_dedup(ray_session):
    import pyarrow as pa
    import ray.data

    from libpysal_ray.multimodal.stages import (
        ImageAHasher,
        ahash_dedup,
        fake_image_bytes,
    )

    # docs 0 and 3 share (h, w, seed) → identical image → same hash
    rows = [
        (0, fake_image_bytes(20, 16, 7)),
        (1, fake_image_bytes(20, 16, 8)),
        (2, fake_image_bytes(24, 16, 7)),
        (3, fake_image_bytes(20, 16, 7)),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "media": pa.array([r[1] for r in rows], pa.binary()),
            }
        )
    )
    out = {r["keep_id"]: r["n_dups"] for r in ahash_dedup(ds).take_all()}
    assert out[0] == 2      # 0 and 3 collapse
    assert out[1] == 1 and out[2] == 1
    # hash is deterministic across calls
    h = ImageAHasher()
    t = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "media": pa.array([rows[0][1]], pa.binary()),
        }
    )
    assert h(t).column("ahash").to_pylist() == h(t).column("ahash").to_pylist()
