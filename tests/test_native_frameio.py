"""Native C++ frameio tests: decode parity vs cv2, geometry, fallbacks."""

import os

import numpy as np
import pytest

from ewvit_tpu.data import native

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

pytestmark = [
    pytest.mark.skipif(cv2 is None, reason="cv2 required for oracles"),
    pytest.mark.skipif(not native.available(),
                       reason="native frameio library unavailable"),
]


def _png(tmp_path, name, img):
    p = str(tmp_path / name)
    cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return p


def _jpg(tmp_path, name, img, q=95):
    p = str(tmp_path / name)
    cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, q])
    return p


def test_png_decode_is_exact(tmp_path, rng):
    img = rng.integers(0, 255, (40, 56, 3), np.uint8)
    p = _png(tmp_path, "a.png", img)
    out = native.decode_file(p)
    np.testing.assert_array_equal(out, img)


def test_jpeg_decode_close_to_cv2(tmp_path, rng):
    img = rng.integers(0, 255, (48, 48, 3), np.uint8)
    p = _jpg(tmp_path, "a.jpg", img)
    ours = native.decode_file(p).astype(np.int16)
    theirs = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB).astype(np.int16)
    # independent IDCT implementations may differ by a few counts
    assert np.abs(ours - theirs).mean() < 2.0


def test_decode_batch_geometry_matches_cv2_resize(tmp_path, rng):
    img = rng.integers(0, 255, (100, 140, 3), np.uint8)
    p = _png(tmp_path, "g.png", img)
    frames, ok = native.decode_batch([p], out_size=64, crop_frac=1.0)
    assert ok.all() and frames.shape == (1, 64, 64, 3)
    side = 100
    crop = img[:, 20:120]  # center square
    oracle = cv2.resize(crop, (64, 64), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(frames[0].astype(np.int16) - oracle.astype(np.int16))
    assert diff.mean() < 1.0 and diff.max() <= 3


def test_decode_batch_crop_frac(tmp_path):
    # image with a white center and black border: crop_frac keeps the center
    img = np.zeros((90, 90, 3), np.uint8)
    img[30:60, 30:60] = 255
    p = _png(tmp_path, "c.png", img)
    frames, _ = native.decode_batch([p], out_size=30, crop_frac=1 / 3)
    assert frames[0].mean() > 250  # fully inside the white center


def test_decode_batch_blank_fallback(tmp_path, rng):
    good = _png(tmp_path, "ok.png", rng.integers(0, 255, (32, 32, 3), np.uint8))
    bad = str(tmp_path / "missing.png")
    trash = str(tmp_path / "trash.png")
    with open(trash, "wb") as f:
        f.write(b"not an image")
    frames, ok = native.decode_batch([good, bad, trash], out_size=16)
    assert list(ok) == [True, False, False]
    assert frames[1].sum() == 0 and frames[2].sum() == 0
    assert frames[0].sum() > 0


def test_dataset_native_path(tmp_path, rng):
    from ewvit_tpu.data.datasets import DiffusionDataset

    os.makedirs(tmp_path / "CelebA-Real")
    os.makedirs(tmp_path / "DDPM")
    for i in range(2):
        _png(tmp_path / "CelebA-Real", f"r{i}.png",
             rng.integers(0, 255, (64, 64, 3), np.uint8))
    _png(tmp_path / "DDPM", "f0.png",
         rng.integers(0, 255, (64, 64, 3), np.uint8))
    ds = DiffusionDataset(str(tmp_path))
    ds.native_decode = True
    ds.native_out_size = 32

    # DiffusionDataset decodes single images via cv2; the native path applies
    # to the video datasets — exercise it through _load_clip on a frames dir.
    from ewvit_tpu.data.datasets import VideoFrameDataset

    class Clip(VideoFrameDataset):
        def __init__(self):
            self.frame_count = 4
            self.transform = None
            self.native_decode = True
            self.native_out_size = 32
            self.native_crop_frac = 1.0

    frames = Clip()._load_clip(str(tmp_path / "CelebA-Real"))
    assert frames.shape == (4, 32, 32, 3) and frames.dtype == np.uint8
