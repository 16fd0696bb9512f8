"""Data pipeline tests on a tiny synthetic frames-on-disk fixture (SURVEY.md §4d)."""

import json
import os

import numpy as np
import pytest

from ewvit_tpu.data.datasets import (
    CelebDFDataset,
    DiffusionDataset,
    FaceForensicsDataset,
)
from ewvit_tpu.data.pipeline import BatchLoader
from ewvit_tpu.data.transforms import FrameTransform, center_crop, resize_shorter_side

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

pytestmark = pytest.mark.skipif(cv2 is None, reason="cv2 required")

METHODS = ["Deepfakes", "Face2Face"]


def _write_frames(dirpath, n=4, size=64, seed=0):
    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        img = rng.integers(0, 255, (size, size, 3), np.uint8)
        cv2.imwrite(os.path.join(dirpath, f"{i:03d}.png"), img)


@pytest.fixture(scope="module")
def ff_root(tmp_path_factory):
    """{root}/faceforensics/ff++/{splits,frames/...} with 6 video pairs."""
    root = tmp_path_factory.mktemp("ffpp")
    base = root / "faceforensics" / "ff++"
    pairs = [[f"{i:03d}", f"{i + 100:03d}"] for i in range(6)]
    os.makedirs(base / "splits")
    for split in ("train", "val", "test"):
        with open(base / "splits" / f"{split}.json", "w") as f:
            json.dump(pairs, f)
    for target, _ in pairs:
        _write_frames(str(base / "frames" / "original" / target))
    for m in METHODS:
        for target, source in pairs:
            _write_frames(str(base / "frames" / m / f"{target}_{source}"))
    return str(root)


@pytest.fixture(scope="module")
def celebdf_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("celebdf")
    for kind, ids in (("Celeb-real", ["id0_000", "id1_000"]),
                      ("Celeb-synthesis", ["id0_id1_000", "id1_id0_000"])):
        for v in ids:
            _write_frames(str(root / "celebdf" / "frames" / kind / v))
    listing = root / "List_of_testing_videos.txt"
    listing.write_text(
        "1 Celeb-real/id0_000.mp4\n"
        "0 Celeb-synthesis/id0_id1_000.mp4\n"
        "1 YouTube-real/yt0.mp4\n")
    return str(root)


def test_ff_balancing_and_shapes(ff_root):
    ds = FaceForensicsDataset(ff_root, split="train", frame_count=3,
                              methods=METHODS, seed=1)
    # 1:1 real/fake, methods evenly mixed (data_loader.py:147-155)
    assert len(ds.real_videos) == 6 and len(ds.fake_videos) == 6
    counts = {}
    for v in ds.fake_videos:
        counts[v["method"]] = counts.get(v["method"], 0) + 1
    assert counts == {"Deepfakes": 3, "Face2Face": 3}
    frames, label = ds[0]
    assert frames.shape == (3, 64, 64, 3) and frames.dtype == np.uint8
    assert label == 0
    frames, label = ds[len(ds.real_videos)]
    assert label == 1


def test_ff_frame_padding(ff_root):
    """frame_count > available -> last-frame repeat (data_loader.py:314-320)."""
    ds = FaceForensicsDataset(ff_root, split="test", frame_count=7,
                              methods=METHODS)
    frames, _ = ds[0]
    assert frames.shape[0] == 7
    np.testing.assert_array_equal(frames[-1], frames[-2])  # padded tail


def test_ff_single_method_filter(ff_root):
    ds = FaceForensicsDataset(ff_root, split="test", frame_count=2,
                              methods=METHODS, single_method="Deepfakes")
    assert all(v["method"] == "Deepfakes" for v in ds.fake_videos)
    assert len(ds.fake_videos) == 6


def test_ff_curriculum_schedule(ff_root):
    ds = FaceForensicsDataset(ff_root, split="train", frame_count=2,
                              methods=METHODS, seed=3)
    ds.update_sampling_strategy(epoch=0, max_epochs=30)
    assert ds.fixed_sample_ratio == 1.0 and ds.novelty_ratio == 0.0
    ds.update_sampling_strategy(epoch=15, max_epochs=30)  # halfway in the ramp
    assert 0.0 < ds.fixed_sample_ratio < 1.0
    assert 0.0 < ds.novelty_ratio <= 1.0
    np.testing.assert_allclose(
        ds.fixed_sample_ratio + ds.novelty_ratio, 1.0, atol=1e-9)
    ds.update_sampling_strategy(epoch=25, max_epochs=30)  # past late_stage
    assert ds.fixed_sample_ratio == 0.0 and ds.novelty_ratio == 1.0
    # fake set stays unique
    paths = [v["path"] for v in ds.current_fake]
    assert len(paths) == len(set(paths))


def test_ff_val_epoch_reshuffle_is_deterministic(ff_root):
    ds1 = FaceForensicsDataset(ff_root, split="val", frame_count=2,
                               methods=METHODS, seed=4)
    ds2 = FaceForensicsDataset(ff_root, split="val", frame_count=2,
                               methods=METHODS, seed=4)
    ds1.update_sampling_strategy(3, 30)
    ds2.update_sampling_strategy(3, 30)
    assert ([v["path"] for v in ds1.dynamic_fake]
            == [v["path"] for v in ds2.dynamic_fake])


def test_celebdf_split_parsing(celebdf_root):
    test_ds = CelebDFDataset(
        celebdf_root, split=["test"], frame_count=2,
        testing_file=os.path.join(celebdf_root, "List_of_testing_videos.txt"))
    # only the listed (non-YouTube) ids are test videos
    assert len(test_ds.real_videos) == 1 and len(test_ds.synthetic_videos) == 1
    train_ds = CelebDFDataset(
        celebdf_root, split=["train"], frame_count=2,
        testing_file=os.path.join(celebdf_root, "List_of_testing_videos.txt"))
    assert len(train_ds.real_videos) == 1 and len(train_ds.synthetic_videos) == 1
    frames, label = test_ds[0]
    assert frames.shape == (2, 64, 64, 3) and label == 0


def test_diffusion_dataset(tmp_path):
    for d, n in (("CelebA-Real", 3), ("DDPM", 2), ("DDIM", 1)):
        os.makedirs(tmp_path / d)
        rng = np.random.default_rng(0)
        for i in range(n):
            cv2.imwrite(str(tmp_path / d / f"{i}.png"),
                        rng.integers(0, 255, (32, 32, 3), np.uint8))
    ds = DiffusionDataset(str(tmp_path))
    assert len(ds) == 6
    frames, label = ds[0]
    assert frames.shape == (1, 32, 32, 3) and label == 0
    info = ds.get_image_info(3)
    assert info["label"] == 1 and info["method"] in ("DDPM", "DDIM")
    only = DiffusionDataset(str(tmp_path), single_method="DDPM")
    assert len(only.fake_images) == 2


def test_batch_loader_threads_match_sync(ff_root):
    ds = FaceForensicsDataset(ff_root, split="test", frame_count=2,
                              methods=METHODS, seed=5)
    sync = list(BatchLoader(ds, batch_size=4, num_workers=0))
    threaded = list(BatchLoader(ds, batch_size=4, num_workers=3))
    assert len(sync) == len(threaded) == -(-len(ds) // 4)
    for (f1, l1), (f2, l2) in zip(sync, threaded):
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(l1, l2)


def test_batch_loader_drop_and_pad(ff_root):
    ds = FaceForensicsDataset(ff_root, split="test", frame_count=2,
                              methods=METHODS)
    n = len(ds)  # 12: 6 real + 6 fakes
    dropped = list(BatchLoader(ds, batch_size=5, drop_last=True, num_workers=0))
    assert len(dropped) == n // 5 and all(f.shape[0] == 5 for f, _ in dropped)
    padded = list(BatchLoader(ds, batch_size=5, pad_last=True, num_workers=0))
    assert all(f.shape[0] == 5 for f, _ in padded)


def test_frame_transform_geometry():
    img = np.zeros((300, 500, 3), np.uint8)
    out = FrameTransform(resize=100, crop=64)(img)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    assert resize_shorter_side(img, 100).shape[0] == 100
    assert center_crop(np.zeros((50, 40, 3), np.uint8), 64).shape == (64, 64, 3)
