#!/usr/bin/env python
"""Offline video→frame extraction for FF++ and Celeb-DF-v2 (host-side CLI).

One tool covering both reference extractors
(/root/reference/data/FaceForensics++/extract_compressed_videos.py:29-66 and
/root/reference/data/Celeb-DF-v2/extract_frames.py:20-114): uniformly samples
``n_frames`` per video with cv2 (or dumps all frames via ffmpeg) into the
directory layout the ewvit_tpu loaders read
(``frames/{original,<method>}/<video_id>/NNNN.png`` for FF++;
``celebdf/frames/{Celeb-real,Celeb-synthesis}/<id>/`` for Celeb-DF). The
Celeb-DF mode can restrict extraction to List_of_testing_videos.txt entries
(YouTube-real lines skipped, extract_frames.py:69-73).

Usage:
  python tools/extract_frames.py ffpp --data-path <videos_root> \
      --dataset Deepfakes --output <root>/faceforensics/ff++/frames
  python tools/extract_frames.py celebdf --data-path <celebdf_root> \
      --testing-file List_of_testing_videos.txt --output <root>
"""

from __future__ import annotations

import argparse
import os
import subprocess
from os.path import join

import numpy as np

try:
    import cv2
except ImportError as e:  # pragma: no cover
    raise SystemExit("cv2 is required for frame extraction") from e

FFPP_METHODS = ("original", "Deepfakes", "Face2Face", "FaceSwap",
                "NeuralTextures", "FaceShifter")
CELEBDF_DIRS = {"real": "Celeb-real", "fake": "Celeb-synthesis"}


def extract_frames(video_path: str, output_dir: str, *, method: str = "cv2",
                   n_frames: int = 300) -> int:
    """Uniformly sample up to n_frames from one video into output_dir."""
    os.makedirs(output_dir, exist_ok=True)
    if method == "ffmpeg":
        subprocess.check_output(
            ["ffmpeg", "-i", video_path, join(output_dir, "%04d.png")],
            stderr=subprocess.STDOUT)
        return len(os.listdir(output_dir))
    reader = cv2.VideoCapture(video_path)
    total = int(reader.get(cv2.CAP_PROP_FRAME_COUNT))
    if total <= 0:
        reader.release()
        return 0
    indices = (list(range(total)) if total < n_frames
               else np.linspace(0, total - 1, n_frames, dtype=int).tolist())
    written = 0
    for out_idx, frame_idx in enumerate(indices):
        reader.set(cv2.CAP_PROP_POS_FRAMES, frame_idx)
        ok, image = reader.read()
        if not ok:
            break
        cv2.imwrite(join(output_dir, f"{out_idx:04d}.png"), image)
        written += 1
    reader.release()
    return written


def extract_ffpp(data_path: str, dataset: str, output_path: str,
                 n_frames: int, method: str) -> None:
    """All videos of one FF++ method into frames/<method>/<video_id>/."""
    videos_path = join(data_path, dataset)
    images_path = join(output_path, dataset)
    vids = sorted(os.listdir(videos_path))
    for i, video in enumerate(vids):
        name = video.split(".")[0]
        n = extract_frames(join(videos_path, video), join(images_path, name),
                           method=method, n_frames=n_frames)
        print(f"[{i + 1}/{len(vids)}] {dataset}/{name}: {n} frames")


def read_testing_videos(testing_file: str):
    """Parse List_of_testing_videos.txt (1=real, 0=fake; YouTube skipped)."""
    test = {"real": [], "fake": []}
    with open(testing_file) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            parts = line.split()
            if len(parts) < 2:
                continue
            label, vpath = parts[0], parts[1]
            if "youtube" in vpath.lower():
                continue
            vid = vpath.split("/")[-1].split(".")[0]
            if label == "1" and "real" in vpath.lower():
                test["real"].append(vid)
            elif label == "0" and "synthesis" in vpath.lower():
                test["fake"].append(vid)
    return test


def extract_celebdf(data_path: str, output_path: str,
                    testing_file: str | None, n_frames: int,
                    method: str) -> None:
    if testing_file:
        wanted = read_testing_videos(testing_file)
    else:  # everything on disk
        wanted = {
            cat: [v.split(".")[0]
                  for v in sorted(os.listdir(join(data_path, d)))
                  if v.endswith(".mp4")]
            for cat, d in CELEBDF_DIRS.items()
        }
    for cat, vids in wanted.items():
        src = join(data_path, CELEBDF_DIRS[cat])
        dst = join(output_path, "celebdf", "frames", CELEBDF_DIRS[cat])
        print(f"Extracting {len(vids)} {cat} videos -> {dst}")
        for i, vid in enumerate(vids):
            vp = join(src, f"{vid}.mp4")
            if not os.path.exists(vp):
                print(f"  warning: {vp} not found")
                continue
            n = extract_frames(vp, join(dst, vid), method=method,
                               n_frames=n_frames)
            print(f"  [{i + 1}/{len(vids)}] {vid}: {n} frames")


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("ffpp", help="extract one FF++ method's videos")
    f.add_argument("--data-path", required=True)
    f.add_argument("--dataset", default="original", choices=FFPP_METHODS)
    f.add_argument("--output", required=True)
    f.add_argument("--n-frames", type=int, default=300)
    f.add_argument("--method", default="cv2", choices=["cv2", "ffmpeg"])

    c = sub.add_parser("celebdf", help="extract Celeb-DF-v2 videos")
    c.add_argument("--data-path", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--testing-file", default=None,
                   help="List_of_testing_videos.txt; omit to extract all")
    c.add_argument("--n-frames", type=int, default=300)
    c.add_argument("--method", default="cv2", choices=["cv2", "ffmpeg"])

    args = p.parse_args()
    if args.cmd == "ffpp":
        extract_ffpp(args.data_path, args.dataset, args.output,
                     args.n_frames, args.method)
    else:
        extract_celebdf(args.data_path, args.output, args.testing_file,
                        args.n_frames, args.method)


if __name__ == "__main__":
    main()
