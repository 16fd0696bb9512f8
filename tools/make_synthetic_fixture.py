"""Generate a synthetic FF++-layout fixture with a learnable real/fake signal.

Real frames are smooth block images; fakes add a +-amp pixel-scale
checkerboard — the MWT high-frequency branch's sweet spot. Layout matches
FaceForensicsDataset (ewvit_tpu/data/datasets.py:134-136 ≙ the reference's
config/data_loader.py:76-169 directory scheme), so the REAL train.py CLI can
train on it end-to-end — the on-chip learning proof (VERDICT r3 #2b,
BASELINE.md "Learning proof" section).

Frames are written at --size (default 450 = FrameTransform's resize target
for 224px models, making the resize a no-op so the center crop preserves
the pixel-scale signal exactly).

Usage:
  python tools/make_synthetic_fixture.py /tmp/fixture --pairs 12 --frames 8
  python train.py --root /tmp/fixture ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

METHODS = ["Deepfakes", "Face2Face", "FaceSwap", "NeuralTextures",
           "FaceShifter"]


def write_clip(dirpath, n_frames, size, amp, fake, rng, block=30):
    import cv2

    os.makedirs(dirpath, exist_ok=True)
    yy, xx = np.indices((size, size))
    cb = (((yy + xx) % 2) * 2 - 1).astype(np.int16)
    g = -(-size // block)   # ceil: kron must COVER size before the truncate
    for i in range(n_frames):
        base = rng.integers(40, 216, (g, g, 3))
        img = np.kron(base, np.ones((block, block, 1)))[:size, :size]
        img = img.astype(np.int16)
        if fake:
            img = img + cb[..., None] * amp
        cv2.imwrite(os.path.join(dirpath, f"{i:03d}.png"),
                    np.clip(img, 0, 255).astype(np.uint8))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--pairs", type=int, default=12,
                    help="real/fake video pairs per split")
    ap.add_argument("--val-pairs", type=int, default=4)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", type=int, default=450)
    ap.add_argument("--amp", type=int, default=24)
    ap.add_argument("--methods", nargs="*", default=["Deepfakes"],
                    choices=METHODS)
    ap.add_argument("--spread-methods", action="store_true",
                    help="write each pair's fake under ONE method "
                         "(round-robin) instead of under every method — "
                         "the shape of real FF++ balanced sampling, 1/5th "
                         "the PNGs; all method roots are still created")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    base = os.path.join(args.root, "faceforensics", "ff++")
    os.makedirs(os.path.join(base, "splits"), exist_ok=True)
    rng = np.random.default_rng(args.seed)

    n_total = args.pairs + 2 * args.val_pairs
    pairs = [[f"{i:03d}", f"{i + 500:03d}"] for i in range(n_total)]
    splits = {
        "train": pairs[:args.pairs],
        "val": pairs[args.pairs:args.pairs + args.val_pairs],
        "test": pairs[args.pairs + args.val_pairs:],
    }
    for split, ps in splits.items():
        with open(os.path.join(base, "splits", f"{split}.json"), "w") as f:
            json.dump(ps, f)

    n_png = 0
    for t, _s in pairs:
        write_clip(os.path.join(base, "frames", "original", t),
                   args.frames, args.size, args.amp, fake=False, rng=rng)
        n_png += args.frames
    if args.spread_methods:
        for m in args.methods:  # the loader requires every method root
            os.makedirs(os.path.join(base, "frames", m), exist_ok=True)
        for j, (t, s) in enumerate(pairs):
            m = args.methods[j % len(args.methods)]
            write_clip(os.path.join(base, "frames", m, f"{t}_{s}"),
                       args.frames, args.size, args.amp, fake=True, rng=rng)
            n_png += args.frames
    else:
        for m in args.methods:
            for t, s in pairs:
                write_clip(os.path.join(base, "frames", m, f"{t}_{s}"),
                           args.frames, args.size, args.amp, fake=True,
                           rng=rng)
                n_png += args.frames
    print(f"fixture at {args.root}: {n_total} pairs "
          f"({args.pairs} train / {args.val_pairs} val / {args.val_pairs} "
          f"test), methods={args.methods}, {n_png} PNGs @{args.size}px")
    return 0


if __name__ == "__main__":
    sys.exit(main())
