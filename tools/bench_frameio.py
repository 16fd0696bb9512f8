"""Measure the native frame decoder (native/frameio.cpp) on REAL image files.

The serving capacity claim needs a host-side number: the device consumes
~5,000 frames/s (tools/bench_serving.py), so the C++ decode+geometry path
must supply crops at that rate from N host cores. This tool writes
photo-like PNG and JPEG frames at representative source sizes, decodes them
through the production ``ewvit_tpu.data.native.decode_batch`` path
(decode -> center-square crop -> bilinear resize to 224, the exact serving
geometry), and reports per-image ms + frames/s on THIS core — plus the
core budget arithmetic against the measured device rate (VERDICT r4 #3).

Synthetic-but-realistic content: smooth low-frequency gradients + band-limited
noise, so JPEG entropy / PNG filter behavior is photo-like (pure random noise
is a pathological best case for PNG row filters and worst case for JPEG).

Usage: python tools/bench_frameio.py [--n 256] [--reps 5] [--out-size 224]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEVICE_FPS = 4977.0  # measured serving device rate (BASELINE.md, r4)


def photo_like(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Low-frequency gradients + textured noise: photo-like compressibility."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (
        127 + 60 * np.sin(xx / w * 4.1) * np.cos(yy / h * 3.3)
        + 40 * np.sin((xx + yy) / (h + w) * 9.0))
    img = np.stack([base + 10 * c for c in range(3)], axis=-1)
    # band-limited texture: upsampled coarse noise (photo detail, not static)
    coarse = rng.normal(0, 18, (h // 8 + 1, w // 8 + 1, 3)).astype(np.float32)
    img += np.kron(coarse, np.ones((8, 8, 1), np.float32))[:h, :w]
    return np.clip(img, 0, 255).astype(np.uint8)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256, help="files per case")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out-size", type=int, default=224)
    ap.add_argument("--threads", type=int, default=1,
                    help="decoder pool threads (1 = per-core number)")
    ap.add_argument("--json", action="store_true", help="emit one JSON line")
    args = ap.parse_args()

    import cv2

    from ewvit_tpu.data import native

    if not native.available():
        print("native frameio library unavailable", file=sys.stderr)
        return 1

    rng = np.random.default_rng(0)
    # (label, height, width, format): face-crop PNGs, extractor-sized frames,
    # and full 720p video frames, both codecs
    cases = [
        ("png_256", 256, 256, "png"),
        ("png_450", 450, 450, "png"),
        ("jpg_450", 450, 450, "jpg"),
        ("jpg_720p", 720, 1280, "jpg"),
    ]
    results = {}
    with tempfile.TemporaryDirectory() as td:
        for label, h, w, fmt in cases:
            paths = []
            for i in range(args.n):
                img = photo_like(rng, h, w)
                p = os.path.join(td, f"{label}_{i}.{fmt}")
                if fmt == "jpg":
                    cv2.imwrite(p, img[..., ::-1],
                                [cv2.IMWRITE_JPEG_QUALITY, 90])
                else:
                    cv2.imwrite(p, img[..., ::-1])
                paths.append(p)
            kb = sum(os.path.getsize(p) for p in paths) / len(paths) / 1024

            # warm (page cache + pool spin-up), then min-of-reps
            native.decode_batch(paths, args.out_size, 1.0, args.threads)
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out, ok = native.decode_batch(
                    paths, args.out_size, 1.0, args.threads)
                best = min(best, time.perf_counter() - t0)
            assert ok.all(), f"{label}: {int((~ok).sum())} failed decodes"
            fps = args.n / best
            results[label] = {
                "ms_per_image": round(best / args.n * 1e3, 3),
                "frames_per_sec": round(fps, 1),
                "avg_kb": round(kb, 1),
                "cores_for_device_rate": round(DEVICE_FPS / fps, 2),
            }

    if args.json:
        print(json.dumps({"threads": args.threads, "n": args.n,
                          "device_fps": DEVICE_FPS, "cases": results}))
        return 0
    print(f"native frameio decode -> crop -> resize({args.out_size}) | "
          f"threads={args.threads} n={args.n} min-of-{args.reps}")
    print(f"{'case':>10} {'avg KB':>8} {'ms/img':>8} {'frames/s':>10} "
          f"{'cores for ' + str(int(DEVICE_FPS)) + ' f/s':>18}")
    for label, r in results.items():
        print(f"{label:>10} {r['avg_kb']:>8.1f} {r['ms_per_image']:>8.3f} "
              f"{r['frames_per_sec']:>10.1f} "
              f"{r['cores_for_device_rate']:>18.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
