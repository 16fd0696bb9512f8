"""Measure input-pipeline overlap: DevicePrefetcher vs synchronous feed.

The reference feeds float32 CHW tensors through a synchronous DataLoader
(/root/reference/train.py:222-236, num_workers=0); this framework ships
uint8 NHWC batches and overlaps the H2D transfer of batch N+1 with the
device compute of batch N (ewvit_tpu.data.pipeline.DevicePrefetcher, used
by Trainer/eval). This tool quantifies the overlap on the real chip: it
runs the same eval-forward stream with and without prefetch on synthetic
decode output and reports wall time per batch.

Timing note (CLAUDE.md): block_until_ready lies through the axon tunnel,
but here each batch's PREDICTIONS are pulled to host (exactly like the
eval loop does for sklearn metrics), so the wall clock covers real
end-to-end work; the comparison is like-for-like.

Usage: python tools/bench_input_pipeline.py [--batches 8] [--batch 4]
       [--frames 16] [--decode-ms 20]
       [--decode-dir DIR]   # REAL decode: each clip decodes `frames` image
                            # files from DIR through the native C++ decoder
                            # (ewvit_tpu.data.native) instead of sleeping
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ewvit_tpu.utils.platform import apply_platform_env

apply_platform_env()   # EWVIT_PLATFORM=cpu redirects the functional check

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("EWVIT_PLATFORM") != "cpu":
    # TPU-only: a cached XLA:CPU AOT load can abort on machine-feature
    # mismatch (CLAUDE.md)
    jax.config.update("jax_compilation_cache_dir", "/tmp/ewvit_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


class SyntheticDecodeDataset:
    """Emits uint8 clips with an artificial per-item decode cost."""

    def __init__(self, n, frames, size, decode_ms):
        g = np.random.default_rng(0)
        self.clip = g.integers(0, 255, (frames, size, size, 3), np.uint8)
        self.n = n
        self.decode_s = decode_ms / 1e3

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.decode_s:
            time.sleep(self.decode_s)  # stand-in for cv2 decode+transform
        return self.clip, i % 2


class RealDecodeDataset:
    """Decodes `frames` REAL image files per clip via the native C++ decoder
    (the production serving ingest path — VERDICT r4 #3 real-decode mode)."""

    def __init__(self, n, frames, size, files):
        from ewvit_tpu.data import native

        assert native.available(), "native frameio library unavailable"
        self._decode = native.decode_batch
        self.n, self.frames, self.size = n, frames, size
        self.files = files

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        k = self.frames
        paths = [self.files[(i * k + j) % len(self.files)] for j in range(k)]
        clip, ok = self._decode(paths, self.size, 1.0, 1)
        return clip, i % 2


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--decode-ms", type=float, default=20.0,
                    help="synthetic per-clip decode cost")
    ap.add_argument("--decode-dir", type=str, default=None,
                    help="directory of PNG/JPEG frames: decode real files "
                         "through the native C++ path instead of sleeping")
    ap.add_argument("--tiny", action="store_true",
                    help="ModelConfig.tiny() (64px) — CPU functional check")
    args = ap.parse_args()

    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.data.pipeline import BatchLoader, DevicePrefetcher
    from ewvit_tpu.models.detector import init_detector, video_forward
    from ewvit_tpu.ops.preprocess import preprocess_batch
    from ewvit_tpu.utils.params import cast_kernels_for_inference

    cfg = ModelConfig.tiny() if args.tiny else ModelConfig()
    model, variables = init_detector(cfg, jax.random.PRNGKey(0))
    variables = cast_kernels_for_inference(variables, cfg.compute_dtype)
    size = cfg.arch.image_size

    def forward(v, frames_u8):
        x = preprocess_batch(frames_u8, train=False,
                             dtype_name=cfg.compute_dtype)
        out, _ = video_forward(model, v, x, mode="dynamic",
                               frame_chunk=min(32, args.frames),
                               train=False, remat=False)
        return jax.nn.sigmoid(out["logits"].astype(jnp.float32))

    fwd = jax.jit(forward)

    ds = SyntheticDecodeDataset(args.batches * args.batch, args.frames,
                                size, 0.0)
    warm = jnp.asarray(np.stack([ds.clip] * args.batch))
    np.asarray(fwd(variables, warm))  # compile + warm

    decode_files = None
    if args.decode_dir:
        decode_files = sorted(
            os.path.join(args.decode_dir, f)
            for f in os.listdir(args.decode_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg")))
        assert decode_files, f"no images in {args.decode_dir}"

    def run(prefetch: bool) -> float:
        if decode_files is not None:
            ds = RealDecodeDataset(args.batches * args.batch, args.frames,
                                   size, decode_files)
        else:
            ds = SyntheticDecodeDataset(args.batches * args.batch,
                                        args.frames, size, args.decode_ms)
        loader = BatchLoader(ds, args.batch, num_workers=2, prefetch=2)
        it = DevicePrefetcher(loader, put_labels=False) if prefetch else loader
        t0 = time.perf_counter()
        preds = []
        for frames, labels in it:
            preds.append(np.asarray(fwd(variables, jnp.asarray(frames))))
        return time.perf_counter() - t0

    run(True)  # warm both paths
    t_sync = min(run(False) for _ in range(2))
    t_pre = min(run(True) for _ in range(2))
    n = args.batches
    decode_desc = (f"native-decode:{args.decode_dir}" if decode_files
                   else f"{args.decode_ms}ms/clip")
    print(f"batches={n} batch={args.batch} frames={args.frames} "
          f"decode={decode_desc}")
    print(f"synchronous: {t_sync / n * 1e3:8.1f} ms/batch")
    print(f"prefetched:  {t_pre / n * 1e3:8.1f} ms/batch "
          f"({t_sync / t_pre:.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
