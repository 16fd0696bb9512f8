"""Device-trace shootout of SE-pool formulations inside a realistic MBConv tail.

The V2-S in-model profile shows ~1.8 ms/call (64 frames) of
``convert_reduce_fusion`` ops — the SE global means — running at ~27% of HBM
peak. Hypothesis: XLA duplicates the BN+SiLU producer chain into both the
reduce fusion and the gating-multiply fusion (the activated tensor is never
materialized), so each pass recomputes sigmoids and is VPU-bound.

This harness builds the real MBConv tail

    h = dw3x3(x); y = silu(bn(h)); s = mean(y, (1,2)); se = mlp(s)
    out = conv1x1(y * sigmoid(se))

and device-trace-times variants (trustworthy through the axon tunnel, unlike
wall-clock micro-timing — see CLAUDE.md):

    v0_2step   : current SqueezeExcite form (H-mean then W-mean)
    v1_fused   : single (1,2)-axis mean
    v2_bnfold  : BN folded into dw weights at trace time (y = silu(conv(x)))
    v3_barrier : optimization_barrier on y (forces materialization, BN+SiLU
                 computed once at the cost of an extra HBM round-trip)
    v4_f32mean : mean computed in f32 via explicit convert

Usage: python tools/profile_se_variants.py [--runs 5]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ewvit_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_tail(mean_fn, bn_fold: bool, barrier: bool):
    def f(x, wdw, gamma, beta, mean_r, var_r, w1, w2, wproj):
        eps = 1e-3
        scale = gamma * jax.lax.rsqrt(var_r + eps)
        shift = beta - mean_r * scale
        if bn_fold:
            wd = wdw * scale.reshape(1, 1, 1, -1)
            h = jax.lax.conv_general_dilated(
                x, wd.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=x.shape[-1])
            y = h + shift.astype(x.dtype)
        else:
            h = jax.lax.conv_general_dilated(
                x, wdw.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=x.shape[-1])
            y = h * scale.astype(x.dtype) + shift.astype(x.dtype)
        y = jax.nn.silu(y)
        if barrier:
            y = jax.lax.optimization_barrier(y)
        s = mean_fn(y)                                   # [N,1,1,C]
        s = jnp.einsum("nc,cd->nd", s.reshape(s.shape[0], -1), w1)
        s = jax.nn.silu(s)
        s = jnp.einsum("nc,cd->nd", s, w2)
        g = jax.nn.sigmoid(s.astype(jnp.float32)).astype(y.dtype)
        z = y * g[:, None, None, :]
        return jax.lax.conv_general_dilated(
            z, wproj, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.jit(f)


def mean_2step(y):
    s = jnp.mean(y, axis=1)
    return jnp.mean(s, axis=1)[:, None, None, :]


def mean_fused(y):
    return jnp.mean(y, axis=(1, 2), keepdims=True)


def mean_f32(y):
    return jnp.mean(y.astype(jnp.float32), axis=(1, 2),
                    keepdims=True).astype(y.dtype)


VARIANTS = [
    ("v0_2step", mean_2step, False, False),
    ("v1_fused", mean_fused, False, False),
    ("v2_bnfold", mean_2step, True, False),
    ("v3_barrier", mean_2step, False, True),
    ("v4_f32mean", mean_f32, False, False),
]


def device_total_us(logdir: str) -> dict:
    paths = glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz"))
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    procs = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            procs[ev["pid"]] = ev.get("args", {}).get("name", "")
    device_pids = {p for p, n in procs.items()
                   if "TPU" in n or "/device" in n.lower()}
    agg = collections.Counter()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in device_pids:
            name = ev["name"].split(".")[0]
            if name.startswith("jit_"):
                continue  # whole-call envelope, double counts
            agg[name] += ev.get("dur", 0)
    return agg


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--hw", type=int, default=14)
    ap.add_argument("--c", type=int, default=960)
    ap.add_argument("--cout", type=int, default=160)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    n, hw, c = args.n, args.hw, args.c
    sq = max(8, c // 24)
    ks = jax.random.split(key, 9)
    x = jax.random.normal(ks[0], (n, hw, hw, c), dt)
    wdw = jax.random.normal(ks[1], (3, 3, 1, c), jnp.float32) * 0.1
    gamma = jnp.abs(jax.random.normal(ks[2], (c,), jnp.float32)) + 0.5
    beta = jax.random.normal(ks[3], (c,), jnp.float32) * 0.1
    mean_r = jax.random.normal(ks[4], (c,), jnp.float32) * 0.1
    var_r = jnp.abs(jax.random.normal(ks[5], (c,), jnp.float32)) + 1.0
    w1 = (jax.random.normal(ks[6], (c, sq), dt) * 0.05)
    w2 = (jax.random.normal(ks[7], (sq, c), dt) * 0.05)
    wproj = (jax.random.normal(ks[8], (1, 1, c, args.cout), dt) * 0.05)
    fargs = (x, wdw, gamma, beta, mean_r, var_r, w1, w2, wproj)

    ref = None
    for name, mean_fn, fold, barrier in VARIANTS:
        fn = make_tail(mean_fn, fold, barrier)
        out = np.asarray(fn(*fargs), np.float32)  # compile + numerics pull
        if ref is None:
            ref = out
        rel = np.max(np.abs(out - ref)) / max(1e-6, np.abs(ref).max())
        logdir = tempfile.mkdtemp(prefix=f"ewvit_se_{name}_")
        with jax.profiler.trace(logdir):
            o = None
            for _ in range(args.runs):
                o = fn(*fargs)
            np.asarray(o)
        agg = device_total_us(logdir)
        total = sum(agg.values()) / args.runs
        top = ", ".join(f"{k}={v / args.runs:.0f}us"
                        for k, v in agg.most_common(4))
        print(f"{name:11s} total={total:7.1f} us/run  rel_vs_v0={rel:.4f}  "
              f"[{top}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
