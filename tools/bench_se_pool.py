"""SE-pool formulation shootout on real TPU.

The V2-S squeeze-excite pools (jnp.mean over H,W) fuse with the preceding
BN/activation into `convert_reduce_fusion` ops running at ~half HBM peak
(~108us for [64,14,14,960], profile 2026-08-16). This microbench compares
mean formulations inside the realistic composite:

    y = a*x + b;  s = mean(y, (1,2));  out = y * sigmoid(s)

Usage: python tools/bench_se_pool.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ewvit_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def slope(fn, x, n1=8, n2=48):
    def chain(n):
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n):
            y = fn(x + acc.astype(x.dtype))
            acc = acc + y.astype(jnp.float32).sum() * 1e-9
        float(np.asarray(acc))
        return time.perf_counter() - t0

    chain(1); chain(n1)
    t1 = min(chain(n1) for _ in range(2))
    t2 = min(chain(n2) for _ in range(2))
    return (t2 - t1) / (n2 - n1)


def mean_v0(y):
    return jnp.mean(y, axis=(1, 2), keepdims=True)


def mean_f32(y):
    return jnp.mean(y.astype(jnp.float32), axis=(1, 2),
                    keepdims=True).astype(y.dtype)


def mean_dot(y):
    n, h, w, c = y.shape
    ones = jnp.full((h * w,), 1.0 / (h * w), y.dtype)
    s = jax.lax.dot_general(
        y.reshape(n, h * w, c), ones,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return s.reshape(n, 1, 1, c).astype(y.dtype)


def mean_2step(y):
    s = jnp.mean(y, axis=1, keepdims=True)
    return jnp.mean(s, axis=2, keepdims=True)


def composite(mean_fn):
    def f(x):
        y = x * jnp.bfloat16(1.01) + jnp.bfloat16(0.02)
        s = mean_fn(y)
        return y * jax.nn.sigmoid(s.astype(jnp.float32)).astype(y.dtype)
    return jax.jit(f)


def main():
    shapes = [(64, 14, 14, 960), (64, 28, 28, 256), (64, 14, 14, 1280)]
    variants = [("mean", mean_v0), ("mean_f32", mean_f32),
                ("dot", mean_dot), ("2step", mean_2step)]
    for shape in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        nbytes = x.size * 2
        print(f"shape {shape} ({nbytes / 1e6:.1f} MB):")
        for name, fn in variants:
            f = composite(fn)
            r = np.asarray(f(x), np.float32)
            t = slope(f, x)
            # traffic: read x + write y... + read y + write out ~= 4 passes
            print(f"  {name:9s} {t * 1e6:8.1f} us  "
                  f"({3 * nbytes / t / 1e9:6.0f} GB/s eff) "
                  f"sum={r.sum():.1f}")


if __name__ == "__main__":
    main()
