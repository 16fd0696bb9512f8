"""Measure the fused (Winograd) MWT tail vs the direct path on real TPU.

Slope-method timing (serial chain, see bench.py / CLAUDE.md): per-call time
from the difference of two chain lengths.

Usage: python tools/bench_mwt_tail.py [batch] [size]
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


def slope(fn, x, n1=4, n2=24):
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


def main():
    from ewvit_tpu.models.mwt import MWT

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 224
    dt = jnp.bfloat16

    x = jax.random.normal(jax.random.PRNGKey(0), (batch, size, size, 3), dt)
    m0 = MWT(dtype=dt, use_fused_tail=False)
    m1 = MWT(dtype=dt, use_fused_tail=True)
    variables = m0.init(jax.random.PRNGKey(1), x)

    f0 = jax.jit(lambda xx: m0.apply(variables, xx))
    f1 = jax.jit(lambda xx: m1.apply(variables, xx))

    # numeric check first
    r0 = np.asarray(f0(x), np.float32)
    r1 = np.asarray(f1(x), np.float32)
    rel = np.max(np.abs(r0 - r1)) / max(1e-6, np.abs(r0).max())
    print(f"max rel diff fused vs direct (bf16): {rel:.4f}")

    t0 = slope(f0, x)
    t1 = slope(f1, x)
    print(f"direct MWT : {t0 * 1e3:8.3f} ms/call  ({batch} frames)")
    print(f"fused tail : {t1 * 1e3:8.3f} ms/call  ({batch} frames)")
    print(f"speedup    : {t0 / t1:.3f}x   (saved {(t0 - t1) * 1e3:.3f} ms)")


if __name__ == "__main__":
    main()
