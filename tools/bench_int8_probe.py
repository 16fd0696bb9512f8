"""Probe: does XLA:TPU lower int8 convs to the MXU at ~2x bf16?

Measured 2026-08-18 (BASELINE.md "Int8 (w8a8) conv probe"): NO — int8
convs via lax.conv_general_dilated(int8, int8, preferred_element_type=
int32) run 2-4x SLOWER than the same conv in bf16 at every shape tried,
so the post-training-quantization serving mode was rejected before being
built. Keep this probe: rerun it after toolchain upgrades before
revisiting quantization.

Slope-method timing (serial chain, one host pull — see bench.py /
CLAUDE.md for why block_until_ready cannot be trusted here). Three
representative shapes from the model's conv population; each variant
chains conv -> requantize -> next input so XLA cannot DCE the work.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/tmp/ewvit_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N1, N2, REPS = 4, 20, 3

def conv(x, k, dt_acc=None):
    kw = dict(window_strides=(1, 1), padding="SAME",
              dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if dt_acc is not None:
        kw["preferred_element_type"] = dt_acc
    return jax.lax.conv_general_dilated(x, k, **kw)

CASES = {
    # name: (x_shape, k_shape, flops)
    "conv3x3_56_128": ((64, 56, 56, 128), (3, 3, 128, 128), None),
    "conv1x1_14_960": ((64, 14, 14, 960), (1, 1, 960, 160), None),
    "conv3x3_112_54": ((64, 112, 112, 54), (3, 3, 54, 54), None),
}

def make_bf16(xs, ks):
    k = jax.random.normal(jax.random.PRNGKey(0), ks, jnp.bfloat16)
    @jax.jit
    def f(x):
        y = conv(x, k)
        # renormalize to keep the chain numerically bounded
        return (y / (1.0 + jnp.max(jnp.abs(y)))).astype(jnp.bfloat16)[
            ..., : xs[-1]] if y.shape[-1] >= xs[-1] else None
    return f

def run_case(name, xs, ks):
    cin, cout = ks[2], ks[3]
    flops = 2 * np.prod(xs[:3]) * ks[0] * ks[1] * cin * cout
    out_trim = min(cin, cout)

    kb = jax.random.normal(jax.random.PRNGKey(0), ks, jnp.bfloat16)
    ki = jnp.asarray(
        np.random.default_rng(0).integers(-127, 127, ks, np.int32),
        jnp.int8)

    @jax.jit
    def f_bf16(x):
        y = conv(x, kb)[..., :out_trim]
        y = y / (1.0 + jnp.max(jnp.abs(y)))
        if out_trim < cin:
            y = jnp.concatenate([y] * (cin // out_trim + 1), -1)[..., :cin]
        return y.astype(jnp.bfloat16)

    @jax.jit
    def f_int8(x):
        y = conv(x, ki, dt_acc=jnp.int32)[..., :out_trim]
        # requantize: scale to int8 range (per-tensor), serial dependency
        m = jnp.maximum(jnp.max(jnp.abs(y)), 1)
        q = jnp.clip((y * 127) // m, -127, 127).astype(jnp.int8)
        if out_trim < cin:
            q = jnp.concatenate([q] * (cin // out_trim + 1), -1)[..., :cin]
        return q

    def time_chain(f, x0):
        def chain(n):
            x = x0
            t0 = time.perf_counter()
            for _ in range(n):
                x = f(x)
            np.asarray(jax.device_get(x.reshape(-1)[:1]))
            return time.perf_counter() - t0
        chain(1); chain(N1)
        t1 = min(chain(N1) for _ in range(REPS))
        t2 = min(chain(N2) for _ in range(REPS))
        return (t2 - t1) / (N2 - N1)

    xb = jax.random.normal(jax.random.PRNGKey(1), xs, jnp.bfloat16)
    xi = jnp.asarray(
        np.random.default_rng(1).integers(-127, 127, xs, np.int32), jnp.int8)
    tb = time_chain(f_bf16, xb)
    ti = time_chain(f_int8, xi)
    print(f"{name}: bf16 {tb*1e6:8.1f} us ({flops/tb/1e12:6.1f} TF/s) | "
          f"int8 {ti*1e6:8.1f} us ({flops/ti/1e12:6.1f} TOP/s) | "
          f"speedup {tb/ti:.2f}x", flush=True)

for name, (xs, ks, _) in CASES.items():
    run_case(name, xs, ks)
print("done")
