"""Runtime platform selection for CLI entry points.

The session's site init imports jax at interpreter start, so JAX_PLATFORMS /
XLA_FLAGS env vars are consumed before user code runs. Backends initialize
lazily though, so ``jax.config.update`` still wins if called before the first
computation. CLIs call :func:`apply_platform_env` first thing in ``main`` so
tests (and users) can redirect them:

    EWVIT_PLATFORM=cpu EWVIT_CPU_DEVICES=8 python train.py ...
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    platform = os.environ.get("EWVIT_PLATFORM")
    if not platform:
        return
    import jax

    jax.config.update("jax_platforms", platform)
    n = os.environ.get("EWVIT_CPU_DEVICES")
    if n:
        jax.config.update("jax_num_cpu_devices", int(n))
