"""Test configuration: force an 8-device virtual CPU platform.

Tests must exercise multi-chip sharding without TPU hardware (SURVEY.md §4)
and must NOT compete with benchmarks for the single real chip. The session's
sitecustomize imports jax at interpreter start (so JAX_PLATFORMS/XLA_FLAGS env
overrides are too late), but backends initialize lazily — jax.config.update
still wins as long as it runs before the first computation.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Do NOT enable jax_compilation_cache_dir here: in this environment CPU
# compiles run on a remote helper whose machine features differ from this
# host, and loading the cached XLA:CPU AOT result SEGFAULTS the process
# ("+prefer-no-gather is not supported on the host machine"). The cache is
# TPU-only (bench.py).

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process XLA:CPU compiler state.

    With the full suite in one process (~169 tests, hundreds of compiled
    programs incl. 8-device mesh train steps and a flagship 224px lowering),
    a later train-step compile crashes INSIDE backend_compile_and_load
    (SIGSEGV or SIGABRT, 2026-08-21; which compile dies varies with what ran
    before — the first test_train_stack compile in the full suite, the 8th
    in a 3-file repro; every crashing test passes standalone). The XLA:CPU
    compiler bug is state/heap-triggered and not fixable here; dropping the
    jit executable caches at module boundaries keeps the accumulated state
    below the trigger at the cost of cross-module recompiles.
    """
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(42)
