"""Driver-contract regression tests for ``__graft_entry__``.

Round 1 shipped a red multichip deliverable because the 8-virtual-device
platform override lived only under ``__main__`` while the driver IMPORTS the
module and calls ``dryrun_multichip(8)`` directly (VERDICT.md "What's weak"
#1).  These tests exercise the module exactly the way the driver does, in a
fresh subprocess, so that failure mode can never ship silently again.
"""

import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The driver killed the round-2 dryrun by timeout (MULTICHIP_r02 rc=124,
# still compiling at 3m19s). The micro config + shape-only init finish in
# ~71 s on this 1-core host; these tests assert REAL wall time under a
# bound comfortably below any observed driver limit, so a compile-time
# regression fails HERE instead of in the driver's artifact.
DRYRUN_WALL_LIMIT_S = 150.0


def _run(code: str, timeout: float) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # The driver gives no special env; strip any test-session overrides so
    # the subprocess sees the same world the driver's invocation would.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout)


@pytest.mark.slow
def test_dryrun_multichip_import_mode():
    """Literally the driver's invocation: import + call, wall-time-bounded."""
    t0 = time.monotonic()
    proc = _run(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        timeout=DRYRUN_WALL_LIMIT_S + 30)
    wall = time.monotonic() - t0
    assert proc.returncode == 0, (
        f"driver-style dryrun failed\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr[-4000:]}")
    assert "dryrun_multichip ok" in proc.stdout
    assert wall < DRYRUN_WALL_LIMIT_S, (
        f"dryrun took {wall:.0f}s — over the {DRYRUN_WALL_LIMIT_S:.0f}s "
        "bound; the driver WILL time this out (MULTICHIP rc=124)")


@pytest.mark.slow
def test_dryrun_multichip_script_mode():
    """Script mode (CLAUDE.md workflow) must keep working too."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "__graft_entry__.py", "8"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=DRYRUN_WALL_LIMIT_S + 30)
    wall = time.monotonic() - t0
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip ok" in proc.stdout
    assert wall < DRYRUN_WALL_LIMIT_S, f"dryrun took {wall:.0f}s"


def test_entry_traces():
    """entry() returns (fn, args) that trace under jit (no full compile)."""
    import jax

    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.pop(0)
    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    out_shape = lowered.out_info
    leaves = jax.tree_util.tree_leaves(out_shape)
    assert leaves, "entry() traced to an empty output"


def test_ensure_devices_is_idempotent_when_enough():
    """In an initialized >=n-device session, _ensure_devices must not churn."""
    import jax

    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.pop(0)
    before = jax.devices()
    assert len(before) >= 8  # conftest: 8 virtual CPU devices
    g._ensure_devices(8)
    assert jax.devices() == before
