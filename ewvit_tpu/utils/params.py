"""Parameter-tree utilities for inference serving.

``cast_kernels_for_inference`` pre-casts large f32 conv/dense kernels to the
compute dtype. Every module in this package already casts its weights to the
module ``dtype`` at call time (e.g. ``kern.astype(self.dtype)`` in
models/mwt.py, flax ``promote_dtype`` in nn.Dense/nn.Conv), so with
``compute_dtype=bfloat16`` the model's outputs are BIT-IDENTICAL whether the
cast happens per call or once up front — but per-call casting makes XLA read
the f32 bytes from HBM every step. Measured on the v5e trace: the
patch_to_embedding matmul alone reads a 128 MB f32 weight
(``fusion.1225``, 188 us at 22 TF/s, memory-bound); pre-casting halves every
large weight read in the dynamic path (~120 MB/call of the ~60M-param DAMA
subtree).

Only leaves named ``kernel`` (conv + dense weights) of at least ``min_elems``
elements are cast: biases and BN/LayerNorm scale/shift leaves are tiny (no
bandwidth to win) and BN statistics math runs in f32 inside the fusions —
casting those WOULD change numerics. ``batch_stats`` are never touched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_kernels_for_inference(variables, compute_dtype="bfloat16",
                               min_elems: int = 4096):
    """Pre-cast large f32 'kernel' param leaves to ``compute_dtype``.

    No-op when ``compute_dtype`` is float32 (CPU test configs). Returns a new
    variables dict; ``batch_stats`` and non-kernel params pass through.
    """
    dt = jnp.dtype(compute_dtype)
    if dt == jnp.float32 or "params" not in variables:
        return variables

    def cast(path, leaf):
        name = getattr(path[-1], "key", None) if path else None
        if (name == "kernel" and hasattr(leaf, "dtype")
                and leaf.dtype == jnp.float32 and leaf.size >= min_elems):
            return leaf.astype(dt)
        return leaf

    out = dict(variables)
    out["params"] = jax.tree_util.tree_map_with_path(cast, variables["params"])
    return out
