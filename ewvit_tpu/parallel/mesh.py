"""TPU mesh + sharding rules.

TPU-native replacement for the reference's only multi-device path —
single-process ``nn.DataParallel`` (/root/reference/train.py:249-251). Here:

- a ``jax.sharding.Mesh`` over ('data', 'frames') axes rides ICI;
- inputs ``[B, K, H, W, C]`` shard B over 'data' and K over 'frames';
- params/optimizer state are replicated; XLA GSPMD inserts the gradient
  all-reduce (psum over 'data') automatically when the jitted train step
  receives sharded batches and replicated params.

Frame-axis sharding is mathematically exact for this model: frames never
attend to each other and the video descriptor is a mean over K
(/root/reference/network/dama.py:197-199), so a frame-sharded sum + psum
equals the sequential loop. This is the natural "context parallelism" for the
workload (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, frames: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data', 'frames') mesh. Defaults: all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % frames == 0, f"{n} devices not divisible by frames={frames}"
        data = n // frames
    assert data * frames == n, (
        f"mesh {data}x{frames} != {n} available devices")
    arr = np.asarray(devices).reshape(data, frames)
    return Mesh(arr, ("data", "frames"))


def batch_sharding(mesh: Mesh, *, frame_axis: bool = True) -> NamedSharding:
    """Sharding for [B, K, ...] video batches: B->'data', K->'frames'."""
    spec = P("data", "frames" if frame_axis else None)
    return NamedSharding(mesh, spec)


def label_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, frames: jax.Array, labels: jax.Array,
                *, frame_axis: bool = False):
    """Place a host batch onto the mesh with batch (and frame) sharding."""
    fs = batch_sharding(mesh, frame_axis=frame_axis)
    ls = label_sharding(mesh)
    return jax.device_put(frames, fs), jax.device_put(labels, ls)


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicate(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
