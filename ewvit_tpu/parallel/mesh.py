"""TPU mesh + sharding rules.

TPU-native replacement for the reference's only multi-device path —
single-process ``nn.DataParallel`` (/root/reference/train.py:249-251). Here:

- a ``jax.sharding.Mesh`` over ('dcn', 'data', 'frames') axes: 'data' and
  'frames' ride ICI within a slice; 'dcn' is the slice-to-slice axis over the
  data-center network for multi-slice/pod-scale training;
- inputs ``[B, K, H, W, C]`` shard B over ('dcn', 'data') and K over 'frames';
- params/optimizer state are replicated; XLA GSPMD inserts the gradient
  all-reduce automatically when the jitted train step receives sharded
  batches and replicated params. With a DCN axis the reduce is hierarchical
  (reduce-scatter/all-gather over ICI inside each slice, one cross-slice
  all-reduce over DCN) — XLA derives that from the hybrid device order.

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

AXES = ("dcn", "data", "frames")


def _num_slices(devices: Sequence[jax.Device]) -> int:
    """Count distinct TPU slices (1 on CPU / single-slice)."""
    ids = set()
    for d in devices:
        ids.add(getattr(d, "slice_index", 0) or 0)
    return max(1, len(ids))


def make_mesh(data: Optional[int] = None, frames: int = 1,
              dcn: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('dcn', 'data', 'frames') mesh.

    Defaults: 'dcn' = number of detected TPU slices (1 on CPU or a single
    slice), all remaining devices on 'data'. On a real multi-slice job the
    device grid comes from ``mesh_utils.create_hybrid_device_mesh`` so that
    the 'dcn' axis maps to slice boundaries (collectives over 'data'/'frames'
    stay on ICI); elsewhere (CPU tests, virtual meshes) a plain row-major
    reshape keeps 'dcn' slowest-varying, which simulates the same topology.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dcn is None:
        dcn = _num_slices(devices)
        if n % dcn != 0:  # heterogeneous listing; fall back to one slice
            dcn = 1
    assert n % dcn == 0, f"{n} devices not divisible by dcn={dcn}"
    per_slice = n // dcn
    if data is None:
        assert per_slice % frames == 0, (
            f"{per_slice} per-slice devices not divisible by frames={frames}")
        data = per_slice // frames
    assert dcn * data * frames == n, (
        f"mesh {dcn}x{data}x{frames} != {n} available devices")

    arr = None
    if dcn > 1 and _num_slices(devices) == dcn:
        try:  # slice-aware placement: ICI axes inside a slice, dcn across
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                (1, data, frames), (dcn, 1, 1), devices=devices)
        except Exception:  # virtual slices / older jax: row-major fallback
            arr = None
            import warnings

            warnings.warn(
                "create_hybrid_device_mesh failed on a multi-slice device "
                "set; falling back to a row-major reshape. If device order "
                "interleaves slices, 'data'/'frames' collectives may cross "
                "slice boundaries and ride DCN instead of ICI.",
                RuntimeWarning, stacklevel=2)
    if arr is None:
        arr = np.asarray(devices).reshape(dcn, data, frames)
    return Mesh(arr, AXES)


def batch_sharding(mesh: Mesh, *, frame_axis: bool = True) -> NamedSharding:
    """Sharding for [B, K, ...] video batches: B->('dcn','data'), K->'frames'."""
    spec = P(("dcn", "data"), "frames" if frame_axis else None)
    return NamedSharding(mesh, spec)


def label_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(("dcn", "data")))


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
