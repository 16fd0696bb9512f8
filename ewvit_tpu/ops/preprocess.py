"""On-device batched image preprocessing (jitted, bf16-ready).

Device half of the reference transform chain
(/root/reference/config/transforms.py:91-117): the host ships uint8 NHWC crops
(ewvit_tpu.data.transforms handles decode/face-align/resize/crop) and this
module runs the photometric tail under jit so it fuses into the first conv:

  train: ColorJitter(brightness=0.01, contrast=0.01) -> /255 -> normalize
  eval : /255 -> normalize

torchvision ColorJitter semantics: factors drawn uniformly from
[1-b, 1+b] / [1-c, 1+c], brightness and contrast applied in random order
(transforms.py:107). Contrast blends with the mean of the grayscale image
(ITU-R 601-2 luma). All of this is elementwise VPU work — XLA fuses the whole
chain into a single pass over the batch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

_LUMA = (0.299, 0.587, 0.114)  # ITU-R 601-2, torchvision rgb_to_grayscale


def normalize(x: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """uint8/float [..., H, W, 3] -> normalized ``dtype`` (ImageNet stats)."""
    x = x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x.astype(jnp.float32)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def _blend(img, other, factor):
    return other + factor * (img - other)


def color_jitter(
    x: jax.Array,
    rng: jax.Array,
    brightness: float = 0.01,
    contrast: float = 0.01,
) -> jax.Array:
    """Per-image brightness/contrast jitter on float [0,1] images [..., H, W, 3]."""
    batch_shape = x.shape[:-3]
    kb, kc, ko = jax.random.split(rng, 3)
    bf = jax.random.uniform(
        kb, batch_shape, minval=1.0 - brightness, maxval=1.0 + brightness)
    cf = jax.random.uniform(
        kc, batch_shape, minval=1.0 - contrast, maxval=1.0 + contrast)
    order = jax.random.bernoulli(ko, 0.5, batch_shape)  # True: brightness first
    bf = bf[..., None, None, None]
    cf = cf[..., None, None, None]
    order = order[..., None, None, None]

    def bright(img):
        return jnp.clip(img * bf, 0.0, 1.0)

    def contr(img):
        luma = jnp.tensordot(img, jnp.asarray(_LUMA, img.dtype), axes=([-1], [0]))
        mean = luma.mean(axis=(-2, -1), keepdims=True)[..., None]
        return jnp.clip(_blend(img, mean, cf), 0.0, 1.0)

    return jnp.where(order, contr(bright(x)), bright(contr(x)))


@functools.partial(jax.jit, static_argnames=("train", "dtype_name"))
def preprocess_batch(
    frames: jax.Array,
    rng: Optional[jax.Array] = None,
    *,
    train: bool = False,
    dtype_name: str = "bfloat16",
) -> jax.Array:
    """uint8 [B, K, H, W, 3] -> normalized [B, K, H, W, 3] in compute dtype."""
    x = frames.astype(jnp.float32) / 255.0
    if train:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        x = color_jitter(x, rng)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return ((x - mean) / std).astype(jnp.dtype(dtype_name))
