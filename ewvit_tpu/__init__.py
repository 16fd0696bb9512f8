"""ewvit_tpu — TPU-native Efficient Wavelet ViT framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
``Sheldon-Xiao9/efficient-wavelet-vit`` video deepfake detector:

- ``ops``      — TPU compute primitives (Pallas Haar DWT filter bank,
                 attention, on-device image preprocessing).
- ``models``   — Flax modules: EfficientNet-B0 / V2-S backbones, MWT
                 frequency branch, SFE EfficientViT spatial branch, DAMA
                 cross-attention fusion, and the top-level DeepfakeDetector.
- ``train``    — losses, optimizer/schedule construction, jitted
                 train/eval steps with gradient accumulation, Orbax
                 checkpointing.
- ``parallel`` — device-mesh construction and sharding rules
                 (data-parallel batch axis + frame/context axis).
- ``data``     — host-side dataset manifests (FaceForensics++, Celeb-DF-v2,
                 diffusion images), curriculum sampling, prefetching loader.
- ``utils``    — metrics, visualization, FLOPs accounting.

Design notes: all device tensors are NHWC (TPU-native layout), compute
dtype defaults to bfloat16 with float32 parameters, per-frame processing
is expressed as ``lax.scan`` over fixed-size frame chunks (memory-bound
inner loop of the reference, /root/reference/network/dama.py:179-199),
and multi-chip execution uses ``jax.sharding.Mesh`` + NamedSharding with
XLA collectives (no hand-written communication layer).
"""

__version__ = "0.1.0"

from ewvit_tpu.configs import ArchConfig, ModelConfig  # noqa: F401
