"""DAMA — dynamic adaptive cross-attention fusion module (Flax, NHWC).

Behavioral equivalent of the reference DAMA (/root/reference/network/dama.py:80-206)
*per-frame* path (``_process_frame``, dama.py:130-169): the module owns its own
SFE (EfficientNetV2-S variant, feature-map head; dama.py:93-99) and MWT
(dama.py:102), runs bidirectional cross-attention between the 1-token spatial
and frequency descriptors, a conv fusion gate, and a 3-way softmax gate that
mixes {space, freq, fused}.

The reference's K-frame chunk loop with running means (dama.py:171-206) is NOT
inside this module: on TPU it is a ``jax.lax.scan`` over fixed-size chunks,
implemented functionally in :mod:`ewvit_tpu.models.detector` so the scan can
carry BN statistics and be rematerialized. This module processes one flattened
chunk ``[N, H, W, C]`` (N = batch * chunk).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from ewvit_tpu.configs import ArchConfig
from ewvit_tpu.models.layers import BidirectionalCrossTransformer
from ewvit_tpu.models.mwt import MWT
from ewvit_tpu.models.norm import TorchBatchNorm
from ewvit_tpu.models.sfe import EfficientViT

Dtype = Any


class DAMA(nn.Module):
    """Per-frame fusion: [N,H,W,3] -> {'fused','space','freq'} each [N, dim]."""

    arch: ArchConfig
    in_channels: int = 3
    dim: int = 128
    num_heads: int = 4
    levels: int = 3
    use_pallas_dwt: bool = False
    use_pallas_dama: bool = False
    use_fused_mwt_tail: bool = False
    fused_eval_pyramid: Any = "level"
    fused_train_pyramid: bool = False
    use_pallas_dwse: bool = False
    use_s2d_stem: bool = False
    pos_mode: str = "reference"
    backbone_spec: Any = None     # (b0, v2s) BackboneSpec pair (micro configs)
    backbone_factory: Any = None  # test-only (ModelConfig.backbone_factory)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, frames, *, train: bool = False,
                 return_intermediates: bool = False):
        n = frames.shape[0]

        # spatial branch: V2-S EfficientViT with feature-map head (dama.py:93-99)
        space_feats = EfficientViT(
            arch=self.arch, channels=1280, selected_efficient_net=1,
            feat_dim=self.dim, output_mode="feature_map",
            use_pallas_dwse=self.use_pallas_dwse,
            use_s2d_stem=self.use_s2d_stem, pos_mode=self.pos_mode,
            backbone_spec=self.backbone_spec,
            backbone_factory=self.backbone_factory, dtype=self.dtype,
            name="sfe",
        )(frames, train=train)                       # [N, 1, 1, dim]

        # frequency branch (dama.py:102)
        freq_feats = MWT(
            in_channels=self.in_channels, dama_dim=self.dim, levels=self.levels,
            use_pallas_dwt=self.use_pallas_dwt,
            use_fused_tail=self.use_fused_mwt_tail,
            fused_eval_pyramid=self.fused_eval_pyramid,
            fused_train_pyramid=self.fused_train_pyramid, dtype=self.dtype,
            name="mwt",
        )(frames, train=train)                       # [N, 1, 1, dim]

        h_out, w_out = space_feats.shape[1:3]

        # bidirectional cross-attention on flattened tokens (dama.py:143-145)
        space_flat = space_feats.reshape(n, h_out * w_out, self.dim)
        freq_flat = freq_feats.reshape(n, h_out * w_out, self.dim)
        cross = BidirectionalCrossTransformer(
            dim=self.dim, depth=2, heads=self.num_heads,
            dim_head=self.dim // self.num_heads, dropout=0.1,
            use_fused=self.use_pallas_dama,
            dtype=self.dtype, name="cross_att",
        )
        if return_intermediates:
            space_enh, freq_enh, attns = cross(
                space_flat, freq_flat, deterministic=not train, return_attn=True)
        else:
            space_enh, freq_enh = cross(space_flat, freq_flat,
                                        deterministic=not train)

        space_feats = space_enh.reshape(n, h_out, w_out, self.dim)
        freq_feats = freq_enh.reshape(n, h_out, w_out, self.dim)

        # conv fusion gate on the channel concat (dama.py:124-128, :152-153)
        concat = jnp.concatenate([space_feats, freq_feats], axis=-1)
        fused = nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="fusion_gate_conv")(concat)
        fused = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=self.dtype,
                               name="fusion_gate_bn")(fused)
        fused = nn.relu(fused)

        # 3-way softmax gate over GAP'd concat (dama.py:105-113, :156-157)
        g = jnp.mean(concat, axis=(1, 2))            # [N, 2*dim]
        g = nn.Dense(self.dim // 2, dtype=self.dtype, name="gate_fc1")(g)
        g = nn.relu(g)
        g = nn.Dropout(0.1)(g, deterministic=not train)
        g = nn.Dense(3, dtype=self.dtype, name="gate_fc2")(g)
        gate = nn.softmax(g.astype(jnp.float32), axis=-1).astype(fused.dtype)

        weighted = (
            gate[:, 0, None, None, None] * space_feats
            + gate[:, 1, None, None, None] * freq_feats
            + gate[:, 2, None, None, None] * fused
        )

        out: Dict[str, jnp.ndarray] = {
            "fused": weighted.mean(axis=(1, 2)),     # [N, dim] (dama.py:165-169)
            "space": space_feats.mean(axis=(1, 2)),
            "freq": freq_feats.mean(axis=(1, 2)),
        }
        if return_intermediates:
            out["intermediates"] = {
                "space_map": space_feats,
                "freq_map": freq_feats,
                "fused_map": fused,
                "gate_weights": gate,
                "attention": attns,
            }
        return out
