"""SFE — EfficientViT spatial feature extractor (Flax, NHWC).

Behavioral equivalent of the reference EfficientViT
(/root/reference/network/sfe.py:87-173): EfficientNet backbone -> patchify the
7x7x1280 feature map with patch_size 7 (=> a single patch, sfe.py:121) ->
linear embed to ``dim`` -> prepend CLS token -> add the *batch-indexed*
positional embedding -> 2-layer ViT -> either an MLP classification head on
the CLS token (``output_mode='cls'``) or a per-token feature map head
(``feat_map``: Dense(dim->feat_dim)+ReLU, reshaped to [N,1,1,feat_dim]).

Reproduced quirk (documented, reference sfe.py:126, :158-159): the positional
embedding has shape ``[emb_dim, 1, dim]`` and is added as
``x += pos_embedding[0:N]`` — each element of the flattened (batch*frames)
axis receives a *different* embedding indexed by its batch position, and the
model only supports flattened batches up to ``emb_dim`` (64). We keep the
semantics for checkpoint parity and raise a clear error above the limit.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ewvit_tpu.configs import ArchConfig
from ewvit_tpu.models.efficientnet import EfficientNetB0, EfficientNetV2S
from ewvit_tpu.models.layers import Transformer

Dtype = Any


class EfficientViT(nn.Module):
    """Backbone + tiny ViT. Input [N,H,W,3]; output depends on ``output_mode``.

    output_mode:
      - 'cls':          [N, num_classes] logits via mlp_head (sfe.py:163-166)
      - anything else:  [N, 1, 1, feat_dim] feature map (sfe.py:167-173)
    """

    arch: ArchConfig
    channels: int = 1280
    selected_efficient_net: int = 0    # 0 = B0, 1 = V2-S (sfe.py:106-113)
    feat_dim: int = 128
    output_mode: Optional[str] = None
    use_pallas_dwse: bool = False
    use_s2d_stem: bool = False
    # "reference": pos row = flattened batch index, hard error above emb_dim
    # (the reference quirk, sfe.py:158-159). "tile": row = index % emb_dim —
    # identical for flattened batches <= emb_dim, defined (and cheap) above
    # it, so larger frame chunks can feed the MXU (TPU serving extension).
    # "row0": every row gets pos row 0 — the semantics every frame sees in
    # the reference's PER-FRAME eval, where each frame is its own [1,1,...]
    # clip so N=1 and pos[0:1] applies (plot_celebdf_roc.py:31-72); lets
    # per-frame scoring batch B*K frames in one forward while staying
    # bit-faithful to the reference's frame-at-a-time loop.
    pos_mode: str = "reference"
    # Optional (b0_spec, v2s_spec) BackboneSpec pair overriding the block
    # stacks (ModelConfig.backbone_spec; used by ModelConfig.micro so the
    # multichip dryrun compiles fast on XLA:CPU).
    backbone_spec: Any = None
    # test-only injection point (ModelConfig.backbone_factory)
    backbone_factory: Any = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        a = self.arch
        p = a.patch_size
        if self.backbone_factory is not None:
            feats = self.backbone_factory(
                dtype=self.dtype, name="efficient_net")(img, train=train)
        elif self.selected_efficient_net == 0:
            feats = EfficientNetB0(
                use_pallas_dwse=self.use_pallas_dwse,
                use_s2d_stem=self.use_s2d_stem,
                spec=self.backbone_spec[0] if self.backbone_spec else None,
                dtype=self.dtype,
                name="efficient_net")(img, train=train)
        else:
            feats = EfficientNetV2S(
                use_pallas_dwse=self.use_pallas_dwse,
                use_s2d_stem=self.use_s2d_stem,
                spec=self.backbone_spec[1] if self.backbone_spec else None,
                dtype=self.dtype,
                name="efficient_net")(img, train=train)

        n, fh, fw, fc = feats.shape
        gh, gw = fh // p, fw // p
        # rearrange 'b (h p1) (w p2) c -> b (h w) (p1 p2 c)'; torch source is
        # NCHW but its per-patch order (p1, p2, c) equals NHWC flattening.
        y = feats.reshape(n, gh, p, gw, p, fc)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, gh * gw, p * p * fc)
        y = nn.Dense(a.dim, dtype=self.dtype, name="patch_to_embedding")(y)

        cls = self.param(
            "cls_token", nn.initializers.normal(stddev=1.0), (1, 1, a.dim),
            jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (n, 1, a.dim)).astype(y.dtype), y], axis=1
        )

        if n > a.emb_dim and self.pos_mode not in ("tile", "row0"):
            raise ValueError(
                f"flattened batch {n} exceeds emb_dim={a.emb_dim}: the "
                "reference's batch-indexed positional embedding "
                "(sfe.py:158-159) only supports up to emb_dim rows "
                "(pos_mode='tile' lifts the cap)"
            )
        pos = self.param(
            "pos_embedding", nn.initializers.normal(stddev=1.0),
            (a.emb_dim, 1, a.dim), jnp.float32,
        )
        if self.pos_mode == "row0":
            x = x + pos[0:1].astype(x.dtype)      # [1,1,dim] broadcast
        elif self.pos_mode == "tile" and n > a.emb_dim:
            rows = np.arange(n) % a.emb_dim   # static gather indices
            x = x + pos[rows].astype(x.dtype)
        else:
            x = x + pos[:n].astype(x.dtype)
        x = nn.Dropout(a.emb_dropout)(x, deterministic=not train)
        x = Transformer(
            a.dim, a.depth, a.heads, a.dim_head, a.mlp_dim,
            dropout=a.dropout, dtype=self.dtype, name="transformer",
        )(x, deterministic=not train)

        # BOTH heads are materialized regardless of output_mode — the torch
        # reference creates mlp_head AND feat_map unconditionally
        # (sfe.py:135-145), so checkpoints carry both. XLA dead-code
        # eliminates the unused branch at compile time (its result is never
        # returned), so this costs parameters only, not FLOPs.
        h = nn.Dense(a.mlp_dim, dtype=self.dtype, name="mlp_head_fc1")(x[:, 0])
        cls_out = nn.Dense(a.num_classes, dtype=self.dtype,
                           name="mlp_head_fc2")(nn.relu(h))

        tokens = x[:, 1:]                       # [N, num_patches, dim]
        f = nn.Dense(self.feat_dim, dtype=self.dtype, name="feat_map")(tokens)
        f = nn.relu(f)
        side = int(round(tokens.shape[1] ** 0.5))
        feat_out = f.reshape(n, side, side, self.feat_dim)  # NHWC feature map

        if self.output_mode == "cls":
            return cls_out
        return feat_out
