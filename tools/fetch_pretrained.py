#!/usr/bin/env python
"""Turnkey ImageNet-pretrained backbone fetch + conversion.

The reference builds every SFE on pretrained backbones
(/root/reference/network/sfe.py:108-119: efficientnet_pytorch B0 for the
detector's two B0 EfficientViTs, torchvision efficientnet_v2_s for DAMA's)
and freezes the first 6 backbone parameter tensors. This environment has no
egress and neither package, so weight VALUES cannot be verified here — the
architecture + converter are already oracle-verified
(tests/test_backbone_oracle.py). This tool makes the remaining step one
command in any egress-capable environment:

    python tools/fetch_pretrained.py --out ./pretrained_init

downloads both weight sets, converts them through the PRODUCTION converter
(utils/torch_convert.py `_convert_b0`/`_convert_v2s`), injects them into a
fresh detector variable tree at all three backbone sites (dama.sfe <- V2-S;
sfe, sfe_cls <- B0), asserts the reference's first-6 freeze order against
torch ``named_parameters`` order, and writes an Orbax checkpoint usable by
``train.py --resume`` / ``eval.py --model-path``.

``--dry-run`` exercises the ENTIRE pipeline offline using the state-dict-
identical oracle recreations (tests/torch_backbones.py) in place of the
downloads — covered by tests so the tool cannot rot while blocked.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def parse_args():
    p = argparse.ArgumentParser(description="fetch + convert ImageNet weights")
    p.add_argument("--out", default="./pretrained_init",
                   help="output Orbax checkpoint directory")
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--dry-run", action="store_true",
                   help="use the oracle torch recreations instead of "
                        "downloading (no egress needed; random weights)")
    p.add_argument("--skip-save", action="store_true",
                   help="validate conversion + freeze order only")
    return p.parse_args()


def _backbone_modules(dry_run: bool):
    """(b0_module, v2s_module) with package-identical state-dict naming."""
    if dry_run:
        sys.path.insert(0, os.path.join(REPO, "tests"))
        from torch_backbones import (TorchEfficientNetB0,
                                     TorchEfficientNetV2SFeatures,
                                     randomize_bn_stats_)

        b0 = TorchEfficientNetB0()
        v2s = TorchEfficientNetV2SFeatures()
        randomize_bn_stats_(b0, seed=1)
        randomize_bn_stats_(v2s, seed=2)
        return b0, v2s

    from efficientnet_pytorch import EfficientNet
    from torchvision.models import EfficientNet_V2_S_Weights, efficientnet_v2_s

    b0 = EfficientNet.from_pretrained("efficientnet-b0")
    v2s = efficientnet_v2_s(weights=EfficientNet_V2_S_Weights.IMAGENET1K_V1)
    return b0, v2s


def convert_backbone(sd, variant: str):
    """Package state dict -> ({'params','batch_stats'} subtree, entries)."""
    from ewvit_tpu.utils.torch_convert import (_TreeBuilder, _convert_b0,
                                               _convert_v2s)

    b = _TreeBuilder({f"x.{k}": v for k, v in sd.items()})
    (_convert_b0 if variant == "b0" else _convert_v2s)(b, "x", ())
    if b.missing:
        raise SystemExit(
            f"{variant}: {len(b.missing)} expected keys missing "
            f"(first: {b.missing[:5]}) — package layout changed?")
    return {"params": b.params, "batch_stats": b.stats}, b.entries


def assert_freeze_order(module, entries, variant: str) -> None:
    """The reference freezes the FIRST 6 named_parameters (sfe.py:115-119);
    assert that order maps exactly onto frozen_param_paths(variant)."""
    from ewvit_tpu.models.efficientnet import frozen_param_paths

    tmap = {tname: fpath for tname, coll, fpath, _ in entries
            if coll == "params"}
    first6 = []
    for name, _ in module.named_parameters():
        key = f"x.{name}"
        if key in tmap:
            first6.append(tmap[key])
        if len(first6) == 6:
            break
    expected = [tuple(p) for p in frozen_param_paths(variant)]
    got = [tuple(p) for p in first6]
    assert got == expected, (
        f"{variant} freeze order mismatch:\n  torch order: {got}\n"
        f"  frozen_param_paths: {expected}")


def _inject(tree, path, sub):
    node = tree
    for p in path[:-1]:
        node = node[p]
    assert path[-1] in node, f"no {path} in detector tree"
    node[path[-1]] = sub


def build_pretrained_variables(dry_run: bool, dim: int = 128):
    """Full detector variable tree with pretrained backbones injected."""
    import jax
    import numpy as np

    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.models.detector import init_detector_fast

    b0_mod, v2s_mod = _backbone_modules(dry_run)
    b0_sd = {k: v.detach().cpu().numpy()
             for k, v in b0_mod.state_dict().items()}
    v2s_sd = {k: v.detach().cpu().numpy()
              for k, v in v2s_mod.state_dict().items()}
    b0_tree, b0_entries = convert_backbone(b0_sd, "b0")
    v2s_tree, v2s_entries = convert_backbone(v2s_sd, "v2s")
    assert_freeze_order(b0_mod, b0_entries, "b0")
    assert_freeze_order(v2s_mod, v2s_entries, "v2s")
    print("freeze order OK (first 6 torch params == frozen_param_paths)")

    cfg = ModelConfig(dama_dim=dim)
    # heads/fusion params stay at this fast init; backbones are replaced
    # below. For a real training run the heads are random anyway (the
    # reference trains them from scratch, model.py:54-68).
    _, variables = init_detector_fast(cfg, seed=0)

    sites = [(("dama", "sfe", "efficient_net"), v2s_tree),
             (("sfe", "efficient_net"), b0_tree),
             (("sfe_cls", "efficient_net"), b0_tree)]
    for path, tree in sites:
        for coll in ("params", "batch_stats"):
            # shape-check against the init tree before replacing
            ref = variables[coll]
            for p in path:
                ref = ref[p]
            ref_leaves = jax.tree_util.tree_leaves_with_path(ref)
            new = dict(jax.tree_util.tree_leaves_with_path(tree[coll]))
            assert len(ref_leaves) == len(new), (path, coll)
            for kp, leaf in ref_leaves:
                assert np.shape(new[kp]) == np.shape(leaf), (
                    f"shape mismatch at {path}+{kp}: "
                    f"{np.shape(new[kp])} vs {np.shape(leaf)}")
            _inject(variables[coll], path, tree[coll])
    print(f"injected pretrained backbones at {[s[0] for s in sites]}")
    return cfg, variables


def main():
    args = parse_args()
    from ewvit_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    cfg, variables = build_pretrained_variables(args.dry_run, args.dim)
    if args.skip_save:
        print("validation-only run complete")
        return
    from ewvit_tpu.train.checkpoint import CheckpointManager
    from ewvit_tpu.train.optimizer import make_optimizer
    from ewvit_tpu.train.steps import create_train_state

    tx = make_optimizer(variables["params"])
    state, _ = create_train_state(variables, tx)
    out = os.path.abspath(args.out)
    mgr = CheckpointManager(os.path.dirname(out) or ".")
    mgr._ckptr.save(out, {
        "epoch": -1, "best_val_auc": 0.0, "params": state.params,
        "batch_stats": state.batch_stats, "opt_state": state.opt_state,
        "step": state.step,
    }, force=True)
    mgr._ckptr.wait_until_finished()
    print(f"wrote {out} — start training with train.py --resume {out}")


if __name__ == "__main__":
    main()
