#!/usr/bin/env python
"""Convert checkpoints between the reference's torch ``.pth`` format and Orbax.

Two directions:

- ``--to-orbax ref.pth out_dir``: a reference DeepfakeDetector checkpoint
  (any of the three layouts the reference emits — raw state_dict /
  ``model_state_dict`` / ``state_dict``, plus DataParallel ``module.``
  prefixes; /root/reference/train.py:306-319, eval.py:65-74) becomes an
  Orbax directory that ``eval.py --model-path`` / ``evaluation.load_model``
  restores directly. The optimizer state is freshly initialized (the torch
  Adam moments do not transfer across frameworks), so the result is an
  eval/finetune starting point, exactly like loading a ``.pth`` in the
  reference's eval.py.

- ``--to-pth ckpt_dir out.pth``: an Orbax checkpoint trained here is
  exported back to the reference's state-dict naming, loadable by the
  reference's own eval.py / test.py / plot tools (torch required).

Note ``eval.py --model-path model.pth`` also works WITHOUT this tool —
``evaluation.load_model`` converts ``.pth`` on the fly; use this CLI when
you want the converted artifact on disk (faster repeat loads, or to hand
to mesh-sharded jobs).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(
        description="reference .pth <-> Orbax checkpoint conversion")
    sub = p.add_subparsers(dest="cmd", required=True)

    to_orbax = sub.add_parser("to-orbax", help=".pth -> Orbax directory")
    to_orbax.add_argument("pth", help="reference .pth checkpoint")
    to_orbax.add_argument("out", help="output Orbax directory")
    to_orbax.add_argument("--dim", type=int, default=128,
                          help="dama feature dim (reference --dim)")

    to_pth = sub.add_parser("to-pth", help="Orbax checkpoint -> .pth")
    to_pth.add_argument("ckpt", help="Orbax checkpoint directory")
    to_pth.add_argument("out", help="output .pth path")
    to_pth.add_argument("--dim", type=int, default=128)
    to_pth.add_argument("--tiny", action="store_true",
                        help="ModelConfig.tiny() layout (tests)")
    return p.parse_args()


def _cfg(args):
    from ewvit_tpu.configs import ModelConfig

    if getattr(args, "tiny", False):
        return ModelConfig.tiny()
    return ModelConfig(dama_dim=args.dim)


def to_orbax(args) -> str:
    import jax

    from ewvit_tpu.models.detector import init_detector
    from ewvit_tpu.train.checkpoint import CheckpointManager
    from ewvit_tpu.train.optimizer import make_optimizer
    from ewvit_tpu.train.steps import create_train_state
    from ewvit_tpu.utils.torch_convert import convert_checkpoint

    variables, report = convert_checkpoint(args.pth)
    if report["missing_torch_keys"]:
        raise SystemExit(
            f"{args.pth}: {len(report['missing_torch_keys'])} expected torch "
            f"keys missing (first: {report['missing_torch_keys'][:5]})")
    if report["unmapped_torch_keys"]:
        print(f"note: {len(report['unmapped_torch_keys'])} torch keys "
              f"unmapped (e.g. {report['unmapped_torch_keys'][:3]})")

    tx = make_optimizer(variables["params"])
    state, _ = create_train_state(variables, tx)
    out = os.path.abspath(args.out)
    mgr = CheckpointManager(os.path.dirname(out) or ".")
    # save under the exact directory name requested
    mgr._ckptr.save(out, {
        "epoch": 0, "best_val_auc": 0.0, "params": state.params,
        "batch_stats": state.batch_stats, "opt_state": state.opt_state,
        "step": state.step,
    }, force=True)
    mgr._ckptr.wait_until_finished()
    print(f"wrote {out}")
    return out


def to_pth(args) -> str:
    import torch

    from ewvit_tpu.evaluation import load_model
    from ewvit_tpu.utils.torch_convert import flax_to_torch_state_dict

    _, variables = load_model(args.ckpt, _cfg(args))
    sd = {k: torch.from_numpy(v.copy())
          for k, v in flax_to_torch_state_dict(variables).items()}
    out = os.path.abspath(args.out)
    # reference train.py:313-319 full-checkpoint layout (model only)
    torch.save({"model_state_dict": sd}, out)
    print(f"wrote {out} ({len(sd)} tensors)")
    return out


def main():
    args = parse_args()
    from ewvit_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    if args.cmd == "to-orbax":
        to_orbax(args)
    else:
        to_pth(args)


if __name__ == "__main__":
    main()
