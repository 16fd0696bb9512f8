"""One-command learning proof: fixture gen -> train.py -> eval.py -> asserts.

Pins the round-4 learning proof (BASELINE.md "Learning proof" §3: the
300-step flagship curriculum run + eval round trip) as a REPEATABLE harness
so perf work can't silently regress learning (VERDICT r4 #6). Drives the
real CLIs as subprocesses — nothing stubbed:

1. ``tools/make_synthetic_fixture.py`` — FF++-layout fixture whose fakes
   carry a pixel-scale checkerboard (the MWT HF branch's sweet spot).
2. ``train.py`` — the production training CLI on that fixture.
3. ``eval.py`` — the production eval CLI on the run's ``best_model``.
4. Asserts: train loss actually declined, best val AUC and held-out test
   AUC/ACC over thresholds. Exit 0 = the stack still learns.

Two profiles:
  --flagship  : the round-4 recipe (224px, 48 pairs spread over 5 methods,
                25 epochs x 12 steps = 300 optimizer steps, B=4 accum=2 K=8
                lr=3e-4 --no-remat --save-every 25). ~minutes on the chip.
  (default)   : tiny 64px profile for CPU/CI (12 pairs, 6 epochs) with
                correspondingly looser thresholds.

Usage:
  python tools/run_learning_proof.py [--flagship] [--workdir DIR] [--keep]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(script: str, *argv: str, timeout: int, env=None) -> str:
    cmd = [sys.executable, os.path.join(REPO, script), *argv]
    print(f"$ {' '.join(cmd)}", flush=True)
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout,
                       cwd=REPO, env=env)
    sys.stdout.write(r.stdout[-4000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise SystemExit(f"{script} failed (rc={r.returncode})")
    return r.stdout


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flagship", action="store_true",
                    help="224px round-4 recipe (chip-scale); default is the "
                         "tiny 64px CPU profile")
    ap.add_argument("--workdir", type=str, default=None,
                    help="where fixture + run outputs go (default: tmpdir)")
    ap.add_argument("--keep", action="store_true",
                    help="keep the workdir for inspection")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override the profile's epoch count")
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="ewvit_proof_")
    os.makedirs(work, exist_ok=True)
    fixture = os.path.join(work, "fixture")
    train_out = os.path.join(work, "train")
    eval_out = os.path.join(work, "eval")

    if args.flagship:
        # BASELINE.md "Learning proof" §3 — the 300-step curriculum recipe
        epochs = args.epochs or 25
        fixture_args = ["--pairs", "48", "--val-pairs", "4", "--frames", "8",
                        "--methods", *"Deepfakes Face2Face FaceSwap "
                        "NeuralTextures FaceShifter".split(),
                        "--spread-methods"]
        train_args = ["--batch-size", "4", "--accum-steps", "2",
                      "--frame-count", "8", "--lr", "3e-4", "--no-remat",
                      "--save-every", str(epochs),
                      "--epochs", str(epochs), "--num-workers", "2"]
        eval_args = ["--batch-size", "4", "--frame-count", "8",
                     "--num-workers", "2"]
        # the 300-step run reached 0.0014; 0.05 leaves 35x headroom while
        # still catching any real optimization regression
        max_final_loss, min_val_auc = 0.05, 0.99
        min_test_auc, min_test_acc = 0.99, 0.95
        timeout = 5400
    else:
        epochs = args.epochs or 10
        # 129px sources: tiny models resize(129)->crop(64), so the resize is
        # a no-op and the center crop preserves the pixel-scale signal. All
        # 5 method roots must exist for the FF++ loader; spread keeps the
        # PNG count at one method's worth.
        fixture_args = ["--pairs", "12", "--val-pairs", "4", "--frames", "4",
                        "--size", "129", "--amp", "32",
                        "--methods", *"Deepfakes Face2Face FaceSwap "
                        "NeuralTextures FaceShifter".split(),
                        "--spread-methods"]
        train_args = ["--tiny", "--batch-size", "4", "--accum-steps", "2",
                      "--frame-count", "4", "--lr", "1e-3",
                      "--epochs", str(epochs), "--num-workers", "0"]
        eval_args = ["--tiny", "--batch-size", "4", "--frame-count", "4",
                     "--num-workers", "0"]
        max_final_loss, min_val_auc = 0.55, 0.75
        min_test_auc, min_test_acc = 0.75, 0.6
        timeout = 2400

    # tiny profile pins CPU so the proof never contends with chip work;
    # flagship inherits the default platform (the real TPU)
    env = (None if args.flagship
           else dict(os.environ, EWVIT_PLATFORM="cpu", EWVIT_CPU_DEVICES="1"))

    try:
        run("tools/make_synthetic_fixture.py", fixture, *fixture_args,
            timeout=300)
        stdout = run("train.py", "--root", fixture, "--output", train_out,
                     *train_args, timeout=timeout, env=env)

        losses = [float(m) for m in re.findall(
            r"train_loss=([0-9.]+)", stdout)]
        best_auc_m = re.search(r"Best val AUC: ([0-9.]+)", stdout)
        assert len(losses) == epochs, f"expected {epochs} epochs, {losses}"
        assert best_auc_m, "train.py printed no Best val AUC"
        best_val_auc = float(best_auc_m.group(1))
        final_loss = losses[-1]

        best_model = os.path.join(train_out, "checkpoints", "best_model")
        run("eval.py", "--root", fixture, "--model-path", best_model,
            "--output", eval_out, *eval_args, timeout=timeout, env=env)
        with open(os.path.join(eval_out, "eval_results.csv")) as f:
            rows = {r["name"]: r for r in csv.DictReader(f)}
        test_auc = float(rows["overall"]["auc"])
        test_acc = float(rows["overall"]["accuracy"])

        checks = {
            f"final train loss {final_loss:.4f} <= {max_final_loss}":
                final_loss <= max_final_loss,
            f"loss declined {losses[0]:.4f} -> {final_loss:.4f}":
                final_loss < losses[0],
            f"best val AUC {best_val_auc:.4f} >= {min_val_auc}":
                best_val_auc >= min_val_auc,
            f"test AUC {test_auc:.4f} >= {min_test_auc}":
                test_auc >= min_test_auc,
            f"test ACC {test_acc:.4f} >= {min_test_acc}":
                test_acc >= min_test_acc,
        }
        failed = [msg for msg, ok in checks.items() if not ok]
        for msg, ok in checks.items():
            print(("PASS  " if ok else "FAIL  ") + msg)
        print(json.dumps({
            "metric": "learning_proof",
            "profile": "flagship" if args.flagship else "tiny",
            "epochs": epochs, "first_loss": losses[0],
            "final_loss": final_loss, "best_val_auc": best_val_auc,
            "test_auc": test_auc, "test_acc": test_acc,
            "ok": not failed,
        }))
        return 1 if failed else 0
    finally:
        if not args.keep and args.workdir is None:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
