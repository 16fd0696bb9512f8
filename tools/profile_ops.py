"""Device-trace op accounting for the dynamic forward (or one component).

Captures a ``jax.profiler`` trace of N runs and aggregates per-op durations
from the chrome-trace JSON the profiler writes (TPU-native replacement for
the reference's absent profiling story, SURVEY.md §5 "Tracing / profiling";
the reference only wall-clocks epochs at /root/reference/train.py:296).

Usage:
    python tools/profile_ops.py [--component full|mwt|backbone|sfe] [--runs 5]
            [--top 30] [--batch 64]

Prints one line per HLO op class, sorted by total device time, with
occurrence counts — the data that drives kernel-optimization decisions
(see BASELINE.md "Roofline analysis").
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import tempfile

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ewvit_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_fn(component: str, batch: int):
    from ewvit_tpu.configs import ModelConfig
    from ewvit_tpu.models.detector import init_detector, video_forward

    cfg = ModelConfig()
    dt = jnp.dtype(cfg.compute_dtype)
    key = jax.random.PRNGKey(0)
    size = cfg.arch.image_size

    if component == "full":
        model, variables = init_detector(cfg, key)
        x = jax.random.normal(key, (2, batch // 2, size, size, 3), dt)
        fn = jax.jit(lambda v, c: video_forward(
            model, v, c, mode="dynamic", frame_chunk=batch // 2,
            train=False, remat=False)[0]["logits"])
        return fn, (variables, x)
    if component == "mwt":
        from ewvit_tpu.models.mwt import MWT
        m = MWT(dtype=dt)
        x = jax.random.normal(key, (batch, size, size, 3), dt)
        variables = m.init(key, x)
        return jax.jit(lambda v, xx: m.apply(v, xx)), (variables, x)
    if component == "backbone":
        from ewvit_tpu.models.efficientnet import EfficientNetV2S
        m = EfficientNetV2S(dtype=dt)
        x = jax.random.normal(key, (batch, size, size, 3), dt)
        variables = m.init(key, x)
        return jax.jit(lambda v, xx: m.apply(v, xx)), (variables, x)
    if component == "sfe":
        from ewvit_tpu.configs import ModelConfig as MC
        from ewvit_tpu.models.sfe import EfficientViT
        cfg = MC()
        m = EfficientViT(arch=cfg.arch, selected_efficient_net=1,
                         output_mode="feature_map", dtype=dt)
        x = jax.random.normal(key, (batch, size, size, 3), dt)
        variables = m.init(key, x)
        return jax.jit(lambda v, xx: m.apply(v, xx, train=False)), (variables, x)
    raise SystemExit(f"unknown component {component}")


def collect_device_events(logdir: str):
    """Aggregate device-op events from the chrome trace JSON."""
    paths = glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {logdir}")
    events = []
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    # pid -> process name, to keep only TPU/device tracks
    procs = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            procs[ev["pid"]] = ev.get("args", {}).get("name", "")
    device_pids = {p for p, n in procs.items()
                   if "TPU" in n or "/device" in n.lower()}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in device_pids:
            events.append(ev)
    return events, procs


def classify(name: str) -> str:
    """Collapse HLO op names to a readable class (fusion.123 -> fusion)."""
    base = name.split(".")[0]
    return base


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--component", default="full",
                    choices=["full", "mwt", "backbone", "sfe"])
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--by-name", action="store_true",
                    help="aggregate by full op name instead of class")
    args = ap.parse_args()

    fn, fargs = build_fn(args.component, args.batch)
    out = fn(*fargs)  # compile
    jax.block_until_ready(out)

    logdir = tempfile.mkdtemp(prefix="ewvit_prof_")
    with jax.profiler.trace(logdir):
        for _ in range(args.runs):
            out = fn(*fargs)
        jax.block_until_ready(out)
        import numpy as np
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # force completion

    events, procs = collect_device_events(logdir)
    if not events:
        print("process table:", procs)
        raise SystemExit("no device events captured")

    agg = collections.Counter()
    cnt = collections.Counter()
    for ev in events:
        k = ev["name"] if args.by_name else classify(ev["name"])
        agg[k] += ev.get("dur", 0)
        cnt[k] += 1
    total = sum(agg.values())
    print(f"# component={args.component} batch={args.batch} runs={args.runs} "
          f"total_device_us={total} per_run_us={total / args.runs:.0f}")
    for k, us in agg.most_common(args.top):
        print(f"{us / args.runs:>10.0f} us/run  {us / total * 100:5.1f}%  "
              f"x{cnt[k] // args.runs:<4d} {k}")
    print(f"trace dir: {logdir}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
