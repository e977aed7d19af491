"""Capture a TPU profile of the stage-1 denoise step and summarize op costs.

Usage: python tools/profile_step.py [--trace-dir /tmp/hi3d_trace]
Parses the chrome-trace JSON the profiler emits and prints the top op
categories by total device time — the profile-then-optimize loop of
SURVEY.md §7 step 10.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict


def run_step(trace_dir: str, stage2: bool = False, dump_hlo: str | None = None) -> None:
    import jax
    import jax.numpy as jnp

    from hi3d_tpu.diffusion.denoiser import Denoiser
    from hi3d_tpu.models.wrappers import ConcatConditionWrapper
    from __graft_entry__ import _unet, _zero_params

    if stage2:
        # 1024² latent grid, 17 input channels, adm 512 (train-v02.yaml:35-38)
        T, H, W = 16, 128, 128
    else:
        T, H, W = 16, 64, 64
    dtype = jnp.bfloat16
    if stage2:
        model = _unet(scale=1.0, in_channels=17, dtype=dtype,
                      adm_in_channels=512)
    else:
        model = _unet(scale=1.0, dtype=dtype)
    bt = 2 * T
    x = jnp.zeros((bt, H, W, 4), dtype)
    concat = jnp.zeros((bt, H, W, model.in_channels - 4), dtype)
    ctx = jnp.zeros((2, 1, model.context_dim), dtype)
    y = jnp.zeros((2, model.adm_in_channels), dtype)
    ind = jnp.zeros((2, T))
    sigma = jnp.full((bt,), 1.0, jnp.float32)
    params = _zero_params(
        model, jnp.concatenate([x, concat], axis=-1), jnp.zeros((bt,)),
        context=ctx, y=y, num_video_frames=T, image_only_indicator=ind,
    )
    wrapper = ConcatConditionWrapper(model)
    denoiser = Denoiser(
        {"target": "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"}
    )

    @jax.jit
    def step(params, x, sigma, concat, ctx, y):
        network = wrapper.bind(params, num_video_frames=T, image_only_indicator=ind)
        return denoiser(network, x, sigma, {"concat": concat, "crossattn": ctx, "vector": y})

    if dump_hlo:
        # optimized HLO text: op names here match the trace's event names,
        # so `--detail copy` hits can be located by shape/operand
        compiled = step.lower(params, x, sigma, concat, ctx, y).compile()
        with open(dump_hlo, "w") as f:
            f.write(compiled.as_text())
        print("optimized HLO ->", dump_hlo)
        return
    jax.block_until_ready(step(params, x, sigma, concat, ctx, y))
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = step(params, x, sigma, concat, ctx, y)
        jax.block_until_ready(out)


def summarize(trace_dir: str, top: int = 30) -> None:
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print("no trace found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # keep device-lane complete events only (TensorCore ops)
    pid_names = {
        e.get("pid"): e.get("args", {}).get("name", "")
        for e in events if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device" in n.lower() or "Chip" in n
    }
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = float(e.get("dur", 0.0))
        if not dur:
            continue
        key = name.split(".")[0].split("_fusion")[0]
        by_op[key] += dur
        total += dur
    print(f"trace: {path}")
    print(f"total device-op time: {total/1e3:.2f} ms (3 steps)")
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur/1e3:9.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {name}")


def detail(trace_dir: str, prefix: str, top: int = 40) -> None:
    """Itemize INDIVIDUAL ops whose name starts with `prefix` (e.g. 'copy',
    'transpose', 'fusion') — per-op total time, call count, and the full op
    name so the site can be located in the optimized HLO."""
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print("no trace found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {
        e.get("pid"): e.get("args", {}).get("name", "")
        for e in events if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device" in n.lower() or "Chip" in n
    }
    by_name = defaultdict(lambda: [0.0, 0])
    total = bucket = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = float(e.get("dur", 0.0))
        if not dur:
            continue
        total += dur
        name = e.get("name", "")
        if not name.startswith(prefix):
            continue
        bucket += dur
        rec = by_name[name]
        rec[0] += dur
        rec[1] += 1
    print(f"trace: {path}")
    print(
        f"'{prefix}*' bucket: {bucket/1e3:.2f} ms of {total/1e3:.2f} ms "
        f"({100*bucket/max(total,1e-9):.1f}%), {len(by_name)} distinct ops"
    )
    for name, (dur, cnt) in sorted(by_name.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{dur/1e3:9.3f} ms  ×{cnt:<4d} {name}")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/hi3d_trace")
    ap.add_argument("--summarize-only", action="store_true")
    ap.add_argument("--stage2", action="store_true",
                    help="profile the stage-2 step (16×1024², 17ch)")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--detail", default=None, metavar="PREFIX",
                    help="itemize individual ops with this name prefix "
                         "(e.g. copy / transpose / fusion)")
    ap.add_argument("--dump-hlo", default=None, metavar="PATH",
                    help="compile the step and write optimized HLO text "
                         "to PATH instead of profiling")
    args = ap.parse_args()
    if args.dump_hlo:
        run_step(args.trace_dir, stage2=args.stage2, dump_hlo=args.dump_hlo)
        sys.exit(0)
    if not args.summarize_only:
        run_step(args.trace_dir, stage2=args.stage2)
    if args.detail:
        detail(args.trace_dir, args.detail, top=args.top)
    else:
        summarize(args.trace_dir, top=args.top)
