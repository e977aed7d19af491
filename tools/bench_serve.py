"""Batched stage-1 serving throughput: assets/min at B = 1, 2 on one chip.

BASELINE.json config 5 is "8 concurrent assets on v5e-8 with sharded UNet
denoiser + tiled VAE decode". On a v5e-8 that layout is zero-communication
(each chip runs its own asset's frames — docs/SCALING.md "Throughput"), so
the per-chip batching efficiency measured here IS the 8-chip number: 8 chips
at batch B serve 8·B assets at the same wall-clock as this one-chip run.

Measures OrbitServer.generate (conditioner → 25-step CFG sampler scan →
chunked VAE decode, full 16 frames @ 512²) steady-state: one warm run, then
`--reps` timed runs per batch size.

Prints one JSON line per batch size.

Usage: python tools/bench_serve.py [--batches 1,2] [--reps 2] [--res 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _demo_images(b: int, res: int) -> np.ndarray:
    """Shaded spheres (B, res, res, 3) in [-1, 1], one tint per asset."""
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32)
    cy = cx = res / 2.0
    r = res * 0.35
    d2 = (yy - cy) ** 2 + (xx - cx) ** 2
    mask = d2 < r * r
    shade = np.clip(1.0 - np.sqrt(d2) / r, 0.0, 1.0)
    out = np.ones((b, res, res, 3), np.float32)
    for i in range(b):
        for c in range(3):
            tint = 0.3 + 0.6 * ((i + c) % 3) / 2.0
            out[i, ..., c] = np.where(mask, shade * tint + 0.1, 1.0)
    return out * 2.0 - 1.0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,2")
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--steps", type=int, default=0,
                   help="override sampler steps (0 = config's 25); for "
                        "CPU smoke runs")
    args = p.parse_args()

    import jax  # compile-cache config is owned by the hi3d_tpu package import

    from hi3d_tpu.parallel.mesh import make_mesh
    from hi3d_tpu.pipelines.common import create_model
    from hi3d_tpu.pipelines.serve import OrbitServer

    model, _ = create_model("configs/inference-v01.yaml")
    model.init(latent_hw=(32, 32), num_frames=2)  # structure-only init
    model.cast_weights_to_compute_dtype()
    model.num_samples = args.frames
    if args.steps:
        model.sampler.num_steps = args.steps
    mesh = make_mesh(data=jax.device_count())
    server = OrbitServer(model, mesh=mesh)

    for b in (int(x) for x in args.batches.split(",")):
        images = _demo_images(b, args.res)
        rng = jax.random.PRNGKey(0)
        t0 = time.time()
        server.generate(images, rng=rng, output_dtype="uint8")  # compile+warm
        warm = time.time() - t0
        t0 = time.time()
        for i in range(args.reps):
            # production export path: uint8 frames off-device
            server.generate(images, rng=jax.random.fold_in(rng, i),
                            output_dtype="uint8")
        dt = (time.time() - t0) / args.reps
        print(json.dumps({
            "metric": f"stage1_serve_assets_per_min_chip_b{b}",
            "value": round(60.0 * b / dt, 3),
            "unit": "assets/min/chip",
            "sec_per_batch": round(dt, 2),
            "sec_per_asset": round(dt / b, 2),
            "warm_first_run_s": round(warm, 1),
            "batch": b,
            "frames": args.frames,
            "res": args.res,
        }), flush=True)


if __name__ == "__main__":
    main()
