"""End-to-end per-asset marginal benchmark for both inference stages.

Runs each stage's full pipeline TWICE in one process at production shapes
(random weights — kernel timing is weight-independent): the first run pays
compiles/caches, the second is the steady-state marginal an N-asset batch
job sees per asset. Stages run sequentially and each engine is released
before the next loads (16 GB chip; see pipelines/full.py docstring).

Set HI3D_TIME_PHASES=1 (default here) for the per-phase breakdown lines.
Prints one JSON summary line at the end.

With --encoder_reuse k (k ≥ 2) each stage ALSO runs the encoder-propagation
turbo path (same seed/noise) and reports its marginal plus the PSNR between
turbo and exact outputs — the speed/quality trade of the approximation.
--cfg_interval LO HI does the same A/B for the guidance-interval turbo
(CFG only where σ ∈ [LO, HI]; arXiv 2404.07724).

Usage: python tools/bench_e2e.py [--stage 1|2|both] [--res1 512 --res2 1024]
       [--encoder_reuse 2] [--cfg_interval 0.3 6.0]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HI3D_TIME_PHASES", "1")

import numpy as np


def _demo_frames(t: int, res: int) -> np.ndarray:
    """Shaded-sphere frames (T, res, res, 3) in [-1, 1] (assets/demo)."""
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32)
    cy = cx = res / 2.0
    r = res * 0.35
    d2 = (yy - cy) ** 2 + (xx - cx) ** 2
    mask = d2 < r * r
    shade = np.clip(1.0 - np.sqrt(d2) / r, 0.0, 1.0)
    img = np.ones((res, res, 3), np.float32)
    for c, tint in enumerate((0.9, 0.6, 0.3)):
        img[..., c] = np.where(mask, shade * tint + 0.1, 1.0)
    return np.repeat((img * 2.0 - 1.0)[None], t, axis=0)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR in dB over [-1, 1]-ranged frames (peak-to-peak 2.0), capped at
    99 dB (identical outputs) so the summary stays strict JSON — Infinity is
    not valid JSON and would break the one-parseable-line contract."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return 99.0
    return min(10.0 * np.log10(4.0 / mse), 99.0)


def bench_stage1(res: int, t: int, encoder_reuse: int = 0,
                 cfg_interval=None, uint8: bool = False) -> dict:
    import jax

    from hi3d_tpu.pipelines.common import create_model
    from hi3d_tpu.pipelines.i2v import generate_orbit

    t0 = time.time()
    model, _ = create_model("configs/inference-v01.yaml")
    t_build = time.time() - t0
    t0 = time.time()
    model.init(latent_hw=(32, 32), num_frames=2)  # structure-only init
    t_init = time.time() - t0
    t0 = time.time()
    model.cast_weights_to_compute_dtype()
    t_cast = time.time() - t0
    print(f"[phases:stage1-setup] build {t_build:.1f}s, init {t_init:.1f}s, "
          f"cast {t_cast:.1f}s", flush=True)
    model.num_samples = t
    frames = _demo_frames(t, res)

    odt = "uint8" if uint8 else "float32"
    t0 = time.time()
    generate_orbit(model, frames, elevation=0.0, rng=jax.random.PRNGKey(0),
                   output_dtype=odt)
    cold = time.time() - t0
    t0 = time.time()
    exact = generate_orbit(model, frames, elevation=0.0,
                           rng=jax.random.PRNGKey(1), output_dtype=odt)
    marginal = time.time() - t0
    if uint8:
        exact = exact.astype(np.float32) / 127.5 - 1.0  # for PSNR baselines
    out = {"stage1_cold_s": round(cold, 1),
           "stage1_marginal_s": round(marginal, 2)}
    if encoder_reuse:
        k = int(encoder_reuse)
        generate_orbit(model, frames, elevation=0.0,
                       rng=jax.random.PRNGKey(0), encoder_reuse=k)  # compile
        t0 = time.time()
        turbo = generate_orbit(model, frames, elevation=0.0,
                               rng=jax.random.PRNGKey(1), encoder_reuse=k)
        out[f"stage1_turbo_k{k}_marginal_s"] = round(time.time() - t0, 2)
        out[f"stage1_turbo_k{k}_psnr_db"] = round(_psnr(turbo, exact), 2)
    if cfg_interval is not None:
        ci = tuple(cfg_interval)
        generate_orbit(model, frames, elevation=0.0,
                       rng=jax.random.PRNGKey(0), cfg_interval=ci)  # compile
        t0 = time.time()
        turbo = generate_orbit(model, frames, elevation=0.0,
                               rng=jax.random.PRNGKey(1), cfg_interval=ci)
        out["stage1_cfgint_marginal_s"] = round(time.time() - t0, 2)
        out["stage1_cfgint_psnr_db"] = round(_psnr(turbo, exact), 2)
    del model
    gc.collect()
    return out


def bench_stage2(res: int, t: int, encoder_reuse: int = 0,
                 cfg_interval=None, uint8: bool = False) -> dict:
    import jax

    from hi3d_tpu.pipelines.common import create_model
    from hi3d_tpu.pipelines.v2v import blend_refine
    from hi3d_tpu.utils.image import foreground_mask_from_white

    t0 = time.time()
    model, _ = create_model("configs/inference-v02.yaml")
    t_build = time.time() - t0
    t0 = time.time()
    model.init(latent_hw=(32, 32), num_frames=2)  # structure-only init
    t_init = time.time() - t0
    t0 = time.time()
    model.cast_weights_to_compute_dtype()
    t_cast = time.time() - t0
    print(f"[phases:stage2-setup] build {t_build:.1f}s, init {t_init:.1f}s, "
          f"cast {t_cast:.1f}s", flush=True)
    model.num_samples = t
    frames = _demo_frames(t, res)
    masks = np.stack([
        foreground_mask_from_white(((f + 1.0) * 127.5).astype(np.uint8))
        for f in frames
    ])

    odt = "uint8" if uint8 else "float32"
    t0 = time.time()
    blend_refine(model, frames, masks, rng=jax.random.PRNGKey(0),
                 output_dtype=odt)
    cold = time.time() - t0
    t0 = time.time()
    exact = blend_refine(model, frames, masks, rng=jax.random.PRNGKey(1),
                         output_dtype=odt)
    marginal = time.time() - t0
    if uint8:
        exact = exact.astype(np.float32) / 127.5 - 1.0
    out = {"stage2_cold_s": round(cold, 1),
           "stage2_marginal_s": round(marginal, 2)}
    if encoder_reuse:
        k = int(encoder_reuse)
        blend_refine(model, frames, masks, rng=jax.random.PRNGKey(0),
                     encoder_reuse=k)  # compile
        t0 = time.time()
        turbo = blend_refine(model, frames, masks, rng=jax.random.PRNGKey(1),
                             encoder_reuse=k)
        out[f"stage2_turbo_k{k}_marginal_s"] = round(time.time() - t0, 2)
        out[f"stage2_turbo_k{k}_psnr_db"] = round(_psnr(turbo, exact), 2)
    if cfg_interval is not None:
        ci = tuple(cfg_interval)
        blend_refine(model, frames, masks, rng=jax.random.PRNGKey(0),
                     cfg_interval=ci)  # compile
        t0 = time.time()
        turbo = blend_refine(model, frames, masks, rng=jax.random.PRNGKey(1),
                             cfg_interval=ci)
        out["stage2_cfgint_marginal_s"] = round(time.time() - t0, 2)
        out["stage2_cfgint_psnr_db"] = round(_psnr(turbo, exact), 2)
    del model
    gc.collect()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="both", choices=["1", "2", "both"])
    ap.add_argument("--res1", type=int, default=512)
    ap.add_argument("--res2", type=int, default=1024)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--encoder_reuse", type=int, default=0,
                    help="also A/B the turbo path at this k (0 = off)")
    ap.add_argument("--cfg_interval", type=float, nargs=2, default=None,
                    metavar=("LO", "HI"),
                    help="also A/B the guidance-interval turbo (CFG only "
                         "where σ in [LO, HI])")
    ap.add_argument("--uint8", action="store_true",
                    help="denormalize to uint8 on device before the "
                         "device→host transfer (the production CLI path)")
    args = ap.parse_args()

    out = {}
    if args.stage in ("1", "both"):
        out.update(bench_stage1(args.res1, args.frames, args.encoder_reuse,
                                args.cfg_interval, uint8=args.uint8))
    if args.stage in ("2", "both"):
        out.update(bench_stage2(args.res2, args.frames, args.encoder_reuse,
                                args.cfg_interval, uint8=args.uint8))
    if "stage1_marginal_s" in out and "stage2_marginal_s" in out:
        out["asset_marginal_s"] = round(
            out["stage1_marginal_s"] + out["stage2_marginal_s"], 2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
