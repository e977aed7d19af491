"""Stage-2 denoise-step benchmark: CFG-doubled VideoUNet forward over a
16-frame video at 1024² (128×128 latent, 17 input channels: 4 latent + 9
depth + 4 cond-video latent, adm 512 — reference configs/train-v02.yaml:35-38).

This is the per-sampler-step device work of the stage-2 refinement loop
(pipeline_i2v_eval_v02.py:127-135). Spatial attention runs at 16384 tokens
per frame — the flash-kernel regime. Prints ONE JSON line (same schema as
bench.py; complements the driver's stage-1 metric in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# compile-cache config is owned by the hi3d_tpu package import (HI3D_COMP_CACHE knobs)

T, H, W = 16, 128, 128
STEPS = 4
WARMUP = 1


def main() -> None:
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from hi3d_tpu.diffusion.denoiser import Denoiser
    from hi3d_tpu.models.wrappers import ConcatConditionWrapper
    from __graft_entry__ import _unet, _zero_params

    dtype = jnp.bfloat16
    # stage-2 adm = elevation 256 + cond_aug 256 (train-v02.yaml:35)
    model = _unet(scale=1.0, in_channels=17, dtype=dtype, adm_in_channels=512)
    bt = 2 * T

    x = jnp.zeros((bt, H, W, 4), dtype)
    concat = jnp.zeros((bt, H, W, model.in_channels - 4), dtype)
    ctx = jnp.zeros((2, 1, model.context_dim), dtype)
    y = jnp.zeros((2, model.adm_in_channels), dtype)
    ind = jnp.zeros((2, T))
    sigma = jnp.full((bt,), 1.0, jnp.float32)

    params = _zero_params(
        model,
        jnp.concatenate([x, concat], axis=-1),
        jnp.zeros((bt,)),
        context=ctx,
        y=y,
        num_video_frames=T,
        image_only_indicator=ind,
    )

    wrapper = ConcatConditionWrapper(model)
    denoiser = Denoiser(
        {"target": "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"}
    )

    def step(params, x, sigma, concat, ctx, y):
        network = wrapper.bind(
            params, num_video_frames=T, image_only_indicator=ind
        )
        out = denoiser(
            network, x, sigma, {"concat": concat, "crossattn": ctx, "vector": y}
        )
        return out.astype(x.dtype)  # chainable: step i feeds step i+1

    compiled = jax.jit(step).lower(params, x, sigma, concat, ctx, y).compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", -1.0)) or None
        flops = flops if flops and flops > 0 else None
    except Exception:
        flops = None

    # honest timing on the tunneled backend (bench.py round-4 rationale):
    # chain each step's output into the next step's input and end with a
    # host readback — block_until_ready alone can return before execution
    # and identical (program, args) calls can short-circuit
    def _materialize(a):
        jax.device_get(a[0, 0, 0, 0])

    for _ in range(WARMUP):
        x = compiled(params, x, sigma, concat, ctx, y)
    _materialize(x)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        x = compiled(params, x, sigma, concat, ctx, y)
    _materialize(x)
    dt = (time.perf_counter() - t0) / STEPS
    out = {
        "metric": "unet_denoise_steps_per_sec_chip_stage2_1024",
        "value": round(1.0 / dt, 4),
        "unit": "steps/sec/chip",
        "sec_per_step": round(dt, 3),
    }
    if flops is not None:
        out["tflops_per_step"] = round(flops / 1e12, 2)
        kind = jax.devices()[0].device_kind.lower()
        if "v5 lite" in kind or "v5e" in kind:
            out["mfu"] = round(flops / dt / 197e12, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
