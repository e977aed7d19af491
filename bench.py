"""Benchmark: UNet denoise steps/sec/chip on the flagship stage-1 config.

One "denoise step" = one CFG-doubled VideoUNet forward over a 16-frame video
at 512² (64×64 latent) — exactly the per-sampler-step work of the reference
stage-1 pipeline (guiders.py:91-99 doubles the batch; 25 such steps per
asset). Weights bf16, σ-math fp32, matching production inference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec/chip", "vs_baseline": N}

`vs_baseline` is measured against REF_A100_STEPS_PER_SEC, the reference
implementation's measured rate on its stated hardware (README.md:34, 80GB
A100, fp16 + xformers): the reference takes roughly 1.2 s per CFG-doubled
16-frame 512² UNet forward (no public number exists — see BASELINE.md — this
is our instrumented estimate; >1.0 means we beat it).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REF_A100_STEPS_PER_SEC = 0.83  # ≈1.2 s/step on A100-80G fp16 (estimate)

T, H, W = 16, 64, 64  # 16 frames, 512² pixels → 64² latent
STEPS = 8
WARMUP = 2


def main() -> None:
    from hi3d_tpu.diffusion.denoiser import Denoiser
    from hi3d_tpu.models.wrappers import ConcatConditionWrapper
    from __graft_entry__ import _unet, _zero_params

    dtype = jnp.bfloat16
    model = _unet(scale=1.0, dtype=dtype)
    bt = 2 * T  # CFG-doubled batch

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

    @jax.jit
    def denoise_step(params, x, sigma, concat, ctx, y):
        network = wrapper.bind(
            params, num_video_frames=T, image_only_indicator=ind
        )
        cond = {"concat": concat, "crossattn": ctx, "vector": y}
        return denoiser(network, x, sigma, cond)

    out = denoise_step(params, x, sigma, concat, ctx, y)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        jax.block_until_ready(denoise_step(params, x, sigma, concat, ctx, y))

    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = denoise_step(params, x, sigma, concat, ctx, y)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    steps_per_sec = STEPS / dt
    print(
        json.dumps(
            {
                "metric": "unet_denoise_steps_per_sec_chip_stage1_512",
                "value": round(steps_per_sec, 4),
                "unit": "steps/sec/chip",
                "vs_baseline": round(steps_per_sec / REF_A100_STEPS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
