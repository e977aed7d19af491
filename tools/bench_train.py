"""Training-step benchmark: the SVD-adaptation fine-tune step on one chip.

Measures the full jitted train step — denoiser loss (σ-sampled v-weighted
MSE), grads, AdamW, EMA — for the stage-1 configuration at 512², 16 frames,
batch 1, with the reference's original SVD-adaptation trainable subset
(label_emb / emb_layers / time_stack — inference-v01.yaml:9-13); full-model
AdamW state (fp32 m+v for 1.5B params ≈ 12 GB) does not fit a 16 GB chip,
and the reference's multi-GPU ZeRO-2 sharding is the multi-chip answer
(training/step.py) — the subset is the realistic single-chip workload.

Prints ONE JSON line (same schema family as bench.py).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

T, H, W = 16, 64, 64  # 512² pixels → 64² latent
STEPS = 4
WARMUP = 1
TRAINED_KEYS = ("label_emb", "emb_layers", "time_stack")


def main() -> None:
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import optax

    from hi3d_tpu.diffusion.denoiser import Denoiser
    from hi3d_tpu.models.wrappers import ConcatConditionWrapper
    from hi3d_tpu.training.state import TrainState, build_optimizer
    from hi3d_tpu.training.step import make_train_step
    from __graft_entry__ import _unet, _zero_params

    dtype = jnp.bfloat16
    # activation checkpointing: the reference's training configuration
    # (train-v01.yaml:36 use_checkpoint: True)
    model = _unet(scale=1.0, dtype=dtype, use_checkpoint=True)
    bt = T  # batch 1 video (no CFG during training)

    x = jnp.zeros((bt, H, W, 4), dtype)
    concat = jnp.zeros((bt, H, W, model.in_channels - 4), dtype)
    ctx = jnp.zeros((1, 1, model.context_dim), dtype)
    y = jnp.zeros((1, model.adm_in_channels), dtype)
    ind = jnp.zeros((1, T))

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

    from hi3d_tpu.training.state import freeze_frozen

    def loss_fn(p, batch, rng):
        p = freeze_frozen(p, TRAINED_KEYS)
        r_sig, r_eps = jax.random.split(rng)
        z = batch["latents"]
        # EDM lognormal σ per video, repeated over frames (loss.py:74-76)
        sigma = jnp.exp(jax.random.normal(r_sig, (1,)) * 1.6 + 1.0)
        sigma = jnp.repeat(sigma, T)
        eps = jax.random.normal(r_eps, z.shape, jnp.float32)
        noised = (z + eps * sigma[:, None, None, None]).astype(dtype)
        network = wrapper.bind(p, num_video_frames=T, image_only_indicator=ind)
        denoised = denoiser(
            network, noised, sigma,
            {"concat": batch["concat"], "crossattn": batch["ctx"],
             "vector": batch["y"]},
        )
        w = (sigma**2 + 1.0) / sigma**2  # VWeighting (σ_data = 1)
        err = (denoised.astype(jnp.float32) - z) ** 2
        return jnp.mean(w[:, None, None, None] * err)

    tx = build_optimizer(
        1e-5, params, trained_param_keys=TRAINED_KEYS
    )
    # EMA doubles the fp32 master params (6.1 GB × 2) — over budget next to
    # the masked AdamW moments on a 16 GB chip; multi-chip ZeRO shards it.
    # Single chip → plain jit (mesh-sharded jit exercises dryrun_multichip).
    state = TrainState.create(params, tx, use_ema=False)
    step_fn_plain = make_train_step(loss_fn, tx, mesh=None, ema_decay=None)

    batch = {
        "latents": jnp.zeros((bt, H, W, 4), jnp.float32),
        "concat": concat,
        "ctx": ctx,
        "y": y,
    }
    step_fn = step_fn_plain
    rng = jax.random.PRNGKey(0)

    # the state chain makes steps data-dependent; end with host readbacks —
    # block_until_ready can return before execution on the tunneled backend
    # (bench.py round-4 rationale)
    for i in range(WARMUP):
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, i))
    jax.device_get(metrics["loss"])
    jax.device_get(jax.tree.leaves(state.params)[0].ravel()[0])
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, 100 + i))
    jax.device_get(metrics["loss"])
    jax.device_get(jax.tree.leaves(state.params)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / STEPS
    print(json.dumps({
        "metric": "train_steps_per_sec_chip_stage1_512_svd_adapt",
        "value": round(1.0 / dt, 4),
        "unit": "steps/sec/chip",
        "sec_per_step": round(dt, 3),
        "loss": float(metrics.get("loss", 0.0)) if isinstance(metrics, dict) else None,
    }))


if __name__ == "__main__":
    main()
