"""Torch-parity for the TRAINING composition (round-2 VERDICT missing #4).

The inference composition is golden-tested end-to-end in
test_parity_pipeline.py; this pins the training objective against the
reference's torch implementation on pinned inputs:

  conditioner (ucg off) → VAE encode (scale_factor, posterior mode) →
  per-video σ repeated over T (loss.py:74-76) → noise-add → denoiser
  (VScalingWithEDMcNoise) → VWeighting·MSE per-sample mean
  (reference sgm/modules/diffusionmodules/loss.py:62-105,
   vtdm/vtdm_gen_v01.py:78-88, sgm/models/diffusion.py:152-156)

then one AdamW step over the SVD-adaptation trained subset
(trained_param_keys substring filter, vtdm_gen_v01.py:167-201) and compares
the updated parameters — the torch-updated state dict is pushed through the
SAME converter used for real checkpoints, so trained params must match the
optax-updated flax tree and frozen params must be bit-unchanged.

Stochastic draws (σ per video, ε noise, cond_aug, cond_frames augmentation)
are pinned on both sides via the loss parity hooks
(StandardDiffusionLoss.parity_sigmas/parity_noise) and batch overwrites.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import test_parity_pipeline as tpp
from reference_loader import _stub

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

T, IMG, LAT = tpp.T, tpp.IMG, tpp.LAT
SIGMA = 2.5       # pinned per-video σ (mid lognormal range)
LR = 1e-3
WD = 1e-2
TRAINED_KEYS = ["label_emb.0.0.weight", ".emb_layers.", ".time_stack."]


def _loss_cfg(stage):
    return {
        "target": "sgm.modules.diffusionmodules.loss.StandardDiffusionLoss",
        "params": {
            "num_frames": T,
            "batch2model_keys": ["num_video_frames", "image_only_indicator"],
            "sigma_sampler_config": {
                "target": "sgm.modules.diffusionmodules.sigma_sampling.EDMSampling",
                "params": {"p_mean": 1.0, "p_std": 1.6},
            },
            "loss_weighting_config": {
                "target": "sgm.modules.diffusionmodules.loss_weighting.VWeighting"
            },
        },
    }


def _model_config(side, stage):
    cfg = tpp.model_config(side, stage)
    cfg["params"]["loss_fn_config"] = _loss_cfg(stage)
    return cfg


def _pinned(stage):
    rs = np.random.RandomState(1000 + stage)
    video = rs.uniform(-1.0, 1.0, (1, 3, T, IMG, IMG)).astype(np.float32)
    cond_aug = 0.05
    if stage == 1:
        cf = video[:, :, 0]
    else:
        cf = np.moveaxis(video[0], 1, 0)
    cond_frames = (cf + cond_aug * rs.randn(*cf.shape)).astype(np.float32)
    eps = rs.randn(T, 4, LAT, LAT).astype(np.float32)
    return video, cond_frames, cond_aug, eps


def _build_torch(stage):
    tpp.load_reference()
    # StandardDiffusionLoss imports the LPIPS module, which imports
    # torchvision.models at module scope (used only for loss_type="lpips")
    import torchvision

    if not hasattr(torchvision, "models"):
        _stub("torchvision", models=type("_Models", (), {})())
    if stage == 2:
        tpp._stub_stage2_deps()
    from sgm.util import instantiate_from_config as torch_instantiate
    import os

    torch.manual_seed(0)
    cwd = os.getcwd()
    try:
        if stage == 2:
            os.chdir("/root/reference")
        with tpp.torch_cpu_identity():
            model = torch_instantiate(_model_config("torch", stage))
    finally:
        os.chdir(cwd)
    model.first_stage_model.regularization.sample = False
    return model.train()


def _build_jax(stage, torch_model):
    """tpp.build_jax_model, but from the loss-extended config."""
    from hi3d_tpu.config import instantiate_from_config
    from hi3d_tpu.convert.torch_to_jax import load_engine_params

    model = instantiate_from_config(_model_config("jax", stage))
    model.init(jax.random.PRNGKey(0))
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    load_engine_params(model, sd)
    return model


def _torch_loss_and_step(model, video, cond_frames, cond_aug, eps):
    """Reference shared_step (vtdm_gen_v01.py:78-88) with pinned draws, then
    one AdamW step over the trained subset (configure_optimizers filter)."""
    batch = {
        "video": torch.from_numpy(video),
        "elevation": torch.tensor([0], dtype=torch.int64),
    }
    with tpp.torch_cpu_identity(), torch.no_grad():
        batch = model.add_custom_cond(batch)  # train-mode wiring
        # overwrite the two stochastic custom-cond draws with pinned values
        batch["cond_aug"] = torch.full(
            (batch["cond_aug"].shape[0],), cond_aug
        )
        batch["cond_frames"] = torch.from_numpy(cond_frames)

    # pin σ and ε inside StandardDiffusionLoss._forward (loss.py:74-78)
    model.loss_fn.sigma_sampler = lambda b: torch.full((b,), SIGMA)
    saved_randn_like = torch.randn_like
    torch.randn_like = lambda t: torch.from_numpy(eps.copy())

    params = []
    for name, p in model.model.named_parameters():
        if any(k in name for k in TRAINED_KEYS):
            params.append(p)
        else:
            p.requires_grad_(False)
    assert params, "trained-subset filter matched nothing"
    opt = torch.optim.AdamW(params, lr=LR, weight_decay=WD)

    try:
        with tpp.torch_cpu_identity():
            frames = batch["video"]  # (b, c, t, h, w)
            frames = frames.permute(0, 2, 1, 3, 4).reshape(-1, 3, IMG, IMG)
            x = model.encode_first_stage(frames)
            loss, _ = model(x, batch)
        opt.zero_grad()
        loss.backward()
        opt.step()
    finally:
        torch.randn_like = saved_randn_like
    return float(loss.detach())


def _jax_loss_and_step(model, video, cond_frames, cond_aug, eps):
    from hi3d_tpu.training.state import build_optimizer
    import optax

    batch = {
        "video": jnp.asarray(video.transpose(0, 2, 3, 4, 1)),  # (B,T,H,W,C)
        "elevation": jnp.asarray([0.0]),
        "num_video_frames": T,
        "image_only_indicator": jnp.zeros((1, T)),
        "cond_frames_without_noise": jnp.asarray(
            video[:, :, 0].transpose(0, 2, 3, 1)
        ),
        "cond_aug": jnp.full((1,), cond_aug, jnp.float32),
        "cond_frames": jnp.asarray(cond_frames.transpose(0, 2, 3, 1)),
    }
    model.loss_fn.parity_sigmas = np.full((1,), SIGMA, np.float32)
    model.loss_fn.parity_noise = eps.transpose(0, 2, 3, 1)

    loss_fn = model.make_loss_fn()
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
        model.params, batch, jax.random.PRNGKey(0)
    )
    tx = build_optimizer(
        LR,
        params=model.params,
        trained_param_keys=TRAINED_KEYS,
        weight_decay=WD,
    )
    opt_state = tx.init(model.params)
    updates, _ = tx.update(grads, opt_state, model.params)
    new_params = optax.apply_updates(model.params, updates)
    return float(loss), new_params


@pytest.mark.parametrize("stage", [1])
def test_training_objective_matches_reference(stage):
    video, cond_frames, cond_aug, eps = _pinned(stage)
    tm = _build_torch(stage)
    init_sd = {k: v.detach().clone() for k, v in tm.state_dict().items()}
    ref_loss = _torch_loss_and_step(tm, video, cond_frames, cond_aug, eps)

    # fresh torch copy of the INITIAL weights for the jax side
    jm_src = _build_torch(stage)
    jm_src.load_state_dict(init_sd)
    jm = _build_jax(stage, jm_src)
    got_loss, new_params = _jax_loss_and_step(
        jm, video, cond_frames, cond_aug, eps
    )

    assert abs(got_loss - ref_loss) < 5e-4 * max(1.0, abs(ref_loss)), (
        f"loss mismatch: torch {ref_loss:.6f} vs jax {got_loss:.6f}"
    )

    # convert the torch-updated weights and compare the full UNet tree:
    # trained params must track the AdamW update, frozen must be unchanged
    from flax import traverse_util
    from hi3d_tpu.training.state import trainable_mask

    jm_after = tpp.build_jax_model(stage, tm)
    unet_ref = traverse_util.flatten_dict(jm_after.params, sep="/")
    unet_got = traverse_util.flatten_dict(new_params, sep="/")
    unet_init = traverse_util.flatten_dict(jm.params, sep="/")
    mask = traverse_util.flatten_dict(
        trainable_mask(jm.params, TRAINED_KEYS), sep="/"
    )
    assert unet_ref.keys() == unet_got.keys()
    n_trained = n_moved = 0
    for k in unet_ref:
        ref_np = np.asarray(unet_ref[k], np.float32)
        got_np = np.asarray(unet_got[k], np.float32)
        if mask[k]:
            n_trained += 1
            delta_ref = ref_np - np.asarray(unet_init[k], np.float32)
            # params feeding a zero-init out conv (every ResBlock/transformer
            # tail, openaimodel.py zero_module) have exactly-zero grads at
            # init → a zero torch delta there is correct, not a no-op
            if np.abs(delta_ref).max() > 0:
                n_moved += 1
            err = np.abs(got_np - ref_np).max()
            assert err < 5e-2 * LR, f"{k}: updated-param err {err:.2e}"
        else:
            np.testing.assert_array_equal(
                got_np, np.asarray(unet_init[k], np.float32),
                err_msg=f"{k}: frozen param changed",
            )
    assert n_trained > 0
    assert n_moved >= n_trained // 3, (
        f"torch AdamW moved only {n_moved}/{n_trained} trained params — "
        "the step looks degenerate"
    )
