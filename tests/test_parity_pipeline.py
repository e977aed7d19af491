"""End-to-end torch↔JAX golden pipeline parity (round-1 VERDICT missing #2).

Runs the REFERENCE inference paths in torch on CPU at toy size —
- stage 1: pipeline_i2v_eval_v01.py:62-98 (add_custom_cond → conditioner →
  EulerEDM CFG sampling → VAE decode),
- stage 2: pipeline_i2v_eval_v02.py:77-141 (per-frame VAE encode → cosine
  α^40 latent blending around `sampler.step_call` → VAE decode),
then converts the torch weights and runs the hi3d_tpu pipelines
(`pipelines.i2v.generate_orbit`, `pipelines.v2v.blend_refine_batch`) on the
SAME inputs and noise, asserting the final frames match within fp32
composition tolerance.

Per-module parity (UNet/VAE/converter) is covered elsewhere; this test pins
the COMPOSITION: conditioner routing order, vector-concat order, cond_aug
wiring, CFG batching, guider per-frame scales, σ bookkeeping across steps,
scale_factor placement, and the stage-2 blend/step interleaving. The heavy
conditioning towers (CLIP/DPT/aesthetic) are replaced on BOTH sides by the
identical-math toy embedders in toy_embedders.py; their unit parity is
tested separately (test_parity_*/test_dpt/test_convert_*).

Stochastic inputs (sampler init noise, cond_frames noise augmentation) are
pinned to shared numpy arrays through the pipelines' parity hooks
(engine.sample(randn=...), generate_orbit/blend_refine_batch
batch_overrides=/init_noise=).
"""

import contextlib
import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_loader import _stub, load_reference

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow

T = 4           # frames
IMG = 32        # image side → 4×4 latents at f=8
LAT = IMG // 8
CTX = 64        # toy crossattn width
VEC = 16        # toy per-embedder vector width (3 × 16 = adm 48 stage 1)
NUM_STEPS = 4   # sampler steps
SCALE_FACTOR = 0.18215

DD = dict(                      # toy f=8 KL-VAE (both stages + cond encoder)
    double_z=True,
    z_channels=4,
    resolution=IMG,
    in_channels=3,
    out_ch=3,
    ch=32,  # reference GroupNorm is hard-coded to 32 groups (model.py:53)
    ch_mult=[1, 1, 2, 2],
    num_res_blocks=1,
    attn_resolutions=[],
    dropout=0.0,
)


def unet_params(in_channels, adm):
    """Toy VideoUNet config (same architecture family as train-v01.yaml:25-55)."""
    return dict(
        adm_in_channels=adm,
        num_classes="sequential",
        use_checkpoint=False,
        in_channels=in_channels,
        out_channels=4,
        model_channels=32,
        attention_resolutions=[1, 2],
        num_res_blocks=1,
        channel_mult=[1, 2],
        num_head_channels=16,
        use_linear_in_transformer=True,
        transformer_depth=1,
        context_dim=CTX,
        extra_ff_mix_layer=True,
        use_spatial_context=True,
        merge_strategy="learned_with_images",
        video_kernel_size=[3, 1, 1],
    )


def vae_config(side, mode_only=False):
    tgt = (
        "sgm.models.autoencoder.AutoencoderKLModeOnly"
        if mode_only
        else "sgm.models.autoencoder.AutoencoderKL"
    )
    dd = dict(DD)
    if side == "torch":
        dd["attn_type"] = "vanilla"  # CPU torch: no xformers
    return {
        "target": tgt,
        "params": {
            "embed_dim": 4,
            "ddconfig": dd,
            "lossconfig": {"target": "torch.nn.Identity"},
        },
    }


def toy_target(side, name):
    prefix = "Torch" if side == "torch" else "Jax"
    return f"toy_embedders.{prefix}{name}"


def conditioner_config(side, stage):
    """Toy mirror of the reference conditioner stacks.

    Stage-1 embedder order = configs/inference-v01.yaml:55-114 (CLIP-image
    crossattn, aes vector, elevation vector, cond-frame-latents concat,
    cond_aug vector → adm = 3·VEC = 48). Stage-2 order =
    configs/inference-v02.yaml:55-114 (CLIP-image crossattn, elevation,
    depth 9-ch concat, per-frame-latents concat, cond_aug → adm = 2·VEC).
    """
    embs = [
        {
            "is_trainable": False,
            "input_key": "cond_frames_without_noise",
            "ucg_rate": 0.0,
            "target": toy_target(side, "ToyImageEmbedder"),
        }
    ]
    if stage == 1:
        embs.append(
            {
                "is_trainable": False,
                "input_key": "video",
                "ucg_rate": 0.0,
                "target": toy_target(side, "ToyVideoEmbedder"),
            }
        )
    embs.append(
        {
            "is_trainable": False,
            "input_key": "elevation",
            "target": "sgm.modules.encoders.modules.ConcatTimestepEmbedderND",
            "params": {"outdim": VEC},
        }
    )
    if stage == 2:
        embs.append(
            {
                "is_trainable": False,
                "input_key": "cond_frames",
                "ucg_rate": 0.0,
                "target": toy_target(side, "ToyDepthEmbedder"),
            }
        )
    embs.append(
        {
            "input_key": "cond_frames",
            "is_trainable": False,
            "ucg_rate": 0.0,
            "target": "sgm.modules.encoders.modules.VideoPredictionEmbedderWithEncoder",
            "params": {
                "disable_encoder_autocast": True,
                "n_cond_frames": 1,
                "n_copies": T if stage == 1 else 1,
                "is_ae": True,
                "encoder_config": vae_config(side, mode_only=True),
            },
        }
    )
    embs.append(
        {
            "input_key": "cond_aug",
            "is_trainable": False,
            "target": "sgm.modules.encoders.modules.ConcatTimestepEmbedderND",
            "params": {"outdim": VEC},
        }
    )
    return {"target": "sgm.modules.GeneralConditioner", "params": {"emb_models": embs}}


def model_config(side, stage):
    """Full toy VideoLDM config for one side/stage (inference-v0{1,2}.yaml)."""
    in_ch = 8 if stage == 1 else 17  # 4+4 / 4+9+4
    adm = 3 * VEC if stage == 1 else 2 * VEC
    net = unet_params(in_ch, adm)
    if side == "torch":
        net["spatial_transformer_attn_type"] = "softmax"
    else:
        net["attn_backend"] = "xla"
    sampler_params = {
        "num_steps": NUM_STEPS,
        "verbose": False,
        "discretization_config": {
            "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
            "params": {"sigma_max": 700.0},
        },
        "guider_config": {
            "target": "sgm.modules.diffusionmodules.guiders.LinearPredictionGuider",
            "params": {
                "num_frames": T,
                "max_scale": 2.5 if stage == 1 else 2.0,
                "min_scale": 1.0,
            },
        },
    }
    if side == "torch":
        sampler_params["device"] = "cpu"
    target = (
        "vtdm.vtdm_gen_v01.VideoLDM"
        if stage == 1
        else "vtdm.vtdm_gen_stage2_degradeImage.VideoLDM"
    )
    if side == "jax" and stage == 2:
        target = "vtdm.vtdm_gen_stage2_degradeImage.VideoLDM"
    return {
        "target": target,
        "params": {
            "input_key": "video",
            "scale_factor": SCALE_FACTOR,
            "num_samples": T,
            "en_and_decode_n_samples_a_time": 16,
            "disable_first_stage_autocast": True,
            "denoiser_config": {
                "target": "sgm.modules.diffusionmodules.denoiser.Denoiser",
                "params": {
                    "scaling_config": {
                        "target": "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"
                    }
                },
            },
            "network_config": {
                "target": "sgm.modules.diffusionmodules.video_model.VideoUNet",
                "params": net,
            },
            "conditioner_config": conditioner_config(side, stage),
            "first_stage_config": vae_config(side),
            "sampler_config": {
                "target": "sgm.modules.diffusionmodules.sampling.EulerEDMSampler",
                "params": sampler_params,
            },
        },
    }


# ------------------------------------------------------------------ fixtures


@contextlib.contextmanager
def torch_cpu_identity():
    """Reference code hard-codes `.cuda()`/`.half()` (vtdm_gen_v01.py:66-73,
    pipeline CLIs); run it unmodified on fp32 CPU by making both identity."""
    saved = (
        torch.Tensor.cuda,
        torch.nn.Module.cuda,
        torch.Tensor.half,
        torch.nn.Module.half,
    )
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.half = lambda self, *a, **k: self
    torch.nn.Module.half = lambda self, *a, **k: self
    try:
        yield
    finally:
        (
            torch.Tensor.cuda,
            torch.nn.Module.cuda,
            torch.Tensor.half,
            torch.nn.Module.half,
        ) = saved


def _stub_stage2_deps():
    """vtdm_gen_stage2_degradeImage imports basicsr (degradation training
    path, unused at inference) — stub the imported names."""
    _stub(
        "basicsr.data.degradations",
        random_add_gaussian_noise_pt=None,
        random_add_poisson_noise_pt=None,
    )
    _stub("basicsr.data.transforms", paired_random_crop=None)
    _stub("basicsr.models.sr_model", SRModel=object)
    _stub("basicsr.utils", DiffJPEG=object, USMSharp=object)
    _stub("basicsr.utils.img_process_util", filter2D=None)
    _stub("basicsr.utils.registry", MODEL_REGISTRY=None)
    _stub("basicsr.data")
    _stub("basicsr.models")
    _stub("basicsr")
    import pytorch_lightning

    if not hasattr(pytorch_lightning, "seed_everything"):
        pytorch_lightning.seed_everything = lambda *a, **k: None


def build_torch_model(stage):
    load_reference()
    if stage == 2:
        _stub_stage2_deps()
    from sgm.util import instantiate_from_config as torch_instantiate

    cfg = model_config("torch", stage)
    torch.manual_seed(0)
    cwd = os.getcwd()
    try:
        if stage == 2:
            # DegradedImages.__init__ reads configs/train_realesrnet_x4plus.yml
            # relative to CWD (degraded_images.py:48-50)
            os.chdir("/root/reference")
        with torch_cpu_identity():
            model = torch_instantiate(cfg)
    finally:
        os.chdir(cwd)
    # pin the stochastic VAE posterior to its mode (reference encode samples,
    # regularizers/__init__.py:24-25); the JAX side's rng-less encode is the
    # mode — this pins the ε of the one remaining noise-injection point
    model.first_stage_model.regularization.sample = False
    return model.eval()


def build_jax_model(stage, torch_model):
    from hi3d_tpu.config import instantiate_from_config
    from hi3d_tpu.convert.torch_to_jax import load_engine_params

    cfg = model_config("jax", stage)
    model = instantiate_from_config(cfg)
    model.init(jax.random.PRNGKey(0))
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    load_engine_params(model, sd)
    return model


# ------------------------------------------------------------------- inputs


def shared_inputs(stage):
    rs = np.random.RandomState(42 + stage)
    video = rs.uniform(-1.0, 1.0, (1, 3, T, IMG, IMG)).astype(np.float32)
    # pinned cond_frames noise augmentation (σ = 0.02 at inference)
    if stage == 1:
        cf_base = video[:, :, 0]  # (1, 3, H, W) — frame 0
    else:
        cf_base = np.moveaxis(video[0], 1, 0)  # (T, 3, H, W) — whole video
    cond_frames = cf_base + 0.02 * rs.randn(*cf_base.shape).astype(np.float32)
    randn = rs.randn(T, 4, LAT, LAT).astype(np.float32)
    return video, cond_frames.astype(np.float32), randn


# -------------------------------------------------------------- torch paths


def torch_stage1(model, video, cond_frames, randn):
    """pipeline_i2v_eval_v01.py denoising() with pinned noise."""
    with torch.no_grad(), torch_cpu_identity():
        batch = {
            "video": torch.from_numpy(video),
            "elevation": torch.tensor([0], dtype=torch.int64),
        }
        batch = model.add_custom_cond(batch, infer=True)
        batch["cond_frames"] = torch.from_numpy(cond_frames)
        c, uc = model.conditioner.get_unconditional_conditioning(
            batch,
            force_uc_zero_embeddings=["cond_frames", "cond_frames_without_noise"],
        )
        extra = {
            "image_only_indicator": torch.zeros(2, T),
            "num_video_frames": T,
        }

        def den(x, sigma, cc):
            return model.denoiser(model.model, x, sigma, cc, **extra)

        # .copy(): the reference sampler SCALES ITS INPUT IN PLACE
        # (prepare_sampling_loop, sampling.py:44: `x *= sqrt(1+σ₀²)`) and
        # from_numpy shares memory — without the copy the JAX side would
        # read noise already multiplied by ~σ_max
        samples = model.sampler(den, torch.from_numpy(randn.copy()), cond=c, uc=uc)
        out = model.decode_first_stage(samples)
    return np.clip(out.numpy(), -1.0, 1.0)  # (T, 3, H, W)


def torch_stage2(model, video, cond_frames, randn):
    """pipeline_i2v_eval_v02.py denoising() (:77-141) with pinned noise."""
    from sgm.util import append_dims

    with torch.no_grad(), torch_cpu_identity():
        frames = torch.from_numpy(video[0])  # (3, T, H, W)
        sampler = model.sampler
        sigmas = sampler.discretization(sampler.num_steps, device="cpu")
        num_sigmas = len(sigmas)
        s_in = frames.new_ones([T])

        init_latents = torch.from_numpy(randn.copy())  # see torch_stage1 note
        latents = init_latents.clone()
        z_list = []
        for t in range(T):
            frame = frames[:, t][None]
            z_list.append(model.encode_first_stage(frame))
        latents = latents * torch.sqrt(1.0 + sigmas[0] ** 2.0)

        batch = {
            "video": torch.from_numpy(video),
            "masks": torch.ones(1, T, IMG, IMG),
            "elevation": torch.tensor([0], dtype=torch.int64),
        }
        batch = model.add_custom_cond(batch, infer=True)
        batch["cond_frames"] = torch.from_numpy(cond_frames)
        c, uc = model.conditioner.get_unconditional_conditioning(
            batch,
            force_uc_zero_embeddings=["cond_frames", "cond_frames_without_noise"],
        )
        extra = {
            "image_only_indicator": torch.zeros(2, T),
            "num_video_frames": T,
        }

        def den(x, sigma, cc):
            return model.denoiser(model.model, x, sigma, cc, **extra)

        alpha_pow = 40.0
        for i in sampler.get_sigma_gen(num_sigmas):
            alpha = 0.5 * (1 + math.cos(i * 1.0 / sampler.num_steps))
            alpha = math.pow(alpha, alpha_pow)
            for t in range(T):
                latents[t : t + 1] = latents[t : t + 1] * (1 - alpha) + (
                    init_latents[t : t + 1] * append_dims(sigmas[i], 4) + z_list[t]
                ) * alpha
            latents = sampler.step_call(
                den, latents, i, s_in, sigmas, num_sigmas, c, uc
            )
        out = model.decode_first_stage(latents)
    return np.clip(out.numpy(), -1.0, 1.0)  # (T, 3, H, W)


# -------------------------------------------------------------------- tests


def test_stage1_pipeline_matches_reference():
    video, cond_frames, randn = shared_inputs(1)
    tm = build_torch_model(1)
    ref = torch_stage1(tm, video, cond_frames, randn)

    jm = build_jax_model(1, tm)
    from hi3d_tpu.pipelines.i2v import generate_orbit

    frames_j = video[0].transpose(1, 2, 3, 0)  # (T, H, W, 3)
    out = generate_orbit(
        jm,
        frames_j,
        elevation=0.0,
        rng=jax.random.PRNGKey(0),
        randn=jnp.asarray(randn.transpose(0, 2, 3, 1)),
        batch_overrides={
            "cond_frames": jnp.asarray(cond_frames.transpose(0, 2, 3, 1))
        },
    )  # (T, H, W, 3)
    got = np.moveaxis(np.asarray(out), -1, 1)  # → (T, 3, H, W)

    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    assert err < 5e-3, f"stage-1 final-frame max err {err:.2e}"


def test_stage2_pipeline_matches_reference():
    video, cond_frames, randn = shared_inputs(2)
    tm = build_torch_model(2)
    ref = torch_stage2(tm, video, cond_frames, randn)

    jm = build_jax_model(2, tm)
    from hi3d_tpu.pipelines.v2v import blend_refine_batch

    videos_j = video.transpose(0, 2, 3, 4, 1)  # (1, T, H, W, 3)
    out = blend_refine_batch(
        jm,
        videos_j,
        masks=np.ones((1, T, IMG, IMG), np.float32),
        elevations=[0.0],
        rng=jax.random.PRNGKey(0),
        steps_per_launch=None,
        init_noise=jnp.asarray(randn.transpose(0, 2, 3, 1)),
        batch_overrides={
            "cond_frames": jnp.asarray(cond_frames.transpose(0, 2, 3, 1))
        },
    )  # (1, T, H, W, 3)
    got = np.moveaxis(np.asarray(out[0]), -1, 1)

    assert got.shape == ref.shape
    err = np.abs(got - ref).max()
    assert err < 5e-3, f"stage-2 final-frame max err {err:.2e}"
