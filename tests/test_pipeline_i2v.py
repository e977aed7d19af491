"""End-to-end stage-1 pipeline smoke at toy size (BASELINE config 1 analog):
image file → preprocess → conditioner → scan-sampler with CFG → VAE decode →
mp4. Random weights; validates wiring, shapes, dtypes, and file outputs."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hi3d_tpu.conditioners import AbstractEmbedder
from hi3d_tpu.pipelines.i2v import generate_orbit, run_pipeline

T, RES = 4, 64
CTX = 32


class TinyImageEmbedder(AbstractEmbedder):
    """Test-only crossattn stand-in for the CLIP tower."""

    def __call__(self, image, rng=None):
        feats = jnp.mean(image, axis=(1, 2))  # (B, 3)
        return jnp.tile(feats, (1, CTX // 3 + 1))[:, :CTX][:, None, :]


# 4 levels → f=8 like the real SD VAE (the pipeline computes latents at H/8)
VAE_DD = {
    "double_z": True, "z_channels": 4, "in_channels": 3, "out_ch": 3,
    "ch": 8, "ch_mult": [1, 1, 2, 2], "num_res_blocks": 1,
    "attn_resolutions": [], "resolution": RES,
}


def tiny_config(num_steps=3):
    return {
        "target": "vtdm.vtdm_gen_v01.VideoLDM",
        "params": {
            "input_key": "video",
            "num_samples": T,
            "scale_factor": 0.18215,
            "en_and_decode_n_samples_a_time": 2,
            "network_config": {
                "target": "sgm.modules.diffusionmodules.video_model.VideoUNet",
                "params": {
                    "in_channels": 8, "out_channels": 4, "model_channels": 32,
                    "num_res_blocks": 1, "channel_mult": [1, 2],
                    "attention_resolutions": [1, 2], "num_head_channels": 16,
                    "transformer_depth": 1, "context_dim": CTX,
                    "num_classes": "sequential", "adm_in_channels": 32,
                    "use_linear_in_transformer": True,
                    "extra_ff_mix_layer": True, "use_spatial_context": True,
                    "merge_strategy": "learned_with_images",
                    "video_kernel_size": [3, 1, 1],
                },
            },
            "denoiser_config": {
                "target": "sgm.modules.diffusionmodules.denoiser.Denoiser",
                "params": {"scaling_config": {
                    "target": "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"
                }},
            },
            "sampler_config": {
                "target": "sgm.modules.diffusionmodules.sampling.EulerEDMSampler",
                "params": {
                    "num_steps": num_steps,
                    "discretization_config": {
                        "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
                        "params": {"sigma_max": 700.0},
                    },
                    "guider_config": {
                        "target": "sgm.modules.diffusionmodules.guiders.LinearPredictionGuider",
                        "params": {"num_frames": T, "max_scale": 2.5},
                    },
                },
            },
            "conditioner_config": {
                "target": "sgm.modules.GeneralConditioner",
                "params": {"emb_models": [
                    {"target": "test_pipeline_i2v.TinyImageEmbedder",
                     "input_key": "cond_frames_without_noise",
                     "is_trainable": False},
                    {"target": "sgm.modules.encoders.modules.ConcatTimestepEmbedderND",
                     "input_key": "elevation", "is_trainable": False,
                     "params": {"outdim": 16}},
                    {"target": "sgm.modules.encoders.modules.VideoPredictionEmbedderWithEncoder",
                     "input_key": "cond_frames", "is_trainable": False,
                     "params": {
                         "n_cond_frames": 1, "n_copies": T, "is_ae": True,
                         "encoder_config": {
                             "target": "sgm.models.autoencoder.AutoencoderKLModeOnly",
                             "params": {"embed_dim": 4, "ddconfig": VAE_DD},
                         },
                     }},
                    {"target": "sgm.modules.encoders.modules.ConcatTimestepEmbedderND",
                     "input_key": "cond_aug", "is_trainable": False,
                     "params": {"outdim": 16}},
                ]},
            },
            "first_stage_config": {
                "target": "sgm.models.autoencoder.AutoencoderKL",
                "params": {"embed_dim": 4, "ddconfig": VAE_DD},
            },
        },
    }


@pytest.fixture(scope="module")
def model():
    from hi3d_tpu.config import instantiate_from_config

    m = instantiate_from_config(tiny_config())
    m.init(latent_hw=(RES // 8, RES // 8), num_frames=2)
    return m


def test_generate_orbit_shapes(model):
    frames = np.zeros((T, RES, RES, 3), np.float32)
    out = generate_orbit(model, frames, elevation=10.0,
                         rng=jax.random.PRNGKey(0))
    assert out.shape == (T, RES, RES, 3)
    assert out.dtype == np.float32
    assert np.all(np.isfinite(out))
    assert float(np.abs(out).max()) <= 1.0


def test_encoder_reuse_k1_matches_exact(model):
    """Turbo with k=1 computes the encoder every step — identical math to
    the exact path through the cache-threaded sampler scan."""
    rnd = np.random.RandomState(7)
    frames = (rnd.rand(T, RES, RES, 3).astype(np.float32)) * 2.0 - 1.0
    noise = rnd.randn(T, RES // 8, RES // 8, 4).astype(np.float32)
    kw = dict(elevation=5.0, rng=jax.random.PRNGKey(11),
              randn=jnp.asarray(noise))
    exact = generate_orbit(model, frames, **kw)
    turbo = generate_orbit(model, frames, encoder_reuse=1, **kw)
    np.testing.assert_allclose(turbo, exact, rtol=1e-4, atol=1e-5)


def test_encoder_reuse_k2_runs_and_approximates(model):
    """k=2 skips the encoder on half the steps: finite, correct shape, and
    in the neighborhood of the exact result (same inputs/noise)."""
    rnd = np.random.RandomState(8)
    frames = (rnd.rand(T, RES, RES, 3).astype(np.float32)) * 2.0 - 1.0
    noise = rnd.randn(T, RES // 8, RES // 8, 4).astype(np.float32)
    kw = dict(elevation=5.0, rng=jax.random.PRNGKey(11),
              randn=jnp.asarray(noise))
    exact = generate_orbit(model, frames, **kw)
    turbo = generate_orbit(model, frames, encoder_reuse=2, **kw)
    assert turbo.shape == exact.shape
    assert np.all(np.isfinite(turbo))
    assert np.abs(turbo).max() <= 1.0 + 1e-6  # output is clipped
    assert np.abs(turbo - exact).mean() < 0.5


def test_run_pipeline_writes_mp4(model, tmp_path):
    import cv2

    img = (np.random.RandomState(0).rand(96, 80, 3) * 255).astype(np.uint8)
    src = str(tmp_path / "input.png")
    cv2.imwrite(src, img)

    out = run_pipeline(
        model, src, str(tmp_path / "out"), elevation=0.0, clip_size=T,
        resolution=(RES, RES), num_iter=1, seed=3, skip_rembg=True,
    )
    assert os.path.exists(out)
    from hi3d_tpu.utils.video import import_video

    vid = import_video(out)
    assert len(vid) >= T
    assert vid[0].shape == (RES, RES, 3)


def test_autoregressive_num_iter(model, tmp_path):
    import cv2

    img = (np.random.RandomState(1).rand(64, 64, 3) * 255).astype(np.uint8)
    src = str(tmp_path / "in.png")
    cv2.imwrite(src, img)
    out = run_pipeline(
        model, src, str(tmp_path / "out2"), clip_size=T,
        resolution=(RES, RES), num_iter=2, seed=5, skip_rembg=True,
    )
    from hi3d_tpu.utils.video import import_video

    # 2 orbits share the boundary frame: T + (T-1), padded to a multiple of fps
    assert len(import_video(out)) >= 2 * T - 1


def test_paired_conditioning_matches_two_pass(model):
    """get_unconditional_conditioning's single-tower-pass pairing (used when
    batch_uc is None) must equal the literal two-pass reference semantics."""
    cond = model.conditioner
    batch = {
        "cond_frames_without_noise": jnp.ones((1, RES, RES, 3)) * 0.25,
        "cond_frames": jnp.ones((1, RES, RES, 3)) * 0.1,
        "elevation": jnp.array([10.0]),
        "cond_aug": jnp.array([0.02]),
    }
    zero_keys = ["cond_frames", "cond_frames_without_noise"]
    c, uc = cond.get_unconditional_conditioning(
        batch, force_uc_zero_embeddings=zero_keys
    )
    c2 = cond(batch, None, ucg_enabled=False)
    uc2 = cond(batch, zero_keys, ucg_enabled=False)
    assert set(c) == set(c2) and set(uc) == set(uc2)
    for k in c2:
        np.testing.assert_array_equal(np.asarray(c[k]), np.asarray(c2[k]))
    for k in uc2:
        np.testing.assert_array_equal(np.asarray(uc[k]), np.asarray(uc2[k]))


def test_cfg_interval_full_cover_matches_exact(model):
    """A cfg_interval covering the whole σ schedule is bit-identical to the
    exact sampling path through engine.sample."""
    rnd = np.random.RandomState(9)
    frames = (rnd.rand(T, RES, RES, 3).astype(np.float32)) * 2.0 - 1.0
    noise = rnd.randn(T, RES // 8, RES // 8, 4).astype(np.float32)
    kw = dict(elevation=5.0, rng=jax.random.PRNGKey(11),
              randn=jnp.asarray(noise))
    exact = generate_orbit(model, frames, **kw)
    covered = generate_orbit(model, frames, cfg_interval=(0.0, 1e9), **kw)
    np.testing.assert_array_equal(covered, exact)


def test_cfg_interval_narrow_runs_and_approximates(model):
    """CFG only at the largest σ: the remaining single-pass (un-doubled
    batch) steps run through the indicator-slicing path and stay close to
    the exact output at toy size."""
    sig = np.asarray(model.sampler.discretization(model.sampler.num_steps))
    lo, hi = float(sig[0]) * 0.99, float(sig[0]) * 1.01
    flags = (sig[:-1] >= lo) & (sig[:-1] <= hi)
    assert flags.any() and not flags.all(), sig

    rnd = np.random.RandomState(10)
    frames = (rnd.rand(T, RES, RES, 3).astype(np.float32)) * 2.0 - 1.0
    noise = rnd.randn(T, RES // 8, RES // 8, 4).astype(np.float32)
    kw = dict(elevation=5.0, rng=jax.random.PRNGKey(11),
              randn=jnp.asarray(noise))
    exact = generate_orbit(model, frames, **kw)
    turbo = generate_orbit(model, frames, cfg_interval=(lo, hi), **kw)
    assert turbo.shape == exact.shape
    assert np.all(np.isfinite(turbo))
    assert np.abs(turbo - exact).mean() < 0.5


def test_num_steps_override_is_honored(model):
    """generate_orbit(num_steps=k) must change the sampler trajectory (it
    was previously accepted but silently ignored)."""
    rnd = np.random.RandomState(12)
    frames = (rnd.rand(T, RES, RES, 3).astype(np.float32)) * 2.0 - 1.0
    noise = rnd.randn(T, RES // 8, RES // 8, 4).astype(np.float32)
    kw = dict(elevation=5.0, rng=jax.random.PRNGKey(13),
              randn=jnp.asarray(noise))
    default_steps = generate_orbit(model, frames, **kw)
    overridden = generate_orbit(model, frames, num_steps=1, **kw)
    assert overridden.shape == default_steps.shape
    assert np.all(np.isfinite(overridden))
    assert np.abs(overridden - default_steps).max() > 1e-6


def test_uint8_output_matches_host_quantization(model):
    """output_dtype="uint8" denormalizes on device with tensor2vid's exact
    math — frames match the host float path within 1 quantization step."""
    from hi3d_tpu.utils.video import tensor2vid

    rnd = np.random.RandomState(14)
    frames = (rnd.rand(T, RES, RES, 3).astype(np.float32)) * 2.0 - 1.0
    noise = rnd.randn(T, RES // 8, RES // 8, 4).astype(np.float32)
    kw = dict(elevation=5.0, rng=jax.random.PRNGKey(15),
              randn=jnp.asarray(noise))
    f32 = generate_orbit(model, frames, **kw)
    u8 = generate_orbit(model, frames, output_dtype="uint8", **kw)
    assert u8.dtype == np.uint8 and u8.shape == f32.shape
    host = np.stack(tensor2vid(f32))
    diff = np.abs(host.astype(np.int16) - u8.astype(np.int16))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999
    # uint8 passthrough in tensor2vid
    assert np.array_equal(np.stack(tensor2vid(u8)), u8)


def test_clip_size_retargets_frame_tied_components(model):
    """Regression (round 4): --clip_size N must retarget every frame-count-
    tied component — VideoPredictionEmbedderWithEncoder.n_copies and the
    LinearPredictionGuider's per-frame scale linspace — not just
    model.num_samples. Before the fix an N != config clip crashed with a
    concat/reshape mismatch (16-copy concat-cond onto an N-frame batch)."""
    t2 = 2
    old = model.num_samples
    try:
        model.num_samples = t2
        assert model.sampler.guider.num_frames == t2
        assert model.sampler.guider.scale.shape == (t2,)
        frames = np.zeros((t2, RES, RES, 3), np.float32)
        out = generate_orbit(model, frames, elevation=0.0,
                             rng=jax.random.PRNGKey(2))
        assert out.shape == (t2, RES, RES, 3)
        assert np.all(np.isfinite(out))
    finally:
        model.num_samples = old
    # retarget is symmetric: the original clip length still runs
    assert model.sampler.guider.num_frames == old
