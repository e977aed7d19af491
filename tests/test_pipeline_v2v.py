"""End-to-end stage-2 refinement smoke at toy size: mp4 + image → latent
blending loop (lax.scan over step_call) → refined mp4. Random weights."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hi3d_tpu.pipelines.v2v import blend_refine, prepare_inputs, run_pipeline
from test_pipeline_i2v import CTX, TinyImageEmbedder, VAE_DD, tiny_config

pytestmark = pytest.mark.slow

T, RES = 4, 64


def tiny_stage2_config():
    cfg = tiny_config(num_steps=3)
    cfg["target"] = "vtdm.vtdm_gen_stage2_degradeImage.VideoLDM"
    p = cfg["params"]
    p["en_and_decode_n_samples_a_time"] = 1
    # 4 latent + 9 depth + 4 cond-video latent
    p["network_config"]["params"]["in_channels"] = 17
    p["conditioner_config"]["params"]["emb_models"] = [
        {"target": "test_pipeline_i2v.TinyImageEmbedder",
         "input_key": "cond_frames_without_noise", "is_trainable": False},
        {"target": "sgm.modules.encoders.modules.ConcatTimestepEmbedderND",
         "input_key": "elevation", "is_trainable": False,
         "params": {"outdim": 16}},
        {"target": "vtdm.encoders.DepthEmbedder",
         "input_key": "cond_frames", "is_trainable": False,
         "params": {"shuffle_size": 3, "scale_factor": 1.0,
                    "model_kwargs": {"features": 16, "vit_width": 32,
                                      "vit_layers": 2, "vit_heads": 2,
                                      "hooks": [0, 1], "pos_grid": 4}}},
        {"target": "sgm.modules.encoders.modules.VideoPredictionEmbedderWithEncoder",
         "input_key": "cond_frames", "is_trainable": False,
         "params": {"n_cond_frames": 1, "n_copies": 1, "is_ae": True,
                    "encoder_config": {
                        "target": "sgm.models.autoencoder.AutoencoderKLModeOnly",
                        "params": {"embed_dim": 4, "ddconfig": VAE_DD}}}},
        {"target": "sgm.modules.encoders.modules.ConcatTimestepEmbedderND",
         "input_key": "cond_aug", "is_trainable": False,
         "params": {"outdim": 16}},
    ]
    return cfg


@pytest.fixture(scope="module")
def model():
    from hi3d_tpu.config import instantiate_from_config

    m = instantiate_from_config(tiny_stage2_config())
    m.init(latent_hw=(RES // 8, RES // 8), num_frames=2)
    return m


def test_stage2_log_images_extras(model):
    """Stage-2 log_images adds depth-video (un-pixel-shuffled, RGB in
    [-1,1]) and cond-video (decoded conditioning latents) — reference
    vtdm_gen_stage2_degradeImage.py:146-151."""
    rnd = np.random.RandomState(5)
    video = rnd.rand(1, T, RES, RES, 3).astype(np.float32) * 2 - 1
    batch = {"video": jnp.asarray(video),
             "elevation": jnp.asarray([5.0], jnp.float32)}
    log = model.log_images(batch, n=1, sample=False,
                           rng=jax.random.PRNGKey(0))
    assert "inputs" in log and "reconstructions" in log
    h8 = RES // 8
    assert log["depth-video"].shape == (1, T, h8 * 3, h8 * 3, 3)
    assert log["cond-video"].shape == (1, T, RES, RES, 3)
    for k in ("depth-video", "cond-video"):
        assert np.all(np.isfinite(log[k])), k
    assert log["depth-video"].min() >= -1.0 - 1e-5
    assert log["depth-video"].max() <= 1.0 + 1e-5


def test_blend_refine_shapes(model):
    frames = np.random.RandomState(0).rand(T, RES, RES, 3).astype(np.float32)
    frames = frames * 2.0 - 1.0
    out = blend_refine(model, frames, elevation=5.0, rng=jax.random.PRNGKey(0))
    assert out.shape == (T, RES, RES, 3)
    assert np.all(np.isfinite(out))


def test_encoder_reuse_k1_matches_exact(model):
    """Turbo with k=1 computes the encoder every step — identical math to
    the exact path through the cache-threaded graph."""
    from hi3d_tpu.pipelines.v2v import blend_refine_batch

    rnd = np.random.RandomState(1)
    videos = (rnd.rand(1, T, RES, RES, 3).astype(np.float32)) * 2.0 - 1.0
    noise = rnd.randn(T, RES // 8, RES // 8, 4).astype(np.float32)
    kw = dict(
        elevations=[5.0],
        rng=jax.random.PRNGKey(3),
        init_noise=jnp.asarray(noise),
        steps_per_launch=None,
    )
    exact = blend_refine_batch(model, videos, **kw)
    turbo = blend_refine_batch(model, videos, encoder_reuse=1, **kw)
    np.testing.assert_allclose(turbo, exact, rtol=1e-4, atol=1e-5)


def test_encoder_reuse_k2_runs_and_approximates(model):
    """k=2 skips the encoder on half the steps: output is finite, correct
    shape, and not wildly far from the exact result (same inputs/noise)."""
    from hi3d_tpu.pipelines.v2v import blend_refine_batch

    rnd = np.random.RandomState(2)
    videos = (rnd.rand(1, T, RES, RES, 3).astype(np.float32)) * 2.0 - 1.0
    noise = rnd.randn(T, RES // 8, RES // 8, 4).astype(np.float32)
    kw = dict(
        elevations=[5.0],
        rng=jax.random.PRNGKey(3),
        init_noise=jnp.asarray(noise),
        steps_per_launch=None,
    )
    exact = blend_refine_batch(model, videos, **kw)
    turbo = blend_refine_batch(model, videos, encoder_reuse=2, **kw)
    assert turbo.shape == exact.shape
    assert np.all(np.isfinite(turbo))
    # approximation bound is architecture/weights-dependent; at toy size and
    # 3 steps the decoded frames stay in the same range
    assert np.abs(turbo).max() <= 1.0 + 1e-6  # output is clipped
    assert np.abs(turbo - exact).mean() < 0.5


def test_full_stage2_pipeline(model, tmp_path):
    import cv2

    from hi3d_tpu.utils.video import export_to_video

    rnd = np.random.RandomState(0)
    vid = [rnd.randint(0, 255, (RES, RES, 3), np.uint8) for _ in range(T + 2)]
    video_path = export_to_video(vid, str(tmp_path / "first.mp4"), fps=4)
    img = np.full((RES, RES, 3), 255, np.uint8)
    img[16:48, 16:48] = [200, 30, 40]
    img_path = str(tmp_path / "white.png")
    cv2.imwrite(img_path, img[..., ::-1])

    frames, masks = prepare_inputs(img_path, video_path, T, (RES, RES))
    assert frames.shape == (T, RES, RES, 3)
    assert masks.shape == (T, RES, RES)
    # frame 0 was replaced by the clean image: mask marks the colored square
    assert masks[0, 32, 32] == 1.0 and masks[0, 2, 2] == 0.0

    out = run_pipeline(
        model, img_path, video_path, str(tmp_path / "out"), clip_size=T,
        resolution=(RES, RES), seed=11,
    )
    assert os.path.exists(out)
    from hi3d_tpu.utils.video import import_video

    assert len(import_video(out)) >= T


def test_cfg_interval_full_cover_matches_exact(model):
    """A cfg_interval covering the whole σ schedule is bit-identical to the
    exact blend loop (same runner, CFG never switched off)."""
    from hi3d_tpu.pipelines.v2v import blend_refine_batch

    rnd = np.random.RandomState(4)
    videos = (rnd.rand(1, T, RES, RES, 3).astype(np.float32)) * 2.0 - 1.0
    noise = rnd.randn(T, RES // 8, RES // 8, 4).astype(np.float32)
    kw = dict(
        elevations=[5.0],
        rng=jax.random.PRNGKey(3),
        init_noise=jnp.asarray(noise),
        steps_per_launch=None,
    )
    exact = blend_refine_batch(model, videos, **kw)
    covered = blend_refine_batch(model, videos, cfg_interval=(0.0, 1e9), **kw)
    np.testing.assert_array_equal(covered, exact)


def test_cfg_interval_narrow_runs_and_approximates(model):
    """CFG restricted to the largest σ only: the no-CFG steps run a single
    conditioned UNet pass (exercising the un-doubled image_only_indicator
    path) and the output stays close to exact at toy size."""
    from hi3d_tpu.pipelines.v2v import blend_refine_batch

    sig = np.asarray(model.sampler.discretization(model.sampler.num_steps))
    lo, hi = float(sig[0]) * 0.99, float(sig[0]) * 1.01
    flags = (sig[:-1] >= lo) & (sig[:-1] <= hi)
    assert flags.any() and not flags.all(), sig

    rnd = np.random.RandomState(5)
    videos = (rnd.rand(1, T, RES, RES, 3).astype(np.float32)) * 2.0 - 1.0
    noise = rnd.randn(T, RES // 8, RES // 8, 4).astype(np.float32)
    kw = dict(
        elevations=[5.0],
        rng=jax.random.PRNGKey(3),
        init_noise=jnp.asarray(noise),
        steps_per_launch=None,
    )
    exact = blend_refine_batch(model, videos, **kw)
    turbo = blend_refine_batch(model, videos, cfg_interval=(lo, hi), **kw)
    assert turbo.shape == exact.shape
    assert np.all(np.isfinite(turbo))
    assert np.abs(turbo - exact).mean() < 0.5


def test_cfg_interval_exclusive_with_encoder_reuse_blend(model):
    from hi3d_tpu.pipelines.v2v import blend_refine_batch

    videos = np.zeros((1, T, RES, RES, 3), np.float32)
    with pytest.raises(ValueError, match="mutually exclusive"):
        blend_refine_batch(
            model, videos, cfg_interval=(0.5, 30.0), encoder_reuse=2
        )


def test_num_steps_override_is_honored(model):
    """blend_refine(num_steps=k) re-derives the σ schedule, blend α, and
    scan length from k instead of the config's sampler.num_steps."""
    rnd = np.random.RandomState(6)
    frames = (rnd.rand(T, RES, RES, 3).astype(np.float32)) * 2.0 - 1.0
    kw = dict(elevation=5.0, rng=jax.random.PRNGKey(7))
    default_steps = blend_refine(model, frames, **kw)
    overridden = blend_refine(model, frames, num_steps=1, **kw)
    assert overridden.shape == default_steps.shape
    assert np.all(np.isfinite(overridden))
    assert np.abs(overridden - default_steps).max() > 1e-6


def test_uint8_output_matches_host_quantization(model):
    from hi3d_tpu.utils.video import tensor2vid

    rnd = np.random.RandomState(7)
    frames = (rnd.rand(T, RES, RES, 3).astype(np.float32)) * 2.0 - 1.0
    kw = dict(elevation=5.0, rng=jax.random.PRNGKey(8))
    f32 = blend_refine(model, frames, **kw)
    u8 = blend_refine(model, frames, output_dtype="uint8", **kw)
    assert u8.dtype == np.uint8 and u8.shape == f32.shape
    host = np.stack(tensor2vid(f32))
    diff = np.abs(host.astype(np.int16) - u8.astype(np.int16))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999
