"""Engine-level units: add_custom_cond semantics, chunked VAE calls, weight
casting, log_images keys."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_pipeline_i2v import T, RES, tiny_config


@pytest.fixture(scope="module")
def model():
    from hi3d_tpu.config import instantiate_from_config

    m = instantiate_from_config(tiny_config(num_steps=2))
    m.init(latent_hw=(RES // 8, RES // 8), num_frames=2)
    return m


def test_add_custom_cond_infer(model):
    video = jnp.zeros((2, T, RES, RES, 3))
    batch = model.add_custom_cond(
        {"video": video, "elevation": jnp.zeros((2,))}, infer=True,
        rng=jax.random.PRNGKey(0),
    )
    # infer: fixed σ=0.02 noise augmentation (vtdm_gen_v01.py:68-69)
    np.testing.assert_allclose(np.asarray(batch["cond_aug"]), 0.02)
    assert batch["cond_frames_without_noise"].shape == (2, RES, RES, 3)
    # cond_frames = clean frame + 0.02·noise
    resid = np.asarray(batch["cond_frames"]) - np.asarray(video[:, 0])
    assert 0.0 < np.abs(resid).max() < 0.2
    assert batch["image_only_indicator"].shape == (2, T)
    assert batch["num_video_frames"] == T


def test_add_custom_cond_train_aug_distribution(model):
    video = jnp.zeros((128, T, 8, 8, 3))
    batch = model.add_custom_cond(
        {"video": video}, infer=False, rng=jax.random.PRNGKey(1)
    )
    aug = np.log(np.asarray(batch["cond_aug"]))
    # train: cond_aug ~ exp(N(-3, 0.5)) (vtdm_gen_v01.py:66)
    assert abs(aug.mean() + 3.0) < 0.2
    assert abs(aug.std() - 0.5) < 0.15


def test_chunked_encode_decode_match_unchunked(model):
    frames = jax.random.normal(jax.random.PRNGKey(2), (4, RES, RES, 3)) * 0.2
    model.en_and_decode_n_samples_a_time = 4
    z_full = model.encode_first_stage(frames)
    model.en_and_decode_n_samples_a_time = 1
    z_chunk = model.encode_first_stage(frames)
    model.en_and_decode_n_samples_a_time = 2
    np.testing.assert_allclose(
        np.asarray(z_full), np.asarray(z_chunk), rtol=1e-4, atol=1e-5
    )
    dec_full = model.decode_first_stage(z_full)
    assert dec_full.shape == (4, RES, RES, 3)


def test_cast_weights_roundtrip(model):
    import jax.numpy as jnp

    orig_dtype = model.compute_dtype
    orig = jax.tree.map(np.asarray, model.params)
    try:
        model.compute_dtype = jnp.bfloat16
        model.cast_weights_to_compute_dtype()
        leaves = jax.tree.leaves(model.params)
        assert all(l.dtype == jnp.bfloat16 for l in leaves)
        # VAE stays fp32
        vae_leaves = jax.tree.leaves(model.first_stage_model.params)
        assert all(l.dtype == jnp.float32 for l in vae_leaves)
    finally:
        model.compute_dtype = orig_dtype
        model.params = jax.tree.map(jnp.asarray, orig)


def test_log_images_keys(model):
    batch = {
        "video": jnp.zeros((1, T, RES, RES, 3)),
        "elevation": jnp.zeros((1,)),
        "caption": ["a test asset"],
    }
    log = model.log_images(batch, n=1, sample=True, rng=jax.random.PRNGKey(3))
    assert set(log) == {"inputs", "reconstructions", "samples", "conditioning"}
    # caption rendered at 512² (reference vtdm_gen_v01.py:139)
    assert log["conditioning"].shape == (1, 512, 512, 3)
    for k in ("inputs", "reconstructions", "samples"):
        assert log[k].shape == (1, T, RES, RES, 3)
        assert np.isfinite(log[k]).all()


def test_log_conditionings_text_images(model):
    """Generic conditioning dumps (reference diffusion.py:255-291)."""
    batch = {
        "video": jnp.zeros((2, T, RES, RES, 3)),
        "elevation": jnp.asarray([0.0, 10.0]),
    }
    log = model.log_conditionings(batch, n=2)
    assert "elevation" in log
    assert log["elevation"].shape == (2, RES, RES, 3)
    assert log["elevation"].min() >= -1.0 and log["elevation"].max() <= 1.0

    model.no_cond_log = True
    try:
        assert model.log_conditionings(batch, n=2) == {}
    finally:
        model.no_cond_log = False


def test_cast_weights_include_first_stage(model):
    """--vae_bf16 parity: VAE params/module cast to compute dtype, decode
    stays close to the fp32 result."""
    import jax.numpy as jnp

    frames = jax.random.normal(jax.random.PRNGKey(7), (2, RES, RES, 3)) * 0.2
    z = model.encode_first_stage(frames)
    ref = np.asarray(model.decode_first_stage(z), np.float32)

    orig_dtype = model.compute_dtype
    orig_unet = jax.tree.map(np.asarray, model.params)
    orig_params = jax.tree.map(np.asarray, model.first_stage_model.params)
    orig_module = model.first_stage_model.module
    try:
        model.compute_dtype = jnp.bfloat16
        model.cast_weights_to_compute_dtype(
            include_towers=False, include_first_stage=True
        )
        leaves = jax.tree.leaves(model.first_stage_model.params)
        assert all(l.dtype == jnp.bfloat16 for l in leaves)
        assert model.first_stage_model.module.dtype == jnp.bfloat16
        got = np.asarray(model.decode_first_stage(z), np.float32)
        assert np.isfinite(got).all()
        # bf16 VAE ≈ fp32 VAE (loose: 8-bit mantissa through ~30 convs)
        assert np.abs(got - ref).mean() < 0.05
    finally:
        model.compute_dtype = orig_dtype
        model.first_stage_model.params = jax.tree.map(
            jnp.asarray, orig_params
        )
        model.first_stage_model.module = orig_module
        model.first_stage_model.__dict__.pop("_misc_cache", None)
        model.params = jax.tree.map(jnp.asarray, orig_unet)
