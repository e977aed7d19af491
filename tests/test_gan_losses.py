"""PatchGAN discriminator, autoencoder GAN losses, and VQ quantizers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hi3d_tpu.models.discriminator import (
    GeneralLPIPSWithDiscriminator,
    LatentLPIPS,
    NLayerDiscriminator,
    hinge_d_loss,
    vanilla_d_loss,
)

pytestmark = pytest.mark.slow


def test_d_losses_golden():
    # hinge: 0.5*(relu(1-r).mean() + relu(1+f).mean())  (vqperceptual.py:5-9)
    r = jnp.asarray([0.5, 2.0])
    f = jnp.asarray([-0.5, -2.0])
    expect = 0.5 * ((0.5 + 0.0) / 2 + (0.5 + 0.0) / 2)
    np.testing.assert_allclose(float(hinge_d_loss(r, f)), expect, rtol=1e-6)
    v = float(vanilla_d_loss(r, f))
    expect_v = 0.5 * float(
        jnp.mean(jnp.log1p(jnp.exp(-r))) + jnp.mean(jnp.log1p(jnp.exp(f)))
    )
    np.testing.assert_allclose(v, expect_v, rtol=1e-5)
    # perfect discrimination → loss small; reversed → large
    assert float(hinge_d_loss(jnp.asarray([5.0]), jnp.asarray([-5.0]))) == 0.0
    assert float(hinge_d_loss(jnp.asarray([-5.0]), jnp.asarray([5.0]))) > 1.0


def test_nlayer_discriminator_patch_output():
    disc = NLayerDiscriminator(n_layers=3)
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = disc.init(jax.random.PRNGKey(0), x, train=True)
    logits = disc.apply(vars_, x)
    # 64 → 32 → 16 → 8 (stride-2 ×3) → 7 → 6 (two stride-1 4×4 convs, pad 1),
    # matching torch's patch-map size for a 64² input
    assert logits.shape == (2, 6, 6, 1)
    # batch stats update in train mode
    _, mut = disc.apply(
        vars_, jnp.ones((2, 64, 64, 3)), train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in mut


def _loss_state(loss, hw=(32, 32)):
    return loss.init(jax.random.PRNGKey(0), image_hw=hw)


def test_general_lpips_disc_generator_pass():
    loss = GeneralLPIPSWithDiscriminator(
        disc_start=0, perceptual_weight=0.0, disc_weight=0.7
    )
    state = _loss_state(loss)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 0.2
    rec = x + 0.1

    total, log = loss.generator_loss(
        state, x, rec, global_step=10, train=True
    )
    # nll = |x-rec|/exp(0) + 0 → mean |0.1| * (pixels summed / batch)
    assert float(log["train/loss/rec"]) == pytest.approx(0.1, rel=1e-5)
    assert "train/loss/g" in log and "train/scalars/d_weight" in log
    # before disc_start, no GAN term
    loss2 = GeneralLPIPSWithDiscriminator(
        disc_start=100, perceptual_weight=0.0
    )
    _, log2 = loss2.generator_loss(state, x, rec, global_step=0, train=True)
    assert float(log2["train/scalars/d_weight"]) == 0.0


def test_general_lpips_disc_discriminator_pass_and_video_dims():
    loss = GeneralLPIPSWithDiscriminator(
        disc_start=0, perceptual_weight=0.0, dims=3
    )
    state = _loss_state(loss)
    vid = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 32, 32, 3)) * 0.3
    d_loss, log, new_stats = loss.discriminator_loss(
        state, vid, vid * 0.5, global_step=5, train=True
    )
    assert np.isfinite(float(d_loss))
    assert "train/logits/real" in log
    assert new_stats is not None  # BatchNorm stats advanced


def test_adaptive_weight_via_grad():
    loss = GeneralLPIPSWithDiscriminator(
        disc_start=0, perceptual_weight=0.0, disc_weight=2.0
    )
    state = _loss_state(loss)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 3)) * 0.2

    w = jnp.ones((3,))  # stand-in "last layer" params

    def decode_fn(p):
        return x * p[None, None, None, :] * 0.9

    total, log = loss.generator_loss(
        state, x, decode_fn(w), global_step=1, train=True,
        decode_fn=decode_fn, last_layer_params=w,
    )
    d_w = float(log["train/scalars/d_weight"])
    assert np.isfinite(d_w) and d_w >= 0.0
    assert d_w != 2.0  # actually computed, not the fallback constant


def test_latent_lpips():
    dd = dict(ch=8, ch_mult=[1, 2], num_res_blocks=1, z_channels=4,
              attn_resolutions=[], resolution=32, double_z=True)
    ll = LatentLPIPS(
        decoder_config={
            "target": "sgm.models.autoencoder.AutoencoderKL",
            "params": {"ddconfig": dd},
        },
        perceptual_weight=1.0,
        latent_weight=0.5,
    )
    ll.init(jax.random.PRNGKey(0), image_hw=(32, 32))
    z1 = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    z2 = z1 + 0.2
    out, log = ll(z1, z2, image_inputs=None)
    assert np.isfinite(float(out)) and float(out) > 0
    assert "train/latent_l2_loss" in log and "train/perceptual_loss" in log


# ---------------------------------------------------------------------------
# quantizers
# ---------------------------------------------------------------------------


def test_vector_quantizer_straight_through():
    from hi3d_tpu.models.quantizers import VectorQuantizer

    vq = VectorQuantizer(n_e=16, e_dim=4, beta=0.25, sane_index_shape=True)
    vq.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4)) * 0.05
    z_q, log = vq(z)
    assert z_q.shape == z.shape
    assert log["min_encoding_indices"].shape == (2, 8, 8)
    assert float(log["loss/vq"]) > 0
    # straight-through: d z_q/d z == identity
    g = jax.grad(lambda v: jnp.sum(vq(v)[0]))(z)
    np.testing.assert_allclose(np.asarray(g), 1.0, rtol=1e-6)
    # quantized values are codebook rows
    flat_q = np.asarray(jax.lax.stop_gradient(z_q)).reshape(-1, 4)
    emb = np.asarray(vq.embedding)
    dists = np.abs(flat_q[:, None, :] - emb[None]).sum(-1).min(1)
    np.testing.assert_allclose(dists, 0.0, atol=1e-6)


def test_vector_quantizer_codebook_entry_roundtrip():
    from hi3d_tpu.models.quantizers import VectorQuantizer

    vq = VectorQuantizer(n_e=8, e_dim=4, sane_index_shape=True)
    vq.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 4))
    z_q, log = vq(z)
    back = vq.get_codebook_entry(
        log["min_encoding_indices"].reshape(-1), shape=(1, 4, 4, 4)
    )
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(jax.lax.stop_gradient(z_q)), atol=1e-6
    )


def test_gumbel_quantizer():
    from hi3d_tpu.models.quantizers import GumbelQuantizer

    gq = GumbelQuantizer(num_hiddens=6, embedding_dim=4, n_embed=10)
    gq.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 5, 6))
    z_q, log = gq(z, rng=jax.random.PRNGKey(2), train=True)
    assert z_q.shape == (2, 5, 5, 4)
    assert log["indices"].shape == (2, 5, 5)
    assert np.isfinite(float(log["loss/vq"]))
    # eval mode = always hard: outputs are exact codebook rows
    z_q_eval, _ = gq(z, rng=jax.random.PRNGKey(3), train=False)
    flat = np.asarray(z_q_eval).reshape(-1, 4)
    emb = np.asarray(gq.embed)
    dists = np.abs(flat[:, None, :] - emb[None]).sum(-1).min(1)
    np.testing.assert_allclose(dists, 0.0, atol=1e-5)


def test_ema_vector_quantizer_updates():
    from hi3d_tpu.models.quantizers import EMAVectorQuantizer

    q = EMAVectorQuantizer(n_embed=4, embedding_dim=3, beta=1.0, decay=0.5)
    q.init_params(jax.random.PRNGKey(0))
    w0 = np.asarray(q.weight).copy()
    z = jnp.ones((1, 2, 2, 3)) * 0.7
    z_q, log = q(z, train=True)
    assert "perplexity" in log
    assert not np.allclose(np.asarray(q.weight), w0)  # EMA moved the codebook
    # repeated exposure pulls the assigned code toward the data point
    for _ in range(30):
        _, log = q(z, train=True)
    idx = int(np.asarray(log["encoding_indices"])[0])
    np.testing.assert_allclose(np.asarray(q.weight)[idx], 0.7, atol=0.05)
    # train=False leaves the codebook untouched
    w1 = np.asarray(q.weight).copy()
    q(z, train=False)
    np.testing.assert_allclose(np.asarray(q.weight), w1)


def test_vq_with_input_projection():
    from hi3d_tpu.models.quantizers import VectorQuantizerWithInputProjection

    q = VectorQuantizerWithInputProjection(
        input_dim=6, n_codes=12, codebook_dim=4, output_dim=6
    )
    q.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 3, 6))
    z_q, log = q(z)
    assert z_q.shape == (2, 3, 3, 6)
    assert "loss/vq" in log


def test_quantizers_from_registry():
    from hi3d_tpu.config import instantiate_from_config

    vq = instantiate_from_config(
        {
            "target": "sgm.modules.autoencoding.regularizers.quantize.VectorQuantizer",
            "params": {"n_e": 8, "e_dim": 4},
        }
    )
    z = jnp.zeros((1, 2, 2, 4))
    z_q, log = vq(z)
    assert z_q.shape == z.shape
