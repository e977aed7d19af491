"""KL-VAE shape/behavior tests at toy size."""

import numpy as np
import jax
import jax.numpy as jnp

from hi3d_tpu.models.vae import (
    AutoencoderKL,
    AutoencoderKLModeOnly,
    DiagonalGaussianDistribution,
)
import pytest

pytestmark = pytest.mark.slow

DDCONFIG = dict(
    double_z=True,
    z_channels=4,
    resolution=32,
    in_channels=3,
    out_ch=3,
    ch=16,
    ch_mult=[1, 2],
    num_res_blocks=1,
    attn_resolutions=[],
    dropout=0.0,
    attn_type="vanilla-xformers",
)


def make_vae(cls=AutoencoderKL):
    vae = cls(ddconfig=DDCONFIG, embed_dim=4)
    vae.init(jax.random.PRNGKey(0), image_hw=(32, 32))
    return vae


def test_encode_decode_shapes():
    vae = make_vae()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    z = vae.encode(x)  # mode (no rng)
    assert z.shape == (2, 16, 16, 4)  # f=2 for ch_mult len 2
    rec = vae.decode(z)
    assert rec.shape == (2, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(rec)))


def test_mode_only_is_deterministic():
    vae = make_vae(AutoencoderKLModeOnly)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    z1 = vae.encode(x, rng=jax.random.PRNGKey(2))
    z2 = vae.encode(x, rng=jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2))


def test_sampling_vae_uses_rng():
    vae = make_vae(AutoencoderKL)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    z1 = vae.encode(x, rng=jax.random.PRNGKey(2))
    z2 = vae.encode(x, rng=jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(z1), np.asarray(z2))


def test_diagonal_gaussian():
    mean = jnp.ones((2, 4, 4, 4)) * 0.5
    logvar = jnp.zeros((2, 4, 4, 4))
    dist = DiagonalGaussianDistribution(jnp.concatenate([mean, logvar], -1))
    np.testing.assert_allclose(np.asarray(dist.mode()), 0.5)
    # KL(N(0.5,1) || N(0,1)) per-dim = 0.5·(μ²+σ²−1−logσ²) = 0.5·0.25
    kl = np.asarray(dist.kl())
    np.testing.assert_allclose(kl, 0.5 * 0.25 * 4 * 4 * 4, rtol=1e-5)
    # samples have roughly the right stats
    s = np.asarray(dist.sample(jax.random.PRNGKey(0)))
    assert abs(s.mean() - 0.5) < 0.15


def test_tiled_decode_close_to_full():
    """Feathered tiled decode ≈ full decode (interior exact up to blending;
    seams within tolerance thanks to the overlap cross-fade)."""
    from hi3d_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL(
        ddconfig=dict(double_z=True, z_channels=4, in_channels=3, out_ch=3,
                      ch=8, ch_mult=[1, 2], num_res_blocks=1,
                      attn_resolutions=[], resolution=64),
    )
    vae.init(jax.random.PRNGKey(0), image_hw=(32, 32))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 48, 4)) * 0.5
    full = vae.decode(z)
    tiled = vae.decode_tiled(z, tile=32, overlap=16)
    assert tiled.shape == full.shape
    # exactness is impossible: the mid-block attention is global, so each
    # tile attends only within itself (the standard tiled-VAE tradeoff);
    # random weights amplify the gap far beyond trained-weight behavior
    diff = np.abs(np.asarray(tiled) - np.asarray(full))
    assert float(np.mean(diff)) < 0.15, float(np.mean(diff))
    assert np.all(np.isfinite(np.asarray(tiled)))
    # small tile == passthrough
    z_small = z[:, :32, :32]
    np.testing.assert_allclose(
        np.asarray(vae.decode_tiled(z_small, tile=32)),
        np.asarray(vae.decode(z_small)), rtol=1e-5, atol=1e-6,
    )
