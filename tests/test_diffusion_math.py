"""Golden-value and consistency tests for the diffusion math layer.

Expected values are computed with independent float64 numpy implementations of
the published formulas (EDM preconditioning, Karras ρ-schedule, CFG blending)
— the same math the reference implements in
sgm/modules/diffusionmodules/{denoiser_scaling,discretizer,guiders}.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hi3d_tpu.diffusion import (
    EDMDiscretization,
    EDMSampling,
    EDMScaling,
    EpsScaling,
    LegacyDDPMDiscretization,
    LinearPredictionGuider,
    UnitWeighting,
    VanillaCFG,
    VScaling,
    VScalingWithEDMcNoise,
    VWeighting,
    EpsWeighting,
    Denoiser,
    DiscreteDenoiser,
)
from hi3d_tpu.utils.misc import append_dims, append_zero

SIGMAS = np.array([0.002, 0.1, 1.0, 7.5, 80.0, 700.0], dtype=np.float64)


# ---------------------------------------------------------------- scalings
def test_v_scaling_with_edm_cnoise_golden():
    c_skip, c_out, c_in, c_noise = VScalingWithEDMcNoise()(jnp.asarray(SIGMAS))
    np.testing.assert_allclose(c_skip, 1.0 / (SIGMAS**2 + 1.0), rtol=1e-5)
    np.testing.assert_allclose(
        c_out, -SIGMAS / np.sqrt(SIGMAS**2 + 1.0), rtol=1e-5
    )
    np.testing.assert_allclose(c_in, 1.0 / np.sqrt(SIGMAS**2 + 1.0), rtol=1e-5)
    np.testing.assert_allclose(c_noise, 0.25 * np.log(SIGMAS), rtol=1e-5, atol=1e-7)


def test_edm_scaling_golden():
    sd = 0.5
    c_skip, c_out, c_in, c_noise = EDMScaling(sd)(jnp.asarray(SIGMAS))
    np.testing.assert_allclose(c_skip, sd**2 / (SIGMAS**2 + sd**2), rtol=1e-5)
    np.testing.assert_allclose(
        c_out, SIGMAS * sd / np.sqrt(SIGMAS**2 + sd**2), rtol=1e-5
    )
    np.testing.assert_allclose(c_in, 1.0 / np.sqrt(SIGMAS**2 + sd**2), rtol=1e-5)
    np.testing.assert_allclose(c_noise, 0.25 * np.log(SIGMAS), rtol=1e-5, atol=1e-7)


def test_eps_and_v_scalings():
    c_skip, c_out, c_in, c_noise = EpsScaling()(jnp.asarray(SIGMAS))
    np.testing.assert_allclose(c_skip, np.ones_like(SIGMAS))
    np.testing.assert_allclose(c_out, -SIGMAS, rtol=1e-6)
    np.testing.assert_allclose(c_noise, SIGMAS, rtol=1e-6)

    c_skip, c_out, c_in, c_noise = VScaling()(jnp.asarray(SIGMAS))
    np.testing.assert_allclose(c_skip, 1.0 / (SIGMAS**2 + 1.0), rtol=1e-5)
    np.testing.assert_allclose(c_noise, SIGMAS, rtol=1e-6)


# ---------------------------------------------------------------- schedules
def test_edm_discretization_hi3d_config():
    """σ_max=700, ρ=7, 25 steps — the exact stage-1/2 sampling schedule."""
    disc = EDMDiscretization(sigma_max=700.0)
    sigmas = np.asarray(disc(25))
    assert sigmas.shape == (26,)  # appended zero
    assert sigmas[-1] == 0.0
    # endpoints
    np.testing.assert_allclose(sigmas[0], 700.0, rtol=1e-5)
    np.testing.assert_allclose(sigmas[24], 0.002, rtol=1e-4)
    # monotonically decreasing
    assert np.all(np.diff(sigmas) < 0)
    # golden middle value from the ρ-formula in float64
    ramp = np.linspace(0, 1, 25)
    expected = (700 ** (1 / 7) + ramp * (0.002 ** (1 / 7) - 700 ** (1 / 7))) ** 7
    np.testing.assert_allclose(sigmas[:-1], expected, rtol=1e-4)


def test_legacy_ddpm_discretization():
    disc = LegacyDDPMDiscretization()
    sigmas = np.asarray(disc(1000, do_append_zero=False))
    assert sigmas.shape == (1000,)
    assert np.all(np.diff(sigmas) < 0)  # descending
    # σ = sqrt((1-ᾱ)/ᾱ) at the last (least-noisy) position
    betas = np.linspace(0.00085**0.5, 0.0120**0.5, 1000) ** 2
    ac = np.cumprod(1 - betas)
    np.testing.assert_allclose(sigmas[-1], np.sqrt((1 - ac[0]) / ac[0]), rtol=1e-4)
    np.testing.assert_allclose(sigmas[0], np.sqrt((1 - ac[-1]) / ac[-1]), rtol=1e-4)

    sub = np.asarray(disc(25, do_append_zero=False))
    assert sub.shape == (25,)
    assert np.all(np.diff(sub) < 0)


# ---------------------------------------------------------------- σ-sampling
def test_edm_sampling_lognormal_stats():
    s = EDMSampling(p_mean=1.0, p_std=1.6)
    sigmas = s(jax.random.PRNGKey(0), 200_000)
    logs = np.log(np.asarray(sigmas))
    assert abs(logs.mean() - 1.0) < 0.02
    assert abs(logs.std() - 1.6) < 0.02


# ---------------------------------------------------------------- weightings
def test_weightings():
    s = jnp.asarray(SIGMAS)
    np.testing.assert_allclose(UnitWeighting()(s), np.ones_like(SIGMAS))
    np.testing.assert_allclose(
        VWeighting()(s), (SIGMAS**2 + 1.0) / SIGMAS**2, rtol=1e-5
    )
    np.testing.assert_allclose(EpsWeighting()(s), SIGMAS**-2.0, rtol=1e-5)


# ---------------------------------------------------------------- guiders
def test_vanilla_cfg():
    g = VanillaCFG(scale=2.0)
    x_u = jnp.ones((2, 3)) * 1.0
    x_c = jnp.ones((2, 3)) * 3.0
    out = g(jnp.concatenate([x_u, x_c]), sigma=None)
    np.testing.assert_allclose(out, 1.0 + 2.0 * (3.0 - 1.0))


def test_linear_prediction_guider_per_frame_scale():
    T = 16
    g = LinearPredictionGuider(max_scale=2.5, num_frames=T, min_scale=1.0)
    b = 2
    x_u = jnp.zeros((b * T, 4, 8, 8))
    x_c = jnp.ones((b * T, 4, 8, 8))
    out = np.asarray(g(jnp.concatenate([x_u, x_c]), sigma=None))
    expected_scales = np.linspace(1.0, 2.5, T)
    out = out.reshape(b, T, 4, 8, 8)
    for t in range(T):
        np.testing.assert_allclose(out[:, t], expected_scales[t], rtol=1e-6)


def test_guider_prepare_inputs_order():
    """Batch doubling must be [uc, c] — the split order the guider assumes."""
    g = VanillaCFG(scale=1.5)
    x = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
    s = jnp.ones((2,))
    c = {"crossattn": jnp.ones((2, 1, 4)), "extra": jnp.zeros((1,))}
    uc = {"crossattn": jnp.zeros((2, 1, 4)), "extra": jnp.zeros((1,))}
    x2, s2, cm = g.prepare_inputs(x, s, c, uc)
    assert x2.shape == (4, 3)
    assert s2.shape == (4,)
    np.testing.assert_allclose(cm["crossattn"][:2], 0.0)  # uc first
    np.testing.assert_allclose(cm["crossattn"][2:], 1.0)
    assert cm["extra"].shape == (1,)  # non-batched keys passthrough


# ---------------------------------------------------------------- denoiser
def test_denoiser_preconditioning():
    """D(x,σ) = net(x·c_in, c_noise)·c_out + x·c_skip with an identity net."""
    den = Denoiser(
        {
            "target": "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"
        }
    )
    captured = {}

    def network(x, c_noise, cond):
        captured["x"] = x
        captured["c_noise"] = c_noise
        return x

    x = jnp.full((2, 3, 4, 4), 2.0)
    sigma = jnp.asarray([1.0, 7.5])
    out = den(network, x, sigma, cond={})

    s = np.array([1.0, 7.5])
    c_skip = 1 / (s**2 + 1)
    c_out = -s / np.sqrt(s**2 + 1)
    c_in = 1 / np.sqrt(s**2 + 1)
    expected = (2.0 * c_in) * c_out + 2.0 * c_skip
    np.testing.assert_allclose(
        np.asarray(out)[:, 0, 0, 0], expected, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(captured["c_noise"]), 0.25 * np.log(s), rtol=1e-5
    )


def test_discrete_denoiser_quantizes_sigma():
    den = DiscreteDenoiser(
        scaling_config={
            "target": "sgm.modules.diffusionmodules.denoiser_scaling.VScaling"
        },
        num_idx=1000,
        discretization_config={
            "target": "sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization"
        },
    )
    sigmas = np.asarray(den.sigmas)
    assert sigmas.shape == (1000,)
    assert np.all(np.diff(sigmas) > 0)  # flip=True → ascending
    # an arbitrary σ snaps to its nearest grid value
    probe = jnp.asarray([float(sigmas[123]) * 1.0001])
    q = den.possibly_quantize_sigma(probe)
    np.testing.assert_allclose(q, sigmas[123], rtol=1e-6)


# ---------------------------------------------------------------- utils
def test_append_dims_and_zero():
    x = jnp.ones((3,))
    assert append_dims(x, 4).shape == (3, 1, 1, 1)
    z = append_zero(jnp.asarray([2.0, 1.0]))
    np.testing.assert_allclose(z, [2.0, 1.0, 0.0])
    with pytest.raises(ValueError):
        append_dims(jnp.ones((2, 2)), 1)


@pytest.mark.slow  # VGG-LPIPS init dominates (~17 s); the L1/L2 paths above
# cover the loss plumbing in the fast subset
def test_diffusion_loss_lpips_type():
    """loss_type='lpips': perceptual distance, no σ-weighting
    (reference loss.py:33-34,107-108)."""
    import jax
    import jax.numpy as jnp
    from hi3d_tpu.diffusion.loss import StandardDiffusionLoss

    loss = StandardDiffusionLoss(
        sigma_sampler_config={
            "target": "sgm.modules.diffusionmodules.sigma_sampling.EDMSampling",
            "params": {"p_mean": -1.2, "p_std": 1.2},
        },
        loss_weighting_config={
            "target": "sgm.modules.diffusionmodules.loss_weighting.UnitWeighting",
        },
        loss_type="lpips",
        num_frames=1,
    )

    def network(x, sigma, cond, **kw):
        return x * 0.98  # near-identity "denoiser network"

    class _IdDenoiser:
        def __call__(self, net, x, sigma, cond, **kw):
            return net(x, sigma, cond, **kw)

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3)) * 0.3
    out = loss(network, _IdDenoiser(), {}, x, {}, jax.random.PRNGKey(1))
    assert out.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(out)))
