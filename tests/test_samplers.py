"""Sampler tests: scan-loop vs. hand-rolled python reference steps, step_call
consistency, and jit-compilability of the full loop."""

import numpy as np
import jax
import jax.numpy as jnp

from hi3d_tpu.diffusion.samplers import (
    DPMPP2MSampler,
    EulerEDMSampler,
    HeunEDMSampler,
    to_d,
)
from hi3d_tpu.utils.misc import append_dims

DISC = {
    "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
    "params": {"sigma_max": 700.0},
}
GUIDER = {
    "target": "sgm.modules.diffusionmodules.guiders.LinearPredictionGuider",
    "params": {"num_frames": 4, "max_scale": 2.5, "min_scale": 1.0},
}


def toy_denoiser(x, sigma, cond):
    """A fake denoiser with nontrivial σ-dependence: D(x,σ) = x/(1+σ)."""
    return x / (1.0 + append_dims(sigma, x.ndim))


def python_euler_reference(x0, sigmas, denoise):
    """Plain python Euler-EDM loop (reference sampling.py:128-147 semantics)."""
    x = x0 * np.sqrt(1 + sigmas[0] ** 2)
    for i in range(len(sigmas) - 1):
        sigma = np.full((x.shape[0],), sigmas[i], dtype=np.float64)
        denoised = denoise(x, sigma)
        d = (x - denoised) / sigma.reshape(-1, 1, 1, 1)
        x = x + (sigmas[i + 1] - sigmas[i]) * d
    return x


def test_euler_edm_matches_python_loop():
    sampler = EulerEDMSampler(num_steps=8, discretization_config=DISC)
    key = jax.random.PRNGKey(42)
    x0 = jax.random.normal(key, (4, 4, 8, 8), dtype=jnp.float32)
    out = sampler(toy_denoiser, x0, cond={}, uc=None)

    sig = np.asarray(sampler.discretization(8), dtype=np.float64)
    ref = python_euler_reference(
        np.asarray(x0, np.float64),
        sig,
        lambda x, s: x / (1 + s.reshape(-1, 1, 1, 1)),
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_euler_with_cfg_guider():
    """With a guider, the denoiser sees a doubled batch and blends per frame."""
    sampler = EulerEDMSampler(
        num_steps=5, discretization_config=DISC, guider_config=GUIDER
    )
    T = 4
    x0 = jax.random.normal(jax.random.PRNGKey(0), (T, 4, 8, 8))
    seen_shapes = []

    def denoiser(x, sigma, cond):
        seen_shapes.append(x.shape)
        return x / (1.0 + append_dims(sigma, x.ndim))

    out = sampler(denoiser, x0, cond={"vector": jnp.ones((T, 8))}, uc={"vector": jnp.zeros((T, 8))})
    assert out.shape == x0.shape
    assert all(s[0] == 2 * T for s in seen_shapes)  # CFG batch doubling
    assert np.all(np.isfinite(np.asarray(out)))


def test_step_call_matches_full_loop():
    """Driving the sampler step-by-step via step_call (traced i) must equal
    the fused scan loop — the stage-2 blending pipeline depends on this."""
    sampler = EulerEDMSampler(num_steps=6, discretization_config=DISC)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))

    full = sampler(toy_denoiser, x0, cond={})

    sigmas = sampler.discretization(6)
    num_sigmas = sigmas.shape[0]
    s_in = jnp.ones((2,), dtype=jnp.float32)
    x = x0 * jnp.sqrt(1.0 + sigmas[0] ** 2)

    def body(x, i):
        x = sampler.step_call(toy_denoiser, x, i, s_in, sigmas, num_sigmas, {}, {})
        return x, None

    stepped, _ = jax.lax.scan(body, x, jnp.arange(num_sigmas - 1))
    np.testing.assert_allclose(np.asarray(full), np.asarray(stepped), rtol=1e-5)


def test_heun_better_than_euler_on_stiff_ode():
    """Heun is second-order: on a stiff toy denoiser D(x,σ)=x/(1+σ)² it must
    beat Euler at equal step count against a fine-step reference."""
    disc = {
        "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
        "params": {"sigma_max": 80.0},
    }

    def stiff(x, sigma, cond):
        s = append_dims(sigma, x.ndim)
        return x / (1.0 + s) ** 2

    x0 = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
    truth = np.asarray(
        EulerEDMSampler(num_steps=2000, discretization_config=disc)(stiff, x0, cond={})
    )
    e = np.asarray(
        EulerEDMSampler(num_steps=16, discretization_config=disc)(stiff, x0, cond={})
    )
    h = np.asarray(
        HeunEDMSampler(num_steps=16, discretization_config=disc)(stiff, x0, cond={})
    )
    assert np.linalg.norm(h - truth) < 0.6 * np.linalg.norm(e - truth)


def test_dpmpp2m_runs_and_is_finite():
    sampler = DPMPP2MSampler(num_steps=8, discretization_config=DISC)
    x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 8, 8))
    out = np.asarray(sampler(toy_denoiser, x0, cond={}))
    assert out.shape == (2, 4, 8, 8)
    assert np.all(np.isfinite(out))


def test_sampler_is_jittable():
    sampler = EulerEDMSampler(num_steps=4, discretization_config=DISC)

    @jax.jit
    def run(x0):
        return sampler(toy_denoiser, x0, cond={})

    x0 = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 8, 8))
    out = run(x0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(sampler(toy_denoiser, x0, cond={})), rtol=1e-6
    )


def test_churn_sampler_adds_noise():
    s_churn = EulerEDMSampler(
        num_steps=6, discretization_config=DISC, s_churn=4.0
    )
    s_plain = EulerEDMSampler(num_steps=6, discretization_config=DISC)
    x0 = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 8, 8))
    a = np.asarray(s_churn(toy_denoiser, x0, cond={}, rng=jax.random.PRNGKey(7)))
    b = np.asarray(s_plain(toy_denoiser, x0, cond={}))
    assert np.all(np.isfinite(a))
    assert not np.allclose(a, b)


def test_to_d():
    x = jnp.full((2, 3), 4.0)
    den = jnp.full((2, 3), 1.0)
    sigma = jnp.asarray([1.5, 3.0])
    d = np.asarray(to_d(x, sigma, den))
    np.testing.assert_allclose(d[0], (4 - 1) / 1.5, rtol=1e-6)
    np.testing.assert_allclose(d[1], (4 - 1) / 3.0, rtol=1e-6)


def test_dpmpp2s_ancestral_deterministic_matches_python():
    """η=0 removes ancestral noise; compare against a hand-rolled python
    DPM-Solver++(2S) loop (reference sampling.py:264-302 semantics)."""
    from hi3d_tpu.diffusion.samplers import DPMPP2SAncestralSampler

    sampler = DPMPP2SAncestralSampler(
        eta=0.0, num_steps=6, discretization_config=DISC
    )
    x0 = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
    out = sampler(toy_denoiser, x0, cond={}, uc=None, rng=jax.random.PRNGKey(0))

    sig = np.append(np.asarray(sampler.discretization(6), np.float64), 0.0)
    den = lambda x, s: x / (1 + s)
    x = np.asarray(x0, np.float64) * np.sqrt(1 + sig[0] ** 2)
    for i in range(6):
        sigma, sigma_down = sig[i], sig[i + 1]  # eta=0 → σ_down = σ_next
        d0 = den(x, sigma)
        if sigma_down == 0.0:
            d = (x - d0) / sigma
            x = x + (sigma_down - sigma) * d
        else:
            t, t_next = -np.log(sigma), -np.log(sigma_down)
            h = t_next - t
            s_mid = t + 0.5 * h
            x2 = (np.exp(-s_mid) / np.exp(-t)) * x - np.expm1(-0.5 * h) * d0
            d2 = den(x2, np.exp(-s_mid))
            x = (np.exp(-t_next) / np.exp(-t)) * x - np.expm1(-h) * d2
    np.testing.assert_allclose(np.asarray(out), x, rtol=2e-4, atol=2e-4)


def test_linear_multistep_matches_python():
    from hi3d_tpu.diffusion.samplers import LinearMultistepSampler
    from scipy import integrate

    sampler = LinearMultistepSampler(order=4, num_steps=7,
                                     discretization_config=DISC)
    x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 8, 8))
    out = sampler(toy_denoiser, x0, cond={}, uc=None)

    # hand-rolled reference loop (sampling.py:201-225)
    sig = np.append(np.asarray(sampler.discretization(7), np.float64), 0.0)

    def lms_coeff(order, t, i, j):
        def fn(tau):
            prod = 1.0
            for k in range(order):
                if j == k:
                    continue
                prod *= (tau - t[i - k]) / (t[i - j] - t[i - k])
            return prod

        return integrate.quad(fn, t[i], t[i + 1], epsrel=1e-4)[0]

    den = lambda x, s: x / (1 + s)
    x = np.asarray(x0, np.float64) * np.sqrt(1 + sig[0] ** 2)
    ds = []
    for i in range(7):
        d = (x - den(x, sig[i])) / sig[i]
        ds.append(d)
        if len(ds) > 4:
            ds.pop(0)
        cur = min(i + 1, 4)
        coeffs = [lms_coeff(cur, sig, i, j) for j in range(cur)]
        x = x + sum(c * dd for c, dd in zip(coeffs, reversed(ds)))
    np.testing.assert_allclose(np.asarray(out), x, rtol=5e-4, atol=5e-4)


def test_steps_per_launch_matches_single_scan():
    """Chunked multi-launch sampling must equal the fused scan exactly."""
    kw = dict(num_steps=7, discretization_config=DISC)
    x0 = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 8, 8))
    full = EulerEDMSampler(**kw)(toy_denoiser, x0, cond={}, uc=None,
                                 rng=jax.random.PRNGKey(1))
    chunked = EulerEDMSampler(steps_per_launch=3, **kw)(
        toy_denoiser, x0, cond={}, uc=None, rng=jax.random.PRNGKey(1)
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(chunked), rtol=1e-6, atol=1e-7
    )


def test_threaded_extras_matches_closure():
    """The param-threaded sampler path (extras= argument, weights enter the
    jitted scan as XLA arguments) is numerically identical to the legacy
    closure path, with and without steps_per_launch chunking."""
    key = jax.random.PRNGKey(7)
    x0 = jax.random.normal(key, (4, 4, 8, 8), dtype=jnp.float32)

    def dfn_threaded(extras, x, sigma, cond):
        (w,), _ = extras
        return w * x / (1.0 + append_dims(sigma, x.ndim))

    w = jnp.float32(0.9)
    extras = ((w,), None)

    for chunk in (None, 3):
        sampler = EulerEDMSampler(
            num_steps=8, discretization_config=DISC, steps_per_launch=chunk
        )
        ref = sampler(
            lambda x, s, c: w * toy_denoiser(x, s, c), x0, cond={}, uc=None
        )
        out = sampler(dfn_threaded, x0, cond={}, uc=None, extras=extras)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
        )


# ---------------------------------------------------------------------------
# guidance-interval turbo (cfg_interval): CFG only where σ ∈ [lo, hi]
# ---------------------------------------------------------------------------

VCFG = {
    "target": "sgm.modules.diffusionmodules.guiders.VanillaCFG",
    "params": {"scale": 2.0},
}


def test_equal_chunk_normalizes_to_divisor():
    """steps_per_launch normalizes to a divisor of n so every segment
    reuses ONE compiled executable (a remainder segment would compile a
    second program — the persistent-cache defeat of BASELINE.md round-5)."""
    from hi3d_tpu.diffusion.samplers import _equal_chunk

    assert _equal_chunk(25, 8) == 5      # 8+8+8+1 would need two programs
    assert _equal_chunk(25, 5) == 5
    assert _equal_chunk(24, 8) == 8
    assert _equal_chunk(13, 8) == 1      # prime: per-step launches
    assert _equal_chunk(25, None) is None
    assert _equal_chunk(25, 0) is None
    assert _equal_chunk(25, 25) is None  # whole-scan single program
    assert _equal_chunk(25, 40) is None


def test_flag_segments():
    from hi3d_tpu.diffusion.samplers import _flag_segments

    flags = [False, False, True, True, True, False]
    assert _flag_segments(flags) == [(0, 2, False), (2, 5, True), (5, 6, False)]
    assert _flag_segments(flags, chunk=2) == [
        (0, 2, False), (2, 4, True), (4, 5, True), (5, 6, False)
    ]
    assert _flag_segments([True] * 4, chunk=2) == [(0, 2, True), (2, 4, True)]


def _cond_denoiser(x, sigma, cond):
    """Cond-dependent toy denoiser: D = x/(1+σ)·(1 + mean(vectorᵢ)) per row
    (per-row gain so the uc/c halves of a CFG-doubled batch stay distinct)."""
    gain = 1.0 + jnp.mean(cond["vector"], axis=1)
    return (
        append_dims(gain, x.ndim) * x / (1.0 + append_dims(sigma, x.ndim))
    )


def python_euler_cfg_interval(x0, sigmas, scale, flags, g_c, g_uc):
    """Euler-EDM with CFG applied only on flagged steps (fp64 host loop)."""
    x = x0 * np.sqrt(1 + sigmas[0] ** 2)
    for i in range(len(sigmas) - 1):
        s = sigmas[i]
        d_c = g_c * x / (1 + s)
        if flags[i]:
            d_uc = g_uc * x / (1 + s)
            denoised = d_uc + scale * (d_c - d_uc)
        else:
            denoised = d_c
        x = x + (sigmas[i + 1] - s) * (x - denoised) / s
    return x


def test_cfg_interval_matches_python_reference():
    """Interval-gated CFG equals a hand-rolled loop that doubles the batch
    only on flagged steps (guidance interval, arXiv 2404.07724)."""
    sampler = EulerEDMSampler(
        num_steps=8, discretization_config=DISC, guider_config=VCFG
    )
    x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 8, 8))
    cond = {"vector": jnp.full((2, 8), 0.1)}
    uc = {"vector": jnp.zeros((2, 8))}
    lo, hi = 0.5, 30.0

    out = sampler(_cond_denoiser, x0, cond=cond, uc=uc, cfg_interval=(lo, hi))

    sig = np.asarray(sampler.discretization(8), np.float64)
    sig = np.append(sig, 0.0)[:9]  # sampler appends σ=0 internally via disc
    flags = (sig[:-1] >= lo) & (sig[:-1] <= hi)
    assert flags.any() and not flags.all(), "interval must be nontrivial"
    ref = python_euler_cfg_interval(
        np.asarray(x0, np.float64), sig, 2.0, flags, g_c=1.1, g_uc=1.0
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_cfg_interval_full_cover_matches_exact():
    """An interval covering the whole σ schedule is bit-identical to the
    exact CFG path (the flags never go off)."""
    kw = dict(num_steps=6, discretization_config=DISC, guider_config=VCFG)
    x0 = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 8, 8))
    cond = {"vector": jnp.full((2, 8), 0.1)}
    uc = {"vector": jnp.zeros((2, 8))}
    exact = EulerEDMSampler(**kw)(_cond_denoiser, x0, cond=cond, uc=uc)
    covered = EulerEDMSampler(**kw)(
        _cond_denoiser, x0, cond=cond, uc=uc, cfg_interval=(0.0, 1e9)
    )
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(covered))


def test_cfg_interval_threaded_extras_matches_plain():
    """The param-threaded (extras=) segment runners honor the interval and
    agree with the closure path, chunked and unchunked."""
    x0 = jax.random.normal(jax.random.PRNGKey(6), (2, 4, 8, 8))
    cond = {"vector": jnp.full((2, 8), 0.1)}
    uc = {"vector": jnp.zeros((2, 8))}

    def dfn(extras, x, sigma, cond):
        (w,), _ = extras
        return w * _cond_denoiser(x, sigma, cond)

    w = jnp.float32(0.95)
    for chunk in (None, 3):
        sampler = EulerEDMSampler(
            num_steps=8, discretization_config=DISC, guider_config=VCFG,
            steps_per_launch=chunk,
        )
        ref = sampler(
            lambda x, s, c: w * _cond_denoiser(x, s, c),
            x0, cond=cond, uc=uc, cfg_interval=(0.5, 30.0),
        )
        out = sampler(
            dfn, x0, cond=cond, uc=uc, extras=((w,), None),
            cfg_interval=(0.5, 30.0),
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
        )


def test_cfg_interval_heun_runs():
    """Heun's correction denoise follows the same per-step CFG flag."""
    sampler = HeunEDMSampler(
        num_steps=6, discretization_config=DISC, guider_config=VCFG
    )
    x0 = jax.random.normal(jax.random.PRNGKey(8), (2, 4, 8, 8))
    cond = {"vector": jnp.full((2, 8), 0.1)}
    uc = {"vector": jnp.zeros((2, 8))}
    out = sampler(_cond_denoiser, x0, cond=cond, uc=uc,
                  cfg_interval=(0.5, 30.0))
    assert out.shape == x0.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_cfg_interval_exclusive_with_encoder_reuse():
    import pytest

    sampler = EulerEDMSampler(
        num_steps=4, discretization_config=DISC, guider_config=VCFG
    )
    x0 = jnp.zeros((2, 4, 8, 8))
    with pytest.raises(ValueError, match="mutually exclusive"):
        sampler(
            _cond_denoiser, x0, cond={"vector": jnp.zeros((2, 8))},
            uc={"vector": jnp.zeros((2, 8))}, cfg_interval=(0.5, 30.0),
            encoder_reuse=2,
        )
