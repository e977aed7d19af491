"""Diffusion samplers as `lax.scan` loops.

Functional parity: reference sgm/modules/diffusionmodules/sampling.py
(BaseDiffusionSampler :21-71, EDMSampler :86-147 incl. the externally-driven
`step_call` :109-124 used by the stage-2 latent-blending pipeline,
EulerEDMSampler :228, HeunEDMSampler :235, EulerAncestralSampler :263,
DPMPP2MSampler :304) and sampling_utils.py (to_d :35-36, get_ancestral_step
:22-32).

TPU-native design decisions:

- The per-step loop is a single `jax.lax.scan` over a stacked (σ_i, σ_{i+1},
  γ_i, rng_i) schedule, so the whole 25-step sampling compiles to one XLA
  program — no per-step dispatch, weights stay resident in HBM.
- σ-schedules are host-side float32 constants baked into the compiled loop.
- CFG doubling (guider.prepare_inputs) happens inside the step, so the network
  sees one 2×-batch call per step (MXU-friendly) exactly like the reference.
- Steps whose math degenerates at σ=0 (Heun's correction denoise, DPM++'s
  log-σ terms) clamp σ before transcendental ops and select the valid branch
  with `jnp.where`; the reference instead branches in Python, which is not
  traceable.
- `step_call(denoiser, x, i, ...)` takes a *traced* step index so callers can
  embed single sampler steps in their own scans (stage-2 latent blending).

The `denoiser` argument is a callable ``denoiser(x, sigma, cond) -> denoised``
— i.e. hi3d_tpu.diffusion.denoiser.Denoiser already closed over the network
and any additional model inputs. The EDM family additionally accepts a
param-threaded form (``denoiser(extras, x, sigma, cond)`` with ``extras=``
passed to __call__): the engine uses it so the UNet weights enter the jitted
scan as XLA arguments rather than being baked into the executable as
constants, which would hold a second full copy of the weights in HBM.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import instantiate_from_config
from ..utils.misc import append_dims, default

DEFAULT_GUIDER = {"target": "sgm.modules.diffusionmodules.guiders.IdentityGuider"}

# clamp for σ before log/division when the result is masked out anyway
_SIGMA_EPS = 1e-20


def _flag_segments(flags, chunk=None):
    """Split [0, len(flags)) into (start, end, flag) runs of constant flag,
    each run further chunked to at most `chunk` steps (guidance-interval +
    steps_per_launch composition; flags are host-static)."""
    n = len(flags)
    runs = []
    s0 = 0
    for i in range(1, n + 1):
        if i == n or bool(flags[i]) != bool(flags[s0]):
            runs.append((s0, i, bool(flags[s0])))
            s0 = i
    if not chunk:
        return runs
    out = []
    for a, b, f in runs:
        for s in range(a, b, chunk):
            out.append((s, min(s + chunk, b), f))
    return out


def _equal_chunk(n: int, chunk) -> "int | None":
    """Largest divisor of n that is ≤ chunk (None = no chunking).

    Equal-size scan segments reuse ONE compiled executable; a remainder
    segment (e.g. 25 steps at chunk 8 → 8+8+8+1) traces and compiles a
    SECOND program — and executable count/size is exactly what defeats the
    persistent compile cache on the tunneled TPU backend (BASELINE.md
    round-5: segmenting the stage-1 sampler cut the fresh-process cold cost
    263 → 78 s). Any configured steps_per_launch therefore normalizes to a
    divisor here."""
    if not chunk or chunk >= n:
        return None
    c = max(1, min(int(chunk), n))
    while n % c:
        c -= 1
    return c


def to_d(x: jax.Array, sigma: jax.Array, denoised: jax.Array) -> jax.Array:
    """ODE derivative dx/dσ = (x − D(x,σ)) / σ."""
    return (x - denoised) / append_dims(sigma, x.ndim)


def get_ancestral_step(sigma_from, sigma_to, eta: float = 1.0):
    if not eta:
        return sigma_to, jnp.zeros_like(sigma_to)
    sigma_up = jnp.minimum(
        sigma_to,
        eta * (sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2) ** 0.5,
    )
    sigma_down = (sigma_to**2 - sigma_up**2) ** 0.5
    return sigma_down, sigma_up


class BaseDiffusionSampler:
    def __init__(
        self,
        discretization_config: Dict,
        num_steps: Optional[int] = None,
        guider_config: Optional[Dict] = None,
        verbose: bool = False,
        device: Optional[str] = None,  # accepted for config parity; unused
        steps_per_launch: Optional[int] = None,
    ):
        self.num_steps = num_steps
        self.discretization = instantiate_from_config(discretization_config)
        self.guider = instantiate_from_config(default(guider_config, DEFAULT_GUIDER))
        self.verbose = verbose
        # split the scan into several launches of one compiled segment when a
        # single execution would exceed runtime watchdogs (large batches or
        # 1024² latents can push one 25-step launch past ~60 s device time)
        self.steps_per_launch = steps_per_launch

    def prepare_sampling_loop(self, x, cond, uc=None, num_steps=None):
        sigmas = self.discretization(
            self.num_steps if num_steps is None else num_steps
        )
        uc = default(uc, cond)
        # initial latent is unit-variance noise; lift it onto the σ₀ shell
        x = x * jnp.sqrt(1.0 + sigmas[0] ** 2.0).astype(x.dtype)
        num_sigmas = sigmas.shape[0]
        s_in = jnp.ones((x.shape[0],), dtype=jnp.float32)
        return x, s_in, sigmas, num_sigmas, cond, uc

    def denoise(self, x, denoiser, sigma, cond, uc, use_cfg: bool = True):
        if not use_cfg:
            # guidance-interval turbo: single conditioned pass, no batch
            # doubling, guider bypassed (≡ CFG scale 1.0 at this step)
            return denoiser(x, sigma, cond)
        x_in, sigma_in, cond_in = self.guider.prepare_inputs(x, sigma, cond, uc)
        denoised = denoiser(x_in, sigma_in, cond_in)
        return self.guider(denoised, sigma)

    def get_sigma_gen(self, num_sigmas: int):
        return range(num_sigmas - 1)

    def _program_key(self) -> str:
        """Stable identity of everything sampler-side that shapes the traced
        scan body but is invisible in the runner's argument avals (σ values
        arrive as arguments; the churn/guider CONFIG does not)."""
        g = self.guider
        gkey = (
            type(g).__name__,
            sorted(
                (k, v) for k, v in vars(g).items()
                if isinstance(v, (int, float, str, bool, tuple))
            ),
        )
        skey = sorted(
            (k, v) for k, v in vars(self).items()
            if isinstance(v, (int, float, str, bool, tuple))
        )
        return f"{type(self).__name__}|{skey}|{gkey}"


class SingleStepDiffusionSampler(BaseDiffusionSampler):
    def euler_step(self, x, d, dt):
        return x + dt * d


class EDMSampler(SingleStepDiffusionSampler):
    """Euler/Heun family with optional stochastic churn (Karras Alg. 2)."""

    def __init__(
        self,
        s_churn: float = 0.0,
        s_tmin: float = 0.0,
        s_tmax: float = float("inf"),
        s_noise: float = 1.0,
        *args,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.s_churn = float(s_churn)
        self.s_tmin = float(s_tmin)
        self.s_tmax = float(s_tmax)
        self.s_noise = float(s_noise)

    # -- per-step ---------------------------------------------------------
    def sampler_step(
        self, sigma, next_sigma, denoiser, x, cond, uc=None, gamma=0.0,
        rng=None, use_cfg: bool = True,
    ):
        sigma_hat = sigma * (gamma + 1.0)
        if self.s_churn > 0.0:
            # churn noise only matters where gamma > 0; masked via the
            # sqrt(σ̂²−σ²) factor which is 0 when gamma == 0
            if rng is None:
                raise ValueError("churn sampling (s_churn>0) requires an rng key")
            eps = jax.random.normal(rng, x.shape, dtype=x.dtype) * self.s_noise
            x = x + eps * append_dims(
                jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0)), x.ndim
            ).astype(x.dtype)

        denoised = self.denoise(x, denoiser, sigma_hat, cond, uc, use_cfg)
        d = to_d(x, sigma_hat, denoised)
        dt = append_dims(next_sigma - sigma_hat, x.ndim)

        euler_step = self.euler_step(x, d.astype(x.dtype), dt.astype(x.dtype))
        return self.possible_correction_step(
            euler_step, x, d, dt, next_sigma, denoiser, cond, uc, use_cfg
        )

    def _gamma_at(self, sigmas: jax.Array, i, num_sigmas: int) -> jax.Array:
        """γ_i with a traced or static index; static churn cap."""
        gamma_val = min(self.s_churn / (num_sigmas - 1), 2**0.5 - 1)
        if gamma_val == 0.0:
            return jnp.float32(0.0)
        in_range = (sigmas[i] >= self.s_tmin) & (sigmas[i] <= self.s_tmax)
        return jnp.where(in_range, jnp.float32(gamma_val), jnp.float32(0.0))

    def step_call(
        self, denoiser, x, i, s_in, sigmas, num_sigmas, cond, uc, rng=None,
        use_cfg: bool = True,
    ):
        """One externally-driven step with traced index `i`.

        Matches reference sampling.py:109-124; used by the stage-2
        latent-blending loop which mutates x between steps. `use_cfg` must
        be static (it selects the denoise batch shape); the stage-2 loop
        derives it host-side from the σ schedule (guidance interval).
        """
        gamma = self._gamma_at(sigmas, i, num_sigmas)
        return self.sampler_step(
            s_in * sigmas[i],
            s_in * sigmas[i + 1],
            denoiser,
            x,
            cond,
            uc,
            gamma,
            rng=rng,
            use_cfg=use_cfg,
        )

    # -- full loop ---------------------------------------------------------
    def __call__(
        self, denoiser, x, cond, uc=None, num_steps=None, rng=None, extras=None,
        encoder_reuse=0, cfg_interval=None,
    ):
        """Full sampling loop.

        `denoiser` is either the legacy closure ``fn(x, sigma, cond)`` or —
        when `extras` is given — a param-threaded ``fn(extras, x, sigma,
        cond)`` (engine.make_denoiser_fn_p). The threaded form passes the
        weights (and any other big arrays in `extras`) into the jitted scan
        as XLA *arguments*; the closure form bakes them into the executable
        as constants, doubling their HBM footprint.

        `encoder_reuse=k` (k ≥ 1) enables encoder propagation (Faster
        Diffusion, arXiv 2312.09608): the UNet encoder + middle block run
        only on every k-th step (and the last); in between, steps decode
        from the cached encoder features. Requires the *cached* threaded
        denoiser form ``fn(extras, x, sigma, cond, cache) → (denoised,
        cache)`` (engine.make_denoiser_fn_cached). k=1 computes the encoder
        every step (identical math to the exact path); k ≥ 2 is an
        APPROXIMATION that slightly changes outputs.

        `cfg_interval=(lo, hi)` enables the guidance-interval turbo
        (Kynkäänniemi et al. 2024, arXiv 2404.07724): CFG runs only on steps
        whose σ_i lies in [lo, hi]; outside the interval the denoiser runs a
        SINGLE conditioned pass (half the UNet work, ≡ CFG scale 1.0 there).
        The flags are host-static (the σ schedule is known), so the scan is
        split into constant-flag segments — no dynamic shapes. An interval
        covering the whole schedule is bit-identical to the exact path;
        anything narrower is an APPROXIMATION. Mutually exclusive with
        `encoder_reuse` (the encoder cache's batch dim differs between
        CFG-doubled and single-pass steps).
        """
        x, s_in, sigmas, num_sigmas, cond, uc = self.prepare_sampling_loop(
            x, cond, uc, num_steps
        )
        n = num_sigmas - 1

        gamma_val = min(self.s_churn / (n if n > 0 else 1), 2**0.5 - 1)
        # γ depends only on the host-side schedule constants, never on traced
        # values — recompute it from the discretization's numpy schedule so the
        # whole __call__ stays jittable
        sig_np = np.append(
            self.discretization.get_sigmas(
                self.num_steps if num_steps is None else num_steps
            ),
            np.float32(0.0),
        )
        gammas = np.where(
            (sig_np[:-1] >= self.s_tmin) & (sig_np[:-1] <= self.s_tmax),
            np.float32(gamma_val),
            np.float32(0.0),
        )
        if rng is None:
            rng = jax.random.PRNGKey(0)
        step_rngs = jax.random.split(rng, n)
        xs = (sigmas[:-1], sigmas[1:], jnp.asarray(gammas), step_rngs)
        chunk = _equal_chunk(n, self.steps_per_launch)

        if cfg_interval is not None:
            if encoder_reuse:
                raise ValueError(
                    "cfg_interval and encoder_reuse are mutually exclusive "
                    "(the encoder cache's batch dim differs between "
                    "CFG-doubled and single-pass steps)"
                )
            lo, hi = cfg_interval
            cfg_on = (sig_np[:-1] >= lo) & (sig_np[:-1] <= hi)
        else:
            cfg_on = np.ones(n, bool)

        if not cfg_on.all():
            segs = _flag_segments(cfg_on, chunk)
            if extras is not None:
                for s0, s1, f in segs:
                    runner = self._threaded_runner(denoiser, use_cfg=f)
                    seg = jax.tree.map(lambda v: v[s0:s1], xs)
                    x = runner(extras, x, seg, s_in, cond, uc)
                return x
            run_cache = {}

            def run_segment_f(x, seg, flag):
                if flag not in run_cache:

                    def body(carry, inp, _f=flag):
                        sigma, next_sigma, gamma, srng = inp
                        out = self.sampler_step(
                            s_in * sigma, s_in * next_sigma, denoiser, carry,
                            cond, uc, gamma, rng=srng, use_cfg=_f,
                        )
                        return out, None

                    run_cache[flag] = jax.jit(
                        lambda x, seg, _b=body: lax.scan(_b, x, seg)[0]
                    )
                return run_cache[flag](x, seg)

            for s0, s1, f in segs:
                seg = jax.tree.map(lambda v: v[s0:s1], xs)
                x = run_segment_f(x, seg, f)
            return x

        if encoder_reuse:
            if extras is None:
                raise ValueError(
                    "encoder_reuse requires the cached param-threaded "
                    "denoiser (pass extras=...; see "
                    "engine.make_denoiser_fn_cached)"
                )
            from .encoder_reuse import reuse_flags, zero_cache

            k = int(encoder_reuse)
            xs = xs + (reuse_flags(n, k),)

            def _probe(x):
                cell = {}

                def den(xx, ss, cc):
                    out, cell["c"] = denoiser(extras, xx, ss, cc, None)
                    return out

                self.denoise(x, den, s_in * sigmas[0], cond, uc)
                return cell["c"]

            # param dtype in the key: cast_weights_to_compute_dtype changes
            # the cached activations' dtype without changing any shape
            pdt = str(jax.tree_util.tree_leaves(extras)[0].dtype)
            cache = zero_cache(
                self, ("turbo_cache", denoiser, x.shape, str(x.dtype), pdt),
                _probe, x,
            )
            runner = self._threaded_runner_cached(denoiser)
            if not chunk or chunk >= n:
                x, _ = runner(extras, x, cache, xs, s_in, cond, uc)
                return x
            for s0 in range(0, n, chunk):
                seg = jax.tree.map(lambda v: v[s0 : s0 + chunk], xs)
                x, cache = runner(extras, x, cache, seg, s_in, cond, uc)
            return x

        if extras is not None:
            runner = self._threaded_runner(denoiser)
            if not chunk or chunk >= n:
                return runner(extras, x, xs, s_in, cond, uc)
            for s0 in range(0, n, chunk):
                seg = jax.tree.map(lambda v: v[s0 : s0 + chunk], xs)
                x = runner(extras, x, seg, s_in, cond, uc)
            return x

        def body(carry, inp):
            sigma, next_sigma, gamma, srng = inp
            out = self.sampler_step(
                s_in * sigma, s_in * next_sigma, denoiser, carry, cond, uc, gamma,
                rng=srng,
            )
            return out, None

        if not chunk or chunk >= n:
            x, _ = lax.scan(body, x, xs)
            return x

        @jax.jit
        def run_segment(x, seg):
            out, _ = lax.scan(body, x, seg)
            return out

        # equal-size segments reuse ONE compiled executable; remainder (if
        # any) compiles once more
        for s0 in range(0, n, chunk):
            seg = jax.tree.map(lambda v: v[s0 : s0 + chunk], xs)
            x = run_segment(x, seg)
        return x

    def _threaded_runner(self, dfn, use_cfg: bool = True):
        """Cached jitted scan-segment runner for a param-threaded denoiser.

        Keyed by the denoiser function object (engine caches those per frame
        count) and the static CFG flag, so repeated sample() calls reuse ONE
        compiled executable per segment shape instead of recompiling."""
        from ..utils.misc import instance_cache

        def make():

            def run(extras, x, seg, s_in, cond, uc):
                den = lambda xx, ss, cc: dfn(extras, xx, ss, cc)

                def body(carry, inp):
                    sigma, next_sigma, gamma, srng = inp
                    out = self.sampler_step(
                        s_in * sigma, s_in * next_sigma, den, carry, cond, uc,
                        gamma, rng=srng, use_cfg=use_cfg,
                    )
                    return out, None

                out, _ = lax.scan(body, x, seg)
                return out

            # disk-cached traced program: a fresh process deserializes the
            # exported scan instead of re-tracing the UNet (~3 s vs ~50 s;
            # utils/program_cache.py). dfn carries its model identity via
            # .program_key (engine.make_denoiser_fn_p); None disables.
            from ..utils.program_cache import program_jit

            return program_jit(
                run,
                name=f"sampler_{type(self).__name__}_cfg{int(use_cfg)}",
                extra_key=(
                    getattr(dfn, "program_key", None),
                    self._program_key(),
                ),
            )

        return instance_cache(self, ("runner", dfn, use_cfg), make)

    def _threaded_runner_cached(self, dfn):
        """Scan-segment runner for the encoder-propagation (turbo) path.

        `dfn(extras, x, sigma, cond, cache) → (denoised, cache)` is the
        cached denoiser form; the scan carries (x, encoder_cache) and
        `lax.cond` selects per step between a full forward (refreshing the
        cache) and a decoder-only forward. Works for any EDM-family
        sampler_step — Heun's correction denoise simply refreshes/reuses the
        cache a second time within the step."""
        from ..utils.misc import instance_cache

        def make():

            def run(extras, x, cache, seg, s_in, cond, uc):

                def body(carry, inp):
                    x, cache = carry
                    sigma, next_sigma, gamma, srng, flag = inp

                    def full_step(x, cache):
                        cell = {}

                        def den(xx, ss, cc):
                            out, cell["c"] = dfn(extras, xx, ss, cc, None)
                            return out

                        out = self.sampler_step(
                            s_in * sigma, s_in * next_sigma, den, x, cond,
                            uc, gamma, rng=srng,
                        )
                        return out, cell["c"]

                    def cached_step(x, cache):
                        den = lambda xx, ss, cc: dfn(extras, xx, ss, cc, cache)[0]
                        out = self.sampler_step(
                            s_in * sigma, s_in * next_sigma, den, x, cond,
                            uc, gamma, rng=srng,
                        )
                        return out, cache

                    return lax.cond(flag, cached_step, full_step, x, cache), None

                (x, cache), _ = lax.scan(body, (x, cache), seg)
                return x, cache

            from ..utils.program_cache import program_jit

            return program_jit(
                run,
                name=f"sampler_{type(self).__name__}_encreuse",
                extra_key=(
                    getattr(dfn, "program_key", None),
                    self._program_key(),
                ),
            )

        return instance_cache(self, ("runner_cached", dfn), make)


class EulerEDMSampler(EDMSampler):
    def possible_correction_step(
        self, euler_step, x, d, dt, next_sigma, denoiser, cond, uc,
        use_cfg: bool = True,
    ):
        return euler_step


class HeunEDMSampler(EDMSampler):
    def possible_correction_step(
        self, euler_step, x, d, dt, next_sigma, denoiser, cond, uc,
        use_cfg: bool = True,
    ):
        # the final step has next_sigma == 0 where the correction is skipped;
        # clamp σ for the (discarded) denoise so c_noise = 0.25·logσ stays finite
        safe_next = jnp.maximum(next_sigma, _SIGMA_EPS)
        denoised = self.denoise(euler_step, denoiser, safe_next, cond, uc,
                                use_cfg)
        d_new = to_d(euler_step, safe_next, denoised)
        d_prime = (d + d_new) / 2.0
        corrected = x + (d_prime * dt).astype(x.dtype)
        return jnp.where(
            append_dims(next_sigma, x.ndim) > 0.0, corrected, euler_step
        )


class AncestralSampler(SingleStepDiffusionSampler):
    def __init__(self, eta: float = 1.0, s_noise: float = 1.0, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.eta = float(eta)
        self.s_noise = float(s_noise)

    def ancestral_euler_step(self, x, denoised, sigma, sigma_down):
        d = to_d(x, sigma, denoised)
        dt = append_dims(sigma_down - sigma, x.ndim)
        return self.euler_step(x, d.astype(x.dtype), dt.astype(x.dtype))

    def ancestral_step(self, x, sigma, next_sigma, sigma_up, rng):
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype) * self.s_noise
        x_noised = x + noise * append_dims(sigma_up, x.ndim).astype(x.dtype)
        return jnp.where(append_dims(next_sigma, x.ndim) > 0.0, x_noised, x)

    def __call__(self, denoiser, x, cond, uc=None, num_steps=None, rng=None):
        x, s_in, sigmas, num_sigmas, cond, uc = self.prepare_sampling_loop(
            x, cond, uc, num_steps
        )
        if rng is None:
            rng = jax.random.PRNGKey(0)
        step_rngs = jax.random.split(rng, num_sigmas - 1)

        def body(carry, inp):
            sigma, next_sigma, srng = inp
            out = self.sampler_step(
                s_in * sigma, s_in * next_sigma, denoiser, carry, cond, uc, srng
            )
            return out, None

        x, _ = lax.scan(body, x, (sigmas[:-1], sigmas[1:], step_rngs))
        return x


class EulerAncestralSampler(AncestralSampler):
    def sampler_step(self, sigma, next_sigma, denoiser, x, cond, uc, rng):
        sigma_down, sigma_up = get_ancestral_step(sigma, next_sigma, eta=self.eta)
        denoised = self.denoise(x, denoiser, sigma, cond, uc)
        x = self.ancestral_euler_step(x, denoised, sigma, sigma_down)
        return self.ancestral_step(x, sigma, next_sigma, sigma_up, rng)


class DPMPP2SAncestralSampler(AncestralSampler):
    """DPM-Solver++(2S) with ancestral noise (reference sampling.py:264-302).

    The reference skips the midpoint evaluation when σ_down == 0 (Python
    branch); here both branches trace and `jnp.where` selects, with σ clamped
    before the log/divide so the discarded branch stays finite.
    """

    @staticmethod
    def _variables(sigma, sigma_down):
        t = -jnp.log(jnp.maximum(sigma, _SIGMA_EPS))
        t_next = -jnp.log(jnp.maximum(sigma_down, _SIGMA_EPS))
        h = t_next - t
        s = t + 0.5 * h
        return h, s, t, t_next

    def sampler_step(self, sigma, next_sigma, denoiser, x, cond, uc, rng):
        sigma_down, sigma_up = get_ancestral_step(sigma, next_sigma, eta=self.eta)
        denoised = self.denoise(x, denoiser, sigma, cond, uc)
        x_euler = self.ancestral_euler_step(x, denoised, sigma, sigma_down)

        h, s, t, t_next = self._variables(sigma, sigma_down)
        sig = lambda v: jnp.exp(-v)  # to_sigma
        mult1 = append_dims(sig(s) / sig(t), x.ndim).astype(x.dtype)
        mult2 = append_dims(jnp.expm1(-0.5 * h), x.ndim).astype(x.dtype)
        mult3 = append_dims(sig(t_next) / sig(t), x.ndim).astype(x.dtype)
        mult4 = append_dims(jnp.expm1(-h), x.ndim).astype(x.dtype)

        x2 = mult1 * x - mult2 * denoised.astype(x.dtype)
        denoised2 = self.denoise(
            x2, denoiser, jnp.maximum(sig(s), _SIGMA_EPS), cond, uc
        )
        x_2s = mult3 * x - mult4 * denoised2.astype(x.dtype)

        x = jnp.where(append_dims(sigma_down, x.ndim) > 0.0, x_2s, x_euler)
        return self.ancestral_step(x, sigma, next_sigma, sigma_up, rng)


class LinearMultistepSampler(BaseDiffusionSampler):
    """Adams-Bashforth-style linear multistep sampler (reference
    sampling.py:190-225 + sampling_utils.linear_multistep_coeff).

    The integration coefficients depend only on the (host-side) σ schedule,
    so the (num_steps, order) coefficient matrix is precomputed with
    scipy.integrate and baked into the scan as a constant; the derivative
    history rides in the scan carry (newest first), zero-padded below the
    current order exactly like the reference's growing `ds` list.
    """

    def __init__(self, order: int = 4, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.order = int(order)

    def _coeff_matrix(self, sigmas_np: np.ndarray) -> np.ndarray:
        from scipy import integrate

        n = len(sigmas_np) - 1
        coeffs = np.zeros((n, self.order), np.float32)
        for i in range(n):
            cur = min(i + 1, self.order)
            for j in range(cur):
                def fn(tau, j=j, cur=cur):
                    prod = 1.0
                    for k in range(cur):
                        if j == k:
                            continue
                        prod *= (tau - sigmas_np[i - k]) / (
                            sigmas_np[i - j] - sigmas_np[i - k]
                        )
                    return prod

                coeffs[i, j] = integrate.quad(
                    fn, sigmas_np[i], sigmas_np[i + 1], epsrel=1e-4
                )[0]
        return coeffs

    def __call__(self, denoiser, x, cond, uc=None, num_steps=None, rng=None):
        x, s_in, sigmas, num_sigmas, cond, uc = self.prepare_sampling_loop(
            x, cond, uc, num_steps
        )
        sig_np = np.append(
            self.discretization.get_sigmas(
                self.num_steps if num_steps is None else num_steps
            ),
            np.float32(0.0),
        )
        coeffs = jnp.asarray(self._coeff_matrix(sig_np))  # (n, order)

        def body(carry, inp):
            x, hist = carry  # hist: (order, ...), newest first
            sigma, c_i = inp
            denoised = self.denoise(x, denoiser, s_in * sigma, cond, uc)
            d = to_d(x, s_in * sigma, denoised).astype(x.dtype)
            hist = jnp.concatenate([d[None], hist[:-1]], axis=0)
            update = jnp.tensordot(c_i.astype(x.dtype), hist, axes=1)
            return (x + update, hist), None

        hist0 = jnp.zeros((self.order,) + x.shape, x.dtype)
        (x, _), _ = lax.scan(body, (x, hist0), (sigmas[:-1], coeffs))
        return x


class DPMPP2MSampler(BaseDiffusionSampler):
    """DPM-Solver++(2M): deterministic multistep in log-σ time."""

    def sampler_step(
        self, old_denoised, previous_sigma, sigma, next_sigma, denoiser, x, cond,
        uc=None, is_first=None,
    ):
        denoised = self.denoise(x, denoiser, sigma, cond, uc)

        safe_next = jnp.maximum(next_sigma, _SIGMA_EPS)
        t = -jnp.log(sigma)
        t_next = -jnp.log(safe_next)
        h = t_next - t

        mult1 = append_dims(safe_next / sigma, x.ndim).astype(x.dtype)
        mult2 = append_dims(jnp.expm1(-h), x.ndim).astype(x.dtype)
        x_standard = mult1 * x - mult2 * denoised.astype(x.dtype)

        # second-order correction using the previous denoised estimate
        safe_prev = jnp.maximum(previous_sigma, _SIGMA_EPS)
        h_last = t - (-jnp.log(safe_prev))
        r = h_last / h
        mult3 = append_dims(1 + 1 / (2 * r), x.ndim).astype(x.dtype)
        mult4 = append_dims(1 / (2 * r), x.ndim).astype(x.dtype)
        denoised_d = mult3 * denoised.astype(x.dtype) - mult4 * old_denoised
        x_advanced = mult1 * x - mult2 * denoised_d

        use_standard = is_first | (
            jnp.sum(next_sigma) < 1e-14
        )  # first step or final σ=0
        x_out = jnp.where(use_standard, x_standard, x_advanced)
        return x_out, denoised.astype(x.dtype)

    def __call__(self, denoiser, x, cond, uc=None, num_steps=None, rng=None):
        x, s_in, sigmas, num_sigmas, cond, uc = self.prepare_sampling_loop(
            x, cond, uc, num_steps
        )
        n = num_sigmas - 1
        idx = jnp.arange(n)
        prev_sigmas = jnp.concatenate([sigmas[:1], sigmas[:-2]])  # unused at i=0

        def body(carry, inp):
            x, old_denoised = carry
            i, prev_s, sigma, next_sigma = inp
            x, denoised = self.sampler_step(
                old_denoised,
                s_in * prev_s,
                s_in * sigma,
                s_in * next_sigma,
                denoiser,
                x,
                cond,
                uc=uc,
                is_first=(i == 0),
            )
            return (x, denoised), None

        (x, _), _ = lax.scan(
            body,
            (x, jnp.zeros_like(x)),
            (idx, prev_sigmas, sigmas[:-1], sigmas[1:]),
        )
        return x
