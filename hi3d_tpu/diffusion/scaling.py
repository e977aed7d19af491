"""EDM-style denoiser preconditioning scalings.

Given σ, each scaling returns (c_skip, c_out, c_in, c_noise) such that

    D(x, σ) = network(x · c_in, c_noise, cond) · c_out + x · c_skip

Functional parity: reference sgm/modules/diffusionmodules/denoiser_scaling.py
(EDMScaling :15-27, EpsScaling :30-38, VScaling :41-50,
VScalingWithEDMcNoise :53-60). Hi3D uses VScalingWithEDMcNoise for both stages
(reference configs/train-v01.yaml:26-29).

σ-math is kept in float32 regardless of the activation dtype — over 25 sampler
steps bf16 σ error compounds visibly, while the cost of fp32 here is nil (these
are per-sample scalars broadcast into the network call).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

ScaleTuple = Tuple[jax.Array, jax.Array, jax.Array, jax.Array]


def _f32(sigma: jax.Array) -> jax.Array:
    return jnp.asarray(sigma, dtype=jnp.float32)


class EDMScaling:
    """Karras et al. (2022) preconditioning with data std σ_data."""

    def __init__(self, sigma_data: float = 0.5):
        self.sigma_data = float(sigma_data)

    def __call__(self, sigma: jax.Array) -> ScaleTuple:
        sigma = _f32(sigma)
        sd2 = self.sigma_data**2
        c_skip = sd2 / (sigma**2 + sd2)
        c_out = sigma * self.sigma_data * jax.lax.rsqrt(sigma**2 + sd2)
        c_in = jax.lax.rsqrt(sigma**2 + sd2)
        c_noise = 0.25 * jnp.log(sigma)
        return c_skip, c_out, c_in, c_noise


class EpsScaling:
    """ε-prediction scaling (DDPM-style)."""

    def __call__(self, sigma: jax.Array) -> ScaleTuple:
        sigma = _f32(sigma)
        c_skip = jnp.ones_like(sigma)
        c_out = -sigma
        c_in = jax.lax.rsqrt(sigma**2 + 1.0)
        c_noise = sigma
        return c_skip, c_out, c_in, c_noise


class VScaling:
    """v-prediction scaling with c_noise = σ."""

    def __call__(self, sigma: jax.Array) -> ScaleTuple:
        sigma = _f32(sigma)
        c_skip = 1.0 / (sigma**2 + 1.0)
        c_out = -sigma * jax.lax.rsqrt(sigma**2 + 1.0)
        c_in = jax.lax.rsqrt(sigma**2 + 1.0)
        c_noise = sigma
        return c_skip, c_out, c_in, c_noise


class VScalingWithEDMcNoise:
    """v-prediction scaling with the EDM noise embedding c_noise = 0.25·log σ.

    This is the scaling both Hi3D stages train and sample with.
    """

    def __call__(self, sigma: jax.Array) -> ScaleTuple:
        sigma = _f32(sigma)
        c_skip = 1.0 / (sigma**2 + 1.0)
        c_out = -sigma * jax.lax.rsqrt(sigma**2 + 1.0)
        c_in = jax.lax.rsqrt(sigma**2 + 1.0)
        c_noise = 0.25 * jnp.log(sigma)
        return c_skip, c_out, c_in, c_noise
