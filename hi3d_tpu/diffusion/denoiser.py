"""Denoiser: EDM preconditioning wrapper around the network call.

Functional parity: reference sgm/modules/diffusionmodules/denoiser.py
(Denoiser :11-39, DiscreteDenoiser :42-75):

    D(x, σ) = network(x · c_in, c_noise, cond, **extra) · c_out + x · c_skip

In hi3d_tpu the `network` argument is any callable
``network(x, c_noise, cond, **extra) -> jax.Array`` — typically a
flax apply-fn closed over its params (see hi3d_tpu.models.wrappers). The
denoiser itself is stateless and jit-transparent.

σ/c-coefficient math runs in float32; coefficients are cast to the activation
dtype only at the multiply (the reference achieves the same through autocast).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..config import instantiate_from_config
from ..utils.misc import append_dims


class Denoiser:
    def __init__(self, scaling_config: Dict):
        self.scaling = instantiate_from_config(scaling_config)

    def possibly_quantize_sigma(self, sigma: jax.Array) -> jax.Array:
        return sigma

    def possibly_quantize_c_noise(self, c_noise: jax.Array) -> jax.Array:
        return c_noise

    def __call__(
        self,
        network: Callable,
        x: jax.Array,
        sigma: jax.Array,
        cond: Dict,
        **additional_model_inputs,
    ) -> jax.Array:
        sigma = self.possibly_quantize_sigma(jnp.asarray(sigma, jnp.float32))
        sigma_shape = sigma.shape
        sigma = append_dims(sigma, x.ndim)
        c_skip, c_out, c_in, c_noise = self.scaling(sigma)
        c_noise = self.possibly_quantize_c_noise(c_noise.reshape(sigma_shape))
        out = network(
            x * c_in.astype(x.dtype), c_noise, cond, **additional_model_inputs
        )
        return out * c_out.astype(out.dtype) + x.astype(out.dtype) * c_skip.astype(
            out.dtype
        )


class DiscreteDenoiser(Denoiser):
    """Quantizes σ to the nearest level of a discretization before scaling."""

    def __init__(
        self,
        scaling_config: Dict,
        num_idx: int,
        discretization_config: Dict,
        do_append_zero: bool = False,
        quantize_c_noise: bool = True,
        flip: bool = True,
    ):
        super().__init__(scaling_config)
        discretization = instantiate_from_config(discretization_config)
        self.sigmas = discretization(num_idx, do_append_zero=do_append_zero, flip=flip)
        self.quantize_c_noise = quantize_c_noise
        self.num_idx = int(num_idx)

    def sigma_to_idx(self, sigma: jax.Array) -> jax.Array:
        dists = sigma - self.sigmas[:, None]
        return jnp.argmin(jnp.abs(dists), axis=0).reshape(sigma.shape)

    def idx_to_sigma(self, idx) -> jax.Array:
        return self.sigmas[idx]

    def possibly_quantize_sigma(self, sigma: jax.Array) -> jax.Array:
        return self.idx_to_sigma(self.sigma_to_idx(sigma))

    def possibly_quantize_c_noise(self, c_noise: jax.Array) -> jax.Array:
        if self.quantize_c_noise:
            return self.sigma_to_idx(c_noise).astype(jnp.float32)
        return c_noise
