"""Training-time σ samplers.

Functional parity: reference sgm/modules/diffusionmodules/sigma_sampling.py
(EDMSampling :6-14, DiscreteSampling :17-30). Hi3D trains with
EDMSampling(p_mean=1.0, p_std=1.6) (reference configs/train-v01.yaml:143-147).

JAX-style: explicit PRNG keys instead of global torch RNG state.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import instantiate_from_config


class EDMSampling:
    """Lognormal σ: σ = exp(p_mean + p_std · N(0,1))."""

    def __init__(self, p_mean: float = -1.2, p_std: float = 1.2):
        self.p_mean = float(p_mean)
        self.p_std = float(p_std)

    def __call__(
        self, rng: jax.Array, n_samples: int, rand: Optional[jax.Array] = None
    ) -> jax.Array:
        if rand is None:
            rand = jax.random.normal(rng, (n_samples,), dtype=jnp.float32)
        log_sigma = self.p_mean + self.p_std * rand
        return jnp.exp(log_sigma)


class DiscreteSampling:
    """Uniformly sample one of `num_idx` discretized σ levels."""

    def __init__(self, discretization_config, num_idx: int, do_append_zero: bool = False, flip: bool = True):
        self.num_idx = int(num_idx)
        self.sigmas = instantiate_from_config(discretization_config)(
            self.num_idx, do_append_zero=do_append_zero, flip=flip
        )

    def idx_to_sigma(self, idx) -> jax.Array:
        return self.sigmas[idx]

    def __call__(
        self, rng: jax.Array, n_samples: int, rand: Optional[jax.Array] = None
    ) -> jax.Array:
        if rand is None:
            rand = jax.random.randint(rng, (n_samples,), 0, self.num_idx)
        return self.idx_to_sigma(rand)
