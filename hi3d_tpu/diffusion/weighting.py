"""Per-σ diffusion loss weightings.

Functional parity: reference sgm/modules/diffusionmodules/loss_weighting.py
(UnitWeighting :12-14, EDMWeighting :17-23, VWeighting :26-28 = EDM with
σ_data=1, EpsWeighting :31-33). Hi3D trains with VWeighting
(reference configs/train-v01.yaml:148-149).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class UnitWeighting:
    def __call__(self, sigma: jax.Array) -> jax.Array:
        return jnp.ones_like(sigma)


class EDMWeighting:
    def __init__(self, sigma_data: float = 0.5):
        self.sigma_data = float(sigma_data)

    def __call__(self, sigma: jax.Array) -> jax.Array:
        return (sigma**2 + self.sigma_data**2) / (sigma * self.sigma_data) ** 2


class VWeighting(EDMWeighting):
    def __init__(self):
        super().__init__(sigma_data=1.0)


class EpsWeighting:
    def __call__(self, sigma: jax.Array) -> jax.Array:
        return sigma**-2.0
