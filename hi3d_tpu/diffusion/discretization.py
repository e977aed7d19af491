"""σ-schedule discretizations.

Functional parity: reference sgm/modules/diffusionmodules/discretizer.py
(EDMDiscretization :28-40, LegacyDDPMDiscretization :43-69). Hi3D samples with
EDMDiscretization(σ_min=0.002, σ_max=700, ρ=7)
(reference configs/train-v01.yaml:157-161).

Schedules are tiny 1-D arrays computed eagerly in float32 on host — they are
constants baked into the jitted sampler, so there is no reason to trace them.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.misc import append_zero


class Discretization:
    def __call__(
        self, n: int, do_append_zero: bool = True, flip: bool = False
    ) -> jax.Array:
        sigmas = jnp.asarray(self.get_sigmas(n), dtype=jnp.float32)
        sigmas = append_zero(sigmas) if do_append_zero else sigmas
        return sigmas if not flip else jnp.flip(sigmas, 0)

    def get_sigmas(self, n: int) -> np.ndarray:
        raise NotImplementedError


class EDMDiscretization(Discretization):
    """Karras ρ-schedule: σ_i = (σ_max^(1/ρ) + i/(n-1)·(σ_min^(1/ρ) − σ_max^(1/ρ)))^ρ."""

    def __init__(self, sigma_min: float = 0.002, sigma_max: float = 80.0, rho: float = 7.0):
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)
        self.rho = float(rho)

    def get_sigmas(self, n: int) -> np.ndarray:
        ramp = np.linspace(0, 1, n, dtype=np.float64)
        min_inv_rho = self.sigma_min ** (1 / self.rho)
        max_inv_rho = self.sigma_max ** (1 / self.rho)
        sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** self.rho
        return sigmas.astype(np.float32)


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
) -> np.ndarray:
    """Linear-in-sqrt β schedule (reference diffusionmodules/util.py:20-33)."""
    if schedule != "linear":
        raise NotImplementedError(f"schedule '{schedule}' unknown.")
    betas = (
        np.linspace(
            linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64
        )
        ** 2
    )
    return betas


def generate_roughly_equally_spaced_steps(num_substeps: int, max_step: int) -> np.ndarray:
    """Evenly spaced timestep subset, ascending (reference discretizer.py:11-14)."""
    return np.linspace(max_step - 1, 0, num_substeps, endpoint=False).astype(int)[::-1]


class LegacyDDPMDiscretization(Discretization):
    """σ-schedule derived from the DDPM ᾱ products (descending σ)."""

    def __init__(
        self,
        linear_start: float = 0.00085,
        linear_end: float = 0.0120,
        num_timesteps: int = 1000,
    ):
        self.num_timesteps = int(num_timesteps)
        betas = make_beta_schedule(
            "linear", self.num_timesteps, linear_start=linear_start, linear_end=linear_end
        )
        self.alphas_cumprod = np.cumprod(1.0 - betas, axis=0)

    def get_sigmas(self, n: int) -> np.ndarray:
        if n < self.num_timesteps:
            timesteps = generate_roughly_equally_spaced_steps(n, self.num_timesteps)
            alphas_cumprod = self.alphas_cumprod[timesteps]
        elif n == self.num_timesteps:
            alphas_cumprod = self.alphas_cumprod
        else:
            raise ValueError(f"n={n} exceeds num_timesteps={self.num_timesteps}")
        sigmas = ((1 - alphas_cumprod) / alphas_cumprod) ** 0.5
        return np.flip(sigmas, 0).astype(np.float32).copy()
