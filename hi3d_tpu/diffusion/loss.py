"""Training loss for the denoiser.

Functional parity: reference sgm/modules/diffusionmodules/loss.py:13-111
(StandardDiffusionLoss): sample one σ per *video* and repeat it across the T
frames (loss.py:74-76), add noise, run the denoiser, and weight the per-sample
L2/L1 by the σ-weighting. Hi3D trains with EDMSampling(p_mean=1, p_std=1.6)
and VWeighting (configs/train-v01.yaml:139-149).

JAX-style: explicit rng; `network` is a bound apply closure (see
hi3d_tpu.models.wrappers) and `cond` is precomputed by the conditioner so the
whole loss is one pure jittable function of (params→network, rng, input).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Union

import jax
import jax.numpy as jnp

from ..config import instantiate_from_config
from ..utils.misc import append_dims


class StandardDiffusionLoss:
    def __init__(
        self,
        sigma_sampler_config: Dict,
        loss_weighting_config: Dict,
        loss_type: str = "l2",
        offset_noise_level: float = 0.0,
        batch2model_keys: Optional[Union[str, List[str]]] = None,
        num_frames: int = 1,
    ):
        if loss_type not in ("l2", "l1", "lpips"):
            raise ValueError(f"loss_type {loss_type!r}")
        if loss_type == "lpips":
            # reference loss.py:33-34,107-108: perceptual distance between
            # model output and target (meaningful for pixel-space models;
            # load VGG weights via lpips_params for trained distances)
            from ..models.lpips import LPIPS

            self.lpips = LPIPS()
            self.lpips_params = None
        self.sigma_sampler = instantiate_from_config(sigma_sampler_config)
        self.loss_weighting = instantiate_from_config(loss_weighting_config)
        self.loss_type = loss_type
        self.offset_noise_level = float(offset_noise_level)
        if not batch2model_keys:
            batch2model_keys = []
        if isinstance(batch2model_keys, str):
            batch2model_keys = [batch2model_keys]
        self.batch2model_keys = set(batch2model_keys)
        self.num_frames = int(num_frames)
        # parity-test hooks (tests/test_parity_training.py): pin the two
        # stochastic draws so the torch reference loss sees identical inputs.
        # None (default) = production path. Same pattern as
        # engine.sample(randn=...) / generate_orbit(batch_overrides=...).
        self.parity_sigmas = None  # (B,) per-video σ, pre-repeat
        self.parity_noise = None   # input-shaped ε

    def __call__(
        self,
        network: Callable,
        denoiser,
        cond: Dict,
        input: jax.Array,
        batch: Dict,
        rng: jax.Array,
    ) -> jax.Array:
        """Per-sample loss, shape (B·T,)."""
        additional = {
            k: batch[k] for k in self.batch2model_keys.intersection(batch)
        }
        rng_sigma, rng_noise, rng_offset = jax.random.split(rng, 3)

        b = input.shape[0] // self.num_frames
        if self.parity_sigmas is not None:
            sigmas = jnp.asarray(self.parity_sigmas, dtype=jnp.float32)
        else:
            sigmas = self.sigma_sampler(rng_sigma, b)
        sigmas = jnp.repeat(sigmas, self.num_frames, axis=0)  # one σ per video

        if self.parity_noise is not None:
            noise = jnp.asarray(self.parity_noise, dtype=input.dtype)
        else:
            noise = jax.random.normal(rng_noise, input.shape, dtype=input.dtype)
        if self.offset_noise_level > 0.0:
            offset = jax.random.normal(
                rng_offset, (input.shape[0],), dtype=input.dtype
            )
            noise = noise + self.offset_noise_level * append_dims(offset, input.ndim)

        sigmas_bc = append_dims(sigmas, input.ndim).astype(input.dtype)
        noised = input + noise * sigmas_bc

        model_output = denoiser(network, noised, sigmas, cond, **additional)
        w = append_dims(self.loss_weighting(sigmas), input.ndim)
        return self.get_loss(model_output, input, w)

    def get_loss(self, model_output, target, w):
        if self.loss_type == "lpips":
            if self.lpips_params is None:
                self.lpips_params = self.lpips.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 8, 8, model_output.shape[-1])),
                    jnp.zeros((1, 8, 8, model_output.shape[-1])),
                )
            # reference applies no σ-weighting to the lpips branch (:107-108)
            return self.lpips.apply(
                self.lpips_params,
                model_output.astype(jnp.float32),
                target.astype(jnp.float32),
            )  # (B,)
        diff = model_output.astype(jnp.float32) - target.astype(jnp.float32)
        if self.loss_type == "l2":
            per = w * diff**2
        else:
            per = w * jnp.abs(diff)
        return jnp.mean(per.reshape(target.shape[0], -1), axis=1)
