"""Classifier-free-guidance guiders.

Functional parity: reference sgm/modules/diffusionmodules/guiders.py
(VanillaCFG :24-42, IdentityGuider :45-56, LinearPredictionGuider :59-99).
Hi3D samples with LinearPredictionGuider: a per-frame CFG scale
linspace(min_scale, max_scale, num_frames) so early orbital views stay close to
the conditioning image while far views get stronger guidance
(reference configs/train-v01.yaml:162-168: max 2.5 stage 1, 2.0 stage 2).

Batch convention matches the reference: `prepare_inputs` doubles the batch as
concat([uc, c]) along axis 0; `__call__` splits the model output back into
(unconditional, conditional) halves and blends. Keeping both halves in ONE
batched network call is the TPU-friendly shape — the MXU sees a 2× larger
matmul instead of two kernel launches.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..utils.misc import append_dims, default

CondDict = Dict[str, jax.Array]

# conditioning entries that get batched for CFG; everything else must be
# identical between c and uc and is passed through untouched
_BATCHED_COND_KEYS = ("vector", "crossattn", "concat")


def _merge_cond(c: CondDict, uc: CondDict, extra_keys=()) -> CondDict:
    out: CondDict = {}
    for k in c:
        if k in _BATCHED_COND_KEYS or k in extra_keys:
            out[k] = jnp.concatenate([uc[k], c[k]], axis=0)
        else:
            out[k] = c[k]
    return out


class IdentityGuider:
    def __call__(self, x: jax.Array, sigma: jax.Array) -> jax.Array:
        return x

    def prepare_inputs(self, x, s, c: CondDict, uc: CondDict):
        return x, s, dict(c)


class VanillaCFG:
    """Single-scale CFG: pred = uc + scale · (c − uc)."""

    def __init__(self, scale: float):
        self.scale = float(scale)

    def __call__(self, x: jax.Array, sigma: jax.Array) -> jax.Array:
        x_u, x_c = jnp.split(x, 2, axis=0)
        return x_u + self.scale * (x_c - x_u)

    def prepare_inputs(self, x, s, c: CondDict, uc: CondDict):
        return (
            jnp.concatenate([x, x], axis=0),
            jnp.concatenate([s, s], axis=0),
            _merge_cond(c, uc),
        )


class LinearPredictionGuider:
    """Per-frame CFG scale rising linearly from min_scale to max_scale over T."""

    def __init__(
        self,
        max_scale: float,
        num_frames: int,
        min_scale: float = 1.0,
        additional_cond_keys: Optional[Union[List[str], str]] = None,
    ):
        self.min_scale = float(min_scale)
        self.max_scale = float(max_scale)
        self.num_frames = int(num_frames)
        self.scale = jnp.linspace(min_scale, max_scale, num_frames, dtype=jnp.float32)

        additional_cond_keys = default(additional_cond_keys, [])
        if isinstance(additional_cond_keys, str):
            additional_cond_keys = [additional_cond_keys]
        self.additional_cond_keys = tuple(additional_cond_keys)

    def __call__(self, x: jax.Array, sigma: jax.Array) -> jax.Array:
        x_u, x_c = jnp.split(x, 2, axis=0)
        t = self.num_frames
        b = x_u.shape[0] // t
        x_u = x_u.reshape((b, t) + x_u.shape[1:])
        x_c = x_c.reshape((b, t) + x_c.shape[1:])
        scale = append_dims(self.scale[None, :], x_u.ndim).astype(x_u.dtype)
        out = x_u + scale * (x_c - x_u)
        return out.reshape((b * t,) + out.shape[2:])

    def prepare_inputs(self, x, s, c: CondDict, uc: CondDict):
        return (
            jnp.concatenate([x, x], axis=0),
            jnp.concatenate([s, s], axis=0),
            _merge_cond(c, uc, self.additional_cond_keys),
        )
