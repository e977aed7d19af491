"""Shared helpers for encoder-propagation ("turbo") sampling.

Faster Diffusion (arXiv 2312.09608): the UNet input+middle block activations
change little between adjacent sampler steps, so a step may skip them and
decode from the previous step's cached (skip_activations, middle_h). Used by
samplers.EDMSampler.__call__ (stage-1 full loop) and pipelines/v2v.py
blend_refine_batch (stage-2 latent blending) — both thread the cache through
a `lax.scan` carry and select full vs decoder-only steps with `lax.cond`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.misc import instance_cache


def reuse_flags(n: int, k: int) -> jax.Array:
    """(n,) bool — True where the step may DECODE FROM THE CACHE.

    The encoder runs on every k-th step (i % k == 0, so step 0 always
    computes fully and the zero-initialized cache never reaches an output)
    and on the last step (quality: the final σ→0 update sees fresh
    features)."""
    k = int(k)
    return jnp.asarray([i % k != 0 and i != n - 1 for i in range(n)])


def zero_cache(owner, key, probe, *probe_args):
    """Zero-filled encoder cache with the real (CFG-doubled) shapes.

    `probe(*probe_args)` must run one full denoise through the cached
    denoiser form and return the fresh cache; it is only ever traced
    abstractly (jax.eval_shape — no FLOPs). The SHAPES are memoized on
    `owner` under `key` — abstract tracing of a 1.5B-param UNet costs
    seconds of host time per call, and serving runs one sample()/refine()
    per asset — while the zeros themselves are allocated fresh per call so
    no multi-GB cache pytree stays pinned in HBM between assets."""

    def make():
        return jax.eval_shape(probe, *probe_args)

    shapes = instance_cache(owner, key, make)
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
