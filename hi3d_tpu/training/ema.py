"""Exponential moving average of parameters.

Functional parity: reference sgm/modules/ema.py:5-86 (LitEma) — shadow params
updated as `s ← s − (1−d)·(s − p)` with warmup decay
`d = min(decay, (1+n)/(10+n))` where n counts updates. The store/restore
"ema_scope" dance is unnecessary in JAX: EMA params are just a second pytree
that callers pass explicitly (e.g. for log_images sampling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, num_updates, decay: float = 0.9999):
    """One EMA step; `num_updates` is a traced int (the post-increment count)."""
    n = jnp.asarray(num_updates, jnp.float32)
    d = jnp.minimum(jnp.float32(decay), (1.0 + n) / (10.0 + n))
    return jax.tree.map(
        lambda s, p: s - (1.0 - d).astype(s.dtype) * (s - p.astype(s.dtype)),
        ema_params,
        params,
    )
