"""Multi-head attention ops.

This replaces the reference's CUDA attention backends (xformers
memory-efficient attention and torch SDPA, reference sgm/modules/attention.py
:15-47, :417-435) with TPU-native paths:

- ``backend="xla"``: plain einsum attention with fp32 softmax. XLA fuses the
  softmax chain into the matmuls; for the temporal factorization (seq=16,
  enormous batch) this is the right shape — a flash kernel has nothing to tile.
- ``backend="flash"``: Pallas flash-attention kernel (hi3d_tpu.ops.flash_attention)
  for the spatial factorization (up to 16384 q-tokens at 1024² latents), where
  materializing the (S, S) score matrix would blow HBM bandwidth.
- ``backend="auto"``: picks per-shape (flash when q_len ≥ 1024 and the TPU
  backend is available, else xla).

All inputs are (batch, seq, heads, head_dim) ["BSHD"]; output matches.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

# flash path requires TPU; resolved lazily so CPU tests never import Pallas
_FLASH_MIN_Q_LEN = 1024


@functools.lru_cache(maxsize=1)
def _flash_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
) -> jax.Array:
    """Einsum attention with fp32 accumulation + fp32 softmax."""
    *_, h, d = q.shape
    if scale is None:
        scale = d**-0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    backend: str = "auto",
) -> jax.Array:
    """(B, Sq, H, D) × (B, Sk, H, D) → (B, Sq, H, D)."""
    if k.shape[1] == 1:
        # single kv token (Hi3D cross-attn against one CLIP embedding):
        # softmax over one key is identically 1, so attention == v broadcast
        # over queries — QKᵀ/softmax/PV all vanish exactly.
        return jnp.broadcast_to(
            v.astype(v.dtype), (v.shape[0], q.shape[1], *v.shape[2:])
        )
    backend = os.environ.get("HI3D_ATTN_BACKEND", backend)  # perf A/B hook
    if backend == "auto":
        from .flash_attention import DEFAULT_BLOCK_Q, _default_block_k

        # flash pays off only when BOTH sequence sides are long; Hi3D's
        # cross-attention has a single CLIP kv-token and its temporal
        # attention seq is 16 — both stay on the fused XLA path
        block_k = _default_block_k(k.shape[1])
        use_flash = (
            _flash_available()
            and q.shape[1] >= _FLASH_MIN_Q_LEN
            and k.shape[1] >= _FLASH_MIN_Q_LEN
            and q.shape[1] % min(DEFAULT_BLOCK_Q, q.shape[1]) == 0
            and k.shape[1] % min(block_k, k.shape[1]) == 0
        )
        backend = "flash" if use_flash else "xla"
    if backend == "flash":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    if backend == "xla":
        return xla_attention(q, k, v, scale=scale)
    raise ValueError(f"unknown attention backend {backend!r}")


def flash_self_attention_engages(sq: int, sk: int) -> bool:
    """True when dot_product_attention's auto logic would route an
    (sq, sk) self-attention site to the flash kernel — exposed so
    models.attention.CrossAttention can decide to use the packed-heads
    entry (padded projections) for exactly those sites."""
    backend = os.environ.get("HI3D_ATTN_BACKEND", "auto")
    if backend == "xla":
        return False
    from .flash_attention import DEFAULT_BLOCK_Q, _default_block_k

    block_k = _default_block_k(sk)
    return (
        _flash_available()
        and sq >= _FLASH_MIN_Q_LEN
        and sk >= _FLASH_MIN_Q_LEN
        and sq % min(DEFAULT_BLOCK_Q, sq) == 0
        and sk % min(block_k, sk) == 0
    )


def _temporal_fused_engages(q, k, v) -> bool:
    from .temporal_attention import temporal_attention_supported

    itemsize = jnp.dtype(
        jnp.result_type(q.dtype, k.dtype, v.dtype)
    ).itemsize
    return temporal_attention_supported(q.shape, k.shape, itemsize)


def xla_attention_time(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
) -> jax.Array:
    """Attention along the FRAME axis of (B, T, S, H, D) tokens.

    Avoids the (B·S, T, C) flattening of the temporal factorization: XLA's
    layout assignment materialized the flattened rearrange as ~0.4 ms
    bf16[8192,16,5,64] copies at every time_stack attention site (profiled
    via tools/profile_step.py). Expressing the contraction directly over the
    frame axis of the 4-D token tensor leaves layout choice to the compiler.

    k/v are (B, Tk, S, H, D) for self-attention or (B, Sk, H, D) for
    cross-attention against per-video context tokens (no per-location
    repeat needed — the einsum broadcasts).
    """
    *_, h, d = q.shape
    if scale is None:
        scale = d**-0.5
    if k.shape[1] == 1:
        # one kv token → softmax ≡ 1 → output is v broadcast (see
        # dot_product_attention); holds for both kv ranks.
        if v.ndim == 5:  # (B, 1, S, H, D) frame-axis kv
            return jnp.broadcast_to(v, q.shape)
        # (B, 1, H, D) per-video context kv → over frames and locations
        return jnp.broadcast_to(v[:, :, None], q.shape)
    if k.ndim == 4:  # per-video context kv
        logits = jnp.einsum(
            "bqshd,bkhd->bshqk", q, k, preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
        out = jnp.einsum(
            "bshqk,bkhd->bqshd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
    elif _temporal_fused_engages(q, k, v):
        # frame-axis self-attention: one fused Pallas pass in the layout the
        # qkv projections produce — replaces the 3 qkv layout copies, the f32
        # (B,S,H,T,T) logits materialization, and the slot-starved batched
        # 16×64 dots the einsum path pays (~175 ms/step at stage 2;
        # BASELINE.md round-3 copy/fusion itemization)
        from .temporal_attention import temporal_attention_fused

        return temporal_attention_fused(q, k, v, scale=scale)
    else:
        logits = jnp.einsum(
            "bqshd,bkshd->bshqk", q, k, preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
        out = jnp.einsum(
            "bshqk,bkshd->bqshd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
    return out.astype(v.dtype)
