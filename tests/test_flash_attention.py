"""Pallas flash attention vs XLA einsum attention (interpret mode on CPU):
forward parity, gradient parity through the custom VJP, dtype handling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hi3d_tpu.ops.attention import xla_attention
from hi3d_tpu.ops.flash_attention import flash_attention

B, S, H, D = 2, 256, 3, 64
BLK = 128


def make_qkv(dtype=jnp.float32, s_kv=S):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), dtype)
    k = jax.random.normal(ks[1], (B, s_kv, H, D), dtype)
    v = jax.random.normal(ks[2], (B, s_kv, H, D), dtype)
    return q, k, v


def test_forward_matches_xla():
    q, k, v = make_qkv()
    out_ref = xla_attention(q, k, v)
    out = jax.jit(
        lambda q, k, v: flash_attention(q, k, v, block_q=BLK, block_k=BLK)
    )(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )


def test_forward_cross_attention_seq_lengths():
    q, k, v = make_qkv(s_kv=128)
    out_ref = xla_attention(q, k, v)
    out = jax.jit(
        lambda q, k, v: flash_attention(q, k, v, block_q=BLK, block_k=128)
    )(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )


def test_custom_scale():
    q, k, v = make_qkv()
    out_ref = xla_attention(q, k, v, scale=0.05)
    out = jax.jit(
        lambda q, k, v: flash_attention(
            q, k, v, scale=0.05, block_q=BLK, block_k=BLK
        )
    )(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )


def test_gradients_match_xla():
    q, k, v = make_qkv()

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=BLK, block_k=BLK)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(xla_attention(q, k, v)))

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"d{name} mismatch",
        )


def test_bfloat16_close_to_fp32():
    q, k, v = make_qkv()
    out32 = np.asarray(xla_attention(q, k, v), np.float32)
    out16 = jax.jit(
        lambda q, k, v: flash_attention(q, k, v, block_q=BLK, block_k=BLK)
    )(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    )
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, dtype=np.float32), out32, rtol=0.1, atol=0.05
    )


def test_indivisible_seq_raises():
    q, k, v = make_qkv()
    with pytest.raises(ValueError):
        flash_attention(
            jnp.concatenate([q, q[:, :44]], axis=1), k, v,
            block_q=BLK, block_k=BLK,
        )
