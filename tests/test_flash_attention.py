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


def test_packed_padded_heads_matches_xla():
    """flash_attention_packed on zero-padded (B, S, H·128) tensors equals
    unpadded attention on the real d=64 heads, and the padded output lanes
    are exactly zero — the invariant models/attention.py's padpack path
    (HI3D_FLASH_PADPACK) relies on."""
    from hi3d_tpu.ops.flash_attention import flash_attention_packed

    q, k, v = make_qkv()
    pad_to = 128

    def pack(x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_to - D)))
        return x.reshape(x.shape[0], x.shape[1], H * pad_to)

    out_ref = xla_attention(q, k, v)
    outp = jax.jit(
        lambda a, b, c: flash_attention_packed(
            a, b, c, H, scale=D**-0.5, block_q=BLK, block_k=BLK
        )
    )(pack(q), pack(k), pack(v))
    outp = outp.reshape(B, S, H, pad_to)
    np.testing.assert_allclose(
        np.asarray(outp[..., :D]), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )
    assert float(np.abs(np.asarray(outp[..., D:])).max()) == 0.0


def test_crossattention_padpack_exact(monkeypatch):
    """CrossAttention with HI3D_FLASH_PADPACK=1 (padded projection weights +
    packed kernel) is numerically the plain path on the SAME param tree."""
    import hi3d_tpu.ops.attention as ops_attn
    from hi3d_tpu.models.attention import CrossAttention

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 1024, 128), jnp.float32)
    m = CrossAttention(heads=2, dim_head=64)
    params = m.init(jax.random.PRNGKey(4), x)
    ref = m.apply(params, x)

    monkeypatch.setenv("HI3D_FLASH_PADPACK", "1")
    monkeypatch.setattr(ops_attn, "_flash_available", lambda: True)
    out = m.apply(params, x)  # identical param tree drives the padded path
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5
    )


def _segment_ref(q, k, v, seg_len):
    """Exact segment-local reference: reshape segments into the batch dim."""
    b, s, h, d = q.shape
    seg = lambda x: x.reshape(b * s // seg_len, seg_len, h, d)
    return xla_attention(seg(q), seg(k), seg(v)).reshape(b, s, h, d)


def test_seg_len_forward_matches_segment_batch():
    """flash_attention(seg_len=T) == many independent T-long attentions:
    the masked-kernel path used when the grouped temporal layout routes
    frame-local attention through the flash entry."""
    q, k, v = make_qkv()
    seg = 16
    out_ref = _segment_ref(q, k, v, seg)
    out = jax.jit(
        lambda q, k, v: flash_attention(
            q, k, v, block_q=BLK, block_k=BLK, seg_len=seg
        )
    )(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )


def test_seg_len_gradients_match_segment_batch():
    q, k, v = make_qkv()
    seg = 16

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=BLK, block_k=BLK, seg_len=seg)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_segment_ref(q, k, v, seg)))

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"d{name} mismatch",
        )


def test_seg_len_spans_key_blocks():
    """Segments wider than one k-block exercise the mask's cross-block
    indexing (seg_len > block_k is the kernel's hardest masking case)."""
    q, k, v = make_qkv()
    seg = 128
    out_ref = _segment_ref(q, k, v, seg)
    out = jax.jit(
        lambda q, k, v: flash_attention(
            q, k, v, block_q=64, block_k=64, seg_len=seg
        )
    )(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )


def test_padpack_never_unmasks_segment_local_sites(monkeypatch):
    """Regression (round-4 fix): CrossAttention(seg_len=T) with
    HI3D_FLASH_PADPACK=1 must stay FRAME-LOCAL. Before the fix the padpack
    fast-path (checked first, no mask support) silently computed global
    attention across all locations at grouped-mode temporal sites."""
    import hi3d_tpu.ops.attention as ops_attn
    from hi3d_tpu.models.attention import CrossAttention

    seg = 16
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 1024, 128), jnp.float32)
    m = CrossAttention(heads=2, dim_head=64, seg_len=seg)
    params = m.init(jax.random.PRNGKey(6), x)
    ref = m.apply(params, x)  # segment-local XLA path (flash unavailable)

    monkeypatch.setenv("HI3D_FLASH_PADPACK", "1")
    monkeypatch.setattr(ops_attn, "_flash_available", lambda: True)
    out = m.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5
    )
