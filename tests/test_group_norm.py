"""Fused GroupNorm op: math equivalence, folded SiLU, custom-VJP backward."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from hi3d_tpu.ops.group_norm import (
    _group_norm_act,
    _xla_group_norm,
    fused_group_norm,
    supports_fused,
)

pytestmark = pytest.mark.slow


def _flax_gn(x, scale, bias, groups, eps=1e-5, act=None):
    y = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32).apply(
        {"params": {"scale": scale, "bias": bias}}, x.astype(jnp.float32)
    ).astype(x.dtype)
    return jax.nn.silu(y) if act == "silu" else y


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 64), 32),
    ((3, 4, 4, 4, 64), 16),   # video-rank input
    ((2, 16, 320), 32),       # non-128-aligned channels
])
def test_xla_group_norm_matches_flax(shape, groups):
    c = shape[-1]
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    scale = jax.random.normal(jax.random.PRNGKey(1), (c,)) * 0.2 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.2
    for act in (None, "silu"):
        got = _xla_group_norm(x, scale, bias, groups, 1e-5, act)
        want = _flax_gn(x, scale, bias, groups, act=act)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_fused_group_norm_dispatch_and_gcd():
    # channels not divisible by 32 → group count falls back to gcd
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 48))
    scale, bias = jnp.ones((48,)), jnp.zeros((48,))
    y = fused_group_norm(x, scale, bias, num_groups=32)
    want = _flax_gn(x, scale, bias, math.gcd(48, 32))
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_custom_vjp_backward_matches_autodiff():
    """The Pallas path's hand-written backward (used under HI3D_FUSED_GN=1)
    must equal autodiff of the plain math — checked via the custom_vjp
    wrapper, whose forward falls back to XLA on CPU."""
    shape, groups = (2, 4, 4, 64), 16
    c = shape[-1]
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    scale = jax.random.normal(jax.random.PRNGKey(1), (c,)) * 0.2 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.2
    cot = jax.random.normal(jax.random.PRNGKey(3), shape)

    for act in (None, "silu"):
        def f_custom(x, s, b):
            return jnp.vdot(_group_norm_act(x, s, b, groups, 1e-5, act), cot)

        def f_plain(x, s, b):
            return jnp.vdot(_xla_group_norm(x, s, b, groups, 1e-5, act), cot)

        g_custom = jax.grad(f_custom, argnums=(0, 1, 2))(x, scale, bias)
        g_plain = jax.grad(f_plain, argnums=(0, 1, 2))(x, scale, bias)
        for gc, gp, name in zip(g_custom, g_plain, ("dx", "dscale", "dbias")):
            np.testing.assert_allclose(
                np.asarray(gc), np.asarray(gp), rtol=2e-4, atol=2e-4,
                err_msg=f"{name} mismatch (act={act})",
            )


def test_supports_fused_gating():
    import hi3d_tpu.ops.group_norm as gn

    orig = gn._pallas_available.__wrapped__
    # emulate TPU availability for the predicate
    gn._pallas_available.cache_clear()
    try:
        gn._pallas_available = lambda: True
        assert gn.supports_fused((32, 64, 64, 320), 32)   # 320 ch OK
        assert gn.supports_fused((2, 16, 64, 64, 320), 32)
        assert not gn.supports_fused((32, 3, 3, 320), 32)  # s=9 not /16
        assert not gn.supports_fused((32, 64, 64, 321), 32)  # c % g != 0
    finally:
        import functools
        gn._pallas_available = functools.lru_cache(maxsize=1)(orig)


def test_group_norm32_module_param_layout_unchanged():
    """GroupNorm32 keeps the nn.GroupNorm param layout (norm/scale, norm/bias)
    so checkpoint conversion is unaffected, and act='silu' folds the ResBlock
    activation."""
    from hi3d_tpu.models.layers import GroupNorm32

    m = GroupNorm32(act="silu")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64))
    params = m.init(jax.random.PRNGKey(1), x)
    assert set(params["params"]["norm"].keys()) == {"scale", "bias"}
    y = m.apply(params, x)
    want = _flax_gn(x, jnp.ones((64,)), jnp.zeros((64,)), 32, act="silu")
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


# ---------------------------------------------------------------------------
# Stats-only Pallas kernels (HI3D_GN=pallas / HI3D_LN=pallas) — interpret
# mode on CPU; the apply stays jnp so only the stats need checking.
# ---------------------------------------------------------------------------

from hi3d_tpu.ops.group_norm import (  # noqa: E402
    _group_stats,
    _row_stats_ref,
    pallas_group_stats,
    pallas_row_stats,
)


@pytest.mark.parametrize("shape,groups", [
    ((2, 16, 64), 32),
    ((3, 4, 8, 320), 32),       # non-128-aligned channels, 4-D
])
def test_pallas_group_stats_matches_reference(shape, groups):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16) * 3 + 1
    gm, gi = pallas_group_stats(x, groups, 1e-5)
    rm, ri = _group_stats(x, groups, 1e-5)
    np.testing.assert_allclose(gm, rm, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(gi, ri, rtol=1e-6, atol=1e-6)


def test_pallas_group_stats_gradients_match_reference():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64))

    def loss_pallas(t):
        m, i = pallas_group_stats(t, 16, 1e-5)
        return jnp.sum(m * 2.0 + i)

    def loss_ref(t):
        m, i = _group_stats(t, 16, 1e-5)
        return jnp.sum(m * 2.0 + i)

    gp = jax.grad(loss_pallas)(x)
    gr = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(gp, gr, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("shape", [(16, 64), (32, 320)])
def test_pallas_row_stats_matches_reference(shape):
    x = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.bfloat16) * 2 - 1
    gm, gi = pallas_row_stats(x, 1e-5)
    rm, ri = _row_stats_ref(x, 1e-5)
    np.testing.assert_allclose(gm, rm, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(gi, ri, rtol=1e-6, atol=1e-6)


def test_pallas_row_stats_gradients_match_reference():
    x = jax.random.normal(jax.random.PRNGKey(3), (16, 48))

    def loss_pallas(t):
        m, i = pallas_row_stats(t, 1e-5)
        return jnp.sum(m - 3.0 * i)

    def loss_ref(t):
        m, i = _row_stats_ref(t, 1e-5)
        return jnp.sum(m - 3.0 * i)

    np.testing.assert_allclose(
        jax.grad(loss_pallas)(x), jax.grad(loss_ref)(x), rtol=1e-5, atol=1e-6
    )


def test_groupnorm32_pallas_stats_matches_default(monkeypatch):
    from hi3d_tpu.models.layers import GroupNorm32

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 64), jnp.bfloat16)
    mod = GroupNorm32(act="silu")
    params = mod.init(jax.random.PRNGKey(5), x)
    monkeypatch.setenv("HI3D_GN", "twostage")
    want = mod.apply(params, x)
    monkeypatch.setenv("HI3D_GN", "pallas")
    got = mod.apply(params, x)
    np.testing.assert_allclose(
        got.astype(jnp.float32), want.astype(jnp.float32), rtol=2e-2,
        atol=2e-2,
    )


def test_layernorm32_pallas_stats_matches_default(monkeypatch):
    from hi3d_tpu.models.attention import LayerNorm32

    x = jax.random.normal(jax.random.PRNGKey(6), (2, 16, 64), jnp.bfloat16)
    mod = LayerNorm32()
    monkeypatch.delenv("HI3D_LN", raising=False)
    params = mod.init(jax.random.PRNGKey(7), x)
    want = mod.apply(params, x)
    monkeypatch.setenv("HI3D_LN", "pallas")
    got = mod.apply(params, x)
    np.testing.assert_allclose(
        got.astype(jnp.float32), want.astype(jnp.float32), rtol=2e-2,
        atol=2e-2,
    )
