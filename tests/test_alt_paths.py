"""Equivalence of the opt-in performance paths against the defaults:

- HI3D_GN twostage (default) vs flax — pure-XLA two-stage GroupNorm
  statistics (spatial-first lane-aligned reduction, ops/group_norm._group_stats);
- HI3D_TEMPORAL_MODE 4d (default) / grouped / flat — temporal-attention
  token layouts (models/video_attention._temporal_mode): 4-D (B, T, S, C)
  tokens (models/attention.TimeAxisCrossAttention, dispatching to the
  block-local Pallas kernel), location-major grouped tokens (opt-in
  bracket, measured slower), and the reference's (B·S, T, C) flattening.

Both modes must be bit-compatible in structure (same param tree) and
numerically equivalent within fp32 tolerance.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import flax
import pytest

from hi3d_tpu.models.layers import GroupNorm32
from hi3d_tpu.models.video_attention import SpatialVideoTransformer

pytestmark = pytest.mark.slow



class _env:
    def __init__(self, **kv):
        self.kv = kv

    def __enter__(self):
        self.old = {k: os.environ.get(k) for k in self.kv}
        os.environ.update(self.kv)

    def __exit__(self, *a):
        for k, v in self.old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _randomized(params, scale=0.2, seed=0):
    flat = flax.traverse_util.flatten_dict(params["params"])
    rng = np.random.RandomState(seed)
    flat = {
        k: jnp.asarray(rng.randn(*v.shape).astype(np.float32) * scale + 0.1)
        for k, v in flat.items()
    }
    return {"params": flax.traverse_util.unflatten_dict(flat)}


@pytest.mark.parametrize("act", [None, "silu"])
@pytest.mark.parametrize("shape", [(3, 8, 8, 64), (2, 4, 6, 6, 32)])
def test_twostage_group_norm_matches_flax(shape, act):
    gn = GroupNorm32(act=act)
    x = jnp.asarray(
        np.random.RandomState(0).randn(*shape).astype(np.float32) * 2 + 1.0
    )
    params = _randomized(gn.init(jax.random.PRNGKey(0), x), seed=1)
    with _env(HI3D_GN="flax"):
        ref = gn.apply(params, x)
    with _env(HI3D_GN="twostage"):
        got = gn.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("mode", ["4d", "grouped", "grouped-xla"])
def test_temporal_modes_match_flattened(mode):
    """All temporal token layouts (HI3D_TEMPORAL_MODE) produce the same
    outputs and the same param tree as the reference-shaped flattened
    rearrange; 'grouped-xla' additionally pins the segment-local XLA
    fallback against the Pallas block-local kernel's path."""
    b, t, h, w, c = 2, 4, 8, 8, 32
    m = SpatialVideoTransformer(
        heads=2, dim_head=16, depth=1, use_spatial_context=True
    )
    x = jnp.asarray(np.random.RandomState(0).randn(b * t, h, w, c), jnp.float32)
    ctx = jnp.asarray(np.random.RandomState(1).randn(b * t, 3, c), jnp.float32)
    ind = jnp.zeros((b, t))
    kw = dict(context=ctx, timesteps=t, image_only_indicator=ind)
    params = _randomized(m.init(jax.random.PRNGKey(0), x, **kw), seed=2)
    with _env(HI3D_TEMPORAL_MODE="flat"):
        ref = m.apply(params, x, **kw)
    env = {
        "4d": {"HI3D_TEMPORAL_MODE": "4d"},
        # grouped + the Pallas kernel (interpret mode on CPU)
        "grouped": {"HI3D_TEMPORAL_MODE": "grouped",
                    "HI3D_TEMPORAL_FUSED": "force"},
        # grouped + the segment-local XLA fallback
        "grouped-xla": {"HI3D_TEMPORAL_MODE": "grouped",
                        "HI3D_TEMPORAL_FUSED": "0"},
    }[mode]
    with _env(**env):
        got = m.apply(params, x, **kw)
        # param tree identical under the flag
        p4 = m.init(jax.random.PRNGKey(0), x, **kw)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    assert jax.tree_util.tree_structure(p4) == jax.tree_util.tree_structure(
        params
    )


def test_single_kv_token_attention_shortcut_exact():
    """Softmax over one key is identically 1 → attention == v broadcast.

    Hi3D's cross-attention always has exactly one CLIP kv token
    (VideoPredictionEmbedder n_copies collapse, reference guiders/conditioner
    wiring), so the shortcut path must be bit-exact vs the full einsum."""
    from hi3d_tpu.ops.attention import (
        dot_product_attention,
        xla_attention,
        xla_attention_time,
    )

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(3, 7, 2, 4), jnp.float32)
    k = jnp.asarray(rng.randn(3, 1, 2, 4), jnp.float32)
    v = jnp.asarray(rng.randn(3, 1, 2, 4), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(dot_product_attention(q, k, v)),
        np.asarray(xla_attention(q, k, v)),
        rtol=1e-6, atol=1e-6,
    )

    qt = jnp.asarray(rng.randn(2, 4, 5, 2, 3), jnp.float32)
    kt = jnp.asarray(rng.randn(2, 1, 2, 3), jnp.float32)
    vt = jnp.asarray(rng.randn(2, 1, 2, 3), jnp.float32)
    out = xla_attention_time(qt, kt, vt)
    np.testing.assert_allclose(
        np.asarray(out),
        np.broadcast_to(np.asarray(vt)[:, :, None], qt.shape),
        rtol=1e-6,
    )


def test_matmul_layer_norm_matches_flax():
    """HI3D_LN=matmul (MXU-contracted LayerNorm statistics) must match the
    flax LayerNorm formulation within fp32 tolerance, with an identical
    param tree."""
    from hi3d_tpu.models.attention import LayerNorm32

    ln = LayerNorm32()
    x = jnp.asarray(
        np.random.RandomState(0).randn(4, 6, 64).astype(np.float32) * 3 + 2
    )
    params = _randomized(ln.init(jax.random.PRNGKey(0), x), seed=3)
    with _env(HI3D_LN=""):
        ref = ln.apply(params, x)
    with _env(HI3D_LN="matmul"):
        got = ln.apply(params, x)
        p2 = ln.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5
    )
    assert jax.tree_util.tree_structure(p2) == jax.tree_util.tree_structure(
        params
    )
