"""Softmax splatting: numpy golden forward, mode semantics, gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from hi3d_tpu.ops.softsplat import softsplat, splat_sum
import pytest

pytestmark = pytest.mark.slow


def numpy_splat_sum(x, flow):
    b, h, w, c = x.shape
    out = np.zeros_like(x)
    for bi in range(b):
        for y in range(h):
            for xx in range(w):
                tx = xx + flow[bi, y, xx, 0]
                ty = y + flow[bi, y, xx, 1]
                x0, y0 = int(np.floor(tx)), int(np.floor(ty))
                dx, dy = tx - x0, ty - y0
                for ox, oy, wgt in ((0, 0, (1 - dx) * (1 - dy)),
                                    (1, 0, dx * (1 - dy)),
                                    (0, 1, (1 - dx) * dy),
                                    (1, 1, dx * dy)):
                    xi, yi = x0 + ox, y0 + oy
                    if 0 <= xi < w and 0 <= yi < h:
                        out[bi, yi, xi] += x[bi, y, xx] * wgt
    return out


def test_splat_sum_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 6, 7, 3).astype(np.float32)
    flow = (rng.rand(2, 6, 7, 2).astype(np.float32) - 0.5) * 4.0
    out = splat_sum(jnp.asarray(x), jnp.asarray(flow))
    np.testing.assert_allclose(
        np.asarray(out), numpy_splat_sum(x, flow), rtol=1e-5, atol=1e-6
    )


def test_zero_flow_is_identity():
    x = jnp.asarray(np.random.RandomState(1).rand(1, 5, 5, 2), jnp.float32)
    out = splat_sum(x, jnp.zeros((1, 5, 5, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)


def test_avg_mode_normalizes():
    """Splatting a constant image with any flow keeps the constant under avg."""
    x = jnp.ones((1, 8, 8, 3))
    flow = jnp.asarray(
        (np.random.RandomState(2).rand(1, 8, 8, 2) - 0.5) * 2.0, jnp.float32
    )
    out = softsplat(x, flow, None, "avg")
    covered = np.asarray(splat_sum(jnp.ones((1, 8, 8, 1)), flow))[..., 0] > 0
    np.testing.assert_allclose(
        np.asarray(out)[0][covered[0]], 1.0, rtol=1e-5
    )


def test_soft_mode_prefers_high_metric():
    """Two pixels splat onto the same site; soft mode weights by exp(metric)."""
    x = jnp.zeros((1, 1, 3, 1)).at[0, 0, 0, 0].set(10.0).at[0, 0, 2, 0].set(2.0)
    # both end at x=1
    flow = jnp.zeros((1, 1, 3, 2)).at[0, 0, 0, 0].set(1.0).at[0, 0, 2, 0].set(-1.0)
    metric = jnp.zeros((1, 1, 3, 1)).at[0, 0, 0, 0].set(5.0)  # favor the 10.0
    out = softsplat(x, flow, metric, "soft")
    val = float(out[0, 0, 1, 0])
    # the middle pixel (value 0, metric 0, zero flow) also lands on x=1
    expected = (10.0 * np.exp(5.0) + 2.0 + 0.0) / (np.exp(5.0) + 1.0 + 1.0)
    assert val == np.float32(expected) or abs(val - expected) < 1e-3


def test_gradients_match_reference_semantics():
    """d(out)/d(in) = gathered bilinear weights; flow grads via the ±frac
    terms (reference softsplat_ingrad/flowgrad kernels). Verify against
    numerical differentiation."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 4, 4, 2), jnp.float32)
    flow = jnp.asarray((rng.rand(1, 4, 4, 2) - 0.5), jnp.float32)

    def loss(x, flow):
        return jnp.sum(jnp.sin(splat_sum(x, flow)))

    gx, gf = jax.grad(loss, argnums=(0, 1))(x, flow)

    eps = 1e-3
    for idx in [(0, 1, 2, 0), (0, 3, 3, 1)]:
        for arg, g in ((0, gx), (1, gf)):
            args = [np.asarray(x, np.float64), np.asarray(flow, np.float64)]
            args[arg] = args[arg].copy()
            args[arg][idx] += eps
            up = float(loss(jnp.asarray(args[0], jnp.float32),
                            jnp.asarray(args[1], jnp.float32)))
            args[arg][idx] -= 2 * eps
            dn = float(loss(jnp.asarray(args[0], jnp.float32),
                            jnp.asarray(args[1], jnp.float32)))
            num = (up - dn) / (2 * eps)
            assert abs(float(g[idx]) - num) < 5e-2, (arg, idx, float(g[idx]), num)
