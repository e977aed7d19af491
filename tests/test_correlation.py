"""Cost-volume correlation op vs a direct nested-loop reference."""

import numpy as np
import jax
import jax.numpy as jnp

from hi3d_tpu.ops.correlation import MAX_DISPLACEMENT, correlation


def _reference_numpy(one, two):
    b, h, w, c = one.shape
    d = MAX_DISPLACEMENT
    pad = np.zeros((b, h + 2 * d, w + 2 * d, c), one.dtype)
    pad[:, d:-d, d:-d] = two
    out = np.zeros((b, h, w, (2 * d + 1) ** 2), np.float32)
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            tc = (dy + d) * (2 * d + 1) + (dx + d)
            shifted = pad[:, d + dy:d + dy + h, d + dx:d + dx + w]
            out[..., tc] = (one * shifted).mean(-1)
    return out


def test_correlation_matches_reference_and_ordering():
    rng = np.random.RandomState(0)
    one = rng.randn(2, 10, 12, 8).astype(np.float32)
    two = rng.randn(2, 10, 12, 8).astype(np.float32)
    got = np.asarray(correlation(jnp.asarray(one), jnp.asarray(two)))
    want = _reference_numpy(one, two)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # identical inputs: zero-shift channel (index 40) is the max on average
    same = np.asarray(correlation(jnp.asarray(one), jnp.asarray(one)))
    assert same[..., 40].mean() >= same.mean(axis=(0, 1, 2)).max() - 1e-6


def test_correlation_differentiable():
    one = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 6, 4))
    two = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 6, 4))
    g1, g2 = jax.grad(lambda a, b: jnp.sum(correlation(a, b) ** 2),
                      argnums=(0, 1))(one, two)
    assert g1.shape == one.shape and g2.shape == two.shape
    assert float(jnp.abs(g1).max()) > 0 and float(jnp.abs(g2).max()) > 0
