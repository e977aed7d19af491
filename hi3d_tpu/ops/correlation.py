"""FlowNet-style cost-volume correlation (TPU-native).

Functional parity: reference tools/softmax_splatting/correlation/
correlation.py — four inline CuPy CUDA kernels implementing a fixed
max_displacement=4, kernel-size-1, stride-1 correlation: 81 output channels,
channel `tc` holding mean_c one[y, x, c] · two[y + tc//9 − 4, x + tc%9 − 4, c]
with zero padding (kernel_Correlation_updateOutput, correlation.py:34-102;
backward kernels :105-256 fall out of JAX autodiff here). The reference uses
it only in its vestigial PWC `Flow` network (run.py:608-666 prefers RAFT), so
this completes the op surface rather than a hot path.

Layout: channels-last (B, H, W, C) → (B, H, W, 81). The shift loop unrolls to
81 static slices — XLA fuses the multiply-reduce chain; on TPU each tap is a
lane-aligned elementwise-dot, no scatter/gather needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_DISPLACEMENT = 4
_TAPS = 2 * MAX_DISPLACEMENT + 1  # 9 per axis → 81 channels


def correlation(one: jax.Array, two: jax.Array) -> jax.Array:
    """(B, H, W, C) × (B, H, W, C) → (B, H, W, 81) cost volume.

    Channel ordering matches the CUDA kernel: index = (dy+4)·9 + (dx+4);
    values are channel means of the shifted dot products, zero outside.
    """
    if one.shape != two.shape:
        raise ValueError(f"shape mismatch {one.shape} vs {two.shape}")
    b, h, w, c = one.shape
    d = MAX_DISPLACEMENT
    two_pad = jnp.pad(two, ((0, 0), (d, d), (d, d), (0, 0)))
    outs = []
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            shifted = jax.lax.dynamic_slice(
                two_pad, (0, dy + d, dx + d, 0), (b, h, w, c)
            )
            outs.append(jnp.mean(one * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)


class ModuleCorrelation:
    """Class wrapper mirroring the reference's ModuleCorrelation
    (correlation.py:387-393)."""

    def __call__(self, one: jax.Array, two: jax.Array) -> jax.Array:
        return correlation(one, two)


FunctionCorrelation = correlation  # reference autograd.Function entry name
