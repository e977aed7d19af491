"""Softmax splatting (differentiable forward warping).

Functional parity: reference tools/softmax_splatting/softsplat.py — three
inline CUDA kernels (`softsplat_out`, `softsplat_ingrad`,
`softsplat_flowgrad` compiled via cupy, :219-456) wrapped in modes
{sum, avg, linear, soft} (:10-46). Each source pixel is pushed along its flow
vector and bilinearly scatter-added into the four destination neighbors; the
avg/linear/soft modes append a normalization channel that divides the result.

TPU-native design: the scatter is ONE `jnp.zeros().at[flat_idx].add()` over
the four corners — XLA lowers it to a sorted scatter-add, and JAX autodiff
reproduces the reference's hand-written backward exactly:
- ingrad  = gather of outgrad × bilinear weights      (softsplat.py:284-365)
- flowgrad through the weights' ±frac terms           (softsplat.py:368-455)
  (the floor() index component has zero gradient a.e., same as CUDA).
No Pallas kernel is warranted: this op sits on the optional flow-warp
conditioning path (the shipped configs use DegradedImages instead —
vtdm/vtdm_gen_stage2_degradeImage.py:31-33).

Layout: channels-last. tenIn (B, H, W, C), tenFlow (B, H, W, 2) with
flow[..., 0] = Δx (width), flow[..., 1] = Δy, tenMetric (B, H, W, 1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def splat_sum(ten_in: jax.Array, ten_flow: jax.Array) -> jax.Array:
    """Raw bilinear scatter-add forward warp."""
    b, h, w, c = ten_in.shape
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    fx = gx[None] + ten_flow[..., 0]
    fy = gy[None] + ten_flow[..., 1]

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    dx = fx - x0
    dy = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = jnp.zeros((b, h * w + 1, c), ten_in.dtype)  # +1 = out-of-bounds sink
    vals = ten_in.reshape(b, h * w, c)

    for ox, oy, wgt in (
        (0, 0, (1.0 - dx) * (1.0 - dy)),
        (1, 0, dx * (1.0 - dy)),
        (0, 1, (1.0 - dx) * dy),
        (1, 1, dx * dy),
    ):
        xi = x0i + ox
        yi = y0i + oy
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        flat = jnp.where(valid, yi * w + xi, h * w)  # sink row when OOB
        out = out.at[
            jnp.arange(b)[:, None], flat.reshape(b, h * w)
        ].add(vals * wgt.reshape(b, h * w, 1).astype(ten_in.dtype))
    return out[:, : h * w].reshape(b, h, w, c)


def softsplat(
    ten_in: jax.Array,
    ten_flow: jax.Array,
    ten_metric: Optional[jax.Array],
    str_mode: str,
) -> jax.Array:
    parts = str_mode.split("-")
    mode = parts[0]
    mode_param = parts[1] if len(parts) > 1 else None
    if mode not in ("sum", "avg", "linear", "soft"):
        raise ValueError(f"unknown splat mode {str_mode!r}")
    if mode in ("sum", "avg"):
        assert ten_metric is None, f"{mode} takes no metric"
    else:
        assert ten_metric is not None and ten_metric.shape[-1] == 1

    if mode == "avg":
        ten_in = jnp.concatenate(
            [ten_in, jnp.ones(ten_in.shape[:-1] + (1,), ten_in.dtype)], -1
        )
    elif mode == "linear":
        ten_in = jnp.concatenate([ten_in * ten_metric, ten_metric], -1)
    elif mode == "soft":
        e = jnp.exp(ten_metric)
        ten_in = jnp.concatenate([ten_in * e, e], -1)

    out = splat_sum(ten_in, ten_flow)

    if mode != "sum":
        norm = out[..., -1:]
        if mode_param == "addeps":
            norm = norm + 1e-7
        elif mode_param == "zeroeps":
            norm = jnp.where(norm == 0.0, 1.0, norm)
        elif mode_param == "clipeps":
            norm = jnp.where(
                jnp.abs(norm) < 1e-7, jnp.sign(norm) * 1e-7 + (norm == 0.0), norm
            )
        else:  # reference default: zeros → 1
            norm = jnp.where(norm == 0.0, 1.0, norm)
        out = out[..., :-1] / norm
    return out
