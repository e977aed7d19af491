"""Shared NN building blocks (flax.linen, NHWC layouts).

Functional parity targets (reference file:line):
- timestep_embedding: sgm/modules/diffusionmodules/util.py:207-231
- GroupNorm32 (fp32 compute): openaimodel `normalization`, util.py:296-304
- ResBlock: sgm/modules/diffusionmodules/openaimodel.py:210-354 (incl. the
  3-D `kernel_size=[3,1,1]` time-stack variant and `exchange_temb_dims`)
- Upsample / Downsample: openaimodel.py:107-206
- AlphaBlender: sgm/modules/diffusionmodules/util.py:312-370

TPU-first design notes:
- Activations are NHWC / NTHWC (channels-last) — the layout XLA:TPU convs are
  fastest in; the torch reference is NCHW and the weight converter transposes.
- Normalizations compute in float32 and cast back to the activation dtype
  (matching the reference's GroupNorm32/autocast behavior in bf16 training).
- The temporal (3,1,1) conv is expressed as a 3-D conv over (T,H,W); with unit
  spatial taps XLA lowers it to a batched matmul over neighboring frames.
- Sub-module names mirror the torch module paths (`in_layers_2`,
  `emb_layers_1`, ...) so checkpoint conversion is a mechanical rename.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def _time_conv_mode() -> str:
    """Lowering for the time-stack's (kt,1,1) conv — all three produce
    bit-identical outputs with an unchanged param tree (HI3D_TIME_CONV):

    - "conv" (default): 5-D conv_general_dilated over (B, T, H, W, C).
      XLA's 5-D lowering re-tiles its operands at every site (the f32/bf16
      [16,128,16,16,320] copies in the stage-2 profile, ~36 ms/step across
      in/out_layers) — but both replacements below measured WORSE, so the
      relayouts are cheaper than they look; this bucket is closed by
      bracketing, not plateaued.
    - "conv4d": run the whole time-stack ResBlock on 4-D (B, T, H·W, C)
      tokens with a (kt, 1) 2-D convolution (free reshape in, free reshape
      out). Measured negative: 0.4166 vs 0.4275 steps/s on the stage-2
      step — the (3,1)-kernel conv over a 16×16384 "image" tiles worse
      than the 5-D path's relayout+conv.
    - "matmul": kt frame-shifted matmuls. Measured negative in round 3
      (0.4225 vs 0.4273 steps/s stage-2): the shifted-matmul formulation
      (3 matmuls + 2 padded adds) costs more than the conv's relayouts.
    """
    import os

    return os.environ.get("HI3D_TIME_CONV", "conv")


class TimeKernelConv(nn.Module):
    """nn.Conv((kt, 1, 1), 'SAME')-equivalent on (B, T, H, W, C) tokens,
    expressed as kt frame-shifted matmuls (see _time_conv_as_matmul).

    Parameters are named/shaped exactly like flax nn.Conv — kernel
    (kt, 1, 1, C_in, C_out), bias (C_out,) — so checkpoints and converters
    are untouched and the two lowerings are swappable per-process."""

    features: int
    kt: int
    dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        t = x.shape[1]
        kernel = self.param(
            "kernel", self.kernel_init, (self.kt, 1, 1, cin, self.features)
        )
        bias = self.param("bias", self.bias_init, (self.features,))
        x = x.astype(self.dtype)
        w = kernel.astype(self.dtype)
        pad = self.kt // 2
        y = None
        for i in range(self.kt):
            off = i - pad  # y[t] += x[t + off] @ w[i]
            if off < 0:
                seg = x[:, : t + off]
                p = jnp.einsum("bthwc,cd->bthwd", seg, w[i, 0, 0])
                p = jnp.pad(p, ((0, 0), (-off, 0)) + ((0, 0),) * 3)
            elif off > 0:
                seg = x[:, off:]
                p = jnp.einsum("bthwc,cd->bthwd", seg, w[i, 0, 0])
                p = jnp.pad(p, ((0, 0), (0, off)) + ((0, 0),) * 3)
            else:
                p = jnp.einsum("bthwc,cd->bthwd", x, w[i, 0, 0])
            y = p if y is None else y + p
        return y + bias.astype(self.dtype)


class TimeConv4D(nn.Module):
    """nn.Conv((kt, 1, 1), 'SAME')-equivalent applied to (B, T, S, C) tokens
    (S = merged H·W) as a (kt, 1) 2-D convolution. Param layout matches the
    5-D nn.Conv — kernel (kt, 1, 1, C_in, C_out), bias (C_out,) — so
    checkpoints and converters are untouched (see _time_conv_mode)."""

    features: int
    kt: int
    dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (self.kt, 1, 1, cin, self.features)
        )
        bias = self.param("bias", self.bias_init, (self.features,))
        pad = self.kt // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.reshape(self.kt, 1, cin, self.features).astype(self.dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    max_period: float = 10000.0,
) -> jax.Array:
    """Sinusoidal embeddings: [cos(t·f), sin(t·f)], f = exp(-log(P)·i/half)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


class _NormParams(nn.Module):
    """Scale/bias container matching nn.GroupNorm's param layout."""

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.features,)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in fp32, output cast back to the input dtype.

    On TPU this dispatches to the fused Pallas kernels
    (hi3d_tpu.ops.group_norm: streamed stats + one-pass apply, optional folded
    SiLU); elsewhere it falls back to the same fp32 math in XLA. Param layout
    matches nn.GroupNorm (child scope "norm" with scale/bias) so checkpoint
    conversion is unchanged.

    At real model widths channels are always a multiple of 32; for toy test
    widths the group count falls back to gcd(channels, 32).
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.group_norm import (
            _group_stats,
            _pallas_gn_opted_in,
            _pallas_opted_in,
            _twostage_opted_in,
            group_stats_supported,
            pallas_group_stats,
            supports_fused,
        )

        groups = math.gcd(x.shape[-1], self.num_groups)
        if _pallas_opted_in() and supports_fused(x.shape, groups):
            from ..ops.group_norm import fused_group_norm

            scale, bias = _NormParams(x.shape[-1], name="norm")()
            return fused_group_norm(
                x, scale, bias, num_groups=groups, eps=self.epsilon,
                act=self.act,
            )
        use_pallas_stats = _pallas_gn_opted_in() and group_stats_supported(
            x.shape
        )
        if _twostage_opted_in() or use_pallas_stats:
            # pure-XLA two-stage stats: reduce over spatial dims first with
            # the channel dim lane-aligned, then the tiny per-group combine —
            # sidesteps XLA's grouped-reduce layout churn while keeping the
            # apply as fusable jnp elementwise ops.
            c = x.shape[-1]
            n = x.shape[0]
            cpg = c // groups
            scale, bias = _NormParams(c, name="norm")()
            if use_pallas_stats:
                # streaming Pallas stats kernel (HI3D_GN=pallas): one HBM
                # read of x; apply below stays jnp/fusable
                gm, inv = pallas_group_stats(x, groups, self.epsilon)
            else:
                gm, inv = _group_stats(x, groups, self.epsilon)  # (N, g) fp32
            mul = (
                scale.astype(jnp.float32).reshape(1, groups, cpg)
                * inv[:, :, None]
            ).reshape(n, c)
            add = (
                bias.astype(jnp.float32).reshape(1, groups, cpg)
                - gm[:, :, None] * scale.astype(jnp.float32).reshape(1, groups, cpg)
                * inv[:, :, None]
            ).reshape(n, c)
            bshape = (n,) + (1,) * (x.ndim - 2) + (c,)
            y = x.astype(jnp.float32) * mul.reshape(bshape) + add.reshape(bshape)
            y = y.astype(x.dtype)
            if self.act == "silu":
                y = nn.silu(y)
            return y
        y = nn.GroupNorm(
            num_groups=groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            name="norm",
        )(x.astype(jnp.float32))
        y = y.astype(x.dtype)
        if self.act == "silu":
            y = nn.silu(y)
        return y


def _pad_for(kernel: Sequence[int]):
    return [(k // 2, k // 2) for k in kernel]


class ResBlock(nn.Module):
    """Residual block: GN→SiLU→conv, +t-emb, GN→SiLU→zero-conv, skip.

    `dims=2` operates on (N, H, W, C); `dims=3` on (B, T, H, W, C) with an
    arbitrary kernel (Hi3D's time-stack uses (3, 1, 1)). With
    `exchange_temb_dims`, `emb` is (B, T, E) and is added per-(B, T, C).
    """

    out_channels: int
    dropout: float = 0.0
    dims: int = 2
    kernel_size: Union[int, Sequence[int]] = 3
    exchange_temb_dims: bool = False
    use_scale_shift_norm: bool = False
    skip_t_emb: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, emb: Optional[jax.Array], deterministic: bool = True
    ) -> jax.Array:
        in_ch = x.shape[-1]
        if isinstance(self.kernel_size, int):
            kernel = (self.kernel_size,) * self.dims
        else:
            kernel = tuple(self.kernel_size)

        # (kt, 1, 1) time-stack convs: pick the lowering (see _time_conv_mode)
        is_time_kernel = (
            self.dims == 3 and len(kernel) == 3 and kernel[1:] == (1, 1)
        )
        mode = _time_conv_mode() if is_time_kernel else "conv"
        time_matmul = is_time_kernel and mode == "matmul"
        time_4d = is_time_kernel and mode == "conv4d"

        orig_shape = x.shape
        if time_4d:
            # merge H·W: every op in this block is pointwise over (h, w), so
            # the whole ResBlock runs on (B, T, S, C) tokens and the conv
            # becomes the NHWC 2-D shape XLA lays out without relayouts
            b_, t_, h_, w_, c_ = x.shape
            x = x.reshape(b_, t_, h_ * w_, c_)

        def conv(name, zero_init=False):
            init = nn.initializers.zeros if zero_init else (
                nn.initializers.lecun_normal()
            )
            if time_matmul:
                return TimeKernelConv(
                    self.out_channels,
                    kt=kernel[0],
                    dtype=self.dtype,
                    kernel_init=init,
                    name=name,
                )
            if time_4d:
                return TimeConv4D(
                    self.out_channels,
                    kt=kernel[0],
                    dtype=self.dtype,
                    kernel_init=init,
                    name=name,
                )
            return nn.Conv(
                self.out_channels,
                kernel,
                padding=_pad_for(kernel),
                kernel_init=init,
                dtype=self.dtype,
                name=name,
            )

        h = GroupNorm32(act="silu", name="in_layers_0")(x)
        h = conv("in_layers_2")(h)

        if not self.skip_t_emb:
            emb_dim = (
                2 * self.out_channels
                if self.use_scale_shift_norm
                else self.out_channels
            )
            emb_out = nn.Dense(emb_dim, dtype=self.dtype, name="emb_layers_1")(
                nn.silu(emb.astype(self.dtype))
            )
            # broadcast over the spatial axes (channels-last: insert size-1
            # axes just before C); with exchange_temb_dims the leading axes are
            # (B, T) instead of (N,), which this reshape handles uniformly
            emb_out = emb_out.reshape(
                emb_out.shape[:-1] + (1,) * (h.ndim - emb_out.ndim) + emb_out.shape[-1:]
            )
        else:
            emb_out = None

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_layers_0")(h) * (1 + scale) + shift
            h = nn.silu(h)
        else:
            if emb_out is not None:
                h = h + emb_out.astype(h.dtype)
            h = GroupNorm32(act="silu", name="out_layers_0")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = conv("out_layers_3", zero_init=True)(h)

        if self.out_channels == in_ch:
            skip = x
        elif time_4d:
            # param shape (1,1,1,C_in,C_out) matches nn.Conv((1,1,1))
            skip = TimeConv4D(
                self.out_channels, kt=1, dtype=self.dtype,
                name="skip_connection",
            )(x)
        else:
            skip = nn.Conv(
                self.out_channels,
                (1,) * self.dims,
                dtype=self.dtype,
                name="skip_connection",
            )(x)
        out = skip + h
        if time_4d:
            out = out.reshape(orig_shape[:-1] + (self.out_channels,))
        return out


class Upsample(nn.Module):
    """Nearest ×2 upsample (+3×3 conv) on (N, H, W, C)."""

    out_channels: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.use_conv:
            x = nn.Conv(
                self.out_channels,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
                name="conv",
            )(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3×3 conv downsample on (N, H, W, C)."""

    out_channels: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.use_conv:
            return nn.Conv(
                self.out_channels,
                (3, 3),
                strides=(2, 2),
                padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
                name="op",
            )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class AlphaBlender(nn.Module):
    """Learned sigmoid blend of spatial vs temporal branches.

    alpha · x_spatial + (1 − alpha) · x_temporal, where alpha is 1 for batch
    entries flagged image-only (so video layers become a no-op on images).

    `mode` picks the broadcast layout of alpha computed from the (B, T)
    indicator:
      - "video5d": alpha → (B, T, 1, 1, 1) for (B, T, H, W, C) tensors
      - "tokens3d": alpha → (B·T, 1, 1) for (B·T, S, C) tensors
    """

    alpha: float = 0.5
    merge_strategy: str = "learned_with_images"
    mode: str = "video5d"

    @nn.compact
    def __call__(
        self,
        x_spatial: jax.Array,
        x_temporal: jax.Array,
        image_only_indicator: Optional[jax.Array] = None,
    ) -> jax.Array:
        if self.merge_strategy == "fixed":
            alpha = jnp.float32(self.alpha)
        elif self.merge_strategy in ("learned", "learned_with_images"):
            mix = self.param(
                "mix_factor",
                lambda _key: jnp.full((1,), self.alpha, dtype=jnp.float32),
            )
            alpha = jax.nn.sigmoid(mix)[0]
            if self.merge_strategy == "learned_with_images":
                if image_only_indicator is None:
                    raise ValueError("learned_with_images needs image_only_indicator")
                alpha = jnp.where(
                    image_only_indicator.astype(bool), jnp.float32(1.0), alpha
                )  # (B, T)
                if self.mode == "video5d":
                    alpha = alpha[:, :, None, None, None]
                elif self.mode == "tokens3d":
                    alpha = alpha.reshape(-1)[:, None, None]
                else:
                    raise ValueError(f"unknown AlphaBlender mode {self.mode!r}")
        else:
            raise ValueError(f"unknown merge strategy {self.merge_strategy!r}")

        alpha = jnp.asarray(alpha, dtype=x_spatial.dtype)
        return alpha * x_spatial + (1.0 - alpha) * x_temporal
