"""Temporal (video) VAE decoder — SVD's "image decoder → video decoder".

Functional parity targets (reference file:line):
- VideoResBlock: sgm/modules/autoencoding/temporal_ae.py:18-84 — spatial
  ResnetBlock followed by an embedding-free 3-D `time_stack` ResBlock
  (openaimodel ResBlock with skip_t_emb, kernel = video_kernel_size over
  (T,H,W)); merged as `α·temporal + (1−α)·spatial` with α = σ(mix_factor)
  for the "learned" strategy (:56-63) — note the α weighting is on the
  TEMPORAL branch here, opposite to the diffusion UNet's AlphaBlender.
- AE3DConv: temporal_ae.py:86-107 — 2-D conv followed by a full 3-D
  `time_mix_conv` over (T,H,W).
- VideoBlock: temporal_ae.py:110-178 — single-head spatial attention +
  frame-position MLP + a 1-head VideoTransformerBlock (ff_in) across T,
  α-merged, then proj_out residual (time_mode "all").
- VideoDecoder: temporal_ae.py:293-349 — the plain VAE Decoder with
  ResnetBlocks/convs/attention swapped per `time_mode`
  ("all" | "conv-only" | "attn-only"); SVD ships time_mode "conv-only".

Layout: frames (B·T, H, W, C) channels-last; `timesteps` = T is static.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import timestep_embedding
from .vae import VaeAttnBlock, VaeGroupNorm, VaeResnetBlock, VaeUpsample
from .video_attention import VideoTransformerBlock

Dtype = Any


def _triple(k) -> Sequence[int]:
    return (k, k, k) if isinstance(k, int) else tuple(k)


class TimeStack3D(nn.Module):
    """Embedding-free 3-D ResBlock over (B, T, H, W, C) — the `time_stack`
    (openaimodel ResBlock with skip_t_emb=True, zero-init out conv)."""

    channels: int
    kernel: Union[int, Sequence[int]] = 3
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        k = _triple(self.kernel)
        pad = [(d // 2, d // 2) for d in k]
        h = VaeGroupNorm(name="in_layers_0")(x)
        h = nn.silu(h)
        h = nn.Conv(self.channels, k, padding=pad, dtype=self.dtype,
                    name="in_layers_2")(h)
        h = VaeGroupNorm(name="out_layers_0")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.channels, k, padding=pad,
                    kernel_init=nn.initializers.zeros, dtype=self.dtype,
                    name="out_layers_3")(h)
        return x + h


def _learned_alpha(module: nn.Module, alpha: float, merge_strategy: str):
    if merge_strategy == "fixed":
        return jnp.float32(alpha)
    if merge_strategy == "learned":
        mix = module.param(
            "mix_factor", lambda rng: jnp.full((1,), alpha, jnp.float32)
        )
        return jax.nn.sigmoid(mix)
    raise ValueError(f"unknown merge strategy {merge_strategy!r}")


class VaeVideoResBlock(nn.Module):
    """Spatial VAE ResnetBlock + temporal time_stack, α-merged."""

    out_channels: int
    dropout: float = 0.0
    video_kernel_size: Union[int, Sequence[int]] = 3
    alpha: float = 0.0
    merge_strategy: str = "learned"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: int,
        skip_video: bool = False,
        deterministic: bool = True,
    ) -> jax.Array:
        # spatial params live at THIS scope (torch VideoResBlock subclasses
        # ResnetBlock — temporal_ae.py:18-28), so inline rather than nest
        in_ch = x.shape[-1]
        h = VaeGroupNorm(name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="conv1")(h)
        h = VaeGroupNorm(name="norm2")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="nin_shortcut")(x)
        x = x + h

        if skip_video:
            return x
        t = timesteps
        bt, hh, ww, c = x.shape
        b = bt // t
        x5 = x.reshape(b, t, hh, ww, c)
        x_temporal = TimeStack3D(
            channels=self.out_channels,
            kernel=self.video_kernel_size,
            dropout=self.dropout,
            dtype=self.dtype,
            name="time_stack",
        )(x5, deterministic=deterministic)
        alpha = _learned_alpha(self, self.alpha, self.merge_strategy)
        x5 = alpha.astype(x5.dtype) * x_temporal + (1.0 - alpha).astype(
            x5.dtype
        ) * x5
        return x5.reshape(bt, hh, ww, c)


class AE3DConv(nn.Module):
    """2-D conv + 3-D time-mix conv (temporal_ae.py:86-107)."""

    out_channels: int
    video_kernel_size: Union[int, Sequence[int]] = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, timesteps: int, skip_video: bool = False
    ) -> jax.Array:
        # own-scope params so torch `conv_out.weight` maps to this module's
        # kernel and `conv_out.time_mix_conv.*` to the child
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.out_channels),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(self.dtype)
        if skip_video:
            return y
        t = timesteps
        bt, hh, ww, c = y.shape
        k = _triple(self.video_kernel_size)
        pad = [(d // 2, d // 2) for d in k]
        y5 = y.reshape(bt // t, t, hh, ww, c)
        y5 = nn.Conv(self.out_channels, k, padding=pad, dtype=self.dtype,
                     name="time_mix_conv")(y5)
        return y5.reshape(bt, hh, ww, c)


class VideoAttnBlock(nn.Module):
    """Spatial single-head attention + temporal mix block (time_mode 'all')."""

    alpha: float = 0.0
    merge_strategy: str = "learned"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, timesteps: int, skip_video: bool = False
    ) -> jax.Array:
        n, hh, ww, c = x.shape
        x_in = x
        hn = VaeGroupNorm(name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn).reshape(n, hh * ww, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn).reshape(n, hh * ww, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn).reshape(n, hh * ww, c)
        logits = jnp.einsum("nqc,nkc->nqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits.astype(jnp.float32) * (c**-0.5), axis=-1)
        h = jnp.einsum(
            "nqk,nkc->nqc", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)  # (B·T, S, C)

        if not skip_video:
            t = timesteps
            frame_idx = jnp.tile(jnp.arange(t, dtype=jnp.float32), (n // t,))
            t_emb = timestep_embedding(frame_idx, c)
            emb = nn.Dense(4 * c, dtype=self.dtype, name="video_time_embed_0")(
                t_emb.astype(self.dtype)
            )
            emb = nn.Dense(c, dtype=self.dtype, name="video_time_embed_2")(
                nn.silu(emb)
            )
            x_mix = h + emb[:, None, :].astype(h.dtype)
            x_mix = VideoTransformerBlock(
                heads=1, dim_head=c, ff_in=True, dtype=self.dtype,
                name="time_mix_block",
            )(x_mix, timesteps=t)
            alpha = _learned_alpha(self, self.alpha, self.merge_strategy)
            h = alpha.astype(h.dtype) * h + (1.0 - alpha).astype(h.dtype) * x_mix

        h = h.reshape(n, hh, ww, c)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return x_in + h


class VideoDecoder(nn.Module):
    """Plain VAE decoder with per-`time_mode` temporal swaps
    (temporal_ae.py:293-349). SVD's image-decoder checkpoint is 'conv-only'."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    out_ch: int = 3
    dropout: float = 0.0
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    in_channels: int = 3
    double_z: bool = True  # config parity
    attn_type: str = "vanilla"
    video_kernel_size: Union[int, Sequence[int]] = 3
    alpha: float = 0.0
    merge_strategy: str = "learned"
    time_mode: str = "conv-only"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        z: jax.Array,
        timesteps: int,
        skip_video: bool = False,
        deterministic: bool = True,
    ) -> jax.Array:
        if self.time_mode not in ("all", "conv-only", "attn-only"):
            raise ValueError(f"time_mode {self.time_mode!r}")
        conv_temporal = self.time_mode != "attn-only"
        res_temporal = self.time_mode != "attn-only"
        attn_temporal = self.time_mode not in ("conv-only",)

        def res(name, out_ch, h):
            if res_temporal:
                return VaeVideoResBlock(
                    out_ch, self.dropout, self.video_kernel_size, self.alpha,
                    self.merge_strategy, dtype=self.dtype, name=name,
                )(h, timesteps, skip_video=skip_video,
                  deterministic=deterministic)
            return VaeResnetBlock(out_ch, self.dropout, dtype=self.dtype,
                                  name=name)(h, deterministic=deterministic)

        def attn(name, h):
            if attn_temporal:
                return VideoAttnBlock(
                    self.alpha, self.merge_strategy, dtype=self.dtype,
                    name=name,
                )(h, timesteps, skip_video=skip_video)
            return VaeAttnBlock(dtype=self.dtype, name=name)(h)

        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="conv_in")(z.astype(self.dtype))
        h = res("mid_block_1", block_in, h)
        h = attn("mid_attn_1", h)
        h = res("mid_block_2", block_in, h)

        for i in reversed(range(len(self.ch_mult))):
            block_out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks + 1):
                h = res(f"up_{i}_block_{j}", block_out, h)
            if i != 0:
                h = VaeUpsample(dtype=self.dtype, name=f"up_{i}_upsample")(h)

        h = VaeGroupNorm(name="norm_out")(h)
        h = nn.silu(h)
        if conv_temporal:
            return AE3DConv(
                self.out_ch, self.video_kernel_size, dtype=self.dtype,
                name="conv_out",
            )(h, timesteps, skip_video=skip_video)
        return nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, name="conv_out")(h)
