"""Temporal transformer stack: attention across the T=16 frame axis.

Functional parity targets (reference file:line):
- VideoTransformerBlock: sgm/modules/video_attention.py:15-144 — tokens are
  rearranged (B·T, S, C) → (B·S, T, C) so each spatial location attends over
  the frame axis; optional GEGLU ff_in (Hi3D sets extra_ff_mix_layer=True),
  temporal self-attn, temporal cross-attn against the per-video CLIP token,
  GEGLU FF, all residual.
- SpatialVideoTransformer: video_attention.py:146-301 — interleaves spatial
  BasicTransformerBlocks with temporal blocks, adds a learned frame-position
  embedding, and alpha-blends spatial vs temporal streams.

TPU note: the temporal factorization has seq_len = T (16) with an enormous
batch (B·H·W up to 16·128·128); a flash kernel has nothing to tile at seq 16,
so these blocks default to the fused-XLA attention path which keeps the MXU
busy with one big batched matmul (SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .attention import (
    BasicTransformerBlock,
    CrossAttention,
    FeedForward,
    LayerNorm32,
    TimeAxisCrossAttention,
)
from .layers import AlphaBlender, GroupNorm32, timestep_embedding

Dtype = Any


def _temporal_mode() -> str:
    """Token layout for the temporal blocks (HI3D_TEMPORAL_MODE). Param
    trees are identical in all modes; outputs match to dtype tolerance.
    Stage-2 full-step A/B on the v5e chip (block-local kernel on in all
    legs, HI3D_TEMPORAL_BLOCK=512):

    - "4d" (default, 0.4434 steps/s): tokens stay (B, T, S, C); attention
      via ops.attention.xla_attention_time, which dispatches to the
      block-local Pallas kernel (ops/temporal_attention.py) when supported.
      The kernel entry pays per-tensor transposes to the location-major
      layout, but XLA fuses them into the surrounding elementwise chains.
    - "grouped" (0.4316): ONE explicit transpose at block entry to
      location-major (B, S·T, C) tokens; attention becomes segment-local
      (seg_len = T); ff_in/attn2/ff run in the same layout and per-video
      context needs no repeat. Hoisting the transposes measured SLOWER than
      letting XLA place them per-tensor — kept as a bracket.
    - "flat" (round-1 bracket, slower still): the reference's (B·S, T, C)
      rearrange (sgm/modules/video_attention.py:113-114); repeats context
      per location.
    """
    import os

    legacy = os.environ.get("HI3D_TEMPORAL_4D")
    default = ("4d" if legacy == "1" else "flat") if legacy is not None else "4d"
    return os.environ.get("HI3D_TEMPORAL_MODE", default)


class VideoTransformerBlock(nn.Module):
    """Temporal transformer block on (B·T, S, C) tokens."""

    heads: int
    dim_head: int
    ff_in: bool = False
    disable_self_attn: bool = False
    disable_temporal_crossattention: bool = False
    switch_temporal_ca_to_sa: bool = False
    dtype: Dtype = jnp.float32
    attn_backend: str = "xla"  # seq=16: fused XLA attention wins over flash

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        timesteps: Optional[int] = None,
    ) -> jax.Array:
        bt, s, c = x.shape
        t = timesteps
        b = bt // t
        mode = _temporal_mode()
        if mode == "grouped":
            # ONE transpose to location-major (B, S·T, C); frame attention
            # becomes segment-local (seg_len = t); `context` stays per-video
            # (B, S_ctx, C) — batch unchanged, no repeat
            x = x.reshape(b, t, s, c).transpose(0, 2, 1, 3).reshape(b, s * t, c)
            attn = lambda name: CrossAttention(
                heads=self.heads,
                dim_head=self.dim_head,
                dtype=self.dtype,
                backend=self.attn_backend,
                seg_len=t,
                name=name,
            )
        elif mode == "4d":
            # tokens stay (B, T, S, C) — a free reshape — and attend over
            # the frame axis in place (ops.attention.xla_attention_time);
            # `context` stays per-video (B, S_ctx, C)
            x = x.reshape(b, t, s, c)
            attn = lambda name: TimeAxisCrossAttention(
                heads=self.heads,
                dim_head=self.dim_head,
                dtype=self.dtype,
                name=name,
            )
        else:
            # (B·T, S, C) -> (B·S, T, C): attend across frames per location
            x = x.reshape(b, t, s, c).transpose(0, 2, 1, 3).reshape(b * s, t, c)
            attn = lambda name: CrossAttention(
                heads=self.heads,
                dim_head=self.dim_head,
                dtype=self.dtype,
                backend=self.attn_backend,
                name=name,
            )

        if self.ff_in:
            x_skip = x
            x = FeedForward(dim_out=c, dtype=self.dtype, name="ff_in")(
                LayerNorm32(name="norm_in")(x)
            )
            x = x + x_skip  # is_res: inner_dim == dim for Hi3D

        if self.disable_self_attn:
            x = attn("attn1")(LayerNorm32(name="norm1")(x), context=context) + x
        else:
            x = attn("attn1")(LayerNorm32(name="norm1")(x)) + x

        if not self.disable_temporal_crossattention:
            if self.switch_temporal_ca_to_sa:
                x = attn("attn2")(LayerNorm32(name="norm2")(x)) + x
            else:
                x = attn("attn2")(LayerNorm32(name="norm2")(x), context=context) + x

        x_skip = x
        x = FeedForward(dtype=self.dtype, name="ff")(LayerNorm32(name="norm3")(x))
        x = x + x_skip

        # back to (B·T, S, C)
        if mode == "grouped":
            x = x.reshape(b, s, t, c).transpose(0, 2, 1, 3).reshape(b * t, s, c)
        elif mode == "4d":
            x = x.reshape(b * t, s, c)
        else:
            x = x.reshape(b, s, t, c).transpose(0, 2, 1, 3).reshape(b * t, s, c)
        return x


class SpatialVideoTransformer(nn.Module):
    """Spatial transformer blocks interleaved with temporal mix blocks.

    Input (B·T, H, W, C); `context` is per-frame crossattn conditioning
    (B·T, S_ctx, C_ctx). With `use_spatial_context` (Hi3D: True) the temporal
    blocks cross-attend to the first frame's context token per video.
    """

    heads: int
    dim_head: int
    depth: int = 1
    use_linear: bool = True
    use_spatial_context: bool = True
    ff_in: bool = True
    merge_strategy: str = "learned_with_images"
    merge_factor: float = 0.5
    disable_self_attn: bool = False
    disable_temporal_crossattention: bool = False
    max_time_embed_period: int = 10000
    dtype: Dtype = jnp.float32
    attn_backend: str = "auto"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        time_context: Optional[jax.Array] = None,
        timesteps: Optional[int] = None,
        image_only_indicator: Optional[jax.Array] = None,
    ) -> jax.Array:
        bt, h, w, c = x.shape
        t = timesteps
        b = bt // t
        inner = self.heads * self.dim_head
        x_in = x

        spatial_context = context
        flat_mode = _temporal_mode() == "flat"
        if self.use_spatial_context:
            # per-video context = first frame's tokens; the grouped and 4-D
            # temporal paths consume it as-is (batch stays B), the flattened
            # path repeats per location
            tc_first = context.reshape(b, t, *context.shape[1:])[:, 0]
            time_context = (
                jnp.repeat(tc_first, h * w, axis=0)  # (B·H·W, S, C)
                if flat_mode else tc_first
            )
        elif time_context is not None:
            if time_context.ndim == 2:
                time_context = time_context[:, None, :]
            if flat_mode:
                time_context = jnp.repeat(time_context, h * w, axis=0)

        x = GroupNorm32(name="norm")(x)
        if not self.use_linear:
            x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(bt, h * w, x.shape[-1])
        if self.use_linear:
            x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)

        # learned frame-position embedding, one vector per (video, frame)
        frame_idx = jnp.tile(jnp.arange(t, dtype=jnp.float32), (b,))  # (B·T,)
        t_emb = timestep_embedding(
            frame_idx, c, max_period=self.max_time_embed_period
        )
        emb = nn.Dense(c * 4, dtype=self.dtype, name="time_pos_embed_0")(
            t_emb.astype(self.dtype)
        )
        emb = nn.Dense(c, dtype=self.dtype, name="time_pos_embed_2")(nn.silu(emb))
        emb = emb[:, None, :]  # broadcast over tokens

        # one blender shared across depth iterations (reference keeps a single
        # self.time_mixer, video_attention.py:225-227)
        time_mixer = AlphaBlender(
            alpha=self.merge_factor,
            merge_strategy=self.merge_strategy,
            mode="tokens3d",
            name="time_mixer",
        )

        for i in range(self.depth):
            x = BasicTransformerBlock(
                heads=self.heads,
                dim_head=self.dim_head,
                disable_self_attn=self.disable_self_attn,
                dtype=self.dtype,
                attn_backend=self.attn_backend,
                name=f"transformer_blocks_{i}",
            )(x, context=spatial_context)

            x_mix = x + emb.astype(x.dtype)
            x_mix = VideoTransformerBlock(
                heads=self.heads,
                dim_head=self.dim_head,
                ff_in=self.ff_in,
                disable_self_attn=self.disable_self_attn,
                disable_temporal_crossattention=self.disable_temporal_crossattention,
                dtype=self.dtype,
                name=f"time_stack_{i}",
            )(x_mix, context=time_context, timesteps=t)

            x = time_mixer(
                x_spatial=x, x_temporal=x_mix, image_only_indicator=image_only_indicator
            )

        if self.use_linear:
            x = nn.Dense(
                c, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                name="proj_out",
            )(x)
            x = x.reshape(bt, h, w, c)
        else:
            x = x.reshape(bt, h, w, inner)
            x = nn.Conv(
                c, (1, 1), kernel_init=nn.initializers.zeros, dtype=self.dtype,
                name="proj_out",
            )(x)
        return x + x_in
