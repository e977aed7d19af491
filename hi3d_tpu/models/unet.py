"""VideoUNet — the SVD-style spatio-temporal denoising UNet.

Functional parity targets (reference file:line):
- VideoResBlock: sgm/modules/diffusionmodules/video_model.py:12-81 — a 2-D
  ResBlock followed by a 3-D `time_stack` ResBlock (kernel (3,1,1) over
  (T,H,W)) whose outputs are alpha-blended per (video, frame).
- VideoUNet: video_model.py:84-501 — 4 levels, model_channels 320,
  channel_mult (1,2,4,4), 2 res blocks/level, SpatialVideoTransformer at
  downsample ratios {1,2,4}, head_dim 64, context_dim 1024, `sequential`
  label-embedding MLP over the adm vector; the forward broadcast of per-video
  y/context to per-frame (video_model.py:459-465) is preserved.

Layout: x is (B·T, H, W, C_in) channels-last; timesteps (B·T,); context
(B or B·T, S_ctx, 1024); y (B or B·T, adm_in_channels).

TPU-first notes:
- Static block plan built from the config at trace time — the compiled graph
  is a flat sequence of convs/attention with no Python dispatch left.
- `use_checkpoint` applies flax remat to each (VideoResBlock,
  SpatialVideoTransformer) pair for training-memory parity with the
  reference's torch.utils.checkpoint usage.
- Skip connections concatenate on the trailing (channel) axis — free in NHWC.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import (
    AlphaBlender,
    Downsample,
    GroupNorm32,
    ResBlock,
    Upsample,
    timestep_embedding,
)
from .attention import SpatialTransformer
from .video_attention import SpatialVideoTransformer

Dtype = Any


def _remat_policy():
    """Rematerialisation policy for `use_checkpoint`, from HI3D_REMAT_POLICY.

    - "none" (default): save nothing — exact parity with the reference's
      torch.utils.checkpoint (train-v01.yaml:36), minimum memory.
    - "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable —
      keep matmul outputs (qkv/proj/FF Dense layers) and only recompute the
      cheap elementwise/norm work in the backward pass. Spends activation
      memory to cut the recompute FLOPs; wins when the chip has HBM headroom
      (e.g. the single-chip SVD-adaptation fine-tune at 512²).
    """
    import os

    name = os.environ.get("HI3D_REMAT_POLICY", "none")
    if name in ("none", "", "full"):
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name == "all":
        # everything_saveable turns each remat into a no-op (all residuals
        # kept) without changing the block structure — the "no recompute"
        # bracket of the memory/time tradeoff
        return jax.checkpoint_policies.everything_saveable
    raise ValueError(f"unknown HI3D_REMAT_POLICY={name!r} (none|dots|all)")


class VideoResBlock(nn.Module):
    """Spatial ResBlock + temporal time-stack ResBlock, alpha-blended."""

    out_channels: int
    dropout: float = 0.0
    video_kernel_size: Union[int, Sequence[int]] = (3, 1, 1)
    merge_strategy: str = "learned_with_images"
    merge_factor: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        emb: jax.Array,
        num_video_frames: int,
        image_only_indicator: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        t = num_video_frames
        bt, h, w, _ = x.shape
        b = bt // t

        x = ResBlock(
            out_channels=self.out_channels,
            dropout=self.dropout,
            dims=2,
            dtype=self.dtype,
            name="spatial",
        )(x, emb, deterministic=deterministic)

        x_5d = x.reshape(b, t, h, w, self.out_channels)
        x_temporal = ResBlock(
            out_channels=self.out_channels,
            dropout=self.dropout,
            dims=3,
            kernel_size=self.video_kernel_size,
            exchange_temb_dims=True,
            dtype=self.dtype,
            name="time_stack",
        )(x_5d, emb.reshape(b, t, emb.shape[-1]), deterministic=deterministic)

        x_5d = AlphaBlender(
            alpha=self.merge_factor,
            merge_strategy=self.merge_strategy,
            mode="video5d",
            name="time_mixer",
        )(
            x_spatial=x_5d,
            x_temporal=x_temporal,
            image_only_indicator=image_only_indicator,
        )
        return x_5d.reshape(bt, h, w, self.out_channels)


def _build_plan(
    model_channels: int,
    channel_mult: Sequence[int],
    num_res_blocks: int,
    attention_resolutions: Sequence[int],
    transformer_depth: Sequence[int],
    num_head_channels: int,
):
    """Static layer plan: (input_blocks, middle, output_blocks, out_ch).

    Mirrors the constructor loops of reference video_model.py:256-440.
    Each block is a list of ("res", out_ch) / ("attn", ch, depth) /
    ("down", ch) / ("up", ch) layer specs.
    """
    input_blocks: List[List[Tuple]] = [[("conv_in", model_channels)]]
    input_chans = [model_channels]
    ch = model_channels
    ds = 1
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            layers: List[Tuple] = [("res", mult * model_channels)]
            ch = mult * model_channels
            if ds in attention_resolutions:
                layers.append(("attn", ch, transformer_depth[level]))
            input_blocks.append(layers)
            input_chans.append(ch)
        if level != len(channel_mult) - 1:
            ds *= 2
            input_blocks.append([("down", ch)])
            input_chans.append(ch)

    middle = [("res", ch), ("attn", ch, transformer_depth[-1]), ("res", ch)]

    output_blocks: List[List[Tuple]] = []
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for i in range(num_res_blocks + 1):
            input_chans.pop()
            layers = [("res", model_channels * mult)]
            ch = model_channels * mult
            if ds in attention_resolutions:
                layers.append(("attn", ch, transformer_depth[level]))
            if level and i == num_res_blocks:
                ds //= 2
                layers.append(("up", ch))
            output_blocks.append(layers)
    return input_blocks, middle, output_blocks, ch


class VideoUNet(nn.Module):
    """The denoising network shared by both Hi3D stages."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    num_classes: Optional[Union[int, str]] = None
    use_checkpoint: bool = False
    num_heads: int = -1
    num_head_channels: int = -1
    transformer_depth: Union[int, Sequence[int]] = 1
    context_dim: Optional[int] = None
    extra_ff_mix_layer: bool = False
    use_spatial_context: bool = False
    merge_strategy: str = "learned_with_images"
    merge_factor: float = 0.5
    video_kernel_size: Union[int, Sequence[int]] = 3
    use_linear_in_transformer: bool = False
    adm_in_channels: Optional[int] = None
    disable_temporal_crossattention: bool = False
    max_ddpm_temb_period: int = 10000
    dtype: Dtype = jnp.float32
    attn_backend: str = "auto"
    # accepted for YAML parity, unused on TPU (backend is chosen per-shape):
    spatial_transformer_attn_type: str = "softmax-xformers"

    def _heads_for(self, ch: int) -> Tuple[int, int]:
        if self.num_head_channels == -1:
            return self.num_heads, ch // self.num_heads
        return ch // self.num_head_channels, self.num_head_channels

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        context: Optional[jax.Array] = None,
        y: Optional[jax.Array] = None,
        time_context: Optional[jax.Array] = None,
        num_video_frames: Optional[int] = None,
        image_only_indicator: Optional[jax.Array] = None,
        deterministic: bool = True,
        encoder_cache: Optional[Tuple[Tuple[jax.Array, ...], jax.Array]] = None,
        return_encoder_cache: bool = False,
    ) -> jax.Array:
        """`encoder_cache`/`return_encoder_cache` implement encoder
        propagation (Faster Diffusion, arXiv 2312.09608): the input_blocks +
        middle_block activations change little between adjacent sampler
        steps, so a step may skip them and decode from the previous step's
        cached (skip_activations, middle_h). Opt-in approximation — exact
        when the cache comes from the same (x, timesteps); see
        diffusion-sampling turbo mode in pipelines/v2v.py."""
        bt = x.shape[0]
        t = num_video_frames

        depth_cfg = (
            [self.transformer_depth] * len(self.channel_mult)
            if isinstance(self.transformer_depth, int)
            else list(self.transformer_depth)
        )
        input_plan, middle_plan, output_plan, _ = _build_plan(
            self.model_channels,
            self.channel_mult,
            self.num_res_blocks,
            self.attention_resolutions,
            depth_cfg,
            self.num_head_channels,
        )

        t_emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(
            self.model_channels * 4, dtype=self.dtype, name="time_embed_0"
        )(t_emb.astype(self.dtype))
        emb = nn.Dense(
            self.model_channels * 4, dtype=self.dtype, name="time_embed_2"
        )(nn.silu(emb))

        # per-video → per-frame broadcast (reference video_model.py:459-465)
        if y is not None and y.shape[0] != bt and bt // y.shape[0] == t:
            y = jnp.repeat(y, t, axis=0)
        if (
            context is not None
            and context.shape[0] != bt
            and bt // context.shape[0] == t
        ):
            context = jnp.repeat(context, t, axis=0)

        if self.num_classes is not None:
            if self.num_classes != "sequential":
                raise NotImplementedError(
                    f"num_classes={self.num_classes!r} not supported (Hi3D uses 'sequential')"
                )
            lab = nn.Dense(
                self.model_channels * 4, dtype=self.dtype, name="label_emb_0_0"
            )(y.astype(self.dtype))
            lab = nn.Dense(
                self.model_channels * 4, dtype=self.dtype, name="label_emb_0_2"
            )(nn.silu(lab))
            emb = emb + lab

        res_cls = VideoResBlock
        attn_cls = SpatialVideoTransformer
        if self.use_checkpoint:
            # static_argnums index into (module, *call_args): num_video_frames
            # is arg 3 of VideoResBlock, timesteps arg 4 of the transformer
            policy = _remat_policy()
            res_cls = nn.remat(
                VideoResBlock, static_argnums=(3,), policy=policy
            )
            attn_cls = nn.remat(
                SpatialVideoTransformer, static_argnums=(4,), policy=policy
            )

        def make_layer(spec, name):
            kind = spec[0]
            if kind == "conv_in":
                conv = nn.Conv(
                    spec[1], (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name=name,
                )
                return lambda h: conv(h)
            if kind == "res":
                block = res_cls(
                    out_channels=spec[1],
                    dropout=self.dropout,
                    video_kernel_size=self.video_kernel_size,
                    merge_strategy=self.merge_strategy,
                    merge_factor=self.merge_factor,
                    dtype=self.dtype,
                    name=name,
                )
                return lambda h: block(h, emb, t, image_only_indicator)
            if kind == "attn":
                heads, dim_head = self._heads_for(spec[1])
                block = attn_cls(
                    heads=heads,
                    dim_head=dim_head,
                    depth=spec[2],
                    use_linear=self.use_linear_in_transformer,
                    use_spatial_context=self.use_spatial_context,
                    ff_in=self.extra_ff_mix_layer,
                    merge_strategy=self.merge_strategy,
                    merge_factor=self.merge_factor,
                    disable_temporal_crossattention=self.disable_temporal_crossattention,
                    max_time_embed_period=self.max_ddpm_temb_period,
                    dtype=self.dtype,
                    attn_backend=self.attn_backend,
                    name=name,
                )
                return lambda h: block(
                    h, context, time_context, t, image_only_indicator
                )
            if kind == "down":
                block = Downsample(spec[1], dtype=self.dtype, name=name)
                return lambda h: block(h)
            if kind == "up":
                block = Upsample(spec[1], dtype=self.dtype, name=name)
                return lambda h: block(h)
            raise ValueError(kind)

        if encoder_cache is None:
            h = x.astype(self.dtype)
            skips = []
            for i, block in enumerate(input_plan):
                for j, spec in enumerate(block):
                    h = make_layer(spec, f"input_blocks_{i}_{j}")(h)
                skips.append(h)

            for j, spec in enumerate(middle_plan):
                h = make_layer(spec, f"middle_block_{j}")(h)
        else:
            skips_t, h = encoder_cache
            skips = list(skips_t)
        cache = (tuple(skips), h)
        skips = list(skips)  # keep `cache` intact while the decoder pops

        for i, block in enumerate(output_plan):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            for j, spec in enumerate(block):
                h = make_layer(spec, f"output_blocks_{i}_{j}")(h)

        h = GroupNorm32(act="silu", name="out_0")(h)
        h = nn.Conv(
            self.out_channels,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="out_2",
        )(h)
        if return_encoder_cache:
            return h, cache
        return h


class UNetModel(nn.Module):
    """Legacy 2-D image UNet (reference openaimodel.py:472-853) — the SD/SDXL
    denoiser family. Shares the static block plan, ResBlock, and
    SpatialTransformer with VideoUNet, minus every temporal component; kept
    as a first-class model so image-diffusion configs (sgm's t2i surface)
    run on the same engine.

    Layout: x (B, H, W, C_in); timesteps (B,); context (B, S_ctx, D);
    y (B,) int labels or (B, adm_in_channels) vectors.
    """

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    num_classes: Optional[Union[int, str]] = None
    use_checkpoint: bool = False
    num_heads: int = -1
    num_head_channels: int = -1
    transformer_depth: Union[int, Sequence[int]] = 1
    context_dim: Optional[int] = None
    use_linear_in_transformer: bool = False
    adm_in_channels: Optional[int] = None
    dtype: Dtype = jnp.float32
    attn_backend: str = "auto"
    spatial_transformer_attn_type: str = "softmax-xformers"  # YAML parity

    def _heads_for(self, ch: int) -> Tuple[int, int]:
        if self.num_head_channels == -1:
            if self.num_heads == -1:
                raise ValueError(
                    "either num_heads or num_head_channels must be set"
                )
            return self.num_heads, ch // self.num_heads
        return ch // self.num_head_channels, self.num_head_channels

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        context: Optional[jax.Array] = None,
        y: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        depth_cfg = (
            [self.transformer_depth] * len(self.channel_mult)
            if isinstance(self.transformer_depth, int)
            else list(self.transformer_depth)
        )
        input_plan, middle_plan, output_plan, _ = _build_plan(
            self.model_channels,
            self.channel_mult,
            self.num_res_blocks,
            self.attention_resolutions,
            depth_cfg,
            self.num_head_channels,
        )

        t_emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(
            self.model_channels * 4, dtype=self.dtype, name="time_embed_0"
        )(t_emb.astype(self.dtype))
        emb = nn.Dense(
            self.model_channels * 4, dtype=self.dtype, name="time_embed_2"
        )(nn.silu(emb))

        if self.num_classes is not None:
            if self.num_classes == "sequential":
                lab = nn.Dense(
                    self.model_channels * 4, dtype=self.dtype,
                    name="label_emb_0_0",
                )(y.astype(self.dtype))
                lab = nn.Dense(
                    self.model_channels * 4, dtype=self.dtype,
                    name="label_emb_0_2",
                )(nn.silu(lab))
            elif self.num_classes == "continuous":
                lab = nn.Dense(
                    self.model_channels * 4, dtype=self.dtype, name="label_emb"
                )(y.astype(self.dtype)[:, None])
            elif isinstance(self.num_classes, int):
                lab = nn.Embed(
                    self.num_classes, self.model_channels * 4,
                    dtype=self.dtype, name="label_emb",
                )(y.astype(jnp.int32))
            else:
                raise NotImplementedError(
                    f"num_classes={self.num_classes!r} unsupported"
                )
            emb = emb + lab

        res_cls = ResBlock
        attn_cls = SpatialTransformer
        if self.use_checkpoint:
            policy = _remat_policy()
            res_cls = nn.remat(ResBlock, policy=policy)
            attn_cls = nn.remat(SpatialTransformer, policy=policy)

        def make_layer(spec, name):
            kind = spec[0]
            if kind == "conv_in":
                conv = nn.Conv(
                    spec[1], (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name=name,
                )
                return lambda h: conv(h)
            if kind == "res":
                block = res_cls(
                    out_channels=spec[1],
                    dropout=self.dropout,
                    dims=2,
                    dtype=self.dtype,
                    name=name,
                )
                return lambda h: block(h, emb, deterministic=deterministic)
            if kind == "attn":
                heads, dim_head = self._heads_for(spec[1])
                block = attn_cls(
                    heads=heads,
                    dim_head=dim_head,
                    depth=spec[2],
                    use_linear=self.use_linear_in_transformer,
                    dtype=self.dtype,
                    attn_backend=self.attn_backend,
                    name=name,
                )
                return lambda h: block(h, context=context)
            if kind == "down":
                block = Downsample(spec[1], dtype=self.dtype, name=name)
                return lambda h: block(h)
            if kind == "up":
                block = Upsample(spec[1], dtype=self.dtype, name=name)
                return lambda h: block(h)
            raise ValueError(kind)

        h = x.astype(self.dtype)
        skips = []
        for i, block in enumerate(input_plan):
            for j, spec in enumerate(block):
                h = make_layer(spec, f"input_blocks_{i}_{j}")(h)
            skips.append(h)

        for j, spec in enumerate(middle_plan):
            h = make_layer(spec, f"middle_block_{j}")(h)

        for i, block in enumerate(output_plan):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            for j, spec in enumerate(block):
                h = make_layer(spec, f"output_blocks_{i}_{j}")(h)

        h = GroupNorm32(act="silu", name="out_0")(h)
        h = nn.Conv(
            self.out_channels,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="out_2",
        )(h)
        return h
