"""Spatial transformer stack for the UNet.

Functional parity targets (reference file:line):
- CrossAttention / MemoryEfficientCrossAttention: sgm/modules/attention.py
  :260-453 (both are the same math; backend selection happens in
  hi3d_tpu.ops.attention instead of at module-construction time)
- GEGLU / FeedForward: attention.py:87-113
- BasicTransformerBlock: attention.py:456-572
- SpatialTransformer: attention.py:619-723 (use_linear=True path, the one both
  Hi3D configs select via `use_linear_in_transformer: True`)

Layout: token tensors are (N, S, C). LayerNorms run in fp32 (torch autocast
semantics); GELU is the exact (erf) variant like torch's default.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.attention import dot_product_attention
from .layers import GroupNorm32

Dtype = Any


def _ln_matmul() -> bool:
    """HI3D_LN=matmul computes LayerNorm statistics as (M, C)·(C, 8) MXU
    matmuls instead of VPU cross-lane reductions. XLA lowers the lane-axis
    reduce as a ~7-step in-register shuffle tree, which profiles ~6× off HBM
    speed at the UNet's LN sites (~140 ms/step total, tools/profile_step.py);
    the MXU contracts the lane dimension natively. Opt-in pending full-step
    A/B."""
    import os

    return os.environ.get("HI3D_LN", "") == "matmul"


def _ln_pallas() -> bool:
    """HI3D_LN=pallas computes LayerNorm statistics with a streaming Pallas
    stats kernel (ops.group_norm.pallas_row_stats) — one HBM read of x — and
    keeps the normalize/affine apply in jnp where XLA fuses it into the
    neighbouring matmul. Motivated by the stage-2 profile: the LN
    convert_reduce fusions cost ~11 ms each at the 16384-token sites, ~25×
    off their streaming floor."""
    import os

    return os.environ.get("HI3D_LN", "") == "pallas"


class LayerNorm32(nn.Module):
    """LayerNorm computed in fp32, cast back to input dtype (eps matches torch)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if _ln_pallas():
            from ..ops.group_norm import pallas_row_stats, row_stats_supported

            if row_stats_supported(x.shape):
                from .layers import _NormParams

                c = x.shape[-1]
                scale, bias = _NormParams(c, name="norm")()
                mean, inv = pallas_row_stats(x.reshape(-1, c), self.epsilon)
                st_shape = x.shape[:-1] + (1,)
                xf = x.astype(jnp.float32)
                y = (xf - mean.reshape(st_shape)) * inv.reshape(st_shape)
                y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
                return y.astype(x.dtype)
        if _ln_matmul():
            from .layers import _NormParams

            c = x.shape[-1]
            scale, bias = _NormParams(c, name="norm")()
            xf = x.astype(jnp.float32)
            rows = xf.reshape(-1, c)
            # (C, 8) ones-in-column-0 keeps XLA from canonicalizing the dot
            # back into a reduce; the 7 zero columns are free next to the
            # HBM-bound read of x
            w = jnp.zeros((c, 8), jnp.float32).at[:, 0].set(1.0)
            # HIGHEST keeps the fp32 operands un-truncated on the MXU —
            # DEFAULT would round mean/variance inputs to bf16 on TPU
            s1 = jax.lax.dot(
                rows, w, precision=jax.lax.Precision.HIGHEST
            )[:, 0].reshape(x.shape[:-1])
            s2 = jax.lax.dot(
                rows * rows, w, precision=jax.lax.Precision.HIGHEST
            )[:, 0].reshape(x.shape[:-1])
            mean = s1 / c
            var = jnp.maximum(s2 / c - mean * mean, 0.0)
            inv = jax.lax.rsqrt(var + self.epsilon)
            y = (xf - mean[..., None]) * inv[..., None]
            y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
            return y.astype(x.dtype)
        y = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)
        )
        return y.astype(x.dtype)


def _flash_padpack() -> bool:
    """HI3D_FLASH_PADPACK=1 routes flash-eligible SELF-attention sites
    through the packed-heads kernel with head dims zero-padded 64→128 in
    the projection weights. EXACT: padded q/k lanes contribute zero to
    every score, padded v lanes produce zero output lanes, and the
    out-projection's correspondingly padded rows ignore them. What it buys:
    the packed layout is a free reshape of the projection output, so the
    (B,S,H,D)→(B·H,S,D) transposes the 3-D kernel needs vanish — profiled
    at ~150 ms of the 2.34 s stage-2 step (copy bucket + transposed-layout
    fusions, BASELINE.md round-3). Cost: q/k/v/out projections compute 2×
    lanes, and the kernel streams 2× bytes per k/v tile. MEASURED round 4
    (BASELINE.md round-4 closure): 0.425 vs 0.4437 steps/s stage-2 —
    the padded-lane compute (+4.5% TF/step) repays the saved transposes
    exactly (MFU unchanged); kept opt-in, closed by measurement."""
    import os

    return os.environ.get("HI3D_FLASH_PADPACK", "0") == "1"


class _PadHeadDense(nn.Module):
    """nn.Dense(heads·dim_head, use_bias=False) whose per-head output lanes
    are zero-padded to `pad_to` at apply time (param tree unchanged)."""

    heads: int
    dim_head: int
    pad_to: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (cin, self.heads * self.dim_head),
        )
        w = kernel.reshape(cin, self.heads, self.dim_head)
        w = jnp.pad(w, ((0, 0), (0, 0), (0, self.pad_to - self.dim_head)))
        w = w.reshape(cin, self.heads * self.pad_to).astype(self.dtype)
        return x.astype(self.dtype) @ w


class _PadHeadOutDense(nn.Module):
    """nn.Dense(features) consuming packed (B, S, heads·pad_to) tokens:
    kernel rows are zero-padded per head to match (param tree unchanged)."""

    features: int
    heads: int
    dim_head: int
    pad_to: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.heads * self.dim_head, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        w = kernel.reshape(self.heads, self.dim_head, self.features)
        w = jnp.pad(
            w, ((0, 0), (0, self.pad_to - self.dim_head), (0, 0))
        ).reshape(self.heads * self.pad_to, self.features)
        return xp.astype(self.dtype) @ w.astype(self.dtype) + bias.astype(
            self.dtype
        )


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when `context` is None.

    `seg_len > 0` makes self-attention SEGMENT-LOCAL: token i attends token
    j iff i//seg_len == j//seg_len. Used by the grouped temporal path
    (models.video_attention): frame-axis attention over location-major
    (B, S·T, C) tokens with seg_len = T. Cross-attention calls (context
    given) are unaffected."""

    heads: int
    dim_head: int
    out_dim: Optional[int] = None  # defaults to query dim
    dtype: Dtype = jnp.float32
    backend: str = "auto"
    seg_len: int = 0

    @nn.compact
    def __call__(
        self, x: jax.Array, context: Optional[jax.Array] = None
    ) -> jax.Array:
        inner = self.heads * self.dim_head
        out_dim = self.out_dim if self.out_dim is not None else x.shape[-1]
        ctx = x if context is None else context

        if (
            _flash_padpack()
            and context is None
            and not self.seg_len  # packed kernel has no block-diagonal mask:
            # grouped-mode temporal sites (seg_len=T) must NOT take it, or
            # frame-local attention silently becomes global attention
            and self.backend in ("auto", "flash")
            and 0 < self.dim_head < 128
        ):
            from ..ops.attention import flash_self_attention_engages

            if flash_self_attention_engages(x.shape[1], ctx.shape[1]):
                from ..ops.flash_attention import flash_attention_packed

                pad_to = 128
                qp = _PadHeadDense(
                    self.heads, self.dim_head, pad_to, dtype=self.dtype,
                    name="to_q",
                )(x)
                kp = _PadHeadDense(
                    self.heads, self.dim_head, pad_to, dtype=self.dtype,
                    name="to_k",
                )(ctx)
                vp = _PadHeadDense(
                    self.heads, self.dim_head, pad_to, dtype=self.dtype,
                    name="to_v",
                )(ctx)
                outp = flash_attention_packed(
                    qp, kp, vp, self.heads, scale=self.dim_head**-0.5
                )
                return _PadHeadOutDense(
                    out_dim, self.heads, self.dim_head, pad_to,
                    dtype=self.dtype, name="to_out_0",
                )(outp)

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.dim_head)
        k = k.reshape(b, sk, self.heads, self.dim_head)
        v = v.reshape(b, sk, self.heads, self.dim_head)

        if self.seg_len and context is None:
            out = _segment_local_attention(q, k, v, self.seg_len)
        else:
            out = dot_product_attention(q, k, v, backend=self.backend)
        out = out.reshape(b, sq, inner)
        return nn.Dense(out_dim, dtype=self.dtype, name="to_out_0")(out)


def _segment_local_attention(q, k, v, seg_len: int):
    """Block-diagonal self-attention on (B, S·T, H, D): the Pallas
    block-local kernel when enabled, else an exact XLA fallback that
    reshapes segments into the batch dim."""
    from ..ops.temporal_attention import kernel_enabled

    if kernel_enabled():
        from ..ops.temporal_attention import temporal_block_attention

        return temporal_block_attention(q, k, v, seg_len)
    from ..ops.attention import xla_attention

    b, st, h, d = q.shape
    seg = lambda x: x.reshape(b * st // seg_len, seg_len, h, d)
    return xla_attention(seg(q), seg(k), seg(v)).reshape(b, st, h, d)


class TimeAxisCrossAttention(nn.Module):
    """Multi-head attention along the frame axis of (B, T, S, C) tokens.

    Param tree (to_q/to_k/to_v/to_out_0) is identical to CrossAttention, so
    checkpoints load unchanged; only the contraction layout differs (see
    ops.attention.xla_attention_time). `context`, when given, is per-video
    (B, S_ctx, C_ctx) — NOT repeated per spatial location.
    """

    heads: int
    dim_head: int
    out_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, context: Optional[jax.Array] = None
    ) -> jax.Array:
        from ..ops.attention import xla_attention_time

        inner = self.heads * self.dim_head
        out_dim = self.out_dim if self.out_dim is not None else x.shape[-1]
        ctx = x if context is None else context

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        b, t, s, _ = q.shape
        q = q.reshape(b, t, s, self.heads, self.dim_head)
        kv_shape = (b,) + k.shape[1:-1] + (self.heads, self.dim_head)
        k = k.reshape(kv_shape)
        v = v.reshape(kv_shape)

        out = xla_attention_time(q, k, v)
        out = out.reshape(b, t, s, inner)
        return nn.Dense(out_dim, dtype=self.dtype, name="to_out_0")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        xg = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(xg, 2, axis=-1)
        return x * jax.nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """(GE)GLU MLP: dim → 4·dim → dim_out."""

    dim_out: Optional[int] = None
    mult: int = 4
    glu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = int(x.shape[-1] * self.mult)
        dim_out = self.dim_out if self.dim_out is not None else x.shape[-1]
        if self.glu:
            h = GEGLU(inner, dtype=self.dtype, name="net_0")(x)
        else:
            h = nn.Dense(inner, dtype=self.dtype, name="net_0")(x)
            h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(dim_out, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    """self-attn → cross-attn(context) → GEGLU FF, all residual."""

    heads: int
    dim_head: int
    disable_self_attn: bool = False
    dtype: Dtype = jnp.float32
    attn_backend: str = "auto"

    @nn.compact
    def __call__(
        self, x: jax.Array, context: Optional[jax.Array] = None
    ) -> jax.Array:
        attn = lambda name: CrossAttention(
            heads=self.heads,
            dim_head=self.dim_head,
            dtype=self.dtype,
            backend=self.attn_backend,
            name=name,
        )
        x = attn("attn1")(
            LayerNorm32(name="norm1")(x),
            context=context if self.disable_self_attn else None,
        ) + x
        x = attn("attn2")(LayerNorm32(name="norm2")(x), context=context) + x
        x = FeedForward(dtype=self.dtype, name="ff")(LayerNorm32(name="norm3")(x)) + x
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm → linear proj_in → transformer blocks over (H·W) tokens →
    linear proj_out → residual. (N, H, W, C) in/out."""

    heads: int
    dim_head: int
    depth: int = 1
    use_linear: bool = True
    disable_self_attn: bool = False
    dtype: Dtype = jnp.float32
    attn_backend: str = "auto"

    @nn.compact
    def __call__(
        self, x: jax.Array, context: Optional[jax.Array] = None
    ) -> jax.Array:
        n, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        x = GroupNorm32(name="norm")(x)
        if not self.use_linear:
            x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(n, h * w, x.shape[-1])
        if self.use_linear:
            x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)

        for i in range(self.depth):
            x = BasicTransformerBlock(
                heads=self.heads,
                dim_head=self.dim_head,
                disable_self_attn=self.disable_self_attn,
                dtype=self.dtype,
                attn_backend=self.attn_backend,
                name=f"transformer_blocks_{i}",
            )(x, context=context)

        if self.use_linear:
            x = nn.Dense(
                c, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                name="proj_out",
            )(x)
            x = x.reshape(n, h, w, c)
        else:
            x = x.reshape(n, h, w, inner)
            x = nn.Conv(
                c, (1, 1), kernel_init=nn.initializers.zeros, dtype=self.dtype,
                name="proj_out",
            )(x)
        return x + x_in
