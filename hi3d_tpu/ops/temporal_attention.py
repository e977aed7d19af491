"""Block-local Pallas attention for the temporal (frame-axis) factorization.

The VideoUNet's time_stack blocks attend across T=16 frames at every spatial
location (reference sgm/modules/video_attention.py:61-73). Expressed as XLA
einsums over (B, T, S, H, D) tokens this is correct but layout-hostile: the
stage-2 profile (BASELINE.md round-3 itemization) shows each temporal
self-attention site paying 3 qkv layout copies, an f32 (B,S,H,T,T) logits
materialization, and (b·s·h)-batched 16×64 MXU dots — ~175 ms of the 2.34 s
step — for a compute whose streaming floor is ~2 ms.

TPU-first reformulation: order tokens LOCATION-MAJOR, FRAME-MINOR —
(B, S·T, C) — so frame-axis attention becomes attention over S·T-long
sequences with a block-diagonal mask (query i may attend key j iff
i//T == j//T). Because segments are T-contiguous and block sizes are chosen
as multiples of T, a query block only ever attends keys in ITS OWN block:
the kernel runs grid (B·H, S·T/blk) with k-tile ≡ q-tile — big MXU matmuls
((blk, d)·(d, blk) and (blk, blk)·(blk, d)), a one-shot fp32 softmax in
VMEM, no online-softmax state, and zero HBM traffic for the scores.

The mask wastes MXU slots (each 16-frame segment computes blk score columns
instead of 16) — but the MXU was idle in the einsum formulation anyway, and
the waste is pure compute: at blk=512, QK+PV for the whole stage-2 step is
~1 ms of MXU time. Softmax cost scales with blk, so blk stays moderate
(HI3D_TEMPORAL_BLOCK, default 512 — the full-step sweep optimum).

Backward: a single block-local kernel computes dq/dk/dv per tile from the
forward lse (FlashAttention-2 Δ-trick, no attention rematerialization in
XLA). Training sites sit under remat; both directions stay exact.

Two kernel layouts ship (HI3D_TEMPORAL_LAYOUT):
- "natural" (default): consumes the projection output layout (B, T, S, C)
  directly via full-channel BlockSpec tiles with a static in-kernel head
  loop — zero HBM layout changes in or out. Tokens are frame-major inside
  a tile, so the segment mask is strided (i % blk_s == j % blk_s); the
  backward recomputes softmax stats (no lse round-trip — the tile is its
  tokens' whole attention range).
- "lm": the round-3 location-major kernel behind explicit t<->s transposes
  (those transposes materialize as HBM copies — ~55 ms/step on the stage-2
  profile — which is why "natural" exists).

Parity: same math as ops.attention.xla_attention_time's self-attention
branch (fp32 softmax, fp32 accumulation); tested against it in
tests/test_temporal_kernel.py on CPU (interpret) and TPU.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LOG2_E = 1.4426950408889634
_LN_2 = 0.6931471805599453


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def kernel_enabled() -> bool:
    """Dispatch policy (HI3D_TEMPORAL_FUSED): "1" (default) engages the
    kernel on TPU only — interpret mode is exact but loops the grid as jax
    ops, far too slow for the real-shape CPU gates (same policy as
    ops.attention._flash_available); "force" engages everywhere (kernel
    unit tests); "0" disables."""
    mode = os.environ.get("HI3D_TEMPORAL_FUSED", "1")
    if mode == "force":
        return True
    return mode == "1" and not _interpret()


def default_block(seg: int, s_total: int) -> int:
    """Largest block ≤ HI3D_TEMPORAL_BLOCK that is a multiple of the segment
    length, divides the total token count, and is sublane-aligned (multiple
    of 8, Mosaic's f32 tile height). 0 when none exists. Default cap 512:
    the stage-2 full-step sweep measured 0.4338 / 0.4406 / 0.4434 steps/s at
    128 / 256 / 512 (bigger tiles amortize grid overhead faster than the
    masked-score waste grows)."""
    cap = int(os.environ.get("HI3D_TEMPORAL_BLOCK", 512))
    blk = max(seg, (cap // seg) * seg)
    while blk >= seg:
        if s_total % blk == 0 and blk % 8 == 0:
            return blk
        blk -= seg
    return 0


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                seg: int):
    # scores in the exp2 domain (cheaper VPU exponentials; lse emitted in
    # natural-log units). Block-local: this tile's keys are its own queries'
    # full attention range, so softmax is one-shot — no online state.
    s = (scale * _LOG2_E) * jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (blk, blk)
    blk = s.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0) // seg
    cols = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1) // seg
    s = jnp.where(rows == cols, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m * _LN_2 + jnp.log(l)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, seg: int):
    dt = q_ref.dtype
    s = (scale * _LOG2_E) * jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    blk = s.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0) // seg
    cols = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1) // seg
    s = jnp.where(rows == cols, s, _NEG_INF)
    p = jnp.exp2(s - lse_ref[0] * _LOG2_E)  # masked → exp2(-1e30·…) = 0
    dv_ref[0] = jax.lax.dot_general(
        p.astype(dt), do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta_ref[0])).astype(dt)
    dk_ref[0] = (jax.lax.dot_general(
        ds, q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale).astype(dk_ref.dtype)
    dq_ref[0] = (jax.lax.dot(
        ds, k_ref[0], preferred_element_type=jnp.float32
    ) * scale).astype(dq_ref.dtype)


def _fwd3(q3, k3, v3, scale: float, blk: int, seg: int):
    bh, st, d = q3.shape
    grid = (bh, st // blk)
    spec = pl.BlockSpec((1, blk, d), lambda b, i: (b, i, 0))
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, seg=seg),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=[spec, pl.BlockSpec((1, blk, 1), lambda b, i: (b, i, 0))],
        out_shape=[
            jax.ShapeDtypeStruct(q3.shape, q3.dtype),
            jax.ShapeDtypeStruct((bh, st, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(q3, k3, v3)
    return out, lse


def _bwd3(q3, k3, v3, out, lse, g, scale: float, blk: int, seg: int):
    bh, st, d = q3.shape
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
        keepdims=True,
    )
    grid = (bh, st // blk)
    spec = pl.BlockSpec((1, blk, d), lambda b, i: (b, i, 0))
    row = pl.BlockSpec((1, blk, 1), lambda b, i: (b, i, 0))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, seg=seg),
        grid=grid,
        in_specs=[spec, spec, spec, spec, row, row],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct(q3.shape, q3.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(q3, k3, v3, g, lse, delta)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _block_local(q3, k3, v3, scale, blk, seg):
    out, _ = _fwd3(q3, k3, v3, scale, blk, seg)
    return out


def _block_local_fwd(q3, k3, v3, scale, blk, seg):
    out, lse = _fwd3(q3, k3, v3, scale, blk, seg)
    return out, (q3, k3, v3, out, lse)


def _block_local_bwd(scale, blk, seg, res, g):
    q3, k3, v3, out, lse = res
    return _bwd3(q3, k3, v3, out, lse, g, scale, blk, seg)


_block_local.defvjp(_block_local_fwd, _block_local_bwd)


# --------------------------------------------------------------------------
# public entries
# --------------------------------------------------------------------------


def temporal_block_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    seg_len: int,
    scale: Optional[float] = None,
) -> jax.Array:
    """(B, S·T, H, D) segment-local attention, tokens location-major /
    frame-minor; query i attends key j iff i//seg_len == j//seg_len."""
    b, st, h, d = q.shape
    if scale is None:
        scale = d**-0.5
    blk = default_block(seg_len, st)
    if not blk:
        raise ValueError(f"no block for seg_len={seg_len}, tokens={st}")
    dt = jnp.result_type(q.dtype, k.dtype, v.dtype)

    def to3(x):
        return x.astype(dt).transpose(0, 2, 1, 3).reshape(b * h, st, d)

    out3 = _block_local(to3(q), to3(k), to3(v), float(scale), blk, seg_len)
    return out3.reshape(b, h, st, d).transpose(0, 2, 1, 3).astype(dt)


# --------------------------------------------------------------------------
# natural-layout kernel (zero HBM transposes)
# --------------------------------------------------------------------------
#
# The location-major entry above is exact but pays one HBM transpose pass per
# tensor on the way in and out ((B,T,S,H,D) -> (B*H, S*T, D) and back) —
# attributed at ~55 ms of the 2.25 s stage-2 step (BASELINE round-4
# itemization; the docstring's "XLA fuses those" claim was measured false:
# the copies materialize). The natural-layout kernel below reads the
# projection output layout (B, T, S, C) DIRECTLY via BlockSpec — each grid
# step (b, i) streams the all-frames spatial slab (T, blk_s, C) as
# blk_s*C-contiguous DMA runs — and loops heads statically in-kernel with
# static lane slices. Tokens inside a tile are FRAME-major (row t*blk_s + s),
# so the segment mask becomes strided: query i attends key j iff
# i % blk_s == j % blk_s. Same (q, k) pair set and fp32 softmax as the
# location-major kernel under a token permutation — exactness tested against
# it and against ops.attention.xla_attention_time in
# tests/test_temporal_kernel.py.


_NAT_BWD_BUDGET = 384 * 1024  # bytes per (T, blk_s, C) tile in the BACKWARD:
# it streams 8 blocks (5 in + 3 out, double-buffered) plus fp32 n×n score /
# dp intermediates per head — a 640 KB tile at (S=1024, C=640) put the
# train step 944 KB over the 16 MB scoped-VMEM limit on a real v5e
# (round-5 driver-bench failure; inference, which only runs the 4-block
# forward, fit fine). Any blk_s is numerically valid — a tile spans all T
# frames, every token's whole attention range — so the backward simply
# re-tiles smaller.


def _nat_default_blk_s(
    s: int, t: int, c: int, itemsize: int = 2, budget: int = 640 * 1024
) -> int:
    """Largest spatial block ≤ HI3D_TEMPORAL_BLKS (default 32 → 512 tokens
    at T=16, matching the location-major kernel's measured blk=512 optimum)
    that divides S, is sublane-aligned, and keeps a (T, blk_s, C) tile of
    `itemsize`-byte elements under `budget` bytes (640 KB forward;
    _NAT_BWD_BUDGET for the heavier backward). 0 when none exists."""
    cap = int(os.environ.get("HI3D_TEMPORAL_BLKS", 32))
    while cap >= 8 and t * cap * c * itemsize > budget:
        cap //= 2
    blk = min(cap, s)
    blk -= blk % 8  # the search steps by 8; a stray remainder (e.g. an env
    # cap of 20) would otherwise skip every aligned candidate
    while blk >= 8:
        if s % blk == 0:
            return blk
        blk -= 8
    return 0


def _nat_mask(n: int, blk_s: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) % blk_s
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) % blk_s
    return rows == cols


def _nat_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                    heads: int, dh: int):
    t, blk_s, c = q_ref.shape[1:]
    n = t * blk_s
    q = q_ref[0].reshape(n, c)
    k = k_ref[0].reshape(n, c)
    v = v_ref[0].reshape(n, c)
    mask = _nat_mask(n, blk_s)
    for h in range(heads):
        lo, hi = h * dh, (h + 1) * dh
        s = (scale * _LOG2_E) * jax.lax.dot_general(
            q[:, lo:hi], k[:, lo:hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(mask, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot(
            p.astype(v.dtype), v[:, lo:hi],
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, :, lo:hi] = (acc / l).astype(o_ref.dtype).reshape(
            t, blk_s, dh
        )


def _nat_bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref,
                    dq_ref, dk_ref, dv_ref, *, scale: float, heads: int,
                    dh: int):
    # No saved lse: the tile is its tokens' entire attention range, so the
    # softmax stats recompute exactly from the recomputed scores (flash
    # kernels must save lse only because their kv loop streams).
    t, blk_s, c = q_ref.shape[1:]
    n = t * blk_s
    q = q_ref[0].reshape(n, c)
    k = k_ref[0].reshape(n, c)
    v = v_ref[0].reshape(n, c)
    o = o_ref[0].reshape(n, c)
    do = do_ref[0].reshape(n, c)
    mask = _nat_mask(n, blk_s)
    dt = q.dtype
    for h in range(heads):
        lo, hi = h * dh, (h + 1) * dh
        s = (scale * _LOG2_E) * jax.lax.dot_general(
            q[:, lo:hi], k[:, lo:hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(mask, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        do_h = do[:, lo:hi]
        dv_ref[0, :, :, lo:hi] = jax.lax.dot_general(
            p.astype(dt), do_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype).reshape(t, blk_s, dh)
        dp = jax.lax.dot_general(
            do_h, v[:, lo:hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(
            do_h.astype(jnp.float32) * o[:, lo:hi].astype(jnp.float32),
            axis=-1, keepdims=True,
        )
        ds = (p * (dp - delta)).astype(dt)
        dk_ref[0, :, :, lo:hi] = (jax.lax.dot_general(
            ds, q[:, lo:hi], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dk_ref.dtype).reshape(t, blk_s, dh)
        dq_ref[0, :, :, lo:hi] = (jax.lax.dot(
            ds, k[:, lo:hi], preferred_element_type=jnp.float32
        ) * scale).astype(dq_ref.dtype).reshape(t, blk_s, dh)


def _nat_fwd(q4, k4, v4, scale: float, blk_s: int, heads: int, dh: int):
    b, t, s, c = q4.shape
    grid = (b, s // blk_s)
    spec = pl.BlockSpec((1, t, blk_s, c), lambda b_, i: (b_, 0, i, 0))
    return pl.pallas_call(
        functools.partial(_nat_fwd_kernel, scale=scale, heads=heads, dh=dh),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q4.shape, q4.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(q4, k4, v4)


def _nat_bwd(q4, k4, v4, out, g, scale: float, blk_s: int, heads: int,
             dh: int):
    b, t, s, c = q4.shape
    grid = (b, s // blk_s)
    spec = pl.BlockSpec((1, t, blk_s, c), lambda b_, i: (b_, 0, i, 0))
    return pl.pallas_call(
        functools.partial(_nat_bwd_kernel, scale=scale, heads=heads, dh=dh),
        grid=grid,
        in_specs=[spec, spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct(q4.shape, q4.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(q4, k4, v4, out, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _nat_local(q4, k4, v4, scale, blk_s, heads, dh):
    return _nat_fwd(q4, k4, v4, scale, blk_s, heads, dh)


def _nat_local_fwd(q4, k4, v4, scale, blk_s, heads, dh):
    out = _nat_fwd(q4, k4, v4, scale, blk_s, heads, dh)
    return out, (q4, k4, v4, out)


def _nat_local_bwd(scale, blk_s, heads, dh, res, g):
    q4, k4, v4, out = res
    b, t, s, c = q4.shape
    blk_b = _nat_default_blk_s(
        s, t, c, jnp.dtype(q4.dtype).itemsize, budget=_NAT_BWD_BUDGET
    )
    blk_b = min(blk_s, blk_b) if blk_b >= 8 else blk_s
    return _nat_bwd(q4, k4, v4, out, g, scale, blk_b, heads, dh)


_nat_local.defvjp(_nat_local_fwd, _nat_local_bwd)


def natural_layout_enabled() -> bool:
    """HI3D_TEMPORAL_LAYOUT: "natural" (default — zero-transpose kernel on
    the projection layout) or "lm" (location-major kernel behind explicit
    t↔s transposes; the round-3 shipped path, kept as the revert switch)."""
    return os.environ.get("HI3D_TEMPORAL_LAYOUT", "natural") == "natural"


def temporal_attention_natural(
    q5: jax.Array,
    k5: jax.Array,
    v5: jax.Array,
    scale: Optional[float] = None,
) -> jax.Array:
    """(B, T, S, H, D) frame-axis self-attention, zero HBM layout changes:
    the (B,T,S,H·D) view is the projection output's own layout."""
    b, t, s, h, d = q5.shape
    if scale is None:
        scale = d**-0.5
    dt = jnp.result_type(q5.dtype, k5.dtype, v5.dtype)
    blk_s = _nat_default_blk_s(s, t, h * d, jnp.dtype(dt).itemsize)
    if blk_s == 0:
        raise ValueError(
            f"temporal_attention_natural: no spatial block for S={s}, T={t}, "
            f"C={h * d} ({jnp.dtype(dt).name}) — need a multiple of 8 "
            "dividing S whose (T, blk_s, C) tile fits the VMEM budget; use "
            "temporal_attention_fused for automatic fallback"
        )

    def to4(x):
        return x.astype(dt).reshape(b, t, s, h * d)

    out = _nat_local(
        to4(q5), to4(k5), to4(v5), float(scale), blk_s, h, d
    )
    return out.reshape(b, t, s, h, d)


def temporal_attention_supported(q_shape, k_shape, itemsize: int = 2) -> bool:
    """True when the block-local kernel handles this (q, k) self-attention
    pair coming from ops.attention.xla_attention_time's 5-D layout.

    `itemsize` must be the compute dtype's byte width (callers pass the
    q/k/v result type's) — the natural kernel's VMEM tile check is
    dtype-dependent, and this gate must mirror temporal_attention_fused's
    dispatch exactly: natural tile fits → natural kernel, else the
    location-major fallback's own block check decides."""
    if not kernel_enabled():
        return False
    if len(q_shape) != 5 or tuple(q_shape) != tuple(k_shape):
        return False
    b, t, s, h, d = q_shape
    if t < 2 or d > 256:
        return False
    if (
        natural_layout_enabled()
        and _nat_default_blk_s(s, t, h * d, itemsize) >= 8
    ):
        return True
    return default_block(t, s * t) >= 8


def temporal_attention_fused(
    q5: jax.Array,
    k5: jax.Array,
    v5: jax.Array,
    scale: Optional[float] = None,
) -> jax.Array:
    """(B, T, S, H, D) frame-axis self-attention.

    Dispatch: the natural-layout kernel (zero HBM layout changes) when its
    tiling fits, else the location-major kernel behind explicit t↔s
    transposes. Round-3's docstring claimed XLA fuses those transposes into
    the surrounding elementwise chains — the round-4 HLO attribution measured
    that false (~55 ms/step of materialized copies on the stage-2 step),
    which is what the natural-layout path eliminates. The model-level grouped
    token path (models.video_attention HI3D_TEMPORAL_MODE=grouped) hoists the
    cost to one explicit transpose per block instead — measured SLOWER
    (0.4316 vs 0.4434 steps/s), so this entry is the default path."""
    b, t, s, h, d = q5.shape
    itemsize = jnp.dtype(
        jnp.result_type(q5.dtype, k5.dtype, v5.dtype)
    ).itemsize
    if (
        natural_layout_enabled()
        and _nat_default_blk_s(s, t, h * d, itemsize) >= 8
    ):
        return temporal_attention_natural(q5, k5, v5, scale=scale)

    def to_lm(x):  # (B,T,S,H,D) → (B, S·T, H, D), location-major
        return x.transpose(0, 2, 1, 3, 4).reshape(b, s * t, h, d)

    out = temporal_block_attention(
        to_lm(q5), to_lm(k5), to_lm(v5), t, scale=scale
    )
    return out.reshape(b, s, t, h, d).transpose(0, 2, 1, 3, 4)
