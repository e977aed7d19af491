"""Pallas TPU flash attention (forward + backward), BSHD layout.

TPU-native replacement for the reference's CUDA attention kernels
(xformers `memory_efficient_attention`, sgm/modules/attention.py:417-435, and
torch SDPA :15-47). Used for the *spatial* attention factorization of the
VideoUNet (up to 16384 q-tokens per frame at 1024² latents) where
materializing the (S, S) score matrix would blow HBM; the temporal
factorization (S=16) stays on plain XLA einsum attention
(hi3d_tpu.ops.attention.xla_attention).

Design (standard FlashAttention-2 tiling):
- inputs collapsed to (B·H, S, D); grid (bh, q-blocks, k-blocks) with the
  k-block dimension innermost/sequential ("arbitrary") so the online-softmax
  state lives in VMEM scratch across k steps;
- fp32 softmax state and fp32 accumulator; the QKᵀ and PV matmuls run on the
  MXU with `preferred_element_type=float32`;
- forward also emits the log-sum-exp (lse) so the backward never
  rematerializes full attention: dkv kernel iterates q-blocks per k-block,
  dq kernel iterates k-blocks per q-block (the Δ = rowsum(dO∘O) trick);
- no masking: Hi3D's attention is fully bidirectional (no causal, no
  padding — token counts are h·w which we keep multiples of the block).

Falls back cleanly: `flash_attention` asserts divisibility; callers
(hi3d_tpu.ops.attention.dot_product_attention) route non-conforming shapes to
the XLA path. On non-TPU backends the kernels run in interpreter mode so unit
tests exercise the same code path on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

DEFAULT_BLOCK_Q = int(os.environ.get("HI3D_FLASH_BLOCK_Q", 1024))
# 0 = per-shape: block_k 2048 at sk ≥ 16384 (stage-2 spatial; measured
# 0.423 → 0.428 steps/s full-step), 1024 below (2048 regressed the
# stage-1 s=4096 sites in round-1 A/Bs). Env overrides pin a fixed size.
DEFAULT_BLOCK_K = int(os.environ.get("HI3D_FLASH_BLOCK_K", 0))


def _default_block_k(sk: int) -> int:
    if DEFAULT_BLOCK_K:
        return DEFAULT_BLOCK_K
    return 2048 if sk >= 16384 else 1024
_NEG_INF = -1e30  # avoid actual -inf: exp(-inf - -inf) = nan on first block
_LOG2_E = 1.4426950408889634  # scores scaled into the exp2 domain (fwd kernel)
_LN_2 = 0.6931471805599453


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _variant() -> str:
    """Forward-kernel selector (A/B'd on the real chip; see BASELINE.md
    exploration log). HI3D_FLASH_VARIANT overrides; "" reverts to the plain
    online-softmax kernel:
    - "vaug"  : DEFAULT — fold the softmax row-sum into the PV matmul: V
                tiles are lane-padded to 128 with a ones-column at lane d,
                so the MXU lanes that sit idle at d=64 compute `l` for free
                and the per-tile VPU rowsum over the S² probabilities
                disappears (69.2 → 73.5 TF/s at s=16384; stage-2 step
                0.415 → 0.423, → 0.428 with the per-shape block_k)
    - "kt"    : K passed pre-transposed (bh, d, sk) so the QKᵀ contraction
                feeds the MXU without an in-kernel transpose
    - "vaug_kt": both
    - "pack"  : heads packed in the lane dim — kernels read (B, S, H·D)
                directly (a free reshape of the Dense projection output)
                with the head selected by BlockSpec lane offset, so the
                (B,S,H,D)→(B·H,S,D) transpose copies around every flash
                site vanish (XLA profile: ~193 ms/step of copies at
                stage 2). Composes with vaug ("pack_vaug").
    """
    return os.environ.get("HI3D_FLASH_VARIANT", "vaug")


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _seg_mask(s, seg_len: int, i, j, block_q: int, block_k: int):
    """Block-diagonal segment mask: query q may attend key k iff
    q//seg_len == k//seg_len. Used by the grouped temporal-attention
    formulation (ops.attention grouped frame attention): tokens are
    (location, frame) pairs flattened location-major, so same-segment ==
    same spatial location. Masked scores drop to _NEG_INF (log2 domain)."""
    rows = i * block_q + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, s.ndim - 2
    )
    cols = j * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, s.ndim - 1
    )
    return jnp.where((rows // seg_len) == (cols // seg_len), s, _NEG_INF)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *,
                scale: float, nk: int, kax: int = 2, seg_len: int = 0):
    j = pl.program_id(kax)

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # dots stay in the input dtype (bf16 MXU rate) with fp32 accumulation.
    # The online softmax runs in the exp2 domain: folding log2(e) into the
    # score scale turns every VPU exp(x) (= exp2(x·log2e), one extra multiply
    # per score element) into a bare exp2 — the S² exponentials are the VPU
    # floor of the kernel. The emitted lse converts back to natural-log
    # units so the backward kernels are unchanged.
    s = (scale * _LOG2_E) * jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk), log2-domain
    if seg_len:
        s = _seg_mask(s, seg_len, pl.program_id(kax - 1), j,
                      q_ref.shape[1], k_ref.shape[1])

    m_prev = m_scr[:, :1]
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    corr = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next)
    if seg_len:
        # a k-block fully outside a row's segment leaves m_next at _NEG_INF;
        # exp2(s - m_next) would then be exp2(0)=1 for masked entries
        p = jnp.where(s <= _NEG_INF / 2, 0.0, p)
    l_scr[:, :1] = l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[:, :1] = m_next
    acc_scr[...] = acc_scr[...] * corr + jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(j == nk - 1)
    def _():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[...] / l).astype(o_ref.dtype)
        # natural-log lse: m·ln2 + log(l). reshape-write: the packed-heads
        # path hands a 4-D (1, 1, block_q, 1) lse block (Mosaic needs the
        # last block dim equal to the array dim), the 3-D path (1, block_q, 1)
        lse_ref[...] = (m_scr[:, :1] * _LN_2 + jnp.log(l)).reshape(
            lse_ref.shape
        )


def _fwd_kernel_vaug(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, acc_scr, *,
                     scale: float, nk: int, d: int, kt: bool, kax: int = 2,
                     seg_len: int = 0):
    """Online softmax with the row-sum folded into the PV matmul.

    The V tile is lane-padded to 128 columns with a ones-column at lane d;
    the (bq, bk)×(bk, 128) PV dot then yields Σp in column d at no extra MXU
    cost (the systolic array processes N in 128-lane granularity, so lanes
    d..127 were idle in the d=64 regime), deleting the per-tile VPU rowsum
    over the S² probabilities. The running correction multiplies apply to the
    l-column exactly as to the output columns, so `l` stays consistent."""
    j = pl.program_id(kax)

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if kt:
        s = (scale * _LOG2_E) * jax.lax.dot(
            q_ref[0], k_ref[0], preferred_element_type=jnp.float32
        )  # q (bq, d) · kT (d, bk)
    else:
        s = (scale * _LOG2_E) * jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if seg_len:
        s = _seg_mask(s, seg_len, pl.program_id(kax - 1), j,
                      q_ref.shape[1], k_ref.shape[2 if kt else 1])

    m_prev = m_scr[:, :1]
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    corr = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next)
    if seg_len:
        p = jnp.where(s <= _NEG_INF / 2, 0.0, p)  # see _fwd_kernel
    m_scr[:, :1] = m_next

    v_blk = v_ref[0]  # (bk, d)
    vp = jnp.pad(v_blk, ((0, 0), (0, 128 - d)))
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    vaug = vp + (col == d).astype(vp.dtype)  # ones-column at lane d
    acc_scr[...] = acc_scr[...] * corr + jax.lax.dot(
        p.astype(v_blk.dtype), vaug, preferred_element_type=jnp.float32
    )

    @pl.when(j == nk - 1)
    def _():
        l = acc_scr[:, d:d + 1]
        o_ref[0] = (acc_scr[:, :d] / l).astype(o_ref.dtype)
        lse_ref[...] = (m_scr[:, :1] * _LN_2 + jnp.log(l)).reshape(
            lse_ref.shape
        )


def _fwd_kernel_kt(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                   *, scale: float, nk: int):
    """Baseline online softmax, K tile pre-transposed (d, bk)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    s = (scale * _LOG2_E) * jax.lax.dot(
        q_ref[0], k_ref[0], preferred_element_type=jnp.float32
    )

    m_prev = m_scr[:, :1]
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    corr = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next)
    l_scr[:, :1] = l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[:, :1] = m_next
    acc_scr[...] = acc_scr[...] * corr + jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(j == nk - 1)
    def _():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[...] / l).astype(o_ref.dtype)
        lse_ref[0] = m_scr[:, :1] * _LN_2 + jnp.log(l)


def _fwd(q3, k3, v3, scale, block_q, block_k, seg_len=0):
    bh, sq, d = q3.shape
    sk = k3.shape[1]
    nq, nk = sq // block_q, sk // block_k
    grid = (bh, nq, nk)
    variant = _variant()
    vaug = "vaug" in variant and d < 128
    kt = "kt" in variant and not seg_len  # kt kernel has no mask support

    q_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0))
    if kt:
        k3 = k3.transpose(0, 2, 1)  # (bh, d, sk)
        k_spec = pl.BlockSpec((1, d, block_k), lambda b, i, j: (b, 0, j))
    else:
        k_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0))
    v_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0))

    if vaug:
        kernel = functools.partial(
            _fwd_kernel_vaug, scale=scale, nk=nk, d=d, kt=kt, seg_len=seg_len
        )
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]
    elif kt:
        kernel = functools.partial(_fwd_kernel_kt, scale=scale, nk=nk)
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]
    else:
        kernel = functools.partial(_fwd_kernel, scale=scale, nk=nk,
                                   seg_len=seg_len)
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, sq, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q3, k3, v3)
    return out, lse


def _fwd_packed(qp, kp, vp, heads, scale, block_q, block_k):
    """Forward over packed-heads layout (B, S, H·D) — no transposes.

    Grid (b, h, nq, nk); the head is selected by lane-offset in the
    BlockSpec (block d wide at element offset h·d), so tiles arrive in VMEM
    identical to the (B·H, S, D) path while XLA never materializes the
    transposed copies the 3-D path needs around every call site."""
    b, sq, hd = qp.shape
    d = hd // heads
    sk = kp.shape[1]
    nq, nk = sq // block_q, sk // block_k
    grid = (b, heads, nq, nk)
    vaug = "vaug" in _variant() and d < 128

    q_spec = pl.BlockSpec((1, block_q, d), lambda b, h, i, j: (b, i, h))
    kv_spec = pl.BlockSpec((1, block_k, d), lambda b, h, i, j: (b, j, h))

    if vaug:
        kernel = functools.partial(
            _fwd_kernel_vaug, scale=scale, nk=nk, d=d, kt=False, kax=3
        )
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]
    else:
        kernel = functools.partial(_fwd_kernel, scale=scale, nk=nk, kax=3)
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, h, i, j: (b, i, h)),
            # lse is (B, H, S, 1), NOT (B, S, H): Mosaic requires the last
            # block dim be 128-divisible or equal to the array dim — a
            # 1-wide head block over a heads-wide last axis cannot lower
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, hd), qp.dtype),
            jax.ShapeDtypeStruct((b, heads, sq, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=_interpret(),
    )(qp, kp, vp)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_packed(qp, kp, vp, heads, scale, block_q, block_k):
    out, _ = _fwd_packed(qp, kp, vp, heads, scale, block_q, block_k)
    return out


def _flash_packed_fwd(qp, kp, vp, heads, scale, block_q, block_k):
    out, lse = _fwd_packed(qp, kp, vp, heads, scale, block_q, block_k)
    return out, (qp, kp, vp, out, lse)


def _flash_packed_bwd(heads, scale, block_q, block_k, res, g):
    # training path: unpack to (B·H, S, D) and reuse the 3-D backward
    # kernels — the transposes cost what the old forward paid, and only
    # when gradients actually flow through a flash site
    qp, kp, vp, out, lse = res
    b, sq, hd = qp.shape
    d = hd // heads
    sk = kp.shape[1]

    def to3(x, s):
        return x.reshape(b, s, heads, d).transpose(0, 2, 1, 3).reshape(
            b * heads, s, d
        )

    lse3 = lse.reshape(b * heads, sq, 1)  # (B, H, S, 1) → free reshape
    dq3, dk3, dv3 = _bwd(
        scale, block_q, block_k,
        (to3(qp, sq), to3(kp, sk), to3(vp, sk), to3(out, sq), lse3),
        to3(g, sq),
    )

    def to_packed(x3, s):
        return x3.reshape(b, heads, s, d).transpose(0, 2, 1, 3).reshape(
            b, s, hd
        )

    return to_packed(dq3, sq), to_packed(dk3, sk), to_packed(dv3, sk)


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_scr, dv_scr, *, scale: float, nq: int,
                seg_len: int = 0):
    i = pl.program_id(2)  # q-block index (sequential)

    @pl.when(i == 0)
    def _():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    lse = lse_ref[0]                               # (bq, 1)
    delta = delta_ref[0]                           # (bq, 1)
    dt = q_ref.dtype

    s = (scale * _LOG2_E) * jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # (bq, bk), log2-domain
    if seg_len:
        # masked s → _NEG_INF → p = 0 exactly (lse is finite)
        s = _seg_mask(s, seg_len, i, pl.program_id(1),
                      q_ref.shape[1], k_ref.shape[1])
    p = jnp.exp2(s - lse * _LOG2_E)
    # dv += pᵀ dO
    dv_scr[...] += jax.lax.dot_general(
        p.astype(dt), do_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # ds = p ∘ (dO Vᵀ − Δ)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta)).astype(dt)
    # dk += dsᵀ q (·scale folded in at the final write)
    dk_scr[...] += jax.lax.dot_general(
        ds, q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = (dk_scr[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, dq_scr, *, scale: float, nk: int, seg_len: int = 0):
    j = pl.program_id(2)  # k-block index (sequential)

    @pl.when(j == 0)
    def _():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    lse = lse_ref[0]
    delta = delta_ref[0]
    dt = q_ref.dtype

    s = (scale * _LOG2_E) * jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if seg_len:
        s = _seg_mask(s, seg_len, pl.program_id(1), j,
                      q_ref.shape[1], k_ref.shape[1])
    p = jnp.exp2(s - lse * _LOG2_E)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta)).astype(dt)
    dq_scr[...] += jax.lax.dot(
        ds, k_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = (dq_scr[...] * scale).astype(dq_ref.dtype)


def _bwd(scale, block_q, block_k, res, g, seg_len=0):
    q3, k3, v3, out, lse = res
    bh, sq, d = q3.shape
    sk = k3.shape[1]
    nq, nk = sq // block_q, sk // block_k
    do = g
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
        keepdims=True,
    )  # (bh, sq, 1)

    q_spec_i = pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0))
    kv_spec_j = pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0))
    row_spec_i = pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0))

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, nq=nq, seg_len=seg_len),
        grid=(bh, nk, nq),
        in_specs=[q_spec_i, kv_spec_j, kv_spec_j, q_spec_i, row_spec_i,
                  row_spec_i],
        out_specs=[kv_spec_j, kv_spec_j],
        out_shape=[
            jax.ShapeDtypeStruct(k3.shape, k3.dtype),
            jax.ShapeDtypeStruct(v3.shape, v3.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q3, k3, v3, do, lse, delta)

    q_spec_q = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0))
    kv_spec_k = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0))
    row_spec_q = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, nk=nk, seg_len=seg_len),
        grid=(bh, nq, nk),
        in_specs=[q_spec_q, kv_spec_k, kv_spec_k, q_spec_q, row_spec_q,
                  row_spec_q],
        out_specs=q_spec_q,
        out_shape=jax.ShapeDtypeStruct(q3.shape, q3.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q3, k3, v3, do, lse, delta)

    return dq, dk, dv


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash3(q3, k3, v3, scale, block_q, block_k, seg_len=0):
    out, _ = _fwd(q3, k3, v3, scale, block_q, block_k, seg_len)
    return out


def _flash3_fwd(q3, k3, v3, scale, block_q, block_k, seg_len=0):
    out, lse = _fwd(q3, k3, v3, scale, block_q, block_k, seg_len)
    return out, (q3, k3, v3, out, lse)


def _flash3_bwd(scale, block_q, block_k, seg_len, res, g):
    return _bwd(scale, block_q, block_k, res, g, seg_len)


_flash3.defvjp(_flash3_fwd, _flash3_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: Optional[int] = None,
    seg_len: int = 0,
) -> jax.Array:
    """(B, Sq, H, D) × (B, Sk, H, D) → (B, Sq, H, D).

    `seg_len > 0` applies a block-diagonal segment mask: token q attends
    token k iff q//seg_len == k//seg_len (requires sq == sk). This turns the
    kernel into many independent seg_len-long attentions batched along the
    sequence — the grouped temporal-attention formulation (ops.attention)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    if block_k is None:
        block_k = _default_block_k(sk)
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    if sq % block_q or sk % block_k:
        raise ValueError(
            f"flash_attention needs seq divisible by blocks: "
            f"sq={sq}%{block_q}, sk={sk}%{block_k}"
        )

    # mixed q/k/v dtypes break Mosaic's dot lowering — unify first
    dt = jnp.result_type(q.dtype, k.dtype, v.dtype)
    q, k, v = q.astype(dt), k.astype(dt), v.astype(dt)

    # packed-heads path: (B,S,H,D)→(B,S,H·D) is a free reshape of the
    # projection output, and the kernel selects heads by lane offset — no
    # transpose copies materialize on the forward path. Mosaic requires the
    # lane block dim be a multiple of 128 (or the full array dim), so this
    # only lowers for d ≥ 128; Hi3D's d=64 heads stay on the 3-D path
    # (measured: the per-site transposes there total only ~25 ms/step —
    # the profile's 193 ms "copy" bucket is mostly non-attention layouts).
    if seg_len and (sq != sk or sq % seg_len):
        raise ValueError(
            f"seg_len={seg_len} needs sq == sk divisible by it, got "
            f"sq={sq}, sk={sk}"
        )
    if "pack" in _variant() and not seg_len and (d % 128 == 0 or _interpret()):
        out = _flash_packed(
            q.reshape(b, sq, h * d), k.reshape(b, sk, h * d),
            v.reshape(b, sk, h * d), h, float(scale), block_q, block_k
        )
        return out.reshape(b, sq, h, d)

    def to3(x, s):
        return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)

    out3 = _flash3(
        to3(q, sq), to3(k, sk), to3(v, sk), float(scale), block_q, block_k,
        seg_len,
    )
    return out3.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def flash_attention_packed(
    qp: jax.Array,
    kp: jax.Array,
    vp: jax.Array,
    heads: int,
    scale: float,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: Optional[int] = None,
) -> jax.Array:
    """Packed-heads flash attention on (B, S, H·D) tensors.

    The head is selected by BlockSpec lane offset, so the packed layout is
    a FREE reshape of the Dense projection output — none of the
    (B,S,H,D)→(B·H,S,D) transpose copies the 3-D entry pays. Mosaic
    requires the per-head lane block be 128-aligned, i.e. D must be a
    multiple of 128; models/attention.py reaches this at Hi3D's d=64 by
    zero-padding each head's PROJECTION WEIGHTS 64→128 (exact: padded
    q/k lanes contribute 0 to every score, padded v lanes produce zero
    output lanes which the out-projection's padded rows ignore). `scale`
    is mandatory — it must be the REAL head dim's d^-1/2, not the padded
    array's."""
    b, sq, hd = qp.shape
    d = hd // heads
    sk = kp.shape[1]
    if d % 128 and not _interpret():
        raise ValueError(f"packed flash needs 128-aligned head dim, got {d}")
    if block_k is None:
        block_k = _default_block_k(sk)
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    if sq % block_q or sk % block_k:
        raise ValueError(
            f"flash_attention_packed needs seq divisible by blocks: "
            f"sq={sq}%{block_q}, sk={sk}%{block_k}"
        )
    dt = jnp.result_type(qp.dtype, kp.dtype, vp.dtype)
    qp, kp, vp = qp.astype(dt), kp.astype(dt), vp.astype(dt)
    return _flash_packed(qp, kp, vp, heads, float(scale), block_q, block_k)
