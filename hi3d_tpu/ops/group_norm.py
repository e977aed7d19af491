"""Fused GroupNorm(+SiLU) Pallas kernels.

Why: profiling the stage-1 denoise step (tools/profile_step.py) shows XLA's
GroupNorm lowering (fp32 convert → grouped reduce → normalize fusion) running
~10-40× off HBM speed-of-light on TPU — the per-group reshape splits the
128-lane channel dimension (e.g. 320 ch → 32 groups × 10) and the surrounding
fusions pick hostile layouts. Together the norm sites cost ~25% of the UNet
step. These kernels stream the tensor through VMEM in channel-aligned blocks:

- stats pass: accumulate per-channel Σx and Σx² in an fp32 VMEM scratch
  across the S-chunk grid axis (TPU grids iterate sequentially, so scratch
  carries across steps); at the last chunk, combine channels into group
  moments and emit the folded affine coefficients a = γ/σ and b = β - μγ/σ.
- apply pass: y = act(x·a + b) in fp32 registers, bf16 in/out.

HBM traffic: 2 reads + 1 write of x (speed-of-light for a two-pass norm) vs
the XLA path's ≥5 equivalent passes. Semantics match reference GroupNorm32
(sgm/modules/diffusionmodules/util.py:296-304: fp32 statistics + fp32 apply,
output cast back to the activation dtype); `act="silu"` additionally folds
the ResBlock's SiLU (openaimodel.py:219-230 in_layers/out_layers ordering).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# target ≈ 1 MiB of fp32 per x block in VMEM
_TARGET_BLOCK_ELEMS = 256 * 1024
_LANE = 128


def _chunk_rows(s: int, c: int) -> int:
    """Largest row-chunk that divides s, is sublane-aligned, and fits VMEM."""
    target = max(16, _TARGET_BLOCK_ELEMS // c)
    best = 16
    d = 16
    while d <= min(s, target):
        if s % d == 0:
            best = d
        d *= 2
    return best


def _stats_kernel(x_ref, scale_ref, bias_ref, a_ref, b_ref, acc_ref,
                  *, groups: int, eps: float):
    ci = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(ci == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xf = x_ref[0].astype(jnp.float32)  # (CH, C)
    acc_ref[0, :] += jnp.sum(xf, axis=0)
    acc_ref[1, :] += jnp.sum(xf * xf, axis=0)

    @pl.when(ci == nc - 1)
    def _():
        c = acc_ref.shape[1]
        cpg = c // groups
        total = nc * x_ref.shape[1] * cpg  # elements per group
        # group-combine without lane-dim reshapes (Mosaic-unsupported):
        # matmul against channel→group one-hot masks built from iota
        ch_of = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cpg
        g_of = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
        gather = (ch_of == g_of).astype(jnp.float32)  # (c, g)
        sums = jnp.dot(
            acc_ref[...], gather, preferred_element_type=jnp.float32
        )  # (2, g): Σx and Σx² per group
        mean = sums[0:1, :] / total
        var = sums[1:2, :] / total - mean * mean
        inv = jax.lax.rsqrt(var + eps)  # (1, g)
        # scatter back to channels: (1, g) @ (g, c) one-hot
        g_of2 = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 0)
        ch_of2 = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 1) // cpg
        scatter = (g_of2 == ch_of2).astype(jnp.float32)  # (g, c)
        inv_c = jnp.dot(inv, scatter, preferred_element_type=jnp.float32)
        mean_c = jnp.dot(mean, scatter, preferred_element_type=jnp.float32)
        sf = scale_ref[0].astype(jnp.float32)[None, :]
        bf = bias_ref[0].astype(jnp.float32)[None, :]
        a = inv_c * sf
        b = bf - mean_c * a
        a_ref[0, 0] = a[0]
        b_ref[0, 0] = b[0]


def _apply_kernel(x_ref, a_ref, b_ref, y_ref, *, act: Optional[str]):
    xf = x_ref[0].astype(jnp.float32)
    y = xf * a_ref[0, 0][None, :] + b_ref[0, 0][None, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    y_ref[0] = y.astype(y_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "act")
)
def _fused_group_norm_nsc(x, scale, bias, num_groups, eps, act):
    n, s, c = x.shape
    ch = _chunk_rows(s, c)
    nchunks = s // ch

    a, b = pl.pallas_call(
        functools.partial(_stats_kernel, groups=num_groups, eps=eps),
        grid=(n, nchunks),
        in_specs=[
            pl.BlockSpec((1, ch, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
    )(x, scale.reshape(1, c), bias.reshape(1, c))

    y = pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        grid=(n, nchunks),
        in_specs=[
            pl.BlockSpec((1, ch, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ch, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
    )(x, a, b)
    return y


@functools.lru_cache(maxsize=1)
def _pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _pallas_opted_in() -> bool:
    """The Pallas GN kernels run ~12× faster than XLA's norm fusions in
    isolation (stats 2-read+1-write vs layout-churned reduces), but as custom
    calls they block XLA from fusing the norm with its conv/residual
    neighbours — measured net-negative on the stage-1 denoise step (2.04 vs
    2.16 steps/s). Kept opt-in (HI3D_FUSED_GN=1) for shapes/models where the
    fusion-break trade flips."""
    import os

    return os.environ.get("HI3D_FUSED_GN", "0") == "1"


def supports_fused(shape, num_groups: int = 32) -> bool:
    """True when the Pallas path handles this (N, ..., C) activation.

    C needs no lane alignment — blocks span the full channel dim (Mosaic pads
    lanes), so 320-channel tensors qualify; S must split into ≥16-row chunks
    (bf16 sublane tile)."""
    if not _pallas_available():
        return False
    c = shape[-1]
    s = math.prod(shape[1:-1])
    return c % num_groups == 0 and s % 16 == 0 and s >= 16


def _group_stats(x, groups, eps):
    """fp32 per-group (mean, inv_std) of (N, ..., C), shapes (N, g)."""
    c = x.shape[-1]
    n = x.shape[0]
    xf = x.astype(jnp.float32).reshape(n, -1, c)
    cnt = xf.shape[1] * (c // groups)
    s_c = jnp.sum(xf, axis=1)  # (N, C) — channel-aligned reduce
    s2_c = jnp.sum(jnp.square(xf), axis=1)
    gm = s_c.reshape(n, groups, c // groups).sum(-1) / cnt
    gm2 = s2_c.reshape(n, groups, c // groups).sum(-1) / cnt
    # one-pass E[x²]−mean² can go slightly negative under fp32 cancellation
    # on near-constant activations — clamp before rsqrt to avoid NaN
    var = jnp.maximum(gm2 - jnp.square(gm), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return gm, inv


def _gn_fwd_impl(x, scale, bias, num_groups, eps, act):
    shape = x.shape
    c = shape[-1]
    if _pallas_opted_in() and supports_fused(shape, num_groups):
        n = shape[0]
        s = math.prod(shape[1:-1])
        y = _fused_group_norm_nsc(
            x.reshape(n, s, c), scale, bias, num_groups, eps, act
        )
        return y.reshape(shape)
    return _xla_group_norm(x, scale, bias, num_groups, eps, act)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _group_norm_act(x, scale, bias, num_groups, eps, act):
    return _gn_fwd_impl(x, scale, bias, num_groups, eps, act)


def _group_norm_act_fwd(x, scale, bias, num_groups, eps, act):
    return _gn_fwd_impl(x, scale, bias, num_groups, eps, act), (x, scale, bias)


def _group_norm_act_bwd(num_groups, eps, act, res, dy):
    """XLA backward with fp32 recompute (the Pallas kernels are fwd-only;
    recompute-in-bwd is also the remat-friendly choice for training)."""
    x, scale, bias = res
    shape = x.shape
    n, c = shape[0], shape[-1]
    g = num_groups
    cpg = c // g
    mean, inv = _group_stats(x, g, eps)  # (N, g)
    bshape = (n,) + (1,) * (x.ndim - 2) + (c,)
    mean_c = jnp.repeat(mean, cpg, axis=1).reshape(bshape)
    inv_c = jnp.repeat(inv, cpg, axis=1).reshape(bshape)
    xf = x.astype(jnp.float32)
    xhat = (xf - mean_c) * inv_c
    sf = scale.astype(jnp.float32)
    z = xhat * sf + bias.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    if act == "silu":
        sig = jax.nn.sigmoid(z)
        dz = dyf * sig * (1.0 + z * (1.0 - sig))
    else:
        dz = dyf
    red_axes = tuple(range(x.ndim - 1))  # all but C
    dscale = jnp.sum(dz * xhat, axis=red_axes)
    dbias = jnp.sum(dz, axis=red_axes)
    # dx = γ/σ (dz − mean_g(dz·γ)/γ ... ) — standard GN backward per group:
    dxhat = dz * sf
    spatial = tuple(range(1, x.ndim - 1))
    m = math.prod(shape[1:-1]) * cpg  # elements per group
    s1 = jnp.sum(dxhat, axis=spatial)          # (N, C)
    s2 = jnp.sum(dxhat * xhat, axis=spatial)   # (N, C)
    s1g = s1.reshape(n, g, cpg).sum(-1)        # (N, g)
    s2g = s2.reshape(n, g, cpg).sum(-1)
    s1c = jnp.repeat(s1g, cpg, axis=1).reshape(bshape)
    s2c = jnp.repeat(s2g, cpg, axis=1).reshape(bshape)
    dx = inv_c * (dxhat - (s1c + xhat * s2c) / m)
    return (
        dx.astype(x.dtype),
        dscale.astype(scale.dtype),
        dbias.astype(bias.dtype),
    )


_group_norm_act.defvjp(_group_norm_act_fwd, _group_norm_act_bwd)


def fused_group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
    act: Optional[str] = None,
) -> jax.Array:
    """GroupNorm over all non-batch dims of (N, ..., C), optional fused SiLU.

    Default: plain XLA fp32 math left to XLA's own fusion/autodiff (fastest
    in-model, see _pallas_opted_in). With HI3D_FUSED_GN=1, the forward runs
    the Pallas kernels (custom_vjp; backward is an XLA recompute).
    """
    g = math.gcd(x.shape[-1], num_groups)
    if _pallas_opted_in() and supports_fused(x.shape, g):
        return _group_norm_act(x, scale, bias, g, eps, act)
    return _xla_group_norm(x, scale, bias, g, eps, act)


def _xla_group_norm(x, scale, bias, groups, eps, act):
    """Reference-math fallback: fp32 stats + fp32 apply (GroupNorm32),
    formulated exactly like flax nn.GroupNorm (two-pass variance) so XLA's
    well-tuned norm fusion patterns kick in; activation applies after the
    cast back to the activation dtype (matching the pre-fold module order)."""
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    xg = xf.reshape(*x.shape[:-1], groups, c // groups)
    axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=axes, keepdims=True)
    y = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(xf.shape) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )
    y = y.astype(x.dtype)
    if act == "silu":
        y = jax.nn.silu(y)
    return y


def _twostage_opted_in() -> bool:
    """Pure-XLA two-stage GroupNorm stats (the DEFAULT; HI3D_GN=flax reverts):
    spatial-first lane-aligned reductions via _group_stats, jnp apply left
    fusable. Full-step A/B on the v5e chip: 2.19 vs 2.16 steps/s alone,
    2.25 combined with HI3D_TEMPORAL_4D."""
    import os

    return os.environ.get("HI3D_GN", "twostage") == "twostage"


# ---------------------------------------------------------------------------
# Stats-only Pallas kernels (HI3D_GN=pallas, HI3D_LN=pallas)
#
# Round-2 stage-2 profile (tools/profile_step.py --stage2): XLA's norm-stat
# convert_reduce fusions run 25-50× off HBM speed-of-light — 20 ms for a
# [32,128,128,320] GroupNorm stat pass whose streaming floor is 0.4 ms, and
# ~11 ms per LayerNorm stat fusion at the 16384-token transformer sites —
# 539 ms of the 2.34 s step in total. The round-1 fused-GN A/B lost because
# the Pallas kernel replaced the *apply* too, pulling the normalize out of
# XLA's norm→conv/residual fusions (net −6%). These kernels replace only the
# statistics: one streaming read of x at HBM rate, emitting per-group or
# per-row (mean, inv_std); the apply stays jnp and fuses exactly as before.
# Backward recomputes the stats VJP in XLA (remat-friendly, matches the
# default path's gradients).
#
# MEASURED RESULT (v5e chip, tools/bench_stage2.py, steps/s): baseline
# 0.4275; HI3D_GN=pallas 0.4045; HI3D_LN=pallas 0.3977; both 0.3879 — all
# LOSE. Root cause, visible in the trace: the convert_reduce fusions are
# multi-output — XLA folds the stat reduction into the *producer* fusion
# that writes x to HBM anyway (the bf16[32,128,128,320] third output above
# IS x), so the statistics are computed in-registers on the way out and are
# effectively free of HBM traffic. Any standalone stats pass — Pallas or
# otherwise — re-reads x once more and loses by exactly that pass. The
# apparent 25-50× "overhead" in the profile is the producer's own cost
# binned under the fusion's reduce name. Kept opt-in as the documented
# negative result; the same reasoning closes the LN=matmul route (which
# additionally materialized x² in fp32).
# ---------------------------------------------------------------------------


def _stats_interpret() -> bool:
    import os

    return (
        os.environ.get("HI3D_PALLAS_INTERPRET", "") == "1"
        or jax.default_backend() != "tpu"
    )


def _gstats_kernel(x_ref, mean_ref, inv_ref, acc_ref, *, groups: int,
                   eps: float):
    ci = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(ci == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xf = x_ref[0].astype(jnp.float32)  # (CH, C)
    acc_ref[0, :] += jnp.sum(xf, axis=0)
    acc_ref[1, :] += jnp.sum(xf * xf, axis=0)

    @pl.when(ci == nc - 1)
    def _():
        c = acc_ref.shape[1]
        cpg = c // groups
        total = nc * x_ref.shape[1] * cpg
        # channel→group combine as one-hot matmuls (no lane-dim reshapes)
        ch_of = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cpg
        g_of = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
        gather = (ch_of == g_of).astype(jnp.float32)  # (c, g)
        sums = jnp.dot(
            acc_ref[...], gather, preferred_element_type=jnp.float32
        )  # (2, g)
        mean = sums[0:1, :] / total
        var = jnp.maximum(sums[1:2, :] / total - mean * mean, 0.0)
        mean_ref[0, 0] = mean[0]
        inv_ref[0, 0] = jax.lax.rsqrt(var + eps)[0]


@functools.partial(jax.jit, static_argnames=("groups", "eps"))
def _pallas_group_stats_impl(x, groups, eps):
    n, c = x.shape[0], x.shape[-1]
    s = math.prod(x.shape[1:-1])
    x3 = x.reshape(n, s, c)
    ch = _chunk_rows(s, c)
    nchunks = s // ch
    mean, inv = pl.pallas_call(
        functools.partial(_gstats_kernel, groups=groups, eps=eps),
        grid=(n, nchunks),
        in_specs=[
            pl.BlockSpec((1, ch, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, groups), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, groups), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, groups), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, groups), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        interpret=_stats_interpret(),
    )(x3)
    return mean.reshape(n, groups), inv.reshape(n, groups)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def pallas_group_stats(x, groups, eps):
    """fp32 per-group (mean, inv_std) of (N, ..., C) via a streaming Pallas
    stats kernel — numerics match `_group_stats` (one-pass, clamped)."""
    return _pallas_group_stats_impl(x, groups, eps)


def _pallas_group_stats_fwd(x, groups, eps):
    return _pallas_group_stats_impl(x, groups, eps), x


def _pallas_group_stats_bwd(groups, eps, x, g):
    _, vjp = jax.vjp(lambda t: _group_stats(t, groups, eps), x)
    return vjp(g)


pallas_group_stats.defvjp(_pallas_group_stats_fwd, _pallas_group_stats_bwd)


def group_stats_supported(shape) -> bool:
    s = math.prod(shape[1:-1])
    return s % 16 == 0 and s >= 16


def _pallas_gn_opted_in() -> bool:
    import os

    return os.environ.get("HI3D_GN", "twostage") == "pallas"


def _rowstats_kernel(x_ref, mean_ref, inv_ref, *, eps: float):
    xf = x_ref[...].astype(jnp.float32)  # (R, C)
    c = xf.shape[-1]
    m = jnp.sum(xf, axis=-1, keepdims=True) / c
    v = jnp.sum(xf * xf, axis=-1, keepdims=True) / c - m * m
    mean_ref[...] = m
    inv_ref[...] = jax.lax.rsqrt(jnp.maximum(v, 0.0) + eps)


@functools.partial(jax.jit, static_argnames=("eps",))
def _pallas_row_stats_impl(x2d, eps):
    m, c = x2d.shape
    ch = _chunk_rows(m, c)
    nchunks = m // ch
    mean, inv = pl.pallas_call(
        functools.partial(_rowstats_kernel, eps=eps),
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((ch, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ch, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        interpret=_stats_interpret(),
    )(x2d)
    return mean, inv


def _row_stats_ref(x2d, eps):
    """jnp reference for the VJP (one-pass fast variance, clamped)."""
    xf = x2d.astype(jnp.float32)
    c = xf.shape[-1]
    m = jnp.sum(xf, axis=-1, keepdims=True) / c
    v = jnp.sum(xf * xf, axis=-1, keepdims=True) / c - m * m
    return m, jax.lax.rsqrt(jnp.maximum(v, 0.0) + eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def pallas_row_stats(x2d, eps):
    """fp32 per-row (mean, inv_std) over the last dim of (M, C) — the
    LayerNorm statistics — via a streaming Pallas kernel."""
    return _pallas_row_stats_impl(x2d, eps)


def _pallas_row_stats_fwd(x2d, eps):
    return _pallas_row_stats_impl(x2d, eps), x2d


def _pallas_row_stats_bwd(eps, x2d, g):
    _, vjp = jax.vjp(lambda t: _row_stats_ref(t, eps), x2d)
    return vjp(g)


pallas_row_stats.defvjp(_pallas_row_stats_fwd, _pallas_row_stats_bwd)


def row_stats_supported(shape) -> bool:
    m = math.prod(shape[:-1])
    return m % 16 == 0 and m >= 16
