"""CLIP image towers (flax): OpenCLIP ViT-H/14 (crossattn conditioning) and
OpenAI CLIP ViT-L/14 (aesthetic scoring).

Functional parity targets:
- FrozenOpenCLIPImageEmbedder's `model.visual` (reference
  sgm/modules/encoders/modules.py:570-728): OpenCLIP ViT-H-14 vision tower —
  width 1280, 32 layers, 16 heads, patch 14, proj → 1024, exact GELU.
- AesEmbedder's `aesthetic_model.encode_image` (reference vtdm/encoders.py:
  56-91): OpenAI CLIP ViT-L/14 — width 1024, 24 layers, 16 heads, patch 14,
  proj → 768, QuickGELU (x·sigmoid(1.702x)).

Both are the same pre-LN ViT; `quick_gelu` switches the activation. Inputs are
(B, 224, 224, 3) NHWC, already CLIP-normalized. Weight conversion from
open_clip / OpenAI checkpoints lives in hi3d_tpu.convert.torch_to_jax.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_normalize(x01: jax.Array) -> jax.Array:
    """Normalize [0,1] RGB (NHWC) with the CLIP mean/std."""
    mean = jnp.asarray(CLIP_MEAN, dtype=x01.dtype)
    std = jnp.asarray(CLIP_STD, dtype=x01.dtype)
    return (x01 - mean) / std


def _aa_bicubic_weights(n_in: int, n_out: int, align_corners: bool = True):
    """Torch/PIL-style antialiased bicubic resampling matrix (n_out, n_in).

    Reproduces `torch.nn.functional.interpolate(mode="bicubic",
    antialias=True, align_corners=…)` — the semantics of the reference's
    kornia CLIP preprocessing (modules.py:620-632) — to machine precision
    (tests/test_clip_resize.py probes torch with one-hot images). Torch's
    separable-AA kernel uses `center = scale·(i+0.5)` regardless of
    align_corners; only the scale changes to (in-1)/(out-1), and windows are
    clipped at the borders then renormalized (aten UpSampleKernel.h,
    _compute_indices_weights_aa).
    """
    import numpy as np

    if align_corners and n_out > 1:
        scale = (n_in - 1) / (n_out - 1)
    else:
        scale = n_in / n_out
    invs = 1.0 / scale if scale > 1 else 1.0
    support = 2.0 * scale if scale > 1 else 2.0

    def cubic(x, a=-0.5):  # antialias path uses a=-0.5 (PIL), not -0.75
        x = np.abs(x)
        return np.where(
            x < 1,
            ((a + 2) * x - (a + 3)) * x * x + 1,
            np.where(x < 2, (((x - 5) * x + 8) * x - 4) * a, 0.0),
        )

    A = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        center = scale * (i + 0.5)
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), n_in)
        js = np.arange(xmin, xmax)
        w = cubic((js - center + 0.5) * invs)
        A[i, xmin:xmax] = w / w.sum()
    return A.astype(np.float32)


@functools.lru_cache(maxsize=32)
def _aa_weights_cached(n_in: int, n_out: int):
    # cache the NUMPY matrix, not a jnp array: jnp.asarray inside a jit
    # trace yields a tracer, and caching that leaks it into later traces
    # (UnexpectedTracerError when a second batch shape retraces the tower)
    return _aa_bicubic_weights(n_in, n_out)


def resize_bicubic(x: jax.Array, hw) -> jax.Array:
    """Exact kornia/torch-parity antialiased bicubic resize (NHWC).

    Separable matmul form — two small einsums that XLA maps onto the MXU —
    with precomputed torch-semantics weight matrices (align_corners=True,
    antialias=True, matching reference modules.py:620-632)."""
    _, h, w, _ = x.shape
    ah = _aa_weights_cached(h, hw[0])
    aw = _aa_weights_cached(w, hw[1])
    y = jnp.einsum("oh,bhwc->bowc", ah, x.astype(jnp.float32))
    y = jnp.einsum("pw,bowc->bopc", aw, y)
    return y.astype(x.dtype)


def resize_bilinear(x: jax.Array, hw) -> jax.Array:
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), method="bilinear", antialias=False)


class _MHA(nn.Module):
    """CLIP-style multi-head self-attention with packed qkv projection."""

    heads: int
    causal: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, s, c = x.shape
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = c // self.heads
        q = q.reshape(b, s, self.heads, d)
        k = k.reshape(b, s, self.heads, d)
        v = v.reshape(b, s, self.heads, d)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        logits = logits.astype(jnp.float32) * (d**-0.5)
        if self.causal:
            mask = jnp.tril(jnp.ones((s, s), bool))
            logits = jnp.where(mask, logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out.reshape(b, s, c))


class _ResBlock(nn.Module):
    heads: int
    quick_gelu: bool = False
    causal: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(
            x.astype(jnp.float32)
        ).astype(x.dtype)
        x = x + _MHA(
            self.heads, causal=self.causal, dtype=self.dtype, name="attn"
        )(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(
            x.astype(jnp.float32)
        ).astype(x.dtype)
        c = x.shape[-1]
        h = nn.Dense(4 * c, dtype=self.dtype, name="mlp_c_fc")(h)
        if self.quick_gelu:
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c, dtype=self.dtype, name="mlp_c_proj")(h)
        return x + h


class CLIPVisionTransformer(nn.Module):
    """Pre-LN CLIP image encoder → pooled (projected) embedding."""

    width: int = 1280
    layers: int = 32
    heads: int = 16
    patch_size: int = 14
    image_size: int = 224
    output_dim: int = 1024
    quick_gelu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b = x.shape[0]
        grid = self.image_size // self.patch_size
        x = nn.Conv(
            self.width,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            padding="VALID",
            dtype=self.dtype,
            name="conv1",
        )(x.astype(self.dtype))
        x = x.reshape(b, grid * grid, self.width)

        cls = self.param(
            "class_embedding",
            nn.initializers.normal(self.width**-0.5),
            (self.width,),
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.width**-0.5),
            (grid * grid + 1, self.width),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.width)), x], axis=1
        )
        x = x + pos.astype(x.dtype)

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        for i in range(self.layers):
            x = _ResBlock(
                self.heads, quick_gelu=self.quick_gelu, dtype=self.dtype,
                name=f"resblocks_{i}",
            )(x)

        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(
            x[:, 0].astype(jnp.float32)
        ).astype(self.dtype)
        proj = self.param(
            "proj",
            nn.initializers.normal(self.width**-0.5),
            (self.width, self.output_dim),
        )
        return pooled @ proj.astype(pooled.dtype)


def vit_h_14(**kw) -> CLIPVisionTransformer:
    """OpenCLIP ViT-H-14 visual tower (laion2b_s32b_b79k layout)."""
    return CLIPVisionTransformer(
        width=1280, layers=32, heads=16, patch_size=14, output_dim=1024,
        quick_gelu=False, **kw,
    )


def vit_l_14(**kw) -> CLIPVisionTransformer:
    """OpenAI CLIP ViT-L/14 visual tower (QuickGELU)."""
    return CLIPVisionTransformer(
        width=1024, layers=24, heads=16, patch_size=14, output_dim=768,
        quick_gelu=True, **kw,
    )


class AestheticMLP(nn.Module):
    """LAION improved-aesthetic-predictor head (reference tools/aes_score.py:14-32):
    768 → 1024 → 128 → 64 → 16 → 1, linear (dropout is inference-disabled)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, width in enumerate([1024, 128, 64, 16, 1]):
            x = nn.Dense(width, dtype=self.dtype, name=f"layers_{i}")(x)
        return x


class CLIPTextTransformer(nn.Module):
    """CLIP/OpenCLIP text tower (causal pre-LN transformer).

    Inputs are token ids (B, L) — BPE tokenization is host-side (the vocab
    ships with the open_clip/clip packages, not this repo). Returns
    (pooled (B, proj), tokens (B, L, width)); `pooled` reads the EOT position
    (argmax of ids, CLIP convention) through ln_final and text_projection.
    """

    vocab_size: int = 49408
    width: int = 1024
    layers: int = 24
    heads: int = 16
    context_length: int = 77
    proj_dim: int = 1024
    quick_gelu: bool = False
    output_hidden: bool = False  # also return per-layer states + ln_final'd seq
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jax.Array):
        b, s = ids.shape
        tok = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = tok[ids].astype(self.dtype) + pos[:s].astype(self.dtype)
        hidden = [x]  # hidden[0] = embeddings; hidden[i] = after block i
        for i in range(self.layers):
            x = _ResBlock(
                self.heads, quick_gelu=self.quick_gelu, causal=True,
                dtype=self.dtype, name=f"resblocks_{i}",
            )(x)
            hidden.append(x)
        tokens = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(
            x.astype(jnp.float32)
        ).astype(x.dtype)
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width**-0.5),
            (self.width, self.proj_dim),
        )
        eot = jnp.argmax(ids, axis=-1)
        pooled = x[jnp.arange(b), eot] @ proj.astype(x.dtype)
        if self.output_hidden:
            return pooled, tokens, {"hidden": tuple(hidden), "final": x}
        return pooled, tokens


def text_vit_h_14(dtype=jnp.float32, **kw) -> CLIPTextTransformer:
    """OpenCLIP ViT-H/14 text tower (width 1024, 24 layers)."""
    return CLIPTextTransformer(dtype=dtype, **kw)


def text_vit_l_14(dtype=jnp.float32, **kw) -> CLIPTextTransformer:
    """OpenAI CLIP ViT-L/14 text tower (width 768, 12 layers, quickGELU)."""
    return CLIPTextTransformer(
        width=768, layers=12, heads=12, proj_dim=768, quick_gelu=True,
        dtype=dtype, **kw,
    )
