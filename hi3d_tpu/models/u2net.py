"""U²-Net salient-object segmentation in flax, NHWC — the native TPU
replacement for the `rembg` dependency in the stage-1 CLI preprocessing
(reference pipeline_i2v_eval_v01.py:153-156 calls `rembg.remove`, which runs
the U²-Net saliency model (Qin et al., 2020) under onnxruntime).

Capability parity:
- full `u2net` (RSU depths 7..4, widths 64..512) and light `u2netp`
  (all widths 64, mid 16) variants — the two models rembg ships;
- inference pre/post-processing matching rembg's u2net session: bilinear
  resize to 320², divide by per-image max, normalize with ImageNet
  mean/(0.229,0.224,0.225) std, run, min-max normalize the fused side
  output, bilinear resize back to the source resolution;
- weights load from the released `u2net.pth` / `u2netp.pth` torch
  checkpoints via `hi3d_tpu.convert.torch_to_jax.load_u2net`.

Architecture (what the torch source computes, re-expressed in NHWC):
- REBNCONV = 3×3 conv (dilation d, SAME) → BatchNorm → ReLU. BatchNorm is
  frozen at inference: running stats are loaded as parameters and applied
  as an affine in fp32.
- RSU-L block: conv_in (in→out) then an L−1 level mini U-Net over mid
  channels: L−2 ceil-mode 2×2 maxpools down, one dilation-2 conv at the
  bottom, concat-skip decoders with ×2 bilinear upsampling; residual add
  with conv_in's output.
- RSU-4F: the pool-free variant — dilations 1,2,4,8 down and 4,2,1 up.
- U²-Net: 6 encoder stages (pooling between), 5 decoder stages with
  concat skips, 6 per-stage 3×3 side heads upsampled to input size, and a
  1×1 fusion conv over the 6 side maps; every output through a sigmoid.

TPU notes: everything is convs + 2× resizes — pure XLA territory (no custom
kernels needed); upsampling uses half-pixel bilinear (torch
`align_corners=False`) via `jax.image.resize`, exact to the torch graph.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def _resize_bilinear(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """(B, H, W, C) half-pixel bilinear resize (torch align_corners=False)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), "bilinear").astype(x.dtype)


def _maxpool_ceil(x: jax.Array) -> jax.Array:
    """2×2 stride-2 max pool with ceil_mode=True (torch nn.MaxPool2d)."""
    pad_h, pad_w = x.shape[1] % 2, x.shape[2] % 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, 2, 2, 1),
        (1, 2, 2, 1),
        ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
    )


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm2d: affine with loaded running statistics.

    Stats and affine run fp32 regardless of compute dtype (the scale factor
    1/sqrt(var+eps) is tiny math on C-sized vectors — precision is free).
    """

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        mul = scale * jax.lax.rsqrt(var + self.eps)
        add = bias - mean * mul
        return (x.astype(jnp.float32) * mul + add).astype(self.dtype)


class REBNConv(nn.Module):
    """3×3 conv (dilated, SAME) → frozen BN → ReLU."""

    features: int
    dirate: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = self.dirate
        x = nn.Conv(
            self.features,
            (3, 3),
            kernel_dilation=(d, d),
            padding=((d, d), (d, d)),
            dtype=self.dtype,
            name="conv",
        )(x)
        x = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class RSU(nn.Module):
    """ReSidual U-block of height L (RSU-7 … RSU-4).

    conv_in lifts to `out_ch`; convs 1..L−1 run at `mid_ch` with ceil-mode
    maxpools after convs 1..L−2; conv L is the dilation-2 bottom; decoders
    (L−1)d..1d consume concat(skip, ×2-upsampled deeper feature).
    """

    height: int
    mid_ch: int
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        L = self.height
        hxin = REBNConv(self.out_ch, dtype=self.dtype, name="rebnconvin")(x)

        # encoder: conv1..conv_{L-1}, pools after conv1..conv_{L-2}
        feats = []
        hx = hxin
        for i in range(1, L):
            hx = REBNConv(self.mid_ch, dtype=self.dtype, name=f"rebnconv{i}")(hx)
            feats.append(hx)
            if i <= L - 2:
                hx = _maxpool_ceil(hx)

        # bottom dilated conv
        hx = REBNConv(self.mid_ch, dirate=2, dtype=self.dtype, name=f"rebnconv{L}")(
            feats[-1]
        )

        # decoder
        for i in range(L - 1, 0, -1):
            skip = feats[i - 1]
            if hx.shape[1:3] != skip.shape[1:3]:
                hx = _resize_bilinear(hx, skip.shape[1:3])
            ch = self.out_ch if i == 1 else self.mid_ch
            hx = REBNConv(ch, dtype=self.dtype, name=f"rebnconv{i}d")(
                jnp.concatenate([hx, skip], axis=-1)
            )

        return hx + hxin


class RSU4F(nn.Module):
    """Pool-free RSU: dilations 1,2,4,8 down, 4,2,1 up."""

    mid_ch: int
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hxin = REBNConv(self.out_ch, dtype=self.dtype, name="rebnconvin")(x)
        hx1 = REBNConv(self.mid_ch, dirate=1, dtype=self.dtype, name="rebnconv1")(hxin)
        hx2 = REBNConv(self.mid_ch, dirate=2, dtype=self.dtype, name="rebnconv2")(hx1)
        hx3 = REBNConv(self.mid_ch, dirate=4, dtype=self.dtype, name="rebnconv3")(hx2)
        hx4 = REBNConv(self.mid_ch, dirate=8, dtype=self.dtype, name="rebnconv4")(hx3)
        hx3d = REBNConv(self.mid_ch, dirate=4, dtype=self.dtype, name="rebnconv3d")(
            jnp.concatenate([hx4, hx3], axis=-1)
        )
        hx2d = REBNConv(self.mid_ch, dirate=2, dtype=self.dtype, name="rebnconv2d")(
            jnp.concatenate([hx3d, hx2], axis=-1)
        )
        hx1d = REBNConv(self.out_ch, dirate=1, dtype=self.dtype, name="rebnconv1d")(
            jnp.concatenate([hx2d, hx1], axis=-1)
        )
        return hx1d + hxin


class U2Net(nn.Module):
    """U²-Net saliency model; `full=True` → u2net, `full=False` → u2netp.

    Input (B, H, W, 3) preprocessed floats; returns (d0, [d1..d6]) sigmoid
    saliency maps, each (B, H, W, 1). H, W need not be multiples of 32 —
    ceil-mode pooling + size-matched upsampling handle any size ≥ 32.
    """

    full: bool = True
    out_ch: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, Sequence[jax.Array]]:
        dt = self.dtype
        if self.full:
            enc = [
                RSU(7, 32, 64, dt, name="stage1"),
                RSU(6, 32, 128, dt, name="stage2"),
                RSU(5, 64, 256, dt, name="stage3"),
                RSU(4, 128, 512, dt, name="stage4"),
                RSU4F(256, 512, dt, name="stage5"),
                RSU4F(256, 512, dt, name="stage6"),
            ]
            dec = [
                RSU4F(256, 512, dt, name="stage5d"),
                RSU(4, 128, 256, dt, name="stage4d"),
                RSU(5, 64, 128, dt, name="stage3d"),
                RSU(6, 32, 64, dt, name="stage2d"),
                RSU(7, 16, 64, dt, name="stage1d"),
            ]
        else:  # u2netp
            enc = [
                RSU(7, 16, 64, dt, name="stage1"),
                RSU(6, 16, 64, dt, name="stage2"),
                RSU(5, 16, 64, dt, name="stage3"),
                RSU(4, 16, 64, dt, name="stage4"),
                RSU4F(16, 64, dt, name="stage5"),
                RSU4F(16, 64, dt, name="stage6"),
            ]
            dec = [
                RSU4F(16, 64, dt, name="stage5d"),
                RSU(4, 16, 64, dt, name="stage4d"),
                RSU(5, 16, 64, dt, name="stage3d"),
                RSU(6, 16, 64, dt, name="stage2d"),
                RSU(7, 16, 64, dt, name="stage1d"),
            ]

        x = x.astype(dt)
        skips = []
        hx = x
        for i, stage in enumerate(enc[:5]):
            hx = stage(hx)
            skips.append(hx)
            hx = _maxpool_ceil(hx)
        hx6 = enc[5](hx)

        # decoder with concat skips
        outs = [hx6]
        hx = hx6
        for stage, skip in zip(dec, reversed(skips)):
            hx = _resize_bilinear(hx, skip.shape[1:3])
            hx = stage(jnp.concatenate([hx, skip], axis=-1))
            outs.append(hx)
        # outs = [hx6, hx5d, hx4d, hx3d, hx2d, hx1d]

        size = x.shape[1:3]
        sides = []
        for i, feat in enumerate(reversed(outs)):  # hx1d .. hx6
            d = nn.Conv(
                self.out_ch, (3, 3), padding=1, dtype=dt, name=f"side{i + 1}"
            )(feat)
            if d.shape[1:3] != size:
                d = _resize_bilinear(d, size)
            sides.append(d)

        d0 = nn.Conv(self.out_ch, (1, 1), dtype=dt, name="outconv")(
            jnp.concatenate(sides, axis=-1)
        )
        sig = jax.nn.sigmoid
        return sig(d0.astype(jnp.float32)), [
            sig(d.astype(jnp.float32)) for d in sides
        ]


# --------------------------------------------------------------------------
# rembg-parity inference helpers
# --------------------------------------------------------------------------

_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_STD = jnp.asarray([0.229, 0.224, 0.225])


def preprocess(rgb: jax.Array, size: int = 320) -> jax.Array:
    """uint8/float (H, W, 3) → (1, size, size, 3) normalized like rembg.

    rembg's u2net session resizes to 320² (bilinear), scales by the
    per-image max, then applies ImageNet mean with std (.229,.224,.225).
    """
    x = jnp.asarray(rgb, jnp.float32)[None]
    x = _resize_bilinear(x, (size, size))
    x = x / jnp.maximum(x.max(), 1e-6)
    return (x - _MEAN) / _STD


def postprocess(d0: jax.Array, out_size: Tuple[int, int]) -> jax.Array:
    """Fused side output → (H, W) float mask in [0, 1] at source size."""
    m = d0
    lo, hi = m.min(), m.max()
    m = (m - lo) / jnp.maximum(hi - lo, 1e-6)
    return _resize_bilinear(m, out_size)[0, :, :, 0]


def segment(model: U2Net, params, rgb, size: int = 320) -> jax.Array:
    """Full rembg-equivalent mask inference for one (H, W, 3) image."""
    x = preprocess(rgb, size=size)
    d0, _ = model.apply(params, x)
    return postprocess(d0, rgb.shape[:2])
