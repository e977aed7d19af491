"""InceptionV3 feature extractor (FID-style block taps).

Functional parity target: reference sgm/modules/encoders/modules.py:187-204 —
a wrapper around the pytorch-fid InceptionV3 port (mseitzer/pytorch-fid
inception.py) that resizes inputs to 299², optionally renormalizes from
[0,1] to [-1,1], and returns the requested block features (default: the
final 2048-d pooled features, squeezed).

This is a from-scratch flax implementation of the torchvision Inception-v3
trunk (BasicConv2d = Conv + BatchNorm(eps 1e-3) + ReLU; Inception A/B/C/D/E
mixes), NHWC, organized into the same four FID blocks:
  block 0: Conv2d_1a..2b + maxpool   (→ 64ch,  /4)
  block 1: Conv2d_3b..4a + maxpool   (→ 192ch, /8)
  block 2: Mixed_5b..6e              (→ 768ch, /16)
  block 3: Mixed_7a..7c + avgpool    (→ 2048ch, pooled)
`convert_inception_key` maps a torchvision / pytorch-fid state dict onto the
module for loading the pretrained weights. Inference-only (BatchNorm uses the
stored running statistics).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.out_channels, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, dtype=self.dtype, name="bn"
        )(x)
        return nn.relu(x)


def _avg_pool_3x3(x: jax.Array, exclude_pad: bool) -> jax.Array:
    """torch AvgPool2d(3, stride=1, padding=1).

    exclude_pad=True matches `count_include_pad=False` — the divisor is the
    number of *valid* taps per window (pytorch-fid patches the pool branches
    of FIDInceptionA/C/E this way); False is the torchvision default, which
    counts padded zeros (divisor always 9).
    """
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    if not exclude_pad:
        return s / 9.0
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return s / counts


def _max_pool_3x3_s1(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(3, stride=1, padding=1) — the pool branch of
    pytorch-fid's FIDInceptionE_2 (Mixed_7c)."""
    return nn.max_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)))


def _max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    return nn.max_pool(x, (3, 3), (2, 2))


class InceptionA(nn.Module):
    pool_features: int
    pool_exclude_pad: bool = True  # pytorch-fid FIDInceptionA patch
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=d, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=d, name="branch5x5_1")(x)
        b5 = BasicConv2d(
            64, (5, 5), padding=((2, 2), (2, 2)), dtype=d, name="branch5x5_2"
        )(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(
            96, (3, 3), padding=((1, 1), (1, 1)), dtype=d, name="branch3x3dbl_2"
        )(b3)
        b3 = BasicConv2d(
            96, (3, 3), padding=((1, 1), (1, 1)), dtype=d, name="branch3x3dbl_3"
        )(b3)
        bp = _avg_pool_3x3(x, self.pool_exclude_pad)
        bp = BasicConv2d(
            self.pool_features, (1, 1), dtype=d, name="branch_pool"
        )(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), dtype=d, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(
            96, (3, 3), padding=((1, 1), (1, 1)), dtype=d, name="branch3x3dbl_2"
        )(bd)
        bd = BasicConv2d(
            96, (3, 3), strides=(2, 2), dtype=d, name="branch3x3dbl_3"
        )(bd)
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    pool_exclude_pad: bool = True  # pytorch-fid FIDInceptionC patch
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, c7 = self.dtype, self.channels_7x7
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = BasicConv2d(192, (1, 1), dtype=d, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=p17, dtype=d, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=p71, dtype=d, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=p71, dtype=d, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=p17, dtype=d, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=p71, dtype=d, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=p17, dtype=d, name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3(x, self.pool_exclude_pad)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(192, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), dtype=d, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=d, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(
            192, (1, 7), padding=((0, 0), (3, 3)), dtype=d, name="branch7x7x3_2"
        )(b7)
        b7 = BasicConv2d(
            192, (7, 1), padding=((3, 3), (0, 0)), dtype=d, name="branch7x7x3_3"
        )(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), dtype=d, name="branch7x7x3_4")(b7)
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # pytorch-fid: FIDInceptionE_1 (Mixed_7b) patches the pool branch to
    # exclude-pad avg pooling; FIDInceptionE_2 (Mixed_7c) uses MAX pooling.
    pool_mode: str = "avg_exclude_pad"  # avg_exclude_pad | avg_include_pad | max
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(320, (1, 1), dtype=d, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3a = BasicConv2d(
            384, (1, 3), padding=((0, 0), (1, 1)), dtype=d, name="branch3x3_2a"
        )(b3)
        b3b = BasicConv2d(
            384, (3, 1), padding=((1, 1), (0, 0)), dtype=d, name="branch3x3_2b"
        )(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(
            384, (3, 3), padding=((1, 1), (1, 1)), dtype=d, name="branch3x3dbl_2"
        )(bd)
        bda = BasicConv2d(
            384, (1, 3), padding=((0, 0), (1, 1)), dtype=d, name="branch3x3dbl_3a"
        )(bd)
        bdb = BasicConv2d(
            384, (3, 1), padding=((1, 1), (0, 0)), dtype=d, name="branch3x3dbl_3b"
        )(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "max":
            bp = _max_pool_3x3_s1(x)
        else:
            bp = _avg_pool_3x3(x, self.pool_mode == "avg_exclude_pad")
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Trunk(nn.Module):
    """Inception-v3 feature trunk returning the four FID block outputs that
    `output_blocks` requests (pytorch-fid inception.py block layout)."""

    output_blocks: Sequence[int] = (3,)
    # True = pytorch-fid semantics (exclude-pad avg pools in A/C/E branches,
    # max pool at Mixed_7c) — what the reference wrapper loads FID weights
    # into; False = plain torchvision inception_v3.
    fid_variant: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        d = self.dtype
        xp = self.fid_variant  # exclude-pad in patched branches
        e1_mode = "avg_exclude_pad" if xp else "avg_include_pad"
        e2_mode = "max" if xp else "avg_include_pad"
        outs = {}
        last = max(self.output_blocks)
        # block 0
        x = BasicConv2d(32, (3, 3), strides=(2, 2), dtype=d, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(
            64, (3, 3), padding=((1, 1), (1, 1)), dtype=d, name="Conv2d_2b_3x3"
        )(x)
        x = _max_pool_3x3_s2(x)
        outs[0] = x
        if last >= 1:
            x = BasicConv2d(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x)
            x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
            x = _max_pool_3x3_s2(x)
            outs[1] = x
        if last >= 2:
            x = InceptionA(32, pool_exclude_pad=xp, dtype=d, name="Mixed_5b")(x)
            x = InceptionA(64, pool_exclude_pad=xp, dtype=d, name="Mixed_5c")(x)
            x = InceptionA(64, pool_exclude_pad=xp, dtype=d, name="Mixed_5d")(x)
            x = InceptionB(dtype=d, name="Mixed_6a")(x)
            x = InceptionC(128, pool_exclude_pad=xp, dtype=d, name="Mixed_6b")(x)
            x = InceptionC(160, pool_exclude_pad=xp, dtype=d, name="Mixed_6c")(x)
            x = InceptionC(160, pool_exclude_pad=xp, dtype=d, name="Mixed_6d")(x)
            x = InceptionC(192, pool_exclude_pad=xp, dtype=d, name="Mixed_6e")(x)
            outs[2] = x
        if last >= 3:
            x = InceptionD(dtype=d, name="Mixed_7a")(x)
            x = InceptionE(pool_mode=e1_mode, dtype=d, name="Mixed_7b")(x)
            x = InceptionE(pool_mode=e2_mode, dtype=d, name="Mixed_7c")(x)
            x = jnp.mean(x, axis=(1, 2), keepdims=True)  # adaptive avg → 1×1
            outs[3] = x
        return [outs[i] for i in self.output_blocks]


class InceptionV3:
    """Config-facing wrapper (reference modules.py:187-204 semantics):
    bilinear-resize to 299², optional [0,1]→[-1,1] renorm, trunk taps, and
    the final squeeze when a single (pooled) block is requested."""

    def __init__(
        self,
        normalize_input: bool = False,
        resize_input: bool = True,  # forced True by the reference wrapper
        output_blocks: Sequence[int] = (3,),
        ckpt_path: Optional[str] = None,
        fid_variant: bool = True,
        dtype: Dtype = jnp.float32,
        **_unused,
    ):
        self.normalize_input = normalize_input
        self.resize_input = True if resize_input is None else bool(resize_input)
        self.module = InceptionV3Trunk(
            output_blocks=tuple(output_blocks), fid_variant=fid_variant,
            dtype=dtype,
        )
        self.params = None
        if ckpt_path is not None:
            self.params = load_inception_params(ckpt_path)

    def init(self, rng: jax.Array):
        if self.params is None:
            x = jnp.zeros((1, 299, 299, 3))
            self.params = jax.jit(self.module.init)(rng, x)
        return self.params

    def __call__(self, x: jax.Array):
        """x: (B, H, W, 3) NHWC. Returns pooled (B, 2048) features for the
        default single-block config, else the list of block maps."""
        if self.params is None:
            self.init(jax.random.PRNGKey(0))
        if self.resize_input and x.shape[1:3] != (299, 299):
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[-1]), "bilinear"
            )
        if self.normalize_input:
            x = 2.0 * x - 1.0
        outs = self.module.apply(self.params, x)
        if len(outs) == 1:
            out = outs[0]
            if out.shape[1] == out.shape[2] == 1:
                return out.reshape(out.shape[0], -1)  # squeeze pooled map
            return out
        return outs


def load_inception_params(path: str) -> Dict:
    """torchvision / pytorch-fid inception_v3 state dict → trunk variables.

    Keys look like `Mixed_5b.branch1x1.conv.weight` and `...bn.{weight,bias,
    running_mean,running_var}`. Conv weights transpose OIHW→HWIO; BN affine
    params land in `params`, running stats in `batch_stats`; the fc /
    AuxLogits heads and `num_batches_tracked` counters are dropped.
    """
    import flax

    from ..convert.torch_to_jax import load_torch_state_dict

    sd = load_torch_state_dict(path)
    params: Dict = {}
    stats: Dict = {}
    for k, v in sd.items():
        parts = k.split(".")
        if parts[0] in ("fc", "AuxLogits") or parts[-1] == "num_batches_tracked":
            continue
        scope, leaf = tuple(parts[:-1]), parts[-1]
        if leaf == "weight" and v.ndim == 4:
            params[scope + ("kernel",)] = jnp.asarray(v.transpose(2, 3, 1, 0))
        elif parts[-2] == "bn" and leaf == "weight":
            params[scope + ("scale",)] = jnp.asarray(v)
        elif leaf == "bias":
            params[scope + ("bias",)] = jnp.asarray(v)
        elif leaf == "running_mean":
            stats[scope + ("mean",)] = jnp.asarray(v)
        elif leaf == "running_var":
            stats[scope + ("var",)] = jnp.asarray(v)
    unflatten = flax.traverse_util.unflatten_dict
    return {"params": unflatten(params), "batch_stats": unflatten(stats)}
