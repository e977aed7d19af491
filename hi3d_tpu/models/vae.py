"""KL-regularized autoencoder (the SD f=8 VAE) — first stage of both Hi3D
models.

Functional parity targets (reference file:line):
- Encoder/Decoder: sgm/modules/diffusionmodules/model.py:487-602, :604-748
  (ch 128, ch_mult [1,2,4,4], 2 res blocks, mid attention, GroupNorm eps 1e-6)
- DiagonalGaussianDistribution: sgm/modules/distributions/distributions.py:24-75
- AutoencoderKL / AutoencoderKLModeOnly: sgm/models/autoencoder.py:508-520,
  :606-619 — ModeOnly returns the posterior mode deterministically and is used
  to encode conditioning frames.

Layout: NHWC. The mid-block attention is single-head over ≤(H/8·W/8) tokens —
plain XLA einsum attention (no flash kernel needed at these sizes).

The engine applies `scale_factor` (0.18215) and frame-chunked encode/decode
(`en_and_decode_n_samples_a_time`) on top of this module; at 1024² the decode
additionally supports spatial tiling (see hi3d_tpu.engine) to bound HBM.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class VaeGroupNorm(nn.Module):
    """GroupNorm(32, eps=1e-6) in fp32 (reference model.py `Normalize`)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import math

        groups = math.gcd(x.shape[-1], 32)
        y = nn.GroupNorm(
            num_groups=groups, epsilon=1e-6, dtype=jnp.float32, name="norm"
        )(x.astype(jnp.float32))
        return y.astype(x.dtype)


class VaeResnetBlock(nn.Module):
    out_channels: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        in_ch = x.shape[-1]
        h = VaeGroupNorm(name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
            name="conv1",
        )(h)
        h = VaeGroupNorm(name="norm2")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
            name="conv2",
        )(h)
        if in_ch != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="nin_shortcut"
            )(x)
        return x + h


class VaeAttnBlock(nn.Module):
    """Single-head self-attention over H·W tokens (reference model.py:231-260)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        hn = VaeGroupNorm(name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn).reshape(n, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn).reshape(n, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn).reshape(n, h * w, c)

        logits = jnp.einsum("nqc,nkc->nqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits.astype(jnp.float32) * (c**-0.5), axis=-1)
        out = jnp.einsum(
            "nqk,nkc->nqc", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = out.reshape(n, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class VaeDownsample(nn.Module):
    """Asymmetric-pad stride-2 conv (torch pads (0,1,0,1); model.py:181-200)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        return nn.Conv(
            c, (3, 3), strides=(2, 2), padding=[(0, 1), (0, 1)], dtype=self.dtype,
            name="conv",
        )(x)


class VaeUpsample(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(
            c, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv"
        )(x)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dropout: float = 0.0
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256  # only used for attn_resolutions bookkeeping
    in_channels: int = 3
    out_ch: int = 3  # decoder-side param, accepted for config parity
    attn_type: str = "vanilla"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = nn.Conv(
            self.ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
            name="conv_in",
        )(x.astype(self.dtype))
        curr_res = self.resolution
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = VaeResnetBlock(
                    self.ch * mult, self.dropout, dtype=self.dtype,
                    name=f"down_{i}_block_{j}",
                )(h, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = VaeAttnBlock(dtype=self.dtype, name=f"down_{i}_attn_{j}")(h)
            if i != len(self.ch_mult) - 1:
                h = VaeDownsample(dtype=self.dtype, name=f"down_{i}_downsample")(h)
                curr_res //= 2

        h = VaeResnetBlock(h.shape[-1], self.dropout, dtype=self.dtype, name="mid_block_1")(
            h, deterministic=deterministic
        )
        h = VaeAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VaeResnetBlock(h.shape[-1], self.dropout, dtype=self.dtype, name="mid_block_2")(
            h, deterministic=deterministic
        )

        h = VaeGroupNorm(name="norm_out")(h)
        h = nn.silu(h)
        out_c = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(
            out_c, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
            name="conv_out",
        )(h)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    out_ch: int = 3
    dropout: float = 0.0
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    in_channels: int = 3
    double_z: bool = True  # accepted for config parity
    attn_type: str = "vanilla"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(
            block_in, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
            name="conv_in",
        )(z.astype(self.dtype))

        h = VaeResnetBlock(block_in, self.dropout, dtype=self.dtype, name="mid_block_1")(
            h, deterministic=deterministic
        )
        h = VaeAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VaeResnetBlock(block_in, self.dropout, dtype=self.dtype, name="mid_block_2")(
            h, deterministic=deterministic
        )

        for i in reversed(range(len(self.ch_mult))):
            block_out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks + 1):
                h = VaeResnetBlock(
                    block_out, self.dropout, dtype=self.dtype,
                    name=f"up_{i}_block_{j}",
                )(h, deterministic=deterministic)
            if i != 0:
                h = VaeUpsample(dtype=self.dtype, name=f"up_{i}_upsample")(h)

        h = VaeGroupNorm(name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(
            self.out_ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
            name="conv_out",
        )(h)


class DiagonalGaussianDistribution:
    """Posterior N(mean, diag(exp(logvar))); channels-last moments."""

    def __init__(self, parameters: jax.Array, deterministic: bool = False):
        self.parameters = parameters
        mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jax.Array:
        if self.deterministic:
            return self.mean
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, dtype=self.mean.dtype
        )

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self, other: Optional["DiagonalGaussianDistribution"] = None) -> jax.Array:
        if self.deterministic:
            return jnp.zeros(self.mean.shape[0])
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(
                self.mean**2 + self.var - 1.0 - self.logvar, axis=axes
            )
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jax.Array) -> jax.Array:
        if self.deterministic:
            return jnp.zeros(sample.shape[0])
        logtwopi = jnp.log(2.0 * jnp.pi)
        axes = tuple(range(1, self.mean.ndim))
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var, axis=axes
        )


class AutoencoderKLModule(nn.Module):
    """Encoder + quant convs + Decoder as one flax module."""

    ddconfig: dict
    embed_dim: int = 4
    dtype: Dtype = jnp.float32

    def setup(self):
        dd = dict(self.ddconfig)
        dd.pop("attn_type", None)  # backend chosen per-shape on TPU
        self.encoder = Encoder(dtype=self.dtype, **dd)
        self.decoder = Decoder(dtype=self.dtype, **dd)
        double = 2 if dd.get("double_z", True) else 1
        self.quant_conv = nn.Conv(
            double * self.embed_dim, (1, 1), dtype=self.dtype, name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            dd.get("z_channels", 4), (1, 1), dtype=self.dtype,
            name="post_quant_conv",
        )

    def encode_moments(self, x: jax.Array) -> jax.Array:
        return self.quant_conv(self.encoder(x))

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array, rng: Optional[jax.Array] = None):
        moments = self.encode_moments(x)
        posterior = DiagonalGaussianDistribution(moments)
        z = posterior.sample(rng) if rng is not None else posterior.mode()
        return self.decode(z), posterior


class AutoencoderKL:
    """Config-facing wrapper: holds the module + params and mirrors the
    reference's encode/decode API (sample_posterior toggled by subclass)."""

    sample_posterior: bool = True

    def __init__(
        self,
        ddconfig: dict,
        embed_dim: int = 4,
        lossconfig: Optional[dict] = None,  # unused (Identity in Hi3D configs)
        monitor: Optional[str] = None,
        ckpt_path: Optional[str] = None,
        dtype: Dtype = jnp.float32,
        **_unused,
    ):
        self.module = AutoencoderKLModule(
            ddconfig=dict(ddconfig), embed_dim=embed_dim, dtype=dtype
        )
        self.embed_dim = embed_dim
        self.params = None
        if ckpt_path is not None:
            from ..convert.torch_to_jax import load_autoencoder_params

            self.params = load_autoencoder_params(ckpt_path)

    def init(self, rng: jax.Array, image_hw: Tuple[int, int] = (32, 32)):
        from ..utils.misc import module_init

        x = jnp.zeros((1, *image_hw, self.module.ddconfig.get("in_channels", 3)))
        # jitted (or zero-filled under HI3D_ZERO_INIT) — eager flax init
        # dispatches the conv graph op-by-op through the TPU tunnel
        self.params = module_init(self.module.init, rng, x)  # __call__ = encode + decode
        return self.params

    def _applier(self, name: str, method):
        """Cached jitted module.apply with params as an XLA argument.

        Eager apply dispatches the conv graph op-by-op (pathological through
        the TPU tunnel) and holds every intermediate alive — a 16-frame fp32
        decode at 512² held several GB of un-fused temporaries. One jit per
        method; retraces only on new input shapes. When already under an
        outer trace, jit inlines."""
        import functools

        from ..utils.misc import instance_jit
        from ..utils.program_cache import flax_module_key

        return instance_jit(
            self,
            name,
            functools.partial(self.module.apply, method=method),
            program_key=flax_module_key(self.module),
        )

    def encode(
        self,
        x: jax.Array,
        rng: Optional[jax.Array] = None,
        return_posterior: bool = False,
        params=None,  # weight-tree override (serve.py: mesh-replicated copy)
    ):
        moments = self._applier("encode_moments", self.module.encode_moments)(
            self.params if params is None else params, x
        )
        posterior = DiagonalGaussianDistribution(moments)
        if self.sample_posterior and rng is not None:
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        if return_posterior:
            return z, posterior
        return z

    def decode(self, z: jax.Array, params=None) -> jax.Array:
        return self._applier("decode", self.module.decode)(
            self.params if params is None else params, z
        )

    def decode_tiled(
        self,
        z: jax.Array,
        tile: int = 64,
        overlap: int = 16,
        params=None,
    ) -> jax.Array:
        """Spatially tiled decode with feathered overlap blending.

        The reference sidesteps 1024² decode memory by decoding one frame at
        a time on an 80 GB card (en_and_decode_n_samples_a_time=1,
        configs/train-v02.yaml:22). On TPU the (N, 128, 128, 4) → (N, 1024²,3)
        decoder activations can exceed HBM; tiling the *latent* plane into
        `tile`² blocks with `overlap` latent pixels of linear cross-fade keeps
        peak memory at one tile's activations. Fully jittable (static tile
        grid).
        """
        n, h, w, c = z.shape
        if h <= tile and w <= tile:
            return self.decode(z, params=params)
        stride = tile - overlap
        # decoder upsampling factor follows the ch_mult pyramid depth
        f = 2 ** (len(self.module.ddconfig.get("ch_mult", (1, 2, 4, 4))) - 1)

        ys = list(range(0, max(h - tile, 0) + 1, stride))
        if ys[-1] + tile < h:
            ys.append(h - tile)
        xs = list(range(0, max(w - tile, 0) + 1, stride))
        if xs[-1] + tile < w:
            xs.append(w - tile)

        def ramp(total, lo_fade, hi_fade):
            """(tile·f,) feather weights: fade in/out only on interior seams."""
            t = tile * f
            wgt = jnp.ones((t,), jnp.float32)
            fade = overlap * f
            if lo_fade:
                wgt = wgt.at[:fade].set(jnp.linspace(0.0, 1.0, fade + 2)[1:-1])
            if hi_fade:
                wgt = wgt.at[-fade:].set(jnp.linspace(1.0, 0.0, fade + 2)[1:-1])
            return wgt

        out = jnp.zeros((n, h * f, w * f, self.module.ddconfig.get("out_ch", 3)),
                        jnp.float32)
        acc = jnp.zeros((n, h * f, w * f, 1), jnp.float32)
        for yi, y0 in enumerate(ys):
            for xi, x0 in enumerate(xs):
                patch = self.decode(
                    z[:, y0 : y0 + tile, x0 : x0 + tile], params=params
                )
                wy = ramp(h, yi > 0, yi < len(ys) - 1)
                wx = ramp(w, xi > 0, xi < len(xs) - 1)
                wgt = (wy[:, None] * wx[None, :])[None, :, :, None]
                out = out.at[:, y0 * f : (y0 + tile) * f,
                             x0 * f : (x0 + tile) * f].add(
                    patch.astype(jnp.float32) * wgt
                )
                acc = acc.at[:, y0 * f : (y0 + tile) * f,
                             x0 * f : (x0 + tile) * f].add(wgt)
        return (out / jnp.maximum(acc, 1e-8)).astype(z.dtype)


class AutoencoderKLModeOnly(AutoencoderKL):
    """Deterministic posterior mode (used for conditioning-frame encoding)."""

    sample_posterior = False
