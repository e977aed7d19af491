"""Generic autoencoding engine + regularizers.

Functional parity targets (reference file:line):
- AutoencodingEngine: sgm/models/autoencoder.py:102-435 — encoder_config /
  decoder_config / regularizer_config composition with `max_batch_size`
  chunked encode/decode (the GAN training loop is unused by Hi3D: its
  lossconfig is torch.nn.Identity — configs/train-v01.yaml:136-137).
- DiagonalGaussianRegularizer: sgm/modules/autoencoding/regularizers/
  __init__.py:13-31 — sample-or-mode + mean KL log.
- IdentityRegularizer: regularizers/base.py.

The Hi3D-specific KL VAE (AutoencoderKL with a ddconfig) lives in
hi3d_tpu.models.vae; this module provides the config-generic composition the
broader sgm surface exposes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import instantiate_from_config
from .vae import DiagonalGaussianDistribution


class IdentityRegularizer:
    def __call__(self, z: jax.Array, rng: Optional[jax.Array] = None):
        return z, {}


class DiagonalGaussianRegularizer:
    def __init__(self, sample: bool = True):
        self.sample = sample

    def __call__(self, z: jax.Array, rng: Optional[jax.Array] = None):
        posterior = DiagonalGaussianDistribution(z)
        if self.sample and rng is not None:
            out = posterior.sample(rng)
        else:
            out = posterior.mode()
        kl = posterior.kl()
        return out, {"kl_loss": jnp.mean(kl)}


class AutoencodingEngine:
    """encoder → regularizer → decoder with chunked batches."""

    def __init__(
        self,
        encoder_config: Dict,
        decoder_config: Dict,
        regularizer_config: Optional[Dict] = None,
        loss_config: Optional[Dict] = None,  # Identity for Hi3D; unused
        optimizer_config: Optional[Dict] = None,
        lr_g_factor: float = 1.0,
        ckpt_path: Optional[str] = None,
        max_batch_size: Optional[int] = None,
        **_unused,
    ):
        self.encoder = instantiate_from_config(encoder_config)
        self.decoder = instantiate_from_config(decoder_config)
        self.regularization = (
            instantiate_from_config(regularizer_config)
            if regularizer_config
            else IdentityRegularizer()
        )
        self.max_batch_size = max_batch_size
        self.params: Optional[Dict] = None
        if ckpt_path is not None:
            from ..convert.torch_to_jax import load_autoencoder_params

            self.params = load_autoencoder_params(ckpt_path)

    def init(self, rng: jax.Array, image_hw: Tuple[int, int] = (32, 32)):
        from ..utils.misc import module_init

        r1, r2 = jax.random.split(rng)
        x = jnp.zeros((1, *image_hw, getattr(self.encoder, "in_channels", 3)))
        enc = module_init(self.encoder.init, r1, x)
        moments = jax.jit(self.encoder.apply)(enc, x)
        z, _ = self.regularization(moments)
        dec = module_init(self.decoder.init, r2, z)
        self.params = {
            "params": {
                "encoder": enc["params"],
                "decoder": dec["params"],
            }
        }
        return self.params

    def _chunked(self, fn, x: jax.Array) -> jax.Array:
        n = self.max_batch_size or x.shape[0]
        if n >= x.shape[0]:
            return fn(x)
        outs = [fn(x[i : i + n]) for i in range(0, x.shape[0], n)]
        return jnp.concatenate(outs, axis=0)

    def encode(
        self,
        x: jax.Array,
        rng: Optional[jax.Array] = None,
        return_reg_log: bool = False,
    ):
        def run(v):
            moments = self.encoder.apply(
                {"params": self.params["params"]["encoder"]}, v
            )
            z, log = self.regularization(moments, rng=rng)
            return z

        z = self._chunked(run, x)
        if return_reg_log:
            moments = self.encoder.apply(
                {"params": self.params["params"]["encoder"]}, x
            )
            _, log = self.regularization(moments, rng=rng)
            return z, log
        return z

    def decode(self, z: jax.Array, **kwargs) -> jax.Array:
        return self._chunked(
            lambda v: self.decoder.apply(
                {"params": self.params["params"]["decoder"]}, v, **kwargs
            ),
            z,
        )

    def __call__(self, x: jax.Array, rng: Optional[jax.Array] = None):
        z = self.encode(x, rng=rng)
        return self.decode(z), z
