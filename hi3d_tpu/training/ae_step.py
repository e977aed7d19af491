"""Autoencoder adversarial training: the manual two-optimizer loop.

Functional parity target: reference sgm/models/autoencoder.py:98-296 —
`configure_optimizers` builds one optimizer over encoder+decoder (+ logvar +
regularizer params) and one over the discriminator
(get_autoencoder_params/get_discriminator_params, :170-191);
`training_step` alternates them by batch index (:281-296), and
`inner_training_step` routes optimizer_idx into the loss's generator /
discriminator passes with `last_layer = decoder.get_last_layer()`
(:221-279, get_last_layer :193-194 = decoder conv_out weight).

TPU-native shape: both passes are jitted pure functions over an explicit
state pytree; the adaptive discriminator weight differentiates a decode
closure over the decoder's conv_out kernel with `jax.grad` (the functional
counterpart of torch.autograd.grad at the last layer). Optimizers are optax
AdamW; donate the state buffer for in-place HBM updates. Unused by the
shipped Hi3D configs (their AE loss is Identity, configs/train-v01.yaml:
136-137) — this completes the sgm autoencoder-training surface.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import instantiate_from_config


class AutoencoderTrainer:
    """Two-optimizer GAN trainer for an AutoencodingEngine."""

    def __init__(
        self,
        engine,
        loss,
        lr: float = 4.5e-6,
        disc_lr: Optional[float] = None,
        b1: float = 0.5,
        b2: float = 0.9,
    ):
        from ..models.discriminator import GeneralLPIPSWithDiscriminator

        self.engine = engine
        self.loss: GeneralLPIPSWithDiscriminator = (
            instantiate_from_config(loss) if isinstance(loss, dict) else loss
        )
        self.opt_ae = optax.adam(lr, b1=b1, b2=b2)
        self.opt_disc = optax.adam(disc_lr or lr, b1=b1, b2=b2)
        self._gen_step = jax.jit(self._gen_step_impl, donate_argnums=(0,))
        self._disc_step = jax.jit(self._disc_step_impl, donate_argnums=(0,))

    # -- state --------------------------------------------------------------
    def init(self, rng: jax.Array, image_hw=(64, 64), channels: int = 3) -> Dict:
        r1, r2 = jax.random.split(rng)
        if self.engine.params is None:
            self.engine.init(r1, image_hw=image_hw)
        loss_state = self.loss.init(r2, image_hw=image_hw, channels=channels)
        ae_params = {
            "encoder": self.engine.params["params"]["encoder"],
            "decoder": self.engine.params["params"]["decoder"],
            "logvar": loss_state["logvar"],
        }
        disc_vars = loss_state["discriminator"]
        return {
            "ae": {"params": ae_params, "opt": self.opt_ae.init(ae_params)},
            "disc": {"vars": disc_vars, "opt": self.opt_disc.init(disc_vars["params"])},
            "lpips": loss_state["lpips"],
            "step": jnp.zeros((), jnp.int32),
        }

    # -- pieces -------------------------------------------------------------
    def _reconstruct(self, ae_params, x, rng):
        moments = self.engine.encoder.apply({"params": ae_params["encoder"]}, x)
        z, reg_log = self.engine.regularization(moments, rng=rng)
        rec = self.engine.decoder.apply({"params": ae_params["decoder"]}, z)
        return z, rec, reg_log

    def _loss_state(self, state, ae_params):
        return {
            "logvar": ae_params["logvar"],
            "discriminator": state["disc"]["vars"],
            "lpips": state["lpips"],
        }

    # -- optimizer_idx == 0: autoencoder ------------------------------------
    def _gen_step_impl(self, state, x, rng):
        def loss_fn(ae_params):
            z, rec, reg_log = self._reconstruct(ae_params, x, rng)
            ls = self._loss_state(state, ae_params)

            def decode_fn(conv_out):
                dec = dict(ae_params["decoder"])
                dec["conv_out"] = conv_out
                return self.engine.decoder.apply({"params": dec}, z)

            loss, log = self.loss.generator_loss(
                ls, x, rec,
                regularization_log=reg_log,
                global_step=state["step"],
                train=True,
                decode_fn=decode_fn,
                last_layer_params=ae_params["decoder"]["conv_out"],
            )
            return loss, log

        (loss, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["ae"]["params"]
        )
        if not self.loss.learn_logvar:  # frozen unless learn_logvar
            grads["logvar"] = jnp.zeros_like(grads["logvar"])
        updates, new_opt = self.opt_ae.update(
            grads, state["ae"]["opt"], state["ae"]["params"]
        )
        new_params = optax.apply_updates(state["ae"]["params"], updates)
        state = dict(state)
        state["ae"] = {"params": new_params, "opt": new_opt}
        state["step"] = state["step"] + 1
        return state, loss, log

    # -- optimizer_idx == 1: discriminator ----------------------------------
    def _disc_step_impl(self, state, x, rng):
        _, rec, _ = self._reconstruct(state["ae"]["params"], x, rng)

        def loss_fn(disc_params):
            ls = self._loss_state(state, state["ae"]["params"])
            ls = dict(ls)
            ls["discriminator"] = {
                **state["disc"]["vars"], "params": disc_params
            }
            d_loss, log, new_stats = self.loss.discriminator_loss(
                ls, x, rec, global_step=state["step"], train=True
            )
            return d_loss, (log, new_stats)

        (d_loss, (log, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state["disc"]["vars"]["params"])
        updates, new_opt = self.opt_disc.update(
            grads, state["disc"]["opt"], state["disc"]["vars"]["params"]
        )
        new_params = optax.apply_updates(
            state["disc"]["vars"]["params"], updates
        )
        new_vars = {**state["disc"]["vars"], "params": new_params}
        if new_stats is not None:
            new_vars["batch_stats"] = new_stats
        state = dict(state)
        state["disc"] = {"vars": new_vars, "opt": new_opt}
        state["step"] = state["step"] + 1
        return state, d_loss, log

    # -- reference-style alternation (autoencoder.py:281-296) ---------------
    def train_step(
        self, state: Dict, x: jax.Array, batch_idx: int, rng: jax.Array
    ) -> Tuple[Dict, jax.Array, Dict]:
        if batch_idx % 2 == 0:
            return self._gen_step(state, x, rng)
        return self._disc_step(state, x, rng)

    def sync_engine(self, state: Dict) -> None:
        """Push trained params back onto the engine for encode/decode use."""
        self.engine.params = {
            "params": {
                "encoder": state["ae"]["params"]["encoder"],
                "decoder": state["ae"]["params"]["decoder"],
            }
        }
