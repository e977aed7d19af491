"""PatchGAN discriminator + autoencoder GAN losses.

Functional parity targets (reference file:line):
- NLayerDiscriminator: sgm/modules/autoencoding/lpips/model/model.py:17-90 —
  Pix2Pix PatchGAN (4×4 convs, stride-2 pyramid, BatchNorm/ActNorm,
  LeakyReLU 0.2, 1-channel logit map) with `weights_init` (normal 0.02 convs,
  BatchNorm γ~N(1,0.02), β=0).
- ActNorm: sgm/modules/autoencoding/lpips/util.py:45-106 — per-channel affine
  with data-dependent (first-batch) initialization.
- hinge_d_loss / vanilla_d_loss: lpips/vqperceptual.py:5-17.
- GeneralLPIPSWithDiscriminator: losses/discriminator_loss.py:17-290 — L1 +
  LPIPS reconstruction NLL with learned logvar, adaptive discriminator weight
  ‖∇nll‖/‖∇g‖ at the decoder's last layer, hinge/vanilla GAN objective, and
  regularization-weight plumbing, split into the generator (optimizer_idx 0)
  and discriminator (optimizer_idx 1) passes.
- LatentLPIPS: losses/lpips.py:8-73 — latent L2 + decoded-image LPIPS.

JAX idioms: the losses are pure functions over explicit variable trees.
`generator_loss` takes an optional `decode_fn(last_layer_params) ->
reconstructions` closure; when given, the adaptive discriminator weight is
computed with `jax.grad` through that closure (the functional equivalent of
torch.autograd.grad w.r.t. the decoder's conv_out weight). BatchNorm runs in
training mode with mutable batch_stats (returned as `new_disc_state`).

The shipped Hi3D configs train with `torch.nn.Identity` loss
(configs/train-v01.yaml:136-137); these losses complete the broader sgm
autoencoder-training surface.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    """vqperceptual.py:5-9."""
    return 0.5 * (
        jnp.mean(nn.relu(1.0 - logits_real)) + jnp.mean(nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    """vqperceptual.py:12-17."""
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


class ActNorm(nn.Module):
    """Per-channel affine norm (lpips/util.py:45-106). The reference's
    data-dependent first-batch init is a train-time detail; here loc/scale
    initialize to 0/1 and are learned."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        loc = self.param("loc", nn.initializers.zeros, (c,))
        scale = self.param("scale", nn.initializers.ones, (c,))
        return scale * (x + loc)


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator, NHWC (model.py:17-90).

    `input_nc` is accepted for config parity (channels are inferred from the
    input in NHWC convs)."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv_init = nn.initializers.normal(0.02)  # weights_init parity
        use_bias = self.use_actnorm  # BatchNorm has affine params already

        # weights_init parity: torch draws BatchNorm γ~N(1.0, 0.02)
        def bn(h, name):
            if self.use_actnorm:
                return ActNorm(dtype=self.dtype, name=name)(h, train=train)
            mod = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                scale_init=lambda k, s, d=jnp.float32: (
                    1.0 + 0.02 * jax.random.normal(k, s, d)
                ),
                dtype=self.dtype, name=name,
            )
            return mod(h)

        h = nn.Conv(
            self.ndf, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
            kernel_init=conv_init, dtype=self.dtype, name="conv0",
        )(x.astype(self.dtype))
        h = nn.leaky_relu(h, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            h = nn.Conv(
                self.ndf * nf_mult, (4, 4), strides=(2, 2),
                padding=[(1, 1), (1, 1)], use_bias=use_bias,
                kernel_init=conv_init, dtype=self.dtype, name=f"conv{n}",
            )(h)
            h = bn(h, f"norm{n}")
            h = nn.leaky_relu(h, 0.2)
        nf_mult = min(2**self.n_layers, 8)
        h = nn.Conv(
            self.ndf * nf_mult, (4, 4), strides=(1, 1),
            padding=[(1, 1), (1, 1)], use_bias=use_bias,
            kernel_init=conv_init, dtype=self.dtype,
            name=f"conv{self.n_layers}",
        )(h)
        h = bn(h, f"norm{self.n_layers}")
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(
            1, (4, 4), strides=(1, 1), padding=[(1, 1), (1, 1)],
            kernel_init=conv_init, dtype=self.dtype, name="conv_out",
        )(h)


def _flatten_video(x: jax.Array) -> jax.Array:
    """(B, T, H, W, C) → (B·T, H, W, C): per-frame LPIPS/disc for dims=3
    (discriminator_loss.py:225-229)."""
    if x.ndim == 5:
        return x.reshape(-1, *x.shape[2:])
    return x


class GeneralLPIPSWithDiscriminator:
    """Reconstruction (L1 + LPIPS) NLL with learned logvar + PatchGAN
    adversarial term (discriminator_loss.py:17-290), as pure functions.

    State layout (`init` returns a dict):
      {"logvar": scalar, "discriminator": {"params": ..., "batch_stats": ...},
       "lpips": lpips params or None}
    """

    def __init__(
        self,
        disc_start: int,
        logvar_init: float = 0.0,
        disc_num_layers: int = 3,
        disc_in_channels: int = 3,
        disc_factor: float = 1.0,
        disc_weight: float = 1.0,
        perceptual_weight: float = 1.0,
        disc_loss: str = "hinge",
        scale_input_to_tgt_size: bool = False,
        dims: int = 2,
        learn_logvar: bool = False,
        regularization_weights: Optional[Dict[str, float]] = None,
        additional_log_keys: Optional[list] = None,
        discriminator_config: Optional[Dict] = None,
    ):
        from .lpips import LPIPS

        if disc_loss not in ("hinge", "vanilla"):
            raise ValueError(f"disc_loss {disc_loss!r}")
        self.dims = dims
        self.scale_input_to_tgt_size = scale_input_to_tgt_size
        self.perceptual_loss = LPIPS()
        self.perceptual_weight = float(perceptual_weight)
        self.logvar_init = float(logvar_init)
        self.learn_logvar = learn_logvar
        if discriminator_config is None:
            self.discriminator = NLayerDiscriminator(
                input_nc=disc_in_channels, n_layers=disc_num_layers,
                use_actnorm=False,
            )
        else:
            from ..config import instantiate_from_config

            self.discriminator = instantiate_from_config(discriminator_config)
        self.discriminator_iter_start = int(disc_start)
        self.disc_loss = hinge_d_loss if disc_loss == "hinge" else vanilla_d_loss
        self.disc_factor = float(disc_factor)
        self.discriminator_weight = float(disc_weight)
        self.regularization_weights = regularization_weights or {}
        self.additional_log_keys = set(additional_log_keys or [])
        self.additional_log_keys.update(self.regularization_weights.keys())

    # -- state ------------------------------------------------------------
    def init(
        self, rng: jax.Array, image_hw: Tuple[int, int] = (64, 64),
        channels: int = 3,
    ) -> Dict:
        r1, r2 = jax.random.split(rng)
        x = jnp.zeros((1, *image_hw, channels))
        disc = self.discriminator.init(r1, x, train=True)
        lpips = (
            self.perceptual_loss.init(r2, x, x)
            if self.perceptual_weight > 0
            else None
        )
        return {
            "logvar": jnp.asarray(self.logvar_init, jnp.float32),
            "discriminator": dict(disc),
            "lpips": lpips,
        }

    def get_trainable_parameters(self, state: Dict):
        """Discriminator params (discriminator_loss.py:86-87)."""
        return state["discriminator"]["params"]

    def get_trainable_autoencoder_parameters(self, state: Dict):
        """logvar iff learn_logvar (discriminator_loss.py:89-93)."""
        return {"logvar": state["logvar"]} if self.learn_logvar else {}

    # -- pieces -----------------------------------------------------------
    def _rec_loss(self, state, inputs, reconstructions):
        rec = jnp.abs(inputs - reconstructions)
        if self.perceptual_weight > 0:
            p = self.perceptual_loss.apply(
                state["lpips"], inputs, reconstructions
            )  # (B,)
            rec = rec + self.perceptual_weight * p[:, None, None, None]
        return rec

    def get_nll_loss(self, state, rec_loss, weights=None):
        """discriminator_loss.py get_nll_loss — rec/exp(logvar) + logvar."""
        nll = rec_loss / jnp.exp(state["logvar"]) + state["logvar"]
        weighted = nll if weights is None else weights * nll
        bsz = rec_loss.shape[0]
        return jnp.sum(nll) / bsz, jnp.sum(weighted) / bsz

    def _run_disc(self, state, x, train):
        if train:
            logits, mut = self.discriminator.apply(
                state["discriminator"], x, train=True, mutable=["batch_stats"]
            )
            return logits, mut
        return self.discriminator.apply(state["discriminator"], x), None

    def calculate_adaptive_weight(
        self,
        nll_fn: Callable[[Any], jax.Array],
        g_fn: Callable[[Any], jax.Array],
        last_layer_params: Any,
    ) -> jax.Array:
        """‖∇_last nll‖ / (‖∇_last g‖ + 1e-4), clipped to [0, 1e4], times
        disc_weight (discriminator_loss.py:197-206) — torch.autograd.grad
        replaced by jax.grad over closures of the decoder's last layer."""
        gn = jax.grad(nll_fn)(last_layer_params)
        gg = jax.grad(g_fn)(last_layer_params)
        norm = lambda t: jnp.sqrt(
            sum(jnp.sum(jnp.square(l)) for l in jax.tree_util.tree_leaves(t))
        )
        w = norm(gn) / (norm(gg) + 1e-4)
        return jax.lax.stop_gradient(
            jnp.clip(w, 0.0, 1e4) * self.discriminator_weight
        )

    # -- the two optimization passes ---------------------------------------
    def generator_loss(
        self,
        state: Dict,
        inputs: jax.Array,
        reconstructions: jax.Array,
        *,
        regularization_log: Optional[Dict[str, jax.Array]] = None,
        global_step: int = 0,
        split: str = "train",
        weights=None,
        train: bool = True,
        decode_fn: Optional[Callable[[Any], jax.Array]] = None,
        last_layer_params: Any = None,
    ) -> Tuple[jax.Array, Dict]:
        """optimizer_idx == 0 pass (discriminator_loss.py:239-275).

        When `decode_fn`+`last_layer_params` are given, d_weight is adaptive
        via jax.grad; otherwise it falls back to the reference's eval-mode
        constant 1.0 (discriminator_loss.py:252-253)."""
        regularization_log = regularization_log or {}
        inputs = _flatten_video(inputs) if self.dims > 2 else inputs
        reconstructions = (
            _flatten_video(reconstructions) if self.dims > 2 else reconstructions
        )
        rec_loss = self._rec_loss(state, inputs, reconstructions)
        nll_loss, weighted_nll = self.get_nll_loss(state, rec_loss, weights)

        # `global_step` may be a traced array (jitted train step) or a python
        # int (reference-style eager use); gate with where in the former case
        traced = isinstance(global_step, jax.Array)
        active = traced or (train and global_step >= self.discriminator_iter_start)
        if active or not train:
            # reference keeps the discriminator module in train mode during
            # the generator update (discriminator_loss.py) — normalize with
            # batch statistics, discarding the mutated running stats
            logits_fake, _ = self._run_disc(state, reconstructions, train=train)
            g_loss = -jnp.mean(logits_fake)
            if train and decode_fn is not None and last_layer_params is not None:
                def nll_fn(p):
                    rec = _flatten_video(decode_fn(p))
                    rl = self._rec_loss(state, inputs, rec)
                    return self.get_nll_loss(state, rl, weights)[0]

                def g_fn(p):
                    rec = _flatten_video(decode_fn(p))
                    lf = self.discriminator.apply(state["discriminator"], rec)
                    return -jnp.mean(lf)

                d_weight = self.calculate_adaptive_weight(
                    nll_fn, g_fn, last_layer_params
                )
            else:
                d_weight = jnp.asarray(1.0)
            if traced and train:
                gate = (global_step >= self.discriminator_iter_start).astype(
                    jnp.float32
                )
                d_weight = d_weight * gate
                g_loss = g_loss * gate
        else:
            d_weight = jnp.asarray(0.0)
            g_loss = jnp.asarray(0.0)

        loss = weighted_nll + d_weight * self.disc_factor * g_loss
        log = {}
        for k, v in regularization_log.items():
            if k in self.regularization_weights:
                loss = loss + self.regularization_weights[k] * v
            if k in self.additional_log_keys:
                log[f"{split}/{k}"] = jnp.mean(v)
        log.update(
            {
                f"{split}/loss/total": loss,
                f"{split}/loss/nll": nll_loss,
                f"{split}/loss/rec": jnp.mean(rec_loss),
                f"{split}/loss/g": g_loss,
                f"{split}/scalars/logvar": state["logvar"],
                f"{split}/scalars/d_weight": d_weight,
            }
        )
        return loss, log

    def discriminator_loss(
        self,
        state: Dict,
        inputs: jax.Array,
        reconstructions: jax.Array,
        *,
        global_step: int = 0,
        split: str = "train",
        train: bool = True,
    ) -> Tuple[jax.Array, Dict, Optional[Dict]]:
        """optimizer_idx == 1 pass (discriminator_loss.py:276-290). Returns
        (loss, log, new_batch_stats|None)."""
        inputs = _flatten_video(inputs) if self.dims > 2 else inputs
        reconstructions = (
            _flatten_video(reconstructions) if self.dims > 2 else reconstructions
        )
        inputs = jax.lax.stop_gradient(inputs)
        reconstructions = jax.lax.stop_gradient(reconstructions)
        logits_real, mut1 = self._run_disc(state, inputs, train)
        logits_fake, mut2 = self._run_disc(
            {**state, "discriminator": {
                **state["discriminator"],
                **({"batch_stats": mut1["batch_stats"]} if mut1 else {}),
            }},
            reconstructions,
            train,
        )
        d_loss = self.disc_factor * self.disc_loss(logits_real, logits_fake)
        if isinstance(global_step, jax.Array):
            if train:
                d_loss = d_loss * (
                    global_step >= self.discriminator_iter_start
                ).astype(d_loss.dtype)
        elif train and global_step < self.discriminator_iter_start:
            d_loss = jnp.asarray(0.0)
        log = {
            f"{split}/loss/disc": d_loss,
            f"{split}/logits/real": jnp.mean(logits_real),
            f"{split}/logits/fake": jnp.mean(logits_fake),
        }
        return d_loss, log, (mut2["batch_stats"] if mut2 else None)

    # reference-compatible dispatcher
    def __call__(self, state, inputs, reconstructions, *, optimizer_idx,
                 global_step, regularization_log=None, split="train",
                 weights=None, train=True, **kw):
        if optimizer_idx == 0:
            return self.generator_loss(
                state, inputs, reconstructions,
                regularization_log=regularization_log,
                global_step=global_step, split=split, weights=weights,
                train=train, **kw,
            )
        loss, log, _ = self.discriminator_loss(
            state, inputs, reconstructions, global_step=global_step,
            split=split, train=train,
        )
        return loss, log


class LatentLPIPS:
    """Latent L2 + decoded-image LPIPS (losses/lpips.py:8-73)."""

    def __init__(
        self,
        decoder_config: Dict,
        perceptual_weight: float = 1.0,
        latent_weight: float = 1.0,
        scale_input_to_tgt_size: bool = False,
        scale_tgt_to_input_size: bool = False,
        perceptual_weight_on_inputs: float = 0.0,
    ):
        from .lpips import LPIPS
        from ..config import instantiate_from_config

        self.decoder = instantiate_from_config(decoder_config)
        self.perceptual_loss = LPIPS()
        self.perceptual_weight = float(perceptual_weight)
        self.latent_weight = float(latent_weight)
        self.scale_input_to_tgt_size = scale_input_to_tgt_size
        self.scale_tgt_to_input_size = scale_tgt_to_input_size
        self.perceptual_weight_on_inputs = float(perceptual_weight_on_inputs)
        self.lpips_params = None

    def init(self, rng: jax.Array, image_hw: Tuple[int, int] = (64, 64)):
        r1, r2 = jax.random.split(rng)
        x = jnp.zeros((1, *image_hw, 3))
        self.lpips_params = self.perceptual_loss.init(r1, x, x)
        if getattr(self.decoder, "params", "absent") is None and hasattr(
            self.decoder, "init"
        ):
            self.decoder.init(r2, image_hw=image_hw)
        return self.lpips_params

    def _lpips(self, a, b):
        return self.perceptual_loss.apply(self.lpips_params, a, b)

    def __call__(
        self,
        latent_inputs: jax.Array,
        latent_predictions: jax.Array,
        image_inputs: jax.Array,
        split: str = "train",
    ) -> Tuple[jax.Array, Dict]:
        log = {}
        loss = (latent_inputs - latent_predictions) ** 2
        log[f"{split}/latent_l2_loss"] = jnp.mean(loss)
        image_reconstructions = None
        if self.perceptual_weight > 0.0:
            image_reconstructions = self.decoder.decode(latent_predictions)
            image_targets = self.decoder.decode(latent_inputs)
            p = self._lpips(image_targets, image_reconstructions)
            loss = self.latent_weight * jnp.mean(loss) + (
                self.perceptual_weight * jnp.mean(p)
            )
            log[f"{split}/perceptual_loss"] = jnp.mean(p)
        if self.perceptual_weight_on_inputs > 0.0:
            if image_reconstructions is None:
                image_reconstructions = self.decoder.decode(latent_predictions)
            if self.scale_input_to_tgt_size:
                b, h, w, c = image_reconstructions.shape
                image_inputs = jax.image.resize(
                    image_inputs, (image_inputs.shape[0], h, w, c), "cubic"
                )
            elif self.scale_tgt_to_input_size:
                b, h, w, c = image_inputs.shape
                image_reconstructions = jax.image.resize(
                    image_reconstructions,
                    (image_reconstructions.shape[0], h, w, c), "cubic",
                )
            p2 = self._lpips(image_inputs, image_reconstructions)
            loss = loss + self.perceptual_weight_on_inputs * jnp.mean(p2)
            log[f"{split}/perceptual_loss_on_inputs"] = jnp.mean(p2)
        return loss, log
