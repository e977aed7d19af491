"""Two-optimizer autoencoder GAN training (reference autoencoder.py:98-296)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from hi3d_tpu.models.autoencoding import AutoencodingEngine
from hi3d_tpu.models.discriminator import GeneralLPIPSWithDiscriminator
from hi3d_tpu.training.ae_step import AutoencoderTrainer

pytestmark = pytest.mark.slow



def _tiny_trainer(disc_start=0):
    dd = dict(ch=8, ch_mult=[1, 2], num_res_blocks=1, z_channels=4,
              attn_resolutions=[], resolution=32, double_z=True)
    eng = AutoencodingEngine(
        encoder_config={
            "target": "sgm.modules.diffusionmodules.model.Encoder",
            "params": dd,
        },
        decoder_config={
            "target": "sgm.modules.diffusionmodules.model.Decoder",
            "params": dd,
        },
        regularizer_config={
            "target": "hi3d_tpu.models.autoencoding.DiagonalGaussianRegularizer",
            "params": {"sample": False},
        },
    )
    loss = GeneralLPIPSWithDiscriminator(
        disc_start=disc_start, perceptual_weight=0.0, disc_weight=0.5,
        disc_num_layers=2,
    )
    return AutoencoderTrainer(eng, loss, lr=1e-3)


def test_ae_gan_alternating_steps():
    trainer = _tiny_trainer()
    state = trainer.init(jax.random.PRNGKey(0), image_hw=(32, 32))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 0.3

    enc0 = jax.tree_util.tree_leaves(state["ae"]["params"]["encoder"])[0].copy()
    disc0 = jax.tree_util.tree_leaves(state["disc"]["vars"]["params"])[0].copy()

    # batch 0 → generator pass
    state, loss_g, log_g = trainer.train_step(
        state, x, batch_idx=0, rng=jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(loss_g))
    assert "train/loss/nll" in log_g
    d_w = float(log_g["train/scalars/d_weight"])
    assert np.isfinite(d_w) and d_w >= 0.0  # adaptive weight computed under jit

    # batch 1 → discriminator pass
    state, loss_d, log_d = trainer.train_step(
        state, x, batch_idx=1, rng=jax.random.PRNGKey(3)
    )
    assert np.isfinite(float(loss_d))
    assert "train/loss/disc" in log_d

    enc1 = jax.tree_util.tree_leaves(state["ae"]["params"]["encoder"])[0]
    disc1 = jax.tree_util.tree_leaves(state["disc"]["vars"]["params"])[0]
    assert not np.allclose(np.asarray(enc0), np.asarray(enc1))  # AE updated
    assert not np.allclose(np.asarray(disc0), np.asarray(disc1))  # disc updated
    assert int(state["step"]) == 2


def test_ae_gan_disc_start_gates_adversarial_term():
    trainer = _tiny_trainer(disc_start=1000)
    state = trainer.init(jax.random.PRNGKey(0), image_hw=(32, 32))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 0.3
    state, _, log_g = trainer.train_step(state, x, 0, jax.random.PRNGKey(2))
    assert float(log_g["train/scalars/d_weight"]) == 0.0  # pre-start: no GAN
    state, loss_d, _ = trainer.train_step(state, x, 1, jax.random.PRNGKey(3))
    assert float(loss_d) == 0.0  # disc loss gated too


def test_ae_gan_sync_engine_roundtrip():
    trainer = _tiny_trainer()
    state = trainer.init(jax.random.PRNGKey(0), image_hw=(32, 32))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 0.3
    state, _, _ = trainer.train_step(state, x, 0, jax.random.PRNGKey(2))
    trainer.sync_engine(state)
    rec = trainer.engine.decode(trainer.engine.encode(x))
    assert rec.shape == x.shape
