"""AutoencodingEngine composition, regularizers, and LPIPS structure."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hi3d_tpu.models.autoencoding import (
    AutoencodingEngine,
    DiagonalGaussianRegularizer,
    IdentityRegularizer,
)
from hi3d_tpu.models.lpips import LPIPS

pytestmark = pytest.mark.slow



def test_diagonal_gaussian_regularizer():
    reg = DiagonalGaussianRegularizer(sample=False)
    moments = jnp.concatenate(
        [jnp.ones((2, 4, 4, 4)), jnp.zeros((2, 4, 4, 4))], axis=-1
    )
    z, log = reg(moments)
    np.testing.assert_allclose(np.asarray(z), 1.0)  # mode = mean
    assert "kl_loss" in log and float(log["kl_loss"]) > 0

    reg_s = DiagonalGaussianRegularizer(sample=True)
    z1, _ = reg_s(moments, rng=jax.random.PRNGKey(0))
    z2, _ = reg_s(moments, rng=jax.random.PRNGKey(1))
    assert float(jnp.abs(z1 - z2).max()) > 0


def test_autoencoding_engine_roundtrip_shapes():
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
        max_batch_size=2,
    )
    eng.init(jax.random.PRNGKey(0), image_hw=(32, 32))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))
    z = eng.encode(x)
    assert z.shape == (3, 16, 16, 4)
    rec = eng.decode(z)
    assert rec.shape == (3, 32, 32, 3)
    z2, log = eng.encode(x, return_reg_log=True)
    assert "kl_loss" in log


def test_lpips_properties():
    model = LPIPS()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3)) * 0.3
    params = model.init(jax.random.PRNGKey(1), x, x)
    d_same = model.apply(params, x, x)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    y = x + 0.5 * jax.random.normal(jax.random.PRNGKey(2), x.shape)
    d_diff = model.apply(params, x, y)
    assert d_diff.shape == (2,)
    assert float(jnp.abs(d_diff).min()) > 0


def test_lpips_key_conversion():
    from hi3d_tpu.models.lpips import convert_lpips_key

    assert convert_lpips_key("lin0.model.1.weight") == ("lin0",)
    assert convert_lpips_key("features.0.weight") == ("net", "conv0")
    assert convert_lpips_key("features.28.bias") == ("net", "conv28")
    assert convert_lpips_key("net.slice1.0.weight") is None


def test_clip_text_tower_causal_and_pooled():
    from hi3d_tpu.models.clip import CLIPTextTransformer

    m = CLIPTextTransformer(
        vocab_size=64, width=16, layers=2, heads=2, proj_dim=8,
        context_length=8,
    )
    ids = jnp.asarray([[1, 5, 3, 63, 0, 0, 0, 0]])  # EOT = argmax at pos 3
    params = m.init(jax.random.PRNGKey(0), ids)
    pooled, toks = m.apply(params, ids)
    assert pooled.shape == (1, 8) and toks.shape == (1, 8, 16)

    # causality: changing a FUTURE token must not change earlier hiddens
    ids2 = ids.at[0, 6].set(9)
    _, toks2 = m.apply(params, ids2)
    np.testing.assert_allclose(
        np.asarray(toks[0, :6]), np.asarray(toks2[0, :6]), rtol=1e-5
    )
    assert float(np.abs(np.asarray(toks[0, 6:]) - np.asarray(toks2[0, 6:])).max()) > 0


def test_clip_text_key_conversion():
    from hi3d_tpu.convert.torch_to_jax import convert_clip_text_key

    assert convert_clip_text_key("token_embedding.weight") == ("_embed_",)
    assert convert_clip_text_key("positional_embedding") == ("_self_",)
    assert convert_clip_text_key("text_projection") == ("_self_",)
    assert convert_clip_text_key(
        "transformer.resblocks.3.attn.in_proj_weight"
    ) == ("resblocks_3", "attn", "in_proj")
    assert convert_clip_text_key("visual.conv1.weight") is None
