"""Text/auxiliary embedders beyond the Hi3D task set (sgm surface parity)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hi3d_tpu.conditioners import (
    ClassEmbedder,
    ClassEmbedderForMultiCond,
    FrozenByT5Embedder,
    FrozenCLIPEmbedder,
    FrozenOpenCLIPEmbedder,
    GaussianEncoder,
    LowScaleEncoder,
)

pytestmark = pytest.mark.slow



def _small_clip_embedder(**kw):
    """FrozenCLIPEmbedder with a tiny tower for CPU tests."""
    from hi3d_tpu.models.clip import CLIPTextTransformer

    emb = FrozenCLIPEmbedder(version=None, max_length=8, **kw)
    emb.module = CLIPTextTransformer(
        vocab_size=64, width=16, layers=3, heads=2, proj_dim=8,
        context_length=8, output_hidden=True,
    )
    emb.init_params(jax.random.PRNGKey(0))
    return emb


def test_frozen_clip_embedder_layers():
    ids = jnp.asarray([[1, 5, 3, 63, 0, 0, 0, 0]])  # EOT (argmax) at pos 3

    last = _small_clip_embedder(layer="last")(ids)
    assert last.shape == (1, 8, 16)

    pooled = _small_clip_embedder(layer="pooled")(ids)
    assert pooled.shape == (1, 1, 16)
    # hf semantics: pooler = final_layer_norm'd sequence at EOT, unprojected
    np.testing.assert_allclose(
        np.asarray(pooled[0, 0]), np.asarray(last[0, 3]), rtol=1e-5
    )

    hidden0 = _small_clip_embedder(layer="hidden", layer_idx=0)(ids)
    assert hidden0.shape == (1, 8, 16)
    # hidden[0] is the raw embedding output — differs from the final states
    assert float(jnp.abs(hidden0 - last).max()) > 1e-3

    out, pool = _small_clip_embedder(layer="last", always_return_pooled=True)(ids)
    assert out.shape == (1, 8, 16) and pool.shape == (1, 16)

    with pytest.raises(ValueError):
        FrozenCLIPEmbedder(version=None, layer="hidden")  # needs layer_idx


def test_frozen_open_clip_penultimate_differs_from_last():
    from hi3d_tpu.models.clip import CLIPTextTransformer

    ids = jnp.asarray([[1, 5, 3, 63, 0, 0, 0, 0]])
    outs = {}
    for layer in ("last", "penultimate"):
        emb = FrozenOpenCLIPEmbedder(layer=layer, max_length=8)
        emb.module = CLIPTextTransformer(
            vocab_size=64, width=16, layers=3, heads=2, proj_dim=8,
            context_length=8, output_hidden=True,
        )
        emb.init_params(jax.random.PRNGKey(0))
        outs[layer] = emb(ids)
    assert outs["last"].shape == outs["penultimate"].shape == (1, 8, 16)
    assert float(jnp.abs(outs["last"] - outs["penultimate"]).max()) > 1e-4


def test_byt5_tokenizer_bytes():
    emb = FrozenByT5Embedder(max_length=12)
    ids = emb.tokenize(["Ab", "é"])
    # utf-8 byte + 3 offset, eos=1, pad=0 (ByT5 convention)
    assert ids.tolist()[0][:4] == [ord("A") + 3, ord("b") + 3, 1, 0]
    assert ids.tolist()[1][:4] == [0xC3 + 3, 0xA9 + 3, 1, 0]
    assert ids.shape == (2, 12)


def test_class_embedder_multicond():
    emb = ClassEmbedderForMultiCond(embed_dim=6, n_classes=5)
    emb.input_key = "cls"
    emb.init_params(jax.random.PRNGKey(0))
    c = jnp.asarray([1, 2])
    plain = emb(c)
    wrapped = emb([c])
    assert isinstance(wrapped, list) and len(wrapped) == 1
    np.testing.assert_allclose(np.asarray(wrapped[0]), np.asarray(plain))
    # uc token = n_classes - 1 (reference modules.py:230-234)
    uc = emb.get_unconditional_conditioning(3)
    assert uc[emb.input_key].tolist() == [4, 4, 4]


def test_low_scale_encoder():
    dd = dict(ch=8, ch_mult=[1, 2], num_res_blocks=1, z_channels=4,
              attn_resolutions=[], resolution=32, double_z=True)
    enc = LowScaleEncoder(
        model_config={
            "target": "sgm.models.autoencoder.AutoencoderKL",
            "params": {"ddconfig": dd},
        },
        linear_start=1e-4,
        linear_end=2e-2,
        timesteps=100,
        max_noise_level=25,
        output_size=8,
        scale_factor=0.5,
    )
    enc.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 0.2
    z, t = enc(x, rng=jax.random.PRNGKey(2))
    assert z.shape == (2, 8, 8, 4)  # resized to output_size
    assert t.shape == (2, 1)
    assert 0 <= float(t.min()) and float(t.max()) < 25
    # q_sample at t=0 ≈ x0 (ᾱ₀ close to 1)
    z0 = enc.q_sample(
        jnp.ones((1, 2, 2, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 2, 2, 4)),
    )
    np.testing.assert_allclose(np.asarray(z0), 1.0, atol=1e-3)
    dec = enc.decode(enc.model.encode(x) * enc.scale_factor)
    assert dec.shape == x.shape


def test_gaussian_encoder():
    enc = GaussianEncoder(
        weight=2.0, flatten_output=True,
        ch=8, ch_mult=[1, 2], num_res_blocks=1, z_channels=4,
        attn_resolutions=[], resolution=32, double_z=True,
    )
    enc.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 0.2
    log, z = enc(x, rng=jax.random.PRNGKey(2))
    assert z.shape == (2, 16 * 16, 4)  # flattened tokens
    assert log["weight"] == 2.0 and "loss" in log and "kl_loss" in log


def test_new_embedders_in_registry():
    from hi3d_tpu.registry import resolve

    for name in (
        "sgm.modules.encoders.modules.FrozenCLIPEmbedder",
        "sgm.modules.encoders.modules.FrozenByT5Embedder",
        "sgm.modules.encoders.modules.FrozenCLIPT5Encoder",
        "sgm.modules.encoders.modules.ClassEmbedderForMultiCond",
        "sgm.modules.encoders.modules.LowScaleEncoder",
        "sgm.modules.encoders.modules.GaussianEncoder",
    ):
        assert resolve(name) is not None
