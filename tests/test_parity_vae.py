"""Activation parity: reference torch VAE Encoder/Decoder vs hi3d_tpu."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hi3d_tpu.convert.torch_to_jax import convert_state_dict, convert_vae_key
from hi3d_tpu.models import vae as jvae

from reference_loader import load_reference

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

DD = dict(
    double_z=True,
    z_channels=4,
    resolution=32,
    in_channels=3,
    out_ch=3,
    ch=32,
    ch_mult=[1, 2],
    num_res_blocks=1,
    attn_resolutions=[],
    dropout=0.0,
)


@pytest.fixture(scope="module")
def towers():
    load_reference()
    from sgm.modules.diffusionmodules.model import Decoder, Encoder

    torch.manual_seed(0)
    enc_t = Encoder(attn_type="vanilla", **DD).eval()
    dec_t = Decoder(attn_type="vanilla", **DD).eval()

    enc_sd = {f"encoder.{k}": v.numpy() for k, v in enc_t.state_dict().items()}
    dec_sd = {f"decoder.{k}": v.numpy() for k, v in dec_t.state_dict().items()}
    params = convert_state_dict({**enc_sd, **dec_sd}, convert_vae_key, strict=True)

    enc_j = jvae.Encoder(**{k: v for k, v in DD.items()})
    dec_j = jvae.Decoder(**{k: v for k, v in DD.items()})
    return enc_t, dec_t, enc_j, dec_j, params


def test_encoder_parity(towers):
    enc_t, _, enc_j, _, params = towers
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        out_t = enc_t(torch.from_numpy(x)).numpy()
    out_j = enc_j.apply(
        {"params": params["params"]["encoder"]}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, rtol=5e-4, atol=5e-5
    )


def test_decoder_parity(towers):
    _, dec_t, _, dec_j, params = towers
    rng = np.random.RandomState(1)
    z = rng.randn(2, 4, 16, 16).astype(np.float32)
    with torch.no_grad():
        out_t = dec_t(torch.from_numpy(z)).numpy()
    out_j = dec_j.apply(
        {"params": params["params"]["decoder"]}, jnp.asarray(z.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, rtol=5e-4, atol=1e-4
    )
