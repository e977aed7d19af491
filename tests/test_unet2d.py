"""Legacy 2-D UNetModel: activation parity vs the reference torch
openaimodel.UNetModel with converted weights (fp32 CPU), plus the registry
alias. Validates convert_unet2d_key and the 2-D assembly of the shared
blocks."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hi3d_tpu.convert.torch_to_jax import convert_state_dict, convert_unet2d_key
from hi3d_tpu.models.unet import UNetModel

from reference_loader import make_reference_unet2d

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

B, H, W = 2, 8, 8


@pytest.fixture(scope="module")
def torch_and_jax():
    torch.manual_seed(0)
    ref, cfg = make_reference_unet2d()
    ref = ref.eval()
    jx = UNetModel(
        in_channels=cfg["in_channels"],
        model_channels=cfg["model_channels"],
        out_channels=cfg["out_channels"],
        num_res_blocks=cfg["num_res_blocks"],
        attention_resolutions=cfg["attention_resolutions"],
        channel_mult=cfg["channel_mult"],
        num_classes=cfg["num_classes"],
        num_head_channels=cfg["num_head_channels"],
        transformer_depth=cfg["transformer_depth"],
        context_dim=cfg["context_dim"],
        use_linear_in_transformer=cfg["use_linear_in_transformer"],
        adm_in_channels=cfg["adm_in_channels"],
        attn_backend="xla",
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_state_dict(sd, convert_unet2d_key, strict=True)
    return ref, jx, params, cfg


def test_param_tree_matches_init(torch_and_jax):
    import flax

    ref, jx, params, cfg = torch_and_jax
    x = jnp.zeros((B, H, W, cfg["in_channels"]))
    shapes = jax.eval_shape(
        lambda: jx.init(
            jax.random.PRNGKey(0), x, jnp.zeros((B,)),
            context=jnp.zeros((B, 3, cfg["context_dim"])),
            y=jnp.zeros((B, cfg["adm_in_channels"])),
        )
    )["params"]
    got = flax.traverse_util.flatten_dict(params["params"])
    want = flax.traverse_util.flatten_dict(shapes)
    assert set(got) == set(want)
    for k in got:
        assert got[k].shape == want[k].shape, k


def test_forward_parity(torch_and_jax):
    ref, jx, params, cfg = torch_and_jax
    rng = np.random.RandomState(1)
    x = rng.randn(B, H, W, cfg["in_channels"]).astype(np.float32)
    ts = np.array([2.0, 5.0], np.float32)
    ctx = rng.randn(B, 3, cfg["context_dim"]).astype(np.float32)
    y = rng.randn(B, cfg["adm_in_channels"]).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            timesteps=torch.from_numpy(ts),
            context=torch.from_numpy(ctx),
            y=torch.from_numpy(y),
        ).permute(0, 2, 3, 1).numpy()

    fwd = jax.jit(
        lambda p, *a: jx.apply(p, *a)
    )
    out = np.asarray(
        fwd(params, jnp.asarray(x), jnp.asarray(ts), jnp.asarray(ctx),
            jnp.asarray(y))
    )
    np.testing.assert_allclose(out, out_ref, rtol=5e-4, atol=5e-5)


def test_registry_alias():
    from hi3d_tpu.config import instantiate_from_config

    m = instantiate_from_config({
        "target": "sgm.modules.diffusionmodules.openaimodel.UNetModel",
        "params": dict(
            in_channels=4, model_channels=32, out_channels=4,
            num_res_blocks=1, attention_resolutions=[1],
            channel_mult=[1, 2], num_heads=2,
        ),
    })
    assert isinstance(m, UNetModel)


def test_int_class_label_emb_conversion():
    """torch nn.Embedding label_emb ↔ flax nn.Embed 'embedding' param."""
    import flax
    import numpy as np
    import torch as _torch

    emb = _torch.nn.Embedding(10, 16)
    sd = {"label_emb.weight": emb.weight.detach().numpy()}
    params = convert_state_dict(sd, convert_unet2d_key, strict=True)
    flat = flax.traverse_util.flatten_dict(params["params"])
    assert ("label_emb", "embedding") in flat
    assert flat[("label_emb", "embedding")].shape == (10, 16)

    # continuous-mode Linear (dim, 1) still maps to a transposed Dense kernel
    sd = {"label_emb.weight": np.zeros((16, 1), np.float32),
          "label_emb.bias": np.zeros((16,), np.float32)}
    params = convert_state_dict(sd, convert_unet2d_key, strict=True)
    flat = flax.traverse_util.flatten_dict(params["params"])
    assert flat[("label_emb", "kernel")].shape == (1, 16)
    assert flat[("label_emb", "bias")].shape == (16,)


def test_heads_unset_raises():
    m = UNetModel(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1], channel_mult=[1],
    )
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    with _pytest.raises(ValueError, match="num_heads"):
        jax.eval_shape(
            lambda: m.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                jnp.zeros((1,)),
            )
        )


def test_int_class_unet_forward():
    import jax
    import jax.numpy as jnp

    m = UNetModel(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=[], channel_mult=[1], num_heads=2,
        num_classes=7,
    )
    x = jnp.zeros((2, 8, 8, 4))
    y = jnp.asarray([1, 5])
    p = m.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)), y=y)
    out = m.apply(p, x, jnp.zeros((2,)), y=y)
    assert out.shape == (2, 8, 8, 4)
