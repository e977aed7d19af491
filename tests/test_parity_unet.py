"""Activation parity: reference torch VideoUNet vs hi3d_tpu VideoUNet with
converted weights (random-init torch → converter → flax), fp32 CPU.

This is the strongest correctness check available without the released
checkpoints: it validates the converter's key mapping/layout transforms AND
the numerical equivalence of every UNet block in one shot.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hi3d_tpu.convert.torch_to_jax import convert_state_dict, convert_unet_key
from hi3d_tpu.models.unet import VideoUNet

from reference_loader import make_reference_unet

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

B, T, H, W = 1, 2, 8, 8


@pytest.fixture(scope="module")
def torch_and_jax_unets():
    torch.manual_seed(0)
    ref, cfg = make_reference_unet()
    ref = ref.eval()

    jx = VideoUNet(
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
        extra_ff_mix_layer=cfg["extra_ff_mix_layer"],
        use_spatial_context=cfg["use_spatial_context"],
        merge_strategy=cfg["merge_strategy"],
        video_kernel_size=cfg["video_kernel_size"],
        use_linear_in_transformer=cfg["use_linear_in_transformer"],
        adm_in_channels=cfg["adm_in_channels"],
        attn_backend="xla",
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_state_dict(sd, convert_unet_key, strict=True)
    return ref, jx, params


def test_param_tree_matches_init(torch_and_jax_unets):
    """Converted tree must be structurally identical to a fresh init tree."""
    import flax

    ref, jx, params = torch_and_jax_unets
    x = jnp.zeros((B * T, H, W, 8))
    init = jx.init(
        jax.random.PRNGKey(0), x, jnp.zeros((B * T,)),
        context=jnp.zeros((B, 1, 64)), y=jnp.zeros((B, 48)),
        num_video_frames=T, image_only_indicator=jnp.zeros((B, T)),
    )
    fi = flax.traverse_util.flatten_dict(init)
    fc = flax.traverse_util.flatten_dict(params)
    missing = sorted(set(fi) - set(fc))
    unexpected = sorted(set(fc) - set(fi))
    assert not missing, f"missing in converted: {missing[:10]}"
    assert not unexpected, f"unexpected in converted: {unexpected[:10]}"
    for k in fi:
        assert fi[k].shape == fc[k].shape, (k, fi[k].shape, fc[k].shape)


def test_forward_parity(torch_and_jax_unets):
    ref, jx, params = torch_and_jax_unets
    rng = np.random.RandomState(1)
    x = rng.randn(B * T, 8, H, W).astype(np.float32)
    ts = np.full((B * T,), 3.7, np.float32)
    ctx = rng.randn(B, 1, 64).astype(np.float32)
    y = rng.randn(B, 48).astype(np.float32)
    ind = np.zeros((B, T), np.float32)

    with torch.no_grad():
        out_t = ref(
            torch.from_numpy(x),
            torch.from_numpy(ts),
            context=torch.from_numpy(ctx),
            y=torch.from_numpy(y),
            num_video_frames=T,
            image_only_indicator=torch.from_numpy(ind),
        ).numpy()

    out_j = jx.apply(
        params,
        jnp.asarray(x.transpose(0, 2, 3, 1)),  # NCHW → NHWC
        jnp.asarray(ts),
        context=jnp.asarray(ctx),
        y=jnp.asarray(y),
        num_video_frames=T,
        image_only_indicator=jnp.asarray(ind),
    )
    out_j = np.asarray(out_j).transpose(0, 3, 1, 2)  # back to NCHW

    np.testing.assert_allclose(out_j, out_t, rtol=5e-4, atol=5e-5)
