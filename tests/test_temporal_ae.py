"""VideoDecoder (temporal VAE decoder): shapes per time_mode, skip_video
behavior, and torch-key conversion coverage for the temporal extras."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from hi3d_tpu.convert.torch_to_jax import convert_state_dict, convert_vae_key
from hi3d_tpu.models.temporal_ae import VideoDecoder

pytestmark = pytest.mark.slow


T = 2
DD = dict(ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=4, out_ch=3,
          resolution=16)


@pytest.mark.parametrize("time_mode", ["conv-only", "all", "attn-only"])
def test_video_decoder_shapes(time_mode):
    model = VideoDecoder(time_mode=time_mode, **DD)
    z = jax.random.normal(jax.random.PRNGKey(0), (T * 2, 8, 8, 4))
    params = model.init(jax.random.PRNGKey(1), z, timesteps=T)
    out = jax.jit(
        lambda p, z: model.apply(p, z, timesteps=T)
    )(params, z)
    assert out.shape == (T * 2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_skip_video_is_frame_independent():
    """With skip_video the decoder is purely spatial: permuting frames
    permutes outputs."""
    model = VideoDecoder(time_mode="conv-only", **DD)
    z = jax.random.normal(jax.random.PRNGKey(0), (T * 2, 8, 8, 4))
    params = model.init(jax.random.PRNGKey(1), z, timesteps=T)
    f = jax.jit(lambda p, z: model.apply(p, z, timesteps=T, skip_video=True))
    out = f(params, z)
    out_perm = f(params, z[::-1])
    np.testing.assert_allclose(
        np.asarray(out[::-1]), np.asarray(out_perm), rtol=1e-5, atol=1e-6
    )


def test_temporal_key_conversion_covers_video_decoder():
    """Synthetic SVD-style decoder keys (time_stack / mix_factor /
    conv_out.time_mix_conv) must land exactly on the flax tree."""
    model = VideoDecoder(time_mode="conv-only", **DD)
    import functools

    z = jnp.zeros((T, 8, 8, 4))
    shapes = jax.eval_shape(
        functools.partial(model.init, timesteps=T), jax.random.PRNGKey(0), z
    )
    flat_flax = {
        "/".join(("decoder",) + k): v.shape
        for k, v in traverse_util.flatten_dict(shapes["params"]).items()
    }

    def conv_w(cout, cin, *k):
        return np.zeros((cout, cin) + k, np.float32)

    sd = {}

    def add_res(prefix, cin, cout):
        sd[f"{prefix}.norm1.weight"] = np.zeros((cin,), np.float32)
        sd[f"{prefix}.norm1.bias"] = np.zeros((cin,), np.float32)
        sd[f"{prefix}.conv1.weight"] = conv_w(cout, cin, 3, 3)
        sd[f"{prefix}.conv1.bias"] = np.zeros((cout,), np.float32)
        sd[f"{prefix}.norm2.weight"] = np.zeros((cout,), np.float32)
        sd[f"{prefix}.norm2.bias"] = np.zeros((cout,), np.float32)
        sd[f"{prefix}.conv2.weight"] = conv_w(cout, cout, 3, 3)
        sd[f"{prefix}.conv2.bias"] = np.zeros((cout,), np.float32)
        if cin != cout:
            sd[f"{prefix}.nin_shortcut.weight"] = conv_w(cout, cin, 1, 1)
            sd[f"{prefix}.nin_shortcut.bias"] = np.zeros((cout,), np.float32)
        sd[f"{prefix}.mix_factor"] = np.zeros((1,), np.float32)
        for l_in, l_out, idx in [("in_layers", "0", "0"), ("in_layers", "2", "2")]:
            pass
        sd[f"{prefix}.time_stack.in_layers.0.weight"] = np.zeros((cout,), np.float32)
        sd[f"{prefix}.time_stack.in_layers.0.bias"] = np.zeros((cout,), np.float32)
        sd[f"{prefix}.time_stack.in_layers.2.weight"] = conv_w(cout, cout, 3, 3, 3)
        sd[f"{prefix}.time_stack.in_layers.2.bias"] = np.zeros((cout,), np.float32)
        sd[f"{prefix}.time_stack.out_layers.0.weight"] = np.zeros((cout,), np.float32)
        sd[f"{prefix}.time_stack.out_layers.0.bias"] = np.zeros((cout,), np.float32)
        sd[f"{prefix}.time_stack.out_layers.3.weight"] = conv_w(cout, cout, 3, 3, 3)
        sd[f"{prefix}.time_stack.out_layers.3.bias"] = np.zeros((cout,), np.float32)

    sd["decoder.conv_in.weight"] = conv_w(16, 4, 3, 3)
    sd["decoder.conv_in.bias"] = np.zeros((16,), np.float32)
    add_res("decoder.mid.block_1", 16, 16)
    for leaf, shp in [("norm", (16,)), ("q", None), ("k", None), ("v", None),
                      ("proj_out", None)]:
        if leaf == "norm":
            sd["decoder.mid.attn_1.norm.weight"] = np.zeros(shp, np.float32)
            sd["decoder.mid.attn_1.norm.bias"] = np.zeros(shp, np.float32)
        else:
            sd[f"decoder.mid.attn_1.{leaf}.weight"] = conv_w(16, 16, 1, 1)
            sd[f"decoder.mid.attn_1.{leaf}.bias"] = np.zeros((16,), np.float32)
    add_res("decoder.mid.block_2", 16, 16)
    add_res("decoder.up.1.block.0", 16, 16)
    add_res("decoder.up.1.block.1", 16, 16)
    sd["decoder.up.1.upsample.conv.weight"] = conv_w(16, 16, 3, 3)
    sd["decoder.up.1.upsample.conv.bias"] = np.zeros((16,), np.float32)
    add_res("decoder.up.0.block.0", 16, 8)
    add_res("decoder.up.0.block.1", 8, 8)
    sd["decoder.norm_out.weight"] = np.zeros((8,), np.float32)
    sd["decoder.norm_out.bias"] = np.zeros((8,), np.float32)
    sd["decoder.conv_out.weight"] = conv_w(3, 8, 3, 3)
    sd["decoder.conv_out.bias"] = np.zeros((3,), np.float32)
    sd["decoder.conv_out.time_mix_conv.weight"] = conv_w(3, 3, 3, 3, 3)
    sd["decoder.conv_out.time_mix_conv.bias"] = np.zeros((3,), np.float32)

    converted = convert_state_dict(sd, convert_vae_key)
    flat_conv = {
        "/".join(k): v.shape
        for k, v in traverse_util.flatten_dict(converted["params"]).items()
    }
    missing = sorted(set(flat_flax) - set(flat_conv))
    unexpected = sorted(set(flat_conv) - set(flat_flax))
    assert not missing, f"missing: {missing[:8]}"
    assert not unexpected, f"unexpected: {unexpected[:8]}"
    for k in flat_flax:
        assert flat_flax[k] == flat_conv[k], k
