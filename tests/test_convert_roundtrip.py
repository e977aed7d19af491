"""Converter round-trip: flax → torch layout → flax must be the identity, on
both the UNet and the VAE. This pins down every key mapping and layout
transform in BOTH directions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from hi3d_tpu.convert.jax_to_torch import (
    _export_tree,
    unet_path_to_torch,
    vae_path_to_torch,
)
from hi3d_tpu.convert.torch_to_jax import (
    convert_state_dict,
    convert_unet_key,
    convert_vae_key,
)
from hi3d_tpu.models.unet import VideoUNet
from hi3d_tpu.models.vae import AutoencoderKL

pytestmark = pytest.mark.slow


def assert_trees_equal(a, b):
    fa = traverse_util.flatten_dict(a["params"])
    fb = traverse_util.flatten_dict(b["params"])
    assert set(fa) == set(fb), (
        sorted(set(fa) - set(fb))[:5], sorted(set(fb) - set(fa))[:5]
    )
    for k in fa:
        np.testing.assert_allclose(
            np.asarray(fa[k]), np.asarray(fb[k]), rtol=1e-6,
            err_msg="/".join(k),
        )


def test_unet_roundtrip():
    model = VideoUNet(
        in_channels=8, out_channels=4, model_channels=16, num_res_blocks=1,
        attention_resolutions=[1, 2], channel_mult=[1, 2],
        num_classes="sequential", num_head_channels=8, transformer_depth=1,
        context_dim=16, extra_ff_mix_layer=True, use_spatial_context=True,
        merge_strategy="learned_with_images", video_kernel_size=[3, 1, 1],
        use_linear_in_transformer=True, adm_in_channels=12,
    )
    t = 2
    x = jnp.zeros((t, 8, 8, 8))
    params = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((t,)),
        context=jnp.zeros((1, 1, 16)), y=jnp.zeros((1, 12)),
        num_video_frames=t, image_only_indicator=jnp.zeros((1, t)),
    )
    # randomize so transposes can't silently no-op
    leaves, treedef = jax.tree.flatten(params)
    rngs = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree.unflatten(
        treedef,
        [jax.random.normal(r, l.shape, l.dtype) for r, l in zip(rngs, leaves)],
    )

    sd = _export_tree(params, unet_path_to_torch, "")
    back = convert_state_dict(sd, convert_unet_key, strict=True)
    assert_trees_equal(params, back)


def test_vae_roundtrip():
    vae = AutoencoderKL(
        ddconfig=dict(double_z=True, z_channels=4, in_channels=3, out_ch=3,
                      ch=8, ch_mult=[1, 2], num_res_blocks=1,
                      attn_resolutions=[16], resolution=32),
    )
    params = vae.init(jax.random.PRNGKey(0), image_hw=(32, 32))
    leaves, treedef = jax.tree.flatten(params)
    rngs = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    params = jax.tree.unflatten(
        treedef,
        [jax.random.normal(r, l.shape, l.dtype) for r, l in zip(rngs, leaves)],
    )
    sd = _export_tree(params, vae_path_to_torch, "")
    back = convert_state_dict(sd, convert_vae_key, strict=True)
    assert_trees_equal(params, back)


def test_exported_names_look_like_reference():
    """Spot-check dotted names against the reference state-dict vocabulary."""
    model = VideoUNet(
        in_channels=8, out_channels=4, model_channels=16, num_res_blocks=1,
        attention_resolutions=[1], channel_mult=[1, 2],
        num_classes="sequential", num_head_channels=8, transformer_depth=1,
        context_dim=16, extra_ff_mix_layer=True, use_spatial_context=True,
        merge_strategy="learned_with_images", video_kernel_size=[3, 1, 1],
        use_linear_in_transformer=True, adm_in_channels=12,
    )
    t = 2
    import functools

    shapes = jax.eval_shape(
        functools.partial(model.init, num_video_frames=t),
        jax.random.PRNGKey(0), jnp.zeros((t, 8, 8, 8)), jnp.zeros((t,)),
        context=jnp.zeros((1, 1, 16)), y=jnp.zeros((1, 12)),
        image_only_indicator=jnp.zeros((1, t)),
    )
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    sd = _export_tree(zeros, unet_path_to_torch, "")
    keys = set(sd)
    assert "time_embed.0.weight" in keys
    assert "label_emb.0.0.weight" in keys
    assert "input_blocks.0.0.weight" in keys
    assert "input_blocks.1.0.in_layers.0.weight" in keys
    assert "input_blocks.1.0.time_stack.in_layers.2.weight" in keys
    assert "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight" in keys
    assert "input_blocks.1.1.transformer_blocks.0.ff.net.0.proj.weight" in keys
    assert "input_blocks.1.1.time_mixer.mix_factor" in keys
    assert "out.2.bias" in keys
    assert "middle_block.0.emb_layers.1.weight" in keys
