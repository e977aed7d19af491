"""DPT checkpoint conversion fidelity: the authentic MiDaS dpt_hybrid_384
state-dict key list (timm vit_base_resnet50_384 + annotator/midas layout)
must map 1:1 onto the flax DPTDepthModel param tree with correct shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from hi3d_tpu.convert.torch_to_jax import convert_dpt_key, convert_state_dict
from hi3d_tpu.models.dpt import DPTDepthModel

pytestmark = pytest.mark.slow


def midas_dpt_hybrid_state_dict_shapes():
    """Key → torch shape for the released dpt_hybrid_384.pt."""
    sd = {}
    pm = "pretrained.model"
    sd[f"{pm}.cls_token"] = (1, 1, 768)
    sd[f"{pm}.pos_embed"] = (1, 577, 768)
    sd[f"{pm}.patch_embed.proj.weight"] = (768, 1024, 1, 1)
    sd[f"{pm}.patch_embed.proj.bias"] = (768,)
    bb = f"{pm}.patch_embed.backbone"
    sd[f"{bb}.stem.conv.weight"] = (64, 3, 7, 7)
    sd[f"{bb}.stem.norm.weight"] = (64,)
    sd[f"{bb}.stem.norm.bias"] = (64,)
    in_ch = 64
    for s, (blocks, out) in enumerate([(3, 256), (4, 512), (9, 1024)]):
        mid = out // 4
        for b in range(blocks):
            p = f"{bb}.stages.{s}.blocks.{b}"
            cin = in_ch if b == 0 else out
            if b == 0:
                sd[f"{p}.downsample.conv.weight"] = (out, cin, 1, 1)
                sd[f"{p}.downsample.norm.weight"] = (out,)
                sd[f"{p}.downsample.norm.bias"] = (out,)
            sd[f"{p}.conv1.weight"] = (mid, cin, 1, 1)
            sd[f"{p}.norm1.weight"] = (mid,)
            sd[f"{p}.norm1.bias"] = (mid,)
            sd[f"{p}.conv2.weight"] = (mid, mid, 3, 3)
            sd[f"{p}.norm2.weight"] = (mid,)
            sd[f"{p}.norm2.bias"] = (mid,)
            sd[f"{p}.conv3.weight"] = (out, mid, 1, 1)
            sd[f"{p}.norm3.weight"] = (out,)
            sd[f"{p}.norm3.bias"] = (out,)
        in_ch = out
    for i in range(12):
        p = f"{pm}.blocks.{i}"
        for n in ("norm1", "norm2"):
            sd[f"{p}.{n}.weight"] = (768,)
            sd[f"{p}.{n}.bias"] = (768,)
        sd[f"{p}.attn.qkv.weight"] = (2304, 768)
        sd[f"{p}.attn.qkv.bias"] = (2304,)
        sd[f"{p}.attn.proj.weight"] = (768, 768)
        sd[f"{p}.attn.proj.bias"] = (768,)
        sd[f"{p}.mlp.fc1.weight"] = (3072, 768)
        sd[f"{p}.mlp.fc1.bias"] = (3072,)
        sd[f"{p}.mlp.fc2.weight"] = (768, 3072)
        sd[f"{p}.mlp.fc2.bias"] = (768,)
    sd[f"{pm}.norm.weight"] = (768,)  # skipped (classifier-only)
    sd[f"{pm}.norm.bias"] = (768,)
    for n in ("3", "4"):
        pp = f"pretrained.act_postprocess{n}"
        sd[f"{pp}.0.project.0.weight"] = (768, 1536)
        sd[f"{pp}.0.project.0.bias"] = (768,)
        sd[f"{pp}.3.weight"] = (768, 768, 1, 1)
        sd[f"{pp}.3.bias"] = (768,)
    sd["pretrained.act_postprocess4.4.weight"] = (768, 768, 3, 3)
    sd["pretrained.act_postprocess4.4.bias"] = (768,)
    for n, cin in [(1, 256), (2, 512), (3, 768), (4, 768)]:
        sd[f"scratch.layer{n}_rn.weight"] = (256, cin, 3, 3)
    for n in range(1, 5):
        for u in (1, 2):
            for c in (1, 2):
                sd[f"scratch.refinenet{n}.resConfUnit{u}.conv{c}.weight"] = (
                    256, 256, 3, 3)
                sd[f"scratch.refinenet{n}.resConfUnit{u}.conv{c}.bias"] = (256,)
        sd[f"scratch.refinenet{n}.out_conv.weight"] = (256, 256, 1, 1)
        sd[f"scratch.refinenet{n}.out_conv.bias"] = (256,)
    sd["scratch.output_conv.0.weight"] = (128, 256, 3, 3)
    sd["scratch.output_conv.0.bias"] = (128,)
    sd["scratch.output_conv.2.weight"] = (32, 128, 3, 3)
    sd["scratch.output_conv.2.bias"] = (32,)
    sd["scratch.output_conv.4.weight"] = (1, 32, 1, 1)
    sd["scratch.output_conv.4.bias"] = (1,)
    return sd


def test_dpt_conversion_is_exact_bijection():
    model = DPTDepthModel()
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 384, 384, 3))
    )
    flat_flax = {
        "/".join(k): v.shape
        for k, v in traverse_util.flatten_dict(shapes["params"]).items()
    }

    torch_sd = {
        k: np.zeros(s, np.float32)
        for k, s in midas_dpt_hybrid_state_dict_shapes().items()
    }
    converted = convert_state_dict(torch_sd, convert_dpt_key)
    flat_conv = {
        "/".join(k): v.shape
        for k, v in traverse_util.flatten_dict(converted["params"]).items()
    }

    missing = sorted(set(flat_flax) - set(flat_conv))
    unexpected = sorted(set(flat_conv) - set(flat_flax))
    assert not missing, f"flax params not covered by checkpoint: {missing[:10]}"
    assert not unexpected, f"converted keys not in model: {unexpected[:10]}"
    for k in flat_flax:
        assert flat_flax[k] == flat_conv[k], (
            f"shape mismatch at {k}: model {flat_flax[k]} vs ckpt {flat_conv[k]}"
        )


def test_only_unused_params_skipped():
    sd = midas_dpt_hybrid_state_dict_shapes()
    skipped = {k for k in sd if convert_dpt_key(k) is None}
    expected = {
        "pretrained.model.norm.weight",  # classifier-only final norm
        "pretrained.model.norm.bias",
        # refinenet4 has no skip input → resConfUnit1 unused (dpt_depth.py:73)
        "scratch.refinenet4.resConfUnit1.conv1.weight",
        "scratch.refinenet4.resConfUnit1.conv1.bias",
        "scratch.refinenet4.resConfUnit1.conv2.weight",
        "scratch.refinenet4.resConfUnit1.conv2.bias",
    }
    assert skipped == expected
