"""InceptionV3 FID feature extractor (reference modules.py:187-204)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from hi3d_tpu.models.inception import (
    InceptionV3,
    InceptionV3Trunk,
    _avg_pool_3x3,
    _max_pool_3x3_s1,
    load_inception_params,
)

pytestmark = pytest.mark.slow



def test_avg_pool_include_pad_semantics():
    # torch AvgPool2d(3,1,1) default divides by 9 even at borders
    x = jnp.ones((1, 4, 4, 1))
    y = _avg_pool_3x3(x, exclude_pad=False)
    np.testing.assert_allclose(float(y[0, 0, 0, 0]), 4 / 9, rtol=1e-6)
    np.testing.assert_allclose(float(y[0, 1, 1, 0]), 1.0, rtol=1e-6)


def test_fid_pool_patches_match_torch():
    """pytorch-fid patches: avg_pool2d(count_include_pad=False) in the
    A/C/E pool branches and max_pool2d(3,1,1) at Mixed_7c."""
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(0).standard_normal((2, 7, 7, 5)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    got = np.asarray(_avg_pool_3x3(jnp.asarray(x), exclude_pad=True))
    want = F.avg_pool2d(
        xt, kernel_size=3, stride=1, padding=1, count_include_pad=False
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    got = np.asarray(_max_pool_3x3_s1(jnp.asarray(x)))
    want = F.max_pool2d(xt, kernel_size=3, stride=1, padding=1).numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), rtol=1e-6)


def test_fid_variant_differs_from_torchvision():
    # the Mixed_7c max-pool patch must show up in the pooled features
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 75, 75, 3))
    fid = InceptionV3Trunk(output_blocks=(3,), fid_variant=True)
    tv = InceptionV3Trunk(output_blocks=(3,), fid_variant=False)
    params = jax.jit(fid.init)(jax.random.PRNGKey(0), x)
    (a,) = jax.jit(fid.apply)(params, x)
    (b,) = jax.jit(tv.apply)(params, x)  # same params, different pool wiring
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_trunk_block_shapes():
    trunk = InceptionV3Trunk(output_blocks=(0, 1, 2, 3))
    x = jnp.zeros((1, 299, 299, 3))
    params = jax.jit(trunk.init)(jax.random.PRNGKey(0), x)
    o0, o1, o2, o3 = jax.jit(trunk.apply)(params, x)
    # torchvision inception_v3 feature-map sizes at 299² input
    assert o0.shape == (1, 73, 73, 64)
    assert o1.shape == (1, 35, 35, 192)
    assert o2.shape == (1, 17, 17, 768)
    assert o3.shape == (1, 1, 1, 2048)


def test_wrapper_resize_and_squeeze():
    model = InceptionV3(normalize_input=True)
    model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 64, 64, 3))  # resized to 299² internally
    feats = jax.jit(model.__call__)(x)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()


def test_inception_state_dict_conversion(tmp_path):
    import torch

    sd = {
        "Conv2d_1a_3x3.conv.weight": torch.randn(32, 3, 3, 3),
        "Conv2d_1a_3x3.bn.weight": torch.randn(32),
        "Conv2d_1a_3x3.bn.bias": torch.randn(32),
        "Conv2d_1a_3x3.bn.running_mean": torch.randn(32),
        "Conv2d_1a_3x3.bn.running_var": torch.rand(32) + 0.5,
        "Conv2d_1a_3x3.bn.num_batches_tracked": torch.tensor(7),
        "fc.weight": torch.randn(1000, 2048),
        "fc.bias": torch.randn(1000),
    }
    p = tmp_path / "inc.pt"
    torch.save(sd, str(p))
    out = load_inception_params(str(p))
    conv = out["params"]["Conv2d_1a_3x3"]["conv"]["kernel"]
    assert conv.shape == (3, 3, 3, 32)  # HWIO
    bn_p = out["params"]["Conv2d_1a_3x3"]["bn"]
    bn_s = out["batch_stats"]["Conv2d_1a_3x3"]["bn"]
    assert bn_p["scale"].shape == (32,) and bn_p["bias"].shape == (32,)
    assert bn_s["mean"].shape == (32,) and bn_s["var"].shape == (32,)
    assert "fc" not in out["params"]
    np.testing.assert_allclose(
        np.asarray(conv), sd["Conv2d_1a_3x3.conv.weight"].numpy().transpose(2, 3, 1, 0)
    )


def test_inception_registry():
    from hi3d_tpu.registry import resolve

    assert resolve("sgm.modules.encoders.modules.InceptionV3") is not None
