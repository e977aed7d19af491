"""DPT-hybrid depth model: shapes, resize math vs torch align_corners, and
the DepthEmbedder packing (min-max normalize + pixel-unshuffle)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hi3d_tpu.models.dpt import (
    DPTDepthModel,
    StdConv,
    resize_bilinear_align_corners,
)

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow


def test_align_corners_resize_matches_torch():
    x = np.random.RandomState(0).rand(2, 7, 9, 3).astype(np.float32)
    for size in [(14, 18), (13, 21), (3, 4)]:
        ours = resize_bilinear_align_corners(jnp.asarray(x), size)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=size,
            mode="bilinear", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


def test_std_conv_weight_standardization():
    """WS formula matches timm StdConv2d (unit-var, zero-mean per out-ch)."""
    m = StdConv(4, (3, 3))
    x = jnp.ones((1, 8, 8, 2))
    params = m.init(jax.random.PRNGKey(0), x)
    k = params["params"]["kernel"]

    ref_w = torch.from_numpy(np.asarray(k).transpose(3, 2, 0, 1))  # OIHW
    ref_w = torch.nn.functional.batch_norm(
        ref_w.reshape(1, 4, -1), None, None, training=True, momentum=0.0,
        eps=1e-6,
    ).reshape_as(ref_w)
    xt = torch.ones(1, 2, 8, 8)
    ref = torch.nn.functional.conv2d(
        xt, ref_w, torch.from_numpy(np.asarray(params["params"]["bias"])),
        padding=1,
    ).permute(0, 2, 3, 1).numpy()
    ours = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_dpt():
    # structurally complete but small: 2 ViT layers with hooks (0, 1)
    model = DPTDepthModel(
        features=16, vit_width=32, vit_layers=2, vit_heads=2, hooks=(0, 1),
        pos_grid=4,
    )
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_dpt_output_shape_and_nonneg(tiny_dpt):
    model, params = tiny_dpt
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 96, 3))
    out = jax.jit(model.apply)(params, x)
    assert out.shape == (2, 64, 96)
    assert bool(jnp.all(out >= 0.0))
    assert bool(jnp.all(jnp.isfinite(out)))


def test_dpt_pos_embed_resizes(tiny_dpt):
    """Different input resolutions share params (resized pos embedding)."""
    model, params = tiny_dpt
    out = jax.jit(model.apply)(params, jnp.zeros((1, 96, 64, 3)))
    assert out.shape == (1, 96, 64)


def test_depth_embedder_packing():
    """DepthEmbedder: per-frame min-max normalize + s×s pixel-unshuffle to
    latent resolution (reference vtdm/encoders.py:44-50)."""
    from hi3d_tpu.conditioners import DepthEmbedder

    emb = DepthEmbedder.__new__(DepthEmbedder)  # skip heavy DPT init
    emb.shuffle_size = 3
    emb.scale_factor = 2.6666
    emb.params = None

    class FakeDPT:
        def apply(self, params, y):
            # deterministic pseudo-depth: x-gradient ramp
            b, h, w, _ = y.shape
            return jnp.broadcast_to(
                jnp.linspace(0.0, 5.0, w)[None, None, :], (b, h, w)
            )

    emb.model = FakeDPT()
    x = jnp.zeros((2, 128, 128, 3))
    out = emb(x)
    assert out.shape == (2, 16, 16, 9)
    assert float(jnp.min(out)) >= 0.0
    assert float(jnp.max(out)) == pytest.approx(1.0, abs=1e-5)
