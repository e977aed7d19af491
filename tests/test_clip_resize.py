"""CLIP preprocessing resize parity (round-1 VERDICT weak #6).

The reference preprocesses conditioning images with kornia bicubic resize,
`align_corners=True, antialias=True` (sgm/modules/encoders/modules.py:
620-632), which is torch `F.interpolate(mode="bicubic", antialias=True,
align_corners=True)`. hi3d_tpu.models.clip.resize_bicubic must reproduce it
to numerical precision — conditioning embeddings feed every sampled frame.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hi3d_tpu.models.clip import (
    _aa_bicubic_weights,
    clip_normalize,
    resize_bicubic,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_resize(x_nhwc: np.ndarray, hw) -> np.ndarray:
    t = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2))
    out = F.interpolate(
        t, size=tuple(hw), mode="bicubic", align_corners=True, antialias=True
    )
    return out.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize(
    "n_in,n_out", [(512, 224), (1024, 224), (224, 224), (100, 224), (33, 17)]
)
def test_weight_matrix_matches_torch_one_hot(n_in, n_out):
    """Probe torch with one-hot rows: interpolate(eye) IS the weight matrix."""
    eye = torch.eye(n_in, dtype=torch.float64)[None, None]
    ref = F.interpolate(
        eye, size=(n_out, n_in), mode="bicubic", align_corners=True, antialias=True
    )[0, 0].numpy()
    ours = _aa_bicubic_weights(n_in, n_out)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("shape", [(2, 512, 512, 3), (1, 311, 473, 3)])
def test_resize_matches_torch_on_images(shape):
    rs = np.random.RandomState(0)
    # structured content (smooth + edges), [0, 1] range like real frames
    x = rs.rand(*shape).astype(np.float32)
    x[:, : shape[1] // 2] = np.linspace(0, 1, shape[2])[None, None, :, None]
    ref = torch_resize(x, (224, 224))
    got = np.asarray(resize_bicubic(jnp.asarray(x), (224, 224)))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_downstream_embedding_delta_is_bounded():
    """Resize error propagated through CLIP normalization stays at fp32
    noise level — the VERDICT asked for a numeric bound on the conditioning
    input, replacing the round-1 docstring claim."""
    rs = np.random.RandomState(1)
    x = rs.rand(1, 512, 512, 3).astype(np.float32)
    ref = clip_normalize(jnp.asarray(torch_resize(x, (224, 224))))
    got = clip_normalize(resize_bicubic(jnp.asarray(x), (224, 224)))
    delta = np.abs(np.asarray(ref) - np.asarray(got)).max()
    assert delta < 1e-4, f"normalized-input delta {delta:.2e}"


def test_resize_weights_not_leaked_across_traces():
    """The cached bicubic weight matrices must not be trace-local: caching a
    jnp constant created inside one jit leaks a tracer into the next trace
    (hit by serving when a second batch size retraced the CLIP tower)."""
    import jax
    import jax.numpy as jnp

    from hi3d_tpu.models.clip import _aa_weights_cached, resize_bicubic

    _aa_weights_cached.cache_clear()
    a = jax.jit(lambda x: resize_bicubic(x, (16, 16)))(
        jnp.ones((2, 32, 32, 3))
    )
    # a different jit with the same (n_in, n_out) key reuses the cache entry
    b = jax.jit(lambda x: resize_bicubic(x, (16, 16)))(
        jnp.ones((1, 32, 32, 3))
    )
    assert a.shape == (2, 16, 16, 3) and b.shape == (1, 16, 16, 3)
