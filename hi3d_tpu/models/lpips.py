"""LPIPS perceptual loss (VGG16 features + learned linear heads).

Functional parity: reference sgm/modules/autoencoding/lpips/loss/lpips.py
:12-99 — ScalingLayer (ImageNet shift/scale on [-1,1] inputs), VGG16 feature
taps after relu1_2/2_2/3_3/4_3/5_3, per-location channel-unit-normalization,
1×1 `NetLinLayer` heads, spatial average, sum over taps. Available for
`loss_type: lpips` (sgm/modules/diffusionmodules/loss.py:34-41) and the
autoencoder GAN losses — both unused by the shipped Hi3D configs.

Weights: `load_lpips_params` maps the reference's `vgg.pth` (lin heads) and a
torchvision-format VGG16 state dict onto this module.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

# torchvision VGG16 `features` conv indices per tap block
_VGG_BLOCKS = (
    ((0, 3, 64)),
    ((5, 8, 128)),
    ((10, 12, 14, 256)),
    ((17, 19, 21, 512)),
    ((24, 26, 28, 512)),
)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 up to relu5_3, returning the five LPIPS tap activations."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, ...]:
        taps = []
        h = x
        for bi, block in enumerate(_VGG_BLOCKS):
            convs, ch = block[:-1], block[-1]
            for ci in convs:
                h = nn.Conv(
                    ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name=f"conv{ci}",
                )(h)
                h = nn.relu(h)
            taps.append(h)
            if bi != len(_VGG_BLOCKS) - 1:
                h = nn.max_pool(h, (2, 2), (2, 2))
        return tuple(taps)


class LPIPS(nn.Module):
    """Perceptual distance between two [-1,1] NHWC images."""

    dtype: Dtype = jnp.float32
    use_dropout: bool = True  # parity flag; heads are eval-mode 1×1 convs

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        net = VGG16Features(dtype=self.dtype, name="net")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)

        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.maximum(
                jnp.linalg.norm(a.astype(jnp.float32), axis=-1, keepdims=True),
                1e-10,
            ).astype(a.dtype)
            b = b / jnp.maximum(
                jnp.linalg.norm(b.astype(jnp.float32), axis=-1, keepdims=True),
                1e-10,
            ).astype(b.dtype)
            diff = (a - b) ** 2
            w = nn.Conv(
                1, (1, 1), use_bias=False, dtype=self.dtype, name=f"lin{i}"
            )(diff)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total  # (B,)


def convert_lpips_key(key: str):
    """Map reference lpips `vgg.pth` + torchvision vgg16 keys to this module."""
    parts = key.split(".")
    if parts[0].startswith("lin") and parts[0][3:].isdigit():
        # linN.model.1.weight → linN
        return (parts[0],)
    if parts[0] == "features" or (parts[0] == "net" and parts[2] == "features"):
        idx = parts[1] if parts[0] == "features" else parts[3]
        return ("net", f"conv{idx}")
    if parts[0] == "net" and parts[1].startswith("slice"):
        return None  # reference wraps slices; weights come via `features`
    return None


def load_lpips_params(
    lpips_path: Optional[str] = None, vgg_path: Optional[str] = None
) -> Dict:
    """Build an LPIPS param tree from the reference checkpoints."""
    from ..convert.torch_to_jax import convert_state_dict, load_torch_state_dict

    sd: Dict[str, np.ndarray] = {}
    if vgg_path:
        sd.update(load_torch_state_dict(vgg_path))
    if lpips_path:
        sd.update(load_torch_state_dict(lpips_path))
    return convert_state_dict(sd, convert_lpips_key)
