"""Deterministic toy conditioning embedders for end-to-end pipeline parity.

The production crossattn / aes towers (OpenCLIP ViT-H, CLIP ViT-L + MLP)
have their own unit parity tests; the e2e pipeline test replaces them with
tiny *identical-math* embedders so the torch reference pipeline and the
hi3d_tpu pipeline can be compared bit-for-bit on the composition logic
(conditioner routing/order, CFG batching, sampler bookkeeping) without
multi-GB weights.

Both variants compute, from fixed seeded numpy matrices:
  ToyImageEmbedder   : image   → spatial mean (B,3) @ W_IMG → (B,1,CTX)   [crossattn]
  ToyVideoEmbedder   : video   → global  mean (B,3) @ W_VID → (B,16)      [vector]
  ToyDepthEmbedder   : frames  → grayscale → 8×8 avgpool → ×9 channels    [concat]
(the second stands in for the reference AesEmbedder slot: a video-input
vector embedder between the crossattn and elevation embedders —
configs/inference-v01.yaml:68-71; the third stands in for the stage-2
DepthEmbedder slot: a cond_frames-input 9-channel latent-resolution concat
embedder — configs/inference-v02.yaml:73-77. Average pooling is chosen
because it is bit-identical across torch and XLA, unlike bilinear resize.)
"""

import numpy as np

CTX_DIM = 64
VEC_DIM = 16
W_IMG = (np.random.RandomState(7).randn(3, CTX_DIM) * 0.2).astype(np.float32)
W_VID = (np.random.RandomState(8).randn(3, VEC_DIM) * 0.2).astype(np.float32)


# --------------------------------------------------------------- torch side
def _torch_base():
    from sgm.modules.encoders.modules import AbstractEmbModel

    return AbstractEmbModel


def TorchToyImageEmbedder():  # instantiate_from_config calls the target
    import torch

    class Impl(_torch_base()):
        def forward(self, image):  # (B, C, H, W) in [-1, 1]
            feat = image.float().mean(dim=(2, 3))  # (B, 3)
            emb = feat @ torch.from_numpy(W_IMG)
            return emb[:, None, :]  # (B, 1, CTX)

    return Impl()


def TorchToyVideoEmbedder():
    import torch

    class Impl(_torch_base()):
        def forward(self, video):  # (B, C, T, H, W)
            feat = video.float().mean(dim=(2, 3, 4))  # (B, 3)
            return feat @ torch.from_numpy(W_VID)  # (B, VEC)

    return Impl()


def TorchToyDepthEmbedder():
    import torch
    import torch.nn.functional as F

    class Impl(_torch_base()):
        def forward(self, frames):  # (B·T, C, H, W) in [-1, 1]
            gray = frames.float().mean(dim=1, keepdim=True)  # (BT, 1, H, W)
            pooled = F.avg_pool2d(gray, kernel_size=8)  # latent res (f=8)
            return pooled.repeat(1, 9, 1, 1)  # (BT, 9, h, w)

    return Impl()


# ----------------------------------------------------------------- jax side
def JaxToyImageEmbedder():
    import jax.numpy as jnp

    from hi3d_tpu.conditioners import AbstractEmbedder

    class Impl(AbstractEmbedder):
        def __call__(self, image, rng=None):  # (B, H, W, C)
            feat = jnp.mean(image.astype(jnp.float32), axis=(1, 2))
            return (feat @ jnp.asarray(W_IMG))[:, None, :]

    return Impl()


def JaxToyVideoEmbedder():
    import jax.numpy as jnp

    from hi3d_tpu.conditioners import AbstractEmbedder

    class Impl(AbstractEmbedder):
        def __call__(self, video, rng=None):  # (B, T, H, W, C)
            feat = jnp.mean(video.astype(jnp.float32), axis=(1, 2, 3))
            return feat @ jnp.asarray(W_VID)

    return Impl()


def JaxToyDepthEmbedder():
    import jax.numpy as jnp

    from hi3d_tpu.conditioners import AbstractEmbedder

    class Impl(AbstractEmbedder):
        def __call__(self, frames, rng=None):  # (B·T, H, W, C)
            gray = jnp.mean(frames.astype(jnp.float32), axis=-1)  # (BT, H, W)
            bt, h, w = gray.shape
            pooled = gray.reshape(bt, h // 8, 8, w // 8, 8).mean(axis=(2, 4))
            return jnp.repeat(pooled[..., None], 9, axis=-1)  # (BT, h, w, 9)

    return Impl()
