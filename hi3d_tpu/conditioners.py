"""Conditioning system: GeneralConditioner + the Hi3D embedder set.

Functional parity targets (reference file:line):
- GeneralConditioner: sgm/modules/encoders/modules.py:71-184 — runs each
  embedder on its batch key, routes outputs by rank into
  {vector, crossattn, concat}, concatenates per key, applies per-embedder
  Bernoulli ucg dropout during training, and computes (c, uc) pairs with
  force-zero keys for CFG.
- FrozenOpenCLIPImageEmbedder(+Prediction): modules.py:570-728, 1028-1046 —
  OpenCLIP ViT-H/14 pooled embedding of the conditioning frame (bicubic 224
  resize + CLIP renorm), repeated n_copies → crossattn (B, 1, 1024).
- ConcatTimestepEmbedderND: modules.py:913-929 — sinusoidal embedding of each
  scalar dim (elevation / cond_aug), flattened → vector (B, 256·D).
- VideoPredictionEmbedderWithEncoder: modules.py:951-1025 — VAE(mode) latent
  of conditioning frame(s), packed (B, H/8, W/8, T·C) and repeated n_copies →
  concat.
- AesEmbedder: vtdm/encoders.py:56-91 — CLIP ViT-L/14 features of the middle
  frame → L2-normalize → aesthetic MLP → [score, sinusoidal(score·100, 255)]
  → vector (B, 256).
- DepthEmbedder: vtdm/encoders.py:15-53 — DPT depth per frame, min-max
  normalized, bilinear to (H/8·s, W/8·s), pixel-unshuffled s×s → concat
  (B·T, H/8, W/8, s²).

Conventions: channels-last everywhere. Videos are (B, T, H, W, C); frames
(N, H, W, C); all image values in [-1, 1]. Concatenation happens on the
trailing axis for every key (the NHWC equivalent of the reference's
OUTPUT_DIM2KEYS/KEY2CATDIM, modules.py:72-73). RNG is explicit: pass `rng` to
enable ucg dropout (training); omit it for deterministic inference.

All Hi3D embedders are frozen (`is_trainable: False` in both shipped configs),
so embedder params are held on the embedder objects and treated as closure
constants under jit; the training step only differentiates the UNet.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import instantiate_from_config
from .models.clip import (
    AestheticMLP,
    clip_normalize,
    resize_bicubic,
    resize_bilinear,
    vit_h_14,
    vit_l_14,
)
from .models.layers import timestep_embedding
from .utils.misc import append_dims, module_init

CondDict = Dict[str, jax.Array]


def _jitted(owner, name: str, fn):
    """Cache a jitted tower forward on the embedder instance.

    Tower applies (CLIP ViT-H/L, DPT, T5/CLIP text, cond-VAE) were running
    eagerly — thousands of per-op dispatches through the ~6 ms TPU tunnel,
    minutes of wall clock per pipeline run. One jit per tower; retraces only
    on new input shapes; inlines when already under an outer trace.

    The traced program is also disk-cached (utils/program_cache.py) keyed by
    the owner's flax module repr(s) — cold processes skip the tower trace."""
    from .utils.misc import instance_jit
    from .utils.program_cache import flax_module_key

    mods = [
        getattr(owner, a)
        for a in ("module", "model", "clip", "mlp", "encoder_module")
        if getattr(owner, a, None) is not None
    ]
    pk = flax_module_key(*mods) if mods else None
    return instance_jit(owner, name, fn, program_key=pk)



class AbstractEmbedder:
    """Base class: config wiring (input_key / ucg_rate / is_trainable) plus a
    __call__ producing one conditioning array."""

    input_key: Optional[str] = None
    ucg_rate: float = 0.0
    is_trainable: bool = False

    # rank → output key, matching reference OUTPUT_DIM2KEYS (channels-last)
    OUT_KEY_BY_NDIM = {2: "vector", 3: "crossattn", 4: "concat", 5: "concat"}

    def __call__(self, x, rng: Optional[jax.Array] = None) -> jax.Array:
        raise NotImplementedError

    def init_params(self, rng: jax.Array) -> None:
        """Initialize tower params (random). Checkpoint loading replaces them."""


class GeneralConditioner:
    def __init__(self, emb_models: Sequence[Dict], rng: Optional[jax.Array] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.embedders: List[AbstractEmbedder] = []
        for n, embconfig in enumerate(emb_models):
            embedder = instantiate_from_config(embconfig)
            if not isinstance(embedder, AbstractEmbedder):
                raise TypeError(
                    f"embedder {type(embedder).__name__} must inherit AbstractEmbedder"
                )
            embedder.is_trainable = bool(embconfig.get("is_trainable", False))
            embedder.ucg_rate = float(embconfig.get("ucg_rate", 0.0))
            if "input_key" in embconfig:
                embedder.input_key = embconfig["input_key"]
            elif "input_keys" in embconfig:
                # multi-input embedders (reference modules.py:133-134)
                embedder.input_key = None
                embedder.input_keys = list(embconfig["input_keys"])
            else:
                raise KeyError(f"embedder #{n} needs 'input_key(s)'")
            rng, sub = jax.random.split(rng)
            embedder.init_params(sub)
            self.embedders.append(embedder)

    def __call__(
        self,
        batch: Dict[str, Any],
        force_zero_embeddings: Optional[Sequence[str]] = None,
        rng: Optional[jax.Array] = None,
        ucg_enabled: bool = True,
    ) -> CondDict:
        force_zero_embeddings = force_zero_embeddings or []
        output: CondDict = {}
        for embedder in self.embedders:
            if rng is not None:
                rng, emb_rng, ucg_rng = jax.random.split(rng, 3)
            else:
                emb_rng = ucg_rng = None
            if embedder.input_key is not None:
                emb_out = embedder(batch[embedder.input_key], rng=emb_rng)
            else:
                emb_out = embedder(
                    *[batch[k] for k in embedder.input_keys], rng=emb_rng
                )
            if not isinstance(emb_out, (list, tuple)):
                emb_out = [emb_out]
            for emb in emb_out:
                out_key = AbstractEmbedder.OUT_KEY_BY_NDIM[emb.ndim]
                if (
                    ucg_enabled
                    and embedder.ucg_rate > 0.0
                    and ucg_rng is not None
                ):
                    keep = jax.random.bernoulli(
                        ucg_rng, 1.0 - embedder.ucg_rate, (emb.shape[0],)
                    )
                    emb = append_dims(keep, emb.ndim).astype(emb.dtype) * emb
                if embedder.input_key in force_zero_embeddings:
                    emb = jnp.zeros_like(emb)
                if out_key in output:
                    output[out_key] = jnp.concatenate(
                        [output[out_key], emb], axis=-1
                    )
                else:
                    output[out_key] = emb
        return output

    def get_unconditional_conditioning(
        self,
        batch_c: Dict[str, Any],
        batch_uc: Optional[Dict[str, Any]] = None,
        force_uc_zero_embeddings: Optional[Sequence[str]] = None,
        force_cond_zero_embeddings: Optional[Sequence[str]] = None,
    ):
        """(c, uc) pair, reference modules.py GeneralConditioner semantics
        (ucg disabled for both passes).

        When `batch_uc` is None — every Hi3D pipeline call site — the uc
        entries are either IDENTICAL to c (same batch, no ucg, rng-free
        towers) or zeroed by `force_uc_zero_embeddings`; running the frozen
        towers a second time only to zero or duplicate their outputs doubles
        the conditioning cost (CLIP ViT-H + DPT×16 + 16-frame cond-VAE encode
        at stage 2). One tower pass builds both dicts, exactly."""
        if batch_uc is None:
            return self._paired_conditioning(
                batch_c, force_cond_zero_embeddings, force_uc_zero_embeddings
            )
        c = self(batch_c, force_cond_zero_embeddings, ucg_enabled=False)
        uc = self(batch_uc, force_uc_zero_embeddings, ucg_enabled=False)
        return c, uc

    def _paired_conditioning(
        self,
        batch: Dict[str, Any],
        force_cond_zero: Optional[Sequence[str]],
        force_uc_zero: Optional[Sequence[str]],
    ) -> Tuple[CondDict, CondDict]:
        force_cond_zero = force_cond_zero or []
        force_uc_zero = force_uc_zero or []
        c: CondDict = {}
        uc: CondDict = {}
        for embedder in self.embedders:
            if embedder.input_key is not None:
                emb_out = embedder(batch[embedder.input_key], rng=None)
            else:
                emb_out = embedder(
                    *[batch[k] for k in embedder.input_keys], rng=None
                )
            if not isinstance(emb_out, (list, tuple)):
                emb_out = [emb_out]
            for emb in emb_out:
                out_key = AbstractEmbedder.OUT_KEY_BY_NDIM[emb.ndim]
                for out, forced in ((c, force_cond_zero), (uc, force_uc_zero)):
                    e = (
                        jnp.zeros_like(emb)
                        if embedder.input_key in forced
                        else emb
                    )
                    if out_key in out:
                        out[out_key] = jnp.concatenate(
                            [out[out_key], e], axis=-1
                        )
                    else:
                        out[out_key] = e
        return c, uc


# --------------------------------------------------------------------------
# embedders
# --------------------------------------------------------------------------


class ConcatTimestepEmbedderND(AbstractEmbedder):
    """Sinusoidal embedding per scalar dim, flattened (elevation / cond_aug)."""

    def __init__(self, outdim: int):
        self.outdim = int(outdim)

    def __call__(self, x, rng=None) -> jax.Array:
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[:, None]
        b, dims = x.shape
        emb = timestep_embedding(x.reshape(-1), self.outdim)
        return emb.reshape(b, dims * self.outdim)


class FrozenOpenCLIPImageEmbedder(AbstractEmbedder):
    """OpenCLIP ViT-H/14 pooled image embedding of [-1,1] NHWC frames."""

    def __init__(
        self,
        arch: str = "ViT-H-14",
        version: Optional[str] = None,
        freeze: bool = True,
        antialias: bool = True,
        ucg_rate: float = 0.0,
        unsqueeze_dim: bool = False,
        dtype=jnp.float32,
        **_unused,
    ):
        if arch != "ViT-H-14":
            raise NotImplementedError(f"arch {arch} (Hi3D uses ViT-H-14)")
        self.module = vit_h_14(dtype=dtype)
        self.params = None
        self.version = version
        self.unsqueeze_dim = unsqueeze_dim

    def init_params(self, rng):
        import os

        if self.params is None and self.version and os.path.exists(self.version):
            from .convert.torch_to_jax import load_open_clip_visual

            self.params = load_open_clip_visual(self.version)
        if self.params is None:
            x = jnp.zeros((1, 224, 224, 3))
            self.params = module_init(self.module.init, rng, x)

    def preprocess(self, x: jax.Array) -> jax.Array:
        x = resize_bicubic(x, (224, 224))
        return clip_normalize((x + 1.0) / 2.0)

    def __call__(self, image, rng=None) -> jax.Array:
        fwd = _jitted(
            self, "visual",
            lambda p, img: self.module.apply(p, self.preprocess(img)),
        )
        z = fwd(self.params, image)
        if self.unsqueeze_dim:
            z = z[:, None, :]
        return z


class FrozenOpenCLIPImagePredictionEmbedder(AbstractEmbedder):
    """CLIP embedding of n_cond_frames, repeated n_copies → (B·n, T, 1024)."""

    def __init__(self, open_clip_embedding_config: Dict, n_cond_frames: int, n_copies: int):
        self.n_cond_frames = int(n_cond_frames)
        self.n_copies = int(n_copies)
        self.open_clip = instantiate_from_config(open_clip_embedding_config)

    def init_params(self, rng):
        self.open_clip.init_params(rng)

    def __call__(self, vid, rng=None) -> jax.Array:
        z = self.open_clip(vid)  # (B·T, 1024)
        z = z.reshape(-1, self.n_cond_frames, z.shape[-1])  # (B, T, 1024)
        return jnp.repeat(z, self.n_copies, axis=0)


class VideoPredictionEmbedderWithEncoder(AbstractEmbedder):
    """VAE-mode latents of conditioning frames → concat input.

    Output (B·n_copies, H/8, W/8, n_cond_frames·C), frame-major channel
    packing like the reference's `(b t) c h w -> b () (t c) h w`.
    """

    def __init__(
        self,
        n_cond_frames: int,
        n_copies: int,
        encoder_config: Dict,
        sigma_sampler_config: Optional[Dict] = None,
        sigma_cond_config: Optional[Dict] = None,
        is_ae: bool = True,
        scale_factor: float = 1.0,
        disable_encoder_autocast: bool = True,
        en_and_decode_n_samples_a_time: Optional[int] = None,
    ):
        self.n_cond_frames = int(n_cond_frames)
        self.n_copies = int(n_copies)
        self.encoder = instantiate_from_config(encoder_config)
        self.sigma_sampler = (
            instantiate_from_config(sigma_sampler_config)
            if sigma_sampler_config
            else None
        )
        if sigma_cond_config is not None:
            raise NotImplementedError("sigma_cond not used by Hi3D")
        self.is_ae = is_ae
        self.scale_factor = float(scale_factor)
        # chunked encode (reference accepts but ignores this on an 80 GB
        # card; at 16×1024² the fp32 encoder's first conv alone is 8 GB)
        self.en_chunk = en_and_decode_n_samples_a_time

    def init_params(self, rng):
        if getattr(self.encoder, "params", None) is None:
            self.encoder.init(rng, image_hw=(32, 32))

    def __call__(self, vid, rng=None) -> jax.Array:
        if self.sigma_sampler is not None and rng is not None:
            rng_s, rng_n = jax.random.split(rng)
            b = vid.shape[0] // self.n_cond_frames
            sigmas = self.sigma_sampler(rng_s, b)
            sigmas = jnp.repeat(sigmas, self.n_cond_frames, axis=0)
            vid = vid + jax.random.normal(rng_n, vid.shape, vid.dtype) * append_dims(
                sigmas, vid.ndim
            ).astype(vid.dtype)

        n = self.en_chunk or vid.shape[0]
        if n >= vid.shape[0]:
            z = self.encoder.encode(vid)  # (B·T, h, w, c), deterministic mode
        else:
            z = jnp.concatenate(
                [
                    self.encoder.encode(vid[i : i + n])
                    for i in range(0, vid.shape[0], n)
                ],
                axis=0,
            )
        z = z * self.scale_factor

        bt, h, w, c = z.shape
        b = bt // self.n_cond_frames
        # (B·T, h, w, c) → (B, h, w, T·C) frame-major packing
        z = z.reshape(b, self.n_cond_frames, h, w, c)
        z = z.transpose(0, 2, 3, 1, 4).reshape(b, h, w, self.n_cond_frames * c)
        return jnp.repeat(z, self.n_copies, axis=0)


class AesEmbedder(AbstractEmbedder):
    """Aesthetic-score vector conditioning (stage 1 only)."""

    CLIP_PATH = "ckpts/ViT-L-14.pt"  # reference vtdm/encoders.py:59
    MLP_PATH = "ckpts/metric_models/sac+logos+ava1-l14-linearMSE.pth"  # :63

    def __init__(
        self,
        freeze: bool = True,
        dtype=jnp.float32,
        clip_path: Optional[str] = None,
        mlp_path: Optional[str] = None,
    ):
        self.clip = vit_l_14(dtype=dtype)
        self.mlp = AestheticMLP(dtype=dtype)
        self.clip_params = None
        self.mlp_params = None
        self.clip_path = clip_path or self.CLIP_PATH
        self.mlp_path = mlp_path or self.MLP_PATH

    def init_params(self, rng):
        import os

        if self.clip_params is None and os.path.exists(self.clip_path):
            from .convert.torch_to_jax import load_clip_jit_visual

            self.clip_params = load_clip_jit_visual(self.clip_path)
        if self.mlp_params is None and os.path.exists(self.mlp_path):
            from .convert.torch_to_jax import load_aesthetic_mlp

            self.mlp_params = load_aesthetic_mlp(self.mlp_path)
        r1, r2 = jax.random.split(rng)
        if self.clip_params is None:
            self.clip_params = module_init(
                self.clip.init, r1, jnp.zeros((1, 224, 224, 3))
            )
        if self.mlp_params is None:
            self.mlp_params = module_init(self.mlp.init, r2, jnp.zeros((1, 768)))

    def __call__(self, video, rng=None) -> jax.Array:
        # video: (B, T, H, W, C) in [-1, 1]; middle frame, 224×384 bilinear,
        # center 224 crop (cols 80:304), CLIP renorm (vtdm/encoders.py:77-85)
        t = video.shape[1]

        def fwd(cp, mp, frame):
            y = resize_bilinear(frame, (224, 384))[:, :, 80:304, :]
            y = clip_normalize((y + 1.0) * 0.5)
            feats = self.clip.apply(cp, y)  # (B, 768)
            # L2 normalize (reference round-trips via numpy `normalized`)
            norm = jnp.linalg.norm(
                feats.astype(jnp.float32), axis=-1, keepdims=True
            )
            feats = feats / jnp.maximum(norm, 1e-12).astype(feats.dtype)
            score = self.mlp.apply(mp, feats)  # (B, 1)
            emb = timestep_embedding(score[:, 0] * 100.0, 255)
            return jnp.concatenate(
                [score, emb.astype(score.dtype)], axis=-1
            )  # (B, 256)

        return _jitted(self, "aes", fwd)(
            self.clip_params, self.mlp_params, video[:, t // 2]
        )


class DepthEmbedder(AbstractEmbedder):
    """DPT depth maps pixel-unshuffled to latent resolution (stage 2)."""

    def __init__(
        self,
        freeze: bool = True,
        use_3d: bool = False,
        shuffle_size: int = 3,
        scale_factor: float = 2.6666,
        dtype=jnp.float32,
        model_kwargs: Optional[Dict] = None,  # tower overrides (tests)
    ):
        from .models.dpt import DPTDepthModel

        if use_3d:
            raise NotImplementedError("use_3d depth not used by Hi3D")
        self.shuffle_size = int(shuffle_size)
        self.scale_factor = float(scale_factor)
        self.model = DPTDepthModel(dtype=dtype, **(model_kwargs or {}))
        self.params = None
        # reference vtdm/encoders.py:18 hardcodes the MiDaS checkpoint path
        self.model_path = "ckpts/dpt_hybrid_384.pt"

    def init_params(self, rng):
        import os

        if self.params is None and os.path.exists(self.model_path):
            from .convert.torch_to_jax import load_dpt_params

            self.params = load_dpt_params(self.model_path)
        if self.params is None:
            self.params = module_init(
                self.model.init, rng, jnp.zeros((1, 384, 384, 3))
            )

    def __call__(self, x, rng=None) -> jax.Array:
        # x: (B·T, H, W, 3) or (B, T, H, W, 3) in [-1, 1]
        if x.ndim == 5:
            b, t, hh, ww, c = x.shape
            x = x.reshape(b * t, hh, ww, c)
        bt, hh, ww, _ = x.shape
        s = self.shuffle_size

        sh = int(hh / self.scale_factor / 32) * 32
        sw = int(ww / self.scale_factor / 32) * 32
        y = resize_bilinear(x, (sh, sw))
        y = _jitted(self, "dpt", self.model.apply)(self.params, y)
        # (B·T, sh, sw) inverse depth
        y = y[..., None]
        y = resize_bilinear(y, (hh // 8 * s, ww // 8 * s))
        # per-frame min-max normalize
        ymin = jnp.min(y, axis=(1, 2, 3), keepdims=True)
        y = y - ymin
        ymax = jnp.max(y, axis=(1, 2, 3), keepdims=True)
        y = y / jnp.maximum(ymax, 1e-6)
        # pixel-unshuffle s×s → channels: (bt, h·s, w·s, 1) → (bt, h, w, s²)
        h8, w8 = hh // 8, ww // 8
        y = y.reshape(bt, h8, s, w8, s)
        y = y.transpose(0, 1, 3, 2, 4).reshape(bt, h8, w8, s * s)
        return y


# --------------------------------------------------------------------------
# auxiliary embedders (sgm surface beyond the Hi3D task — reference
# sgm/modules/encoders/modules.py:187-929; unused by the shipped configs)
# --------------------------------------------------------------------------


class IdentityEncoder(AbstractEmbedder):
    """modules.py:207-212 — passthrough conditioning."""

    def __call__(self, x, rng=None):
        return jnp.asarray(x)


class ClassEmbedder(AbstractEmbedder):
    """modules.py:215-234 — learned class-label embedding table; class
    n_classes−1 is reserved as the unconditional token."""

    def __init__(self, embed_dim: int, n_classes: int = 1000,
                 add_sequence_dim: bool = False):
        self.embed_dim = int(embed_dim)
        self.n_classes = int(n_classes)
        self.add_sequence_dim = add_sequence_dim
        self.params = None

    def init_params(self, rng):
        if self.params is None:
            self.params = (
                jax.random.normal(rng, (self.n_classes, self.embed_dim)) * 0.02
            )

    def __call__(self, c, rng=None):
        emb = self.params[jnp.asarray(c, jnp.int32)]
        return emb[:, None, :] if self.add_sequence_dim else emb

    def get_unconditional_conditioning(self, bs: int):
        return {self.input_key: jnp.full((bs,), self.n_classes - 1, jnp.int32)}


class SpatialRescaler(AbstractEmbedder):
    """modules.py:759-816 — n_stages × multiplier resize (+ optional 1×1
    channel remap), video-aware. NHWC."""

    def __init__(
        self,
        n_stages: int = 1,
        method: str = "bilinear",
        multiplier: float = 0.5,
        in_channels: int = 3,
        out_channels: Optional[int] = None,
        bias: bool = False,
        wrap_video: bool = False,
        kernel_size: int = 1,
        remap_output: bool = False,
    ):
        if method not in ("nearest", "linear", "bilinear", "bicubic"):
            raise NotImplementedError(f"method {method!r}")
        self.n_stages = int(n_stages)
        self.method = {"linear": "bilinear"}.get(method, method)
        self.multiplier = float(multiplier)
        self.remap = out_channels is not None or remap_output
        self.out_channels = out_channels
        self.kernel_size = int(kernel_size)
        self.use_bias = bias
        self.wrap_video = wrap_video
        self.params = None
        self._mapper = None
        if self.remap:
            import flax.linen as nn

            self._mapper = nn.Conv(
                out_channels, (self.kernel_size, self.kernel_size),
                use_bias=bias,
                padding=[(self.kernel_size // 2, self.kernel_size // 2)] * 2,
            )
            self._in_channels = in_channels

    def init_params(self, rng):
        if self._mapper is not None and self.params is None:
            self.params = self._mapper.init(
                rng, jnp.zeros((1, 8, 8, self._in_channels))
            )

    def __call__(self, x, rng=None):
        x = jnp.asarray(x)
        video_shape = None
        if self.wrap_video and x.ndim == 5:
            video_shape = x.shape  # (B, T, H, W, C)
            x = x.reshape(-1, *x.shape[2:])
        for _ in range(self.n_stages):
            b, h, w, c = x.shape
            nh, nw = int(h * self.multiplier), int(w * self.multiplier)
            x = jax.image.resize(
                x, (b, nh, nw, c),
                {"bilinear": "bilinear", "nearest": "nearest",
                 "bicubic": "cubic"}[self.method],
            )
        if self._mapper is not None:
            x = self._mapper.apply(self.params, x)
        if video_shape is not None:
            x = x.reshape(video_shape[0], video_shape[1], *x.shape[1:])
        return x


class FrozenT5Embedder(AbstractEmbedder):
    """modules.py:250-290 — T5 text encoder via transformers' flax weights.

    Accepts raw strings (tokenized on host) or pre-tokenized int32 ids.
    Unused by Hi3D's shipped configs; provided for the full sgm surface.
    """

    def __init__(self, version: str = "google/t5-v1_1-xxl", max_length: int = 77,
                 freeze: bool = True, **_unused):
        self.version = version
        self.max_length = int(max_length)
        self._model = None
        self._tokenizer = None

    def _lazy(self):
        if self._model is None:
            from transformers import AutoTokenizer, FlaxT5EncoderModel

            self._tokenizer = AutoTokenizer.from_pretrained(self.version)
            self._model = FlaxT5EncoderModel.from_pretrained(
                self.version, dtype=jnp.float32
            )
        return self._model, self._tokenizer

    def __call__(self, text, rng=None):
        model, tok = self._lazy()
        if isinstance(text, (list, tuple)) and isinstance(text[0], str):
            ids = tok(
                list(text), truncation=True, max_length=self.max_length,
                padding="max_length", return_tensors="np",
            )["input_ids"]
        else:
            ids = np.asarray(text, np.int32)
        out = model(input_ids=jnp.asarray(ids))
        return out.last_hidden_state  # (B, L, D) crossattn


class FrozenOpenCLIPEmbedder(AbstractEmbedder):
    """OpenCLIP TEXT encoder (reference modules.py:498-568; unused by Hi3D).

    Accepts pre-tokenized int ids (B, 77) — BPE runs host-side via open_clip /
    transformers when installed; this environment ships neither, so raw
    strings raise with a pointer. `layer` picks the reference's taps: "last" =
    ln_final(block[-1]) and "penultimate" = ln_final(block[-2]) (reference
    encode_with_transformer applies ln_final after the truncated stack,
    modules.py:547-564); "pooled" additionally exposes the projected EOT
    embedding (FrozenOpenCLIPEmbedder2 semantics, modules.py:396-495).
    """

    LAYERS = ("last", "penultimate", "pooled")

    def __init__(
        self,
        arch: str = "ViT-H-14",
        version: Optional[str] = None,
        max_length: int = 77,
        freeze: bool = True,
        layer: str = "last",
        always_return_pooled: bool = False,
        legacy: bool = True,
        dtype=jnp.float32,
        **_unused,
    ):
        from .models.clip import text_vit_h_14

        if layer not in self.LAYERS:
            raise ValueError(f"layer {layer!r}")
        if arch != "ViT-H-14":
            raise NotImplementedError(f"arch {arch}")
        self.module = text_vit_h_14(dtype=dtype, output_hidden=True)
        self.layer = layer
        self.max_length = int(max_length)
        self.return_pooled = always_return_pooled
        self.version = version
        self.params = None

    def init_params(self, rng):
        import os

        if self.params is None and self.version and os.path.exists(self.version):
            from .convert.torch_to_jax import load_open_clip_text

            self.params = load_open_clip_text(self.version)
        if self.params is None:
            ids = jnp.zeros((1, self.max_length), jnp.int32)
            self.params = module_init(self.module.init, rng, ids)

    def _ln_final(self, x: jax.Array) -> jax.Array:
        import flax.linen as nn

        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32).apply(
            {"params": self.params["params"]["ln_final"]},
            x.astype(jnp.float32),
        ).astype(x.dtype)

    def __call__(self, text, rng=None):
        if isinstance(text, (list, tuple)) and text and isinstance(text[0], str):
            raise NotImplementedError(
                "raw-text tokenization needs open_clip's BPE vocab (not "
                "bundled); pass pre-tokenized int32 ids of shape (B, 77)"
            )
        ids = jnp.asarray(text, jnp.int32)
        pooled, _, extras = _jitted(self, "text", self.module.apply)(
            self.params, ids
        )
        if self.layer == "pooled":
            out = pooled
        elif self.layer == "last":
            out = extras["final"]
        else:  # penultimate: ln_final over the stack truncated by one block
            out = self._ln_final(extras["hidden"][-2])
        if self.return_pooled:
            return out, pooled
        return out


class FrozenCLIPEmbedder(AbstractEmbedder):
    """OpenAI CLIP text encoder, huggingface semantics (reference
    modules.py:331-393; unused by Hi3D).

    `layer`: "last" = final_layer_norm'd last hidden state; "pooled" = that
    sequence at the EOT position, unprojected, with a length-1 sequence axis
    (hf CLIPTextModel.pooler_output); "hidden" = raw hidden_states[layer_idx]
    where index 0 is the embedding output (hf output_hidden_states indexing).
    Accepts pre-tokenized int32 ids (B, 77); raw strings need the CLIP BPE
    vocab, which is not bundled.
    """

    LAYERS = ("last", "pooled", "hidden")

    def __init__(
        self,
        version: str = "openai/clip-vit-large-patch14",
        max_length: int = 77,
        freeze: bool = True,
        layer: str = "last",
        layer_idx: Optional[int] = None,
        always_return_pooled: bool = False,
        dtype=jnp.float32,
        **_unused,
    ):
        from .models.clip import text_vit_l_14

        if layer not in self.LAYERS:
            raise ValueError(f"layer {layer!r}")
        if layer == "hidden":
            if layer_idx is None or not (0 <= abs(layer_idx) <= 12):
                raise ValueError("layer='hidden' needs layer_idx in [-12, 12]")
        self.module = text_vit_l_14(dtype=dtype, output_hidden=True)
        self.layer = layer
        self.layer_idx = layer_idx
        self.max_length = int(max_length)
        self.return_pooled = always_return_pooled
        self.version = version
        self.params = None

    def init_params(self, rng):
        import os

        if self.params is None and self.version and os.path.exists(self.version):
            from .convert.torch_to_jax import load_clip_jit_text

            self.params = load_clip_jit_text(self.version)
        if self.params is None:
            ids = jnp.zeros((1, self.max_length), jnp.int32)
            self.params = module_init(self.module.init, rng, ids)

    def __call__(self, text, rng=None):
        if isinstance(text, (list, tuple)) and text and isinstance(text[0], str):
            raise NotImplementedError(
                "raw-text tokenization needs the CLIP BPE vocab (not "
                "bundled); pass pre-tokenized int32 ids of shape (B, 77)"
            )
        ids = jnp.asarray(text, jnp.int32)
        _, _, extras = _jitted(self, "text", self.module.apply)(
            self.params, ids
        )
        final = extras["final"]  # (B, L, D), post final-layer-norm
        eot = jnp.argmax(ids, axis=-1)
        pooler = final[jnp.arange(final.shape[0]), eot]  # unprojected EOT
        if self.layer == "last":
            out = final
        elif self.layer == "pooled":
            out = pooler[:, None, :]
        else:
            out = extras["hidden"][self.layer_idx]
        if self.return_pooled:
            return out, pooler
        return out


class FrozenByT5Embedder(AbstractEmbedder):
    """Character-aware ByT5 text encoder (reference modules.py:289-328).

    ByT5 tokenization is byte-level and vocabulary-free (utf-8 byte + 3,
    eos=1, pad=0), so it is done inline on host; the encoder itself loads via
    transformers' flax T5 weights.
    """

    def __init__(self, version: str = "google/byt5-base", max_length: int = 77,
                 freeze: bool = True, **_unused):
        self.version = version
        self.max_length = int(max_length)
        self._model = None

    def _lazy(self):
        if self._model is None:
            from transformers import FlaxT5EncoderModel

            self._model = FlaxT5EncoderModel.from_pretrained(
                self.version, dtype=jnp.float32
            )
        return self._model

    def tokenize(self, texts: Sequence[str]) -> np.ndarray:
        ids = np.zeros((len(texts), self.max_length), np.int32)  # pad = 0
        for i, t in enumerate(texts):
            raw = list(t.encode("utf-8"))[: self.max_length - 1]
            row = [b + 3 for b in raw] + [1]  # +3 special offset, eos = 1
            ids[i, : len(row)] = row
        return ids

    def __call__(self, text, rng=None):
        if isinstance(text, (list, tuple)) and text and isinstance(text[0], str):
            ids = self.tokenize(list(text))
        else:
            ids = np.asarray(text, np.int32)
        out = self._lazy()(input_ids=jnp.asarray(ids))
        return out.last_hidden_state


class FrozenCLIPT5Encoder(AbstractEmbedder):
    """CLIP + T5 dual text encoding, returned as a list so GeneralConditioner
    concatenates both onto crossattn (reference modules.py:731-757)."""

    def __init__(
        self,
        clip_version: str = "openai/clip-vit-large-patch14",
        t5_version: str = "google/t5-v1_1-xl",
        clip_max_length: int = 77,
        t5_max_length: int = 77,
        **_unused,
    ):
        self.clip_encoder = FrozenCLIPEmbedder(
            clip_version, max_length=clip_max_length
        )
        self.t5_encoder = FrozenT5Embedder(t5_version, max_length=t5_max_length)

    def init_params(self, rng):
        self.clip_encoder.init_params(rng)

    def __call__(self, text, rng=None):
        return [self.clip_encoder(text), self.t5_encoder(text)]


class ClassEmbedderForMultiCond(ClassEmbedder):
    """modules.py:237-246 — ClassEmbedder that tolerates list-wrapped batch
    values, embedding the first entry and re-wrapping."""

    def __call__(self, c, rng=None):
        islist = isinstance(c, list)
        out = super().__call__(c[0] if islist else c, rng=rng)
        return [out] if islist else out


class LowScaleEncoder(AbstractEmbedder):
    """modules.py:819-911 — encodes with a first-stage model, scales, then
    DDPM-noise-augments with a random timestep in [0, max_noise_level) and
    returns (noised latent, noise_level) — both routed by rank (concat +
    vector is the upstream usage)."""

    def __init__(
        self,
        model_config: Dict,
        linear_start: float,
        linear_end: float,
        timesteps: int = 1000,
        max_noise_level: int = 250,
        output_size: Optional[int] = 64,
        scale_factor: float = 1.0,
        **_unused,
    ):
        from .diffusion.discretization import make_beta_schedule

        self.model = instantiate_from_config(model_config)
        self.max_noise_level = int(max_noise_level)
        self.out_size = output_size
        self.scale_factor = float(scale_factor)
        betas = make_beta_schedule(
            "linear", timesteps, linear_start=linear_start, linear_end=linear_end
        )
        alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
        self.sqrt_alphas_cumprod = jnp.asarray(
            np.sqrt(alphas_cumprod), jnp.float32
        )
        self.sqrt_one_minus_alphas_cumprod = jnp.asarray(
            np.sqrt(1.0 - alphas_cumprod), jnp.float32
        )

    def init_params(self, rng):
        if getattr(self.model, "params", "absent") is None and hasattr(
            self.model, "init"
        ):
            self.model.init(rng)

    def q_sample(self, x0: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        a = append_dims(self.sqrt_alphas_cumprod[t], x0.ndim)
        s = append_dims(self.sqrt_one_minus_alphas_cumprod[t], x0.ndim)
        return a * x0 + s * noise

    def __call__(self, x, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r_enc, r_t, r_n = jax.random.split(rng, 3)
        z = self.model.encode(x, rng=r_enc)
        z = z * self.scale_factor
        t = jax.random.randint(r_t, (x.shape[0],), 0, self.max_noise_level)
        z = self.q_sample(z, t, jax.random.normal(r_n, z.shape, z.dtype))
        if self.out_size is not None:
            b, _, _, c = z.shape
            z = jax.image.resize(
                z, (b, self.out_size, self.out_size, c), "nearest"
            )
        return [z, t.astype(jnp.float32)[:, None]]

    def decode(self, z: jax.Array) -> jax.Array:
        return self.model.decode(z / self.scale_factor)


class GaussianEncoder(AbstractEmbedder):
    """modules.py:932-948 — conv Encoder + diagonal-Gaussian sample, returning
    (kl log dict, flattened latent tokens)."""

    def __init__(self, weight: float = 1.0, flatten_output: bool = True, **ddkw):
        from .models.vae import Encoder
        from .models.autoencoding import DiagonalGaussianRegularizer

        self.module = Encoder(**ddkw)
        self.posterior = DiagonalGaussianRegularizer()
        self.weight = float(weight)
        self.flatten_output = flatten_output
        self.params = None
        self._in_ch = ddkw.get("in_channels", 3)

    def init_params(self, rng):
        if self.params is None:
            x = jnp.zeros((1, 32, 32, self._in_ch))
            self.params = module_init(self.module.init, rng, x)

    def __call__(self, x, rng=None):
        moments = _jitted(self, "enc", self.module.apply)(
            self.params, jnp.asarray(x)
        )
        z, log = self.posterior(moments, rng=rng)
        log = dict(log)
        log["loss"] = log["kl_loss"]
        log["weight"] = self.weight
        if self.flatten_output:
            b, h, w, c = z.shape
            z = z.reshape(b, h * w, c)
        return log, z
