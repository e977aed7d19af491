"""DiffusionEngine and the Hi3D task layer (VideoLDM stages 1 & 2).

Functional parity targets (reference file:line):
- DiffusionEngine: sgm/models/diffusion.py:19-341 — glues network + denoiser +
  sampler + conditioner + first-stage VAE + loss; chunked VAE encode/decode
  (`en_and_decode_n_samples_a_time`, :117-150); `sample` (:237-252).
- VideoLDM stage 1: vtdm/vtdm_gen_v01.py:24-201 — `add_custom_cond` builds
  cond_frames(_without_noise)/cond_aug/image_only_indicator (:58-76);
  video-shaped `shared_step` (:78-88); checkpoint loading incl. DeepSpeed
  `module.`-prefixed .pt (:30-56); selective-parameter training via
  `trained_param_keys` (:167-201).
- VideoLDM stage 2: vtdm/vtdm_gen_stage2_degradeImage.py:25-213 — adds the
  degradation model on the conditioning video during training (passthrough at
  inference).

TPU-native design:
- The engine is a plain Python object holding flax modules + param pytrees;
  everything it launches (sampling loop, train step) is a single jitted
  function. Latents and frames are channels-last.
- Sampling runs the whole 25-step CFG loop as one `lax.scan` program with the
  UNet in `compute_dtype` (bf16 on TPU) and σ-math in fp32.
- The VAE runs in fp32 by default (`disable_first_stage_autocast` parity).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import instantiate_from_config
from .utils.misc import append_dims, default

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}

DEFAULT_WRAPPER = {
    "target": "sgm.modules.diffusionmodules.wrappers.OpenAIWrapper"
}


@jax.jit
def _noise_aug(x, rng, aug):
    """x + aug·N(0,1) in ONE compiled kernel. Un-jitted threefry sampling on
    a (16, 1024, 1024, 3) tensor costs seconds of eager dispatch through the
    tunneled chip; jitted it is a single fused pass."""
    return x + aug * jax.random.normal(rng, x.shape, x.dtype)


def _fit_indicator(indicator, x, num_video_frames: int):
    """Match a (possibly CFG-doubled) image_only_indicator to x's batch.

    Samplers hand the param-threaded denoiser a pre-doubled indicator
    (2b, t) because the guider concatenates [uc, c] (reference
    guiders.py:91-99). On single-pass steps (cfg_interval turbo — CFG
    skipped outside the σ interval) x arrives un-doubled, so take the
    conditioned half. Shapes are static under trace, so this is free.
    """
    if indicator is None:
        return None
    b = x.shape[0] // num_video_frames
    if indicator.shape[0] == 2 * b:
        return indicator[b:]
    return indicator


@functools.lru_cache(maxsize=32)
def _sampler_signature(cls):
    import inspect

    return frozenset(inspect.signature(cls.__call__).parameters)


def _sampler_call_params(sampler):
    return _sampler_signature(type(sampler))


class DiffusionEngine:
    def __init__(
        self,
        network_config: Dict,
        denoiser_config: Dict,
        first_stage_config: Dict,
        conditioner_config: Optional[Dict] = None,
        sampler_config: Optional[Dict] = None,
        optimizer_config: Optional[Dict] = None,
        scheduler_config: Optional[Dict] = None,
        loss_fn_config: Optional[Dict] = None,
        network_wrapper: Optional[str] = None,
        ckpt_path: Optional[str] = None,
        use_ema: bool = False,
        ema_decay_rate: float = 0.9999,
        scale_factor: float = 1.0,
        disable_first_stage_autocast: bool = False,
        input_key: str = "jpg",
        log_keys: Optional[List[str]] = None,
        no_cond_log: bool = False,
        monitor: Optional[str] = None,  # checkpoint-retention metric
        compile_model: bool = False,
        en_and_decode_n_samples_a_time: Optional[int] = None,
        decode_tile_size: Optional[int] = 96,  # latent side beyond which the
        # VAE decode tiles spatially (None disables; see vae.decode_tiled)
        compute_dtype: str = "float32",
        base_learning_rate: Optional[float] = None,  # config passthrough
        seed: int = 0,
    ):
        self.compute_dtype = _DTYPES[compute_dtype]
        self.input_key = input_key
        self.scale_factor = float(scale_factor)
        self.disable_first_stage_autocast = disable_first_stage_autocast
        self.en_and_decode_n_samples_a_time = en_and_decode_n_samples_a_time
        self.decode_tile_size = decode_tile_size
        self.use_ema = use_ema
        self.ema_decay_rate = ema_decay_rate
        self.log_keys = log_keys
        self.no_cond_log = no_cond_log
        self.monitor = monitor
        self.optimizer_config = optimizer_config
        self.scheduler_config = scheduler_config
        self.base_learning_rate = base_learning_rate

        net_params = dict(network_config.get("params") or {})
        net_params.setdefault("dtype", self.compute_dtype)
        self.model = instantiate_from_config(
            {"target": network_config["target"], "params": net_params}
        )
        from .models.wrappers import ConcatConditionWrapper, IdentityWrapper

        if network_wrapper in (None, "sgm.modules.diffusionmodules.wrappers.OpenAIWrapper"):
            self.wrapper = ConcatConditionWrapper(self.model)
        else:
            self.wrapper = instantiate_from_config(
                {"target": network_wrapper, "params": {"module": self.model}}
            )

        self.denoiser = instantiate_from_config(denoiser_config)
        self.sampler = (
            instantiate_from_config(sampler_config) if sampler_config else None
        )
        self.conditioner = (
            instantiate_from_config(conditioner_config) if conditioner_config else None
        )
        self.loss_fn = (
            instantiate_from_config(loss_fn_config) if loss_fn_config else None
        )
        self.first_stage_model = instantiate_from_config(first_stage_config)

        self.params: Optional[Dict] = None  # UNet params pytree
        self.ema_params: Optional[Dict] = None
        self._rng = jax.random.PRNGKey(seed)
        self._ckpt_path = ckpt_path

    # ------------------------------------------------------------------ rng
    def next_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # ----------------------------------------------------------------- init
    def init(
        self,
        rng: Optional[jax.Array] = None,
        latent_hw: Tuple[int, int] = (32, 32),
        num_frames: int = 2,
        image_hw: Optional[Tuple[int, int]] = None,
    ):
        """Initialize all param pytrees with toy-shaped tracers.

        Shapes only fix parameter *structure* (conv channels etc.), so tiny
        spatial extents keep init fast; real calls may use any H/W.
        """
        rng = default(rng, self.next_rng())
        r_net, r_vae = jax.random.split(rng)

        t = num_frames
        in_ch = self.model.in_channels
        ctx_dim = self.model.context_dim
        adm = self.model.adm_in_channels
        x = jnp.zeros((t, *latent_hw, in_ch), dtype=self.compute_dtype)
        ts = jnp.zeros((t,))
        ctx = jnp.zeros((1, 1, ctx_dim), dtype=self.compute_dtype)
        y = jnp.zeros((1, adm), dtype=self.compute_dtype)
        ind = jnp.zeros((1, t))
        from .utils.misc import module_init

        self.params = module_init(
            functools.partial(self.model.init, num_video_frames=t),
            r_net, x, ts, context=ctx, y=y, image_only_indicator=ind,
        )
        if getattr(self.first_stage_model, "params", None) is None:
            self.first_stage_model.init(
                r_vae, image_hw=default(image_hw, (64, 64))
            )
        if self._ckpt_path is not None:
            self.init_from_ckpt(self._ckpt_path)
        return self.params

    def init_from_ckpt(self, path: str) -> None:
        from .convert.torch_to_jax import load_engine_params

        load_engine_params(self, path)

    def cast_weights_to_compute_dtype(
        self, include_towers: bool = True, include_first_stage: bool = False
    ) -> None:
        """Inference-time weight cast — the reference CLIs run the whole model
        `.half()` (pipeline_i2v_eval_v01.py:52), VAE included. Casts the UNet
        params (and optionally the frozen conditioner towers) to
        `compute_dtype`; the VAE stays fp32 by default (the conservative
        choice — bf16 has fewer mantissa bits than the reference's fp16) and
        casts only with `include_first_stage=True` (CLI flag --vae_bf16),
        which halves VAE HBM/time at 1024². Do NOT call when training — the
        optimizer wants fp32 master params."""
        dt = self.compute_dtype
        if dt == jnp.float32:
            return

        # ONE jitted program per tree: an eager per-leaf astype dispatches
        # ~2,000 individual device ops through the TPU tunnel (~6 ms each →
        # measured 43.5 s of the stage-1 cold start); a single jitted
        # tree-cast is one dispatch and runs at HBM bandwidth
        @functools.partial(jax.jit, donate_argnums=0)
        def _cast_tree(tree):
            return jax.tree.map(
                lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, tree
            )

        def cast(tree):
            return _cast_tree(tree)

        def cast_vae(wrapper):
            # params AND module compute dtype; drop its cached jitted
            # appliers (they captured the fp32 module)
            wrapper.params = cast(wrapper.params)
            wrapper.module = wrapper.module.clone(dtype=dt)
            wrapper.__dict__.pop("_misc_cache", None)

        if self.params is not None:
            self.params = cast(self.params)
        if self.ema_params is not None:
            self.ema_params = cast(self.ema_params)
        if include_towers and self.conditioner is not None:
            for emb in self.conditioner.embedders:
                for attr in ("params", "clip_params", "mlp_params"):
                    v = getattr(emb, attr, None)
                    if v is not None:
                        setattr(emb, attr, cast(v))
                clip = getattr(emb, "open_clip", None)
                if clip is not None and getattr(clip, "params", None) is not None:
                    clip.params = cast(clip.params)
        if include_first_stage:
            if self.conditioner is not None:
                for emb in self.conditioner.embedders:
                    enc = getattr(emb, "encoder", None)
                    if enc is not None and getattr(enc, "params", None) is not None:
                        cast_vae(enc)
            if getattr(self.first_stage_model, "params", None) is not None:
                cast_vae(self.first_stage_model)

    # ------------------------------------------------------------ first stage
    def _chunked(self, fn, x: jax.Array) -> jax.Array:
        n = self.en_and_decode_n_samples_a_time or x.shape[0]
        if n >= x.shape[0]:
            return fn(x)
        outs = [fn(x[i : i + n]) for i in range(0, x.shape[0], n)]
        return jnp.concatenate(outs, axis=0)

    def encode_first_stage(self, x: jax.Array, fs_params=None) -> jax.Array:
        """(N, H, W, 3) in [-1,1] → scaled latents (N, H/8, W/8, 4); fp32.

        `fs_params` overrides the VAE weight tree for this call only (serve.py
        threads a mesh-replicated copy through here instead of mutating the
        shared model — concurrent single-device users keep their placement)."""
        z = self._chunked(
            lambda v: self.first_stage_model.encode(
                v.astype(jnp.float32), params=fs_params
            ),
            x,
        )
        return (self.scale_factor * z).astype(self.compute_dtype)

    def decode_first_stage(self, z: jax.Array, fs_params=None) -> jax.Array:
        tiled = (
            self.decode_tile_size is not None
            and max(z.shape[1], z.shape[2]) > self.decode_tile_size
        )

        def dec(v):
            v = (1.0 / self.scale_factor) * v.astype(jnp.float32)
            if tiled:
                return self.first_stage_model.decode_tiled(
                    v, tile=self.decode_tile_size, params=fs_params
                )
            return self.first_stage_model.decode(v, params=fs_params)

        return self._chunked(dec, z)

    # --------------------------------------------------------------- network
    def bound_network(self, params=None, **static_kwargs):
        return self.wrapper.bind(default(params, self.params), **static_kwargs)

    def make_denoiser_fn_p(self, num_video_frames: int):
        """Param-threaded denoiser: fn(extras, x, sigma, cond) with
        extras = (params, image_only_indicator).

        Unlike make_denoiser_fn's closure, nothing array-valued is captured:
        when a sampler jits its scan segments, the weights arrive as XLA
        *arguments* instead of being baked into the executable as constants
        (which would keep a second full copy of the UNet in HBM — the
        difference between fitting and OOMing a 16 GB chip at 512²).
        Cached per frame count so jitted callers retrace only on new shapes.
        """
        from .utils.misc import instance_cache

        key = int(num_video_frames)

        def make():
            def dfn(extras, x, sigma, cond):
                params, indicator = extras
                network = self.wrapper.bind(
                    params,
                    num_video_frames=key,
                    image_only_indicator=_fit_indicator(indicator, x, key),
                )
                return self.denoiser(network, x, sigma, cond)

            dfn.program_key = self._denoiser_program_key(key)
            return dfn

        return instance_cache(self, ("dfn_p", key), make)

    def _denoiser_program_key(self, num_video_frames: int) -> str:
        """Identity of the traced denoiser graph for the disk program cache
        (utils/program_cache.py): full UNet config (flax dataclass repr),
        wrapper routing, scaling law, frame count."""
        from .utils.program_cache import flax_module_key

        return "|".join(
            (
                flax_module_key(self.model),
                type(self.wrapper).__name__,
                type(self.denoiser).__name__,
                type(self.denoiser.scaling).__name__,
                f"t={num_video_frames}",
            )
        )

    def make_denoiser_fn_cached(self, num_video_frames: int):
        """Param-threaded denoiser with UNet encoder-feature caching
        (encoder propagation, arXiv 2312.09608 — see models/unet.py):
        fn(extras, x, sigma, cond, cache) → (denoised, new_cache).

        cache=None runs the full UNet and returns the fresh
        (skip_activations, middle_h); a given cache skips input/middle
        blocks entirely (decoder-only step) and is passed through. Both
        call forms return the same pytree so lax.cond can select between
        them inside a sampling scan (pipelines/v2v.py turbo mode)."""
        from .utils.misc import instance_cache

        key = int(num_video_frames)

        def make():
            def dfn(extras, x, sigma, cond, cache=None):
                params, indicator = extras
                cell = {}

                def network(xx, cn, cc, **extra):
                    bound = self.wrapper.bind(
                        params,
                        num_video_frames=key,
                        image_only_indicator=_fit_indicator(indicator, xx, key),
                        **(
                            {"return_encoder_cache": True}
                            if cache is None
                            else {"encoder_cache": cache}
                        ),
                    )
                    out = bound(xx, cn, cc, **extra)
                    if cache is None:
                        out, cell["cache"] = out
                    return out

                den = self.denoiser(network, x, sigma, cond)
                return den, (cell["cache"] if cache is None else cache)

            dfn.program_key = self._denoiser_program_key(key) + "|enc_cache"
            return dfn

        return instance_cache(self, ("dfn_cached", key), make)

    def make_denoiser_fn(
        self,
        params=None,
        num_video_frames: int = 16,
        image_only_indicator: Optional[jax.Array] = None,
    ):
        """denoiser(x, sigma, cond) closure for samplers.

        `image_only_indicator` must already be CFG-doubled when the sampler's
        guider doubles the batch (reference pipeline_i2v_eval_v01.py:79-86).
        """
        network = self.bound_network(
            params,
            num_video_frames=num_video_frames,
            image_only_indicator=image_only_indicator,
        )

        def denoiser_fn(x, sigma, cond):
            return self.denoiser(network, x, sigma, cond)

        return denoiser_fn

    # ---------------------------------------------------------------- sample
    def sample(
        self,
        cond: Dict,
        uc: Optional[Dict] = None,
        shape: Optional[Sequence[int]] = None,
        num_video_frames: Optional[int] = None,
        image_only_indicator: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
        params=None,
        randn: Optional[jax.Array] = None,
        encoder_reuse: int = 0,
        cfg_interval: Optional[Tuple[float, float]] = None,
        num_steps: Optional[int] = None,  # override the sampler's step count
    ) -> jax.Array:
        """Draw latents: full CFG sampling loop, jitted end to end.

        `randn` optionally supplies the initial unit-variance noise (shape
        `shape`) — used for reproducible generation and torch-parity tests;
        when omitted it is drawn from `rng`.

        `encoder_reuse=k` (k ≥ 2) enables encoder propagation (Faster
        Diffusion, arXiv 2312.09608; see samplers.EDMSampler.__call__):
        the UNet encoder runs only every k-th step — an APPROXIMATION;
        0 keeps exact reference semantics. EDM-family samplers only.

        `cfg_interval=(lo, hi)` enables the guidance-interval turbo
        (arXiv 2404.07724): CFG batch doubling only on steps with
        σ ∈ [lo, hi], a single conditioned pass elsewhere. An interval
        covering the full schedule is bit-identical to the exact path.
        EDM-family samplers only; mutually exclusive with encoder_reuse.
        """
        rng = default(rng, self.next_rng())
        r_init, r_steps = jax.random.split(rng)
        if randn is None:
            randn = jax.random.normal(r_init, tuple(shape), dtype=jnp.float32)
        else:
            randn = jnp.asarray(randn)
            shape = randn.shape
        t = default(num_video_frames, shape[0])
        if image_only_indicator is None:
            # doubled for the CFG batch
            image_only_indicator = jnp.zeros((2 * (shape[0] // t), t))
        randn = randn.astype(self.compute_dtype)
        use_params = default(params, self.params)
        sampler_params = _sampler_call_params(self.sampler)
        if encoder_reuse and cfg_interval is not None:
            raise ValueError(
                "cfg_interval and encoder_reuse are mutually exclusive"
            )
        if encoder_reuse:
            if "encoder_reuse" not in sampler_params:
                raise ValueError(
                    f"sampler {type(self.sampler).__name__} does not support "
                    "encoder_reuse (EDM Euler/Heun family only)"
                )
            dfn = self.make_denoiser_fn_cached(t)
            return self.sampler(
                dfn, randn, cond, uc=uc, rng=r_steps,
                extras=(use_params, image_only_indicator),
                encoder_reuse=int(encoder_reuse),
                num_steps=num_steps,
            )
        if cfg_interval is not None and "cfg_interval" not in sampler_params:
            raise ValueError(
                f"sampler {type(self.sampler).__name__} does not support "
                "cfg_interval (EDM Euler/Heun family only)"
            )
        if "extras" in sampler_params:
            dfn = self.make_denoiser_fn_p(t)
            kw = (
                {"cfg_interval": tuple(cfg_interval)}
                if cfg_interval is not None
                else {}
            )
            return self.sampler(
                dfn, randn, cond, uc=uc, rng=r_steps,
                extras=(use_params, image_only_indicator),
                num_steps=num_steps, **kw,
            )
        denoiser_fn = self.make_denoiser_fn(
            params, num_video_frames=t, image_only_indicator=image_only_indicator
        )
        return self.sampler(
            denoiser_fn, randn, cond, uc=uc, rng=r_steps, num_steps=num_steps
        )


class VideoLDM(DiffusionEngine):
    """Stage-1 image-to-orbital-video model."""

    def __init__(
        self,
        num_samples: int,
        trained_param_keys: Sequence[str] = ("",),
        *args,
        **kwargs,
    ):
        self.num_samples = int(num_samples)
        self.trained_param_keys = list(trained_param_keys)
        super().__init__(*args, **kwargs)

    @property
    def num_samples(self) -> int:
        return self._num_samples

    @num_samples.setter
    def num_samples(self, value: int) -> None:
        """Changing the clip length retargets every frame-count-tied embedder.

        Embedders whose `n_copies` equals the CURRENT clip length repeat
        their output once per video frame (stage-1's
        VideoPredictionEmbedderWithEncoder packs the frame-0 latent per
        frame, configs/inference-v01.yaml n_copies: 16 == num_samples: 16);
        per-video embedders (CLIP crossattn, n_copies: 1) stay fixed. The
        CLIs' --clip_size relies on this — without it an 8-frame run
        concatenates a 16-copy concat-cond onto an 8-frame latent batch."""
        value = int(value)
        old = getattr(self, "_num_samples", None)
        self._num_samples = value
        if old in (None, value):
            return
        cond = getattr(self, "conditioner", None)
        if cond is not None:
            for emb in getattr(cond, "embedders", []):
                if getattr(emb, "n_copies", None) == old:
                    emb.n_copies = value
        # per-frame CFG guider: rescale the linspace over the new clip length
        # (reference semantics — scale rises min→max over the clip,
        # guiders.py linspace(min_scale, max_scale, num_frames))
        guider = getattr(getattr(self, "sampler", None), "guider", None)
        if guider is not None and getattr(guider, "num_frames", None) == old:
            import jax.numpy as jnp

            guider.num_frames = value
            guider.scale = jnp.linspace(
                guider.min_scale, guider.max_scale, value, dtype=jnp.float32
            )

    def add_custom_cond(
        self, batch: Dict, infer: bool = False, rng: Optional[jax.Array] = None
    ) -> Dict:
        """Build cond_frames(_without_noise), cond_aug, image_only_indicator.

        batch['video'] is (B, T, H, W, C) in [-1, 1].
        """
        batch = dict(batch)
        batch["num_video_frames"] = self.num_samples
        video = batch["video"]
        image = video[:, 0]  # (B, H, W, C) first frame
        batch["cond_frames_without_noise"] = image

        n = video.shape[0]
        rng = default(rng, self.next_rng())
        r_aug, r_noise = jax.random.split(rng)
        if not infer:
            # train: cond_aug ~ exp(N(-3, 0.5)) per video (vtdm_gen_v01.py:66)
            cond_aug = jnp.exp(
                -3.0 + 0.5 * jax.random.normal(r_aug, (n,), dtype=jnp.float32)
            )
        else:
            # infer: fixed σ=0.02 noise augmentation (vtdm_gen_v01.py:68-69)
            cond_aug = jnp.full((n,), 0.02, dtype=jnp.float32)
        batch["cond_aug"] = cond_aug
        batch["cond_frames"] = _noise_aug(
            image, r_noise, append_dims(cond_aug, image.ndim).astype(image.dtype)
        )

        if "image_only_indicator" not in batch:
            batch["image_only_indicator"] = jnp.zeros((n, self.num_samples))
        return batch

    def shared_step(self, batch: Dict, rng: Optional[jax.Array] = None):
        """Training objective on one batch; returns (loss_scalar, loss_dict)."""
        rng = default(rng, self.next_rng())
        r_custom, r_step = jax.random.split(rng)
        batch = self.add_custom_cond(batch, infer=False, rng=r_custom)
        loss_mean = self.make_loss_fn()(self.params, batch, r_step)
        return loss_mean, {"loss": loss_mean}

    def make_loss_fn(self):
        """Pure jittable loss(params, batch, rng) for the pjit train step.

        `batch` must already be through `add_custom_cond` (host side — the
        stage-2 degradation runs on CPU) and contain only arrays. VAE encode,
        conditioner (with ucg dropout), and the denoiser loss all trace into
        ONE XLA program per step.
        """

        def loss_fn(params, batch: Dict, rng: jax.Array) -> jax.Array:
            from .training.state import freeze_frozen

            params = freeze_frozen(
                params, tuple(getattr(self, "trained_param_keys", ("all",)))
            )
            r_cond, r_loss = jax.random.split(rng)
            video = batch[self.input_key]  # (B, T, H, W, C)
            b, t = video.shape[:2]
            frames = video.reshape(b * t, *video.shape[2:])
            x = self.encode_first_stage(frames)
            cond = self.conditioner(batch, rng=r_cond)
            network = self.wrapper.bind(
                params,
                num_video_frames=t,
                image_only_indicator=batch["image_only_indicator"],
            )
            loss = self.loss_fn(network, self.denoiser, cond, x, batch, r_loss)
            return jnp.mean(loss)

        return loss_fn

    def log_conditionings(self, batch: Dict, n: int) -> Dict[str, np.ndarray]:
        """Render loggable conditioning inputs as images (reference
        diffusion.py:255-291): scalar/int per-sample conds and string
        captions become text images; 2-D conds are "x"-joined."""
        from .utils.image import log_txt_as_img

        if self.no_cond_log:
            return {}
        video = np.asarray(batch[self.input_key])
        image_h, image_w = video.shape[-3:-1]
        log: Dict[str, np.ndarray] = {}
        for embedder in self.conditioner.embedders:
            key = embedder.input_key
            if key is None or key not in batch:
                continue
            if self.log_keys is not None and key not in self.log_keys:
                continue
            x = batch[key]
            if isinstance(x, (list, tuple)) and x and isinstance(x[0], str):
                log[key] = log_txt_as_img(
                    (image_w, image_h), list(x[:n]), size=image_h // 20
                )
                continue
            x = np.asarray(x)[:n]
            if x.ndim == 1:
                caps = [str(v) for v in x.tolist()]
                log[key] = log_txt_as_img(
                    (image_w, image_h), caps, size=image_h // 4
                )
            elif x.ndim == 2:
                caps = ["x".join(str(v) for v in row) for row in x.tolist()]
                log[key] = log_txt_as_img(
                    (image_w, image_h), caps, size=image_h // 20
                )
        return log

    def log_images(
        self,
        batch: Dict,
        n: int = 1,
        sample: bool = True,
        params=None,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, np.ndarray]:
        """Periodic eval media (reference vtdm_gen_v01.py:90-165): VAE
        reconstructions + a full sampling run (with EMA params when present).
        Returns numpy videos (n, T, H, W, 3) in [-1, 1]."""
        rng = default(rng, self.next_rng())
        r_custom, r_sample = jax.random.split(rng)
        batch = self.add_custom_cond(batch, infer=True, rng=r_custom)
        video = jnp.asarray(batch[self.input_key])[:n]
        b, t = video.shape[:2]
        frames = video.reshape(b * t, *video.shape[2:])

        log: Dict[str, np.ndarray] = {
            "inputs": np.asarray(video, np.float32)
        }
        if "caption" in batch and not self.no_cond_log:
            # reference vtdm_gen_v01.py:139 renders the caption at 512²
            from .utils.image import log_txt_as_img

            caps = batch["caption"]
            if isinstance(caps, str):
                caps = [caps]
            log["conditioning"] = log_txt_as_img((512, 512), caps[:n], size=16)
        z = self.encode_first_stage(frames)
        recon = self.decode_first_stage(z)
        log["reconstructions"] = np.asarray(
            recon.reshape(video.shape), np.float32
        )
        if sample and self.sampler is not None and self.conditioner is not None:
            c, uc = self.conditioner.get_unconditional_conditioning(
                batch,
                force_uc_zero_embeddings=[
                    "cond_frames", "cond_frames_without_noise"
                ],
            )
            use_params = default(
                params, self.ema_params if self.ema_params is not None else self.params
            )
            samples = self.sample(
                cond=c,
                uc=uc,
                shape=(b * t, *z.shape[1:3], z.shape[-1]),
                num_video_frames=t,
                rng=r_sample,
                params=use_params,
            )
            dec = self.decode_first_stage(samples)
            log["samples"] = np.asarray(dec.reshape(video.shape), np.float32)
        return log


class VideoLDMStage2(VideoLDM):
    """Stage-2 video-to-video refiner: conditioning video is the (degraded
    during training / raw at inference) input video; depth is added by the
    DepthEmbedder through the conditioner."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.degradation = None  # set lazily by training (hi3d_tpu.data.degradation)

    def add_custom_cond(
        self, batch: Dict, infer: bool = False, rng: Optional[jax.Array] = None
    ) -> Dict:
        batch = dict(batch)
        batch["num_video_frames"] = self.num_samples
        video = batch["video"]  # (B, T, H, W, C)
        n = video.shape[0]
        batch["cond_frames_without_noise"] = video[:, 0]

        rng = default(rng, self.next_rng())
        r_deg, r_aug, r_noise = jax.random.split(rng, 3)
        if not infer:
            if self.degradation is None:
                from .data.degradation import DegradedImages

                self.degradation = DegradedImages()
            cond_video = self.degradation(
                video,
                batch.get("masks"),
                kernel1s=batch.get("kernel1s"),
                kernel2s=batch.get("kernel2s"),
                sinc_kernels=batch.get("sinc_kernels"),
                rng=r_deg,
            )
            cond_aug = jnp.exp(
                -3.0 + 0.5 * jax.random.normal(r_aug, (n,), dtype=jnp.float32)
            )
        else:
            cond_video = video
            cond_aug = jnp.full((n,), 0.02, dtype=jnp.float32)
        # flatten to frames for the conditioner's per-frame embedders
        cond_frames = cond_video.reshape(-1, *cond_video.shape[2:])
        # noise augmentation applies at BOTH train and inference
        # (reference vtdm_gen_stage2_degradeImage.py:76-81)
        aug = jnp.repeat(cond_aug, self.num_samples, axis=0)
        batch["cond_frames"] = _noise_aug(
            cond_frames, r_noise,
            append_dims(aug, cond_frames.ndim).astype(cond_frames.dtype),
        )
        batch["cond_aug"] = cond_aug
        if "image_only_indicator" not in batch:
            batch["image_only_indicator"] = jnp.zeros((n, self.num_samples))
        return batch

    def log_images(
        self,
        batch: Dict,
        n: int = 1,
        sample: bool = True,
        params=None,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, np.ndarray]:
        """Base media plus the stage-2 extras (reference
        vtdm_gen_stage2_degradeImage.py:146-151): the DPT depth maps
        (un-pixel-shuffled from the first 9 concat channels, grayscale →
        RGB in [-1, 1]) and the VAE-decoded conditioning video (last 4
        concat channels, raw latents like the reference's)."""
        rng = default(rng, self.next_rng())
        r_base, r_custom, r_cond = jax.random.split(rng, 3)
        log = super().log_images(
            batch, n=n, sample=sample, params=params, rng=r_base
        )
        if self.conditioner is None:
            return log
        cbatch = self.add_custom_cond(batch, infer=True, rng=r_custom)
        c = self.conditioner(cbatch, rng=r_cond, ucg_enabled=False)
        t = self.num_samples
        concat = c["concat"][: n * t].astype(jnp.float32)
        depth, z_cond = concat[..., :9], concat[..., 9:]

        # inverse of DepthEmbedder's pixel-unshuffle (conditioners.py):
        # (n·t, h, w, 3·3) → (n·t, 3h, 3w)
        bt, h8, w8 = depth.shape[:3]
        d = depth.reshape(bt, h8, w8, 3, 3).transpose(0, 1, 3, 2, 4)
        d = d.reshape(bt, h8 * 3, w8 * 3)
        d = jnp.repeat(d[..., None], 3, axis=-1) * 2.0 - 1.0
        log["depth-video"] = np.asarray(
            d.reshape(n, t, *d.shape[1:]), np.float32
        )
        dec = self.decode_first_stage(z_cond * self.scale_factor)
        log["cond-video"] = np.asarray(
            dec.reshape(n, t, *dec.shape[1:]), np.float32
        )
        return log
