"""Stage-2 inference: stage-1 video + original image → 16×1024² refined video.

Functional parity: reference pipeline_i2v_eval_v02.py —
1. read first_step/first.mp4, keep the last `clip_size` frames, replace frame
   0 with the clean white-bg image, resize to 1024² (:165-197),
2. per-frame foreground masks from near-white background (:52-70),
3. per-frame VAE encode of the input video → z_t (:96-101),
4. the latent-blending sampling loop (:127-135): at step i,
   α = (0.5·(1+cos(i/num_steps)))^40, each latent is pulled toward
   (init_noise·σ_i + z_t) by α, then advanced by ONE externally-driven
   sampler step (`step_call`),
5. frame-chunked VAE decode at 1024² + mp4 export (:137-141, :199-207).

TPU-native: the whole blend+step loop runs as a single `lax.scan` over the
step index (the sampler's `step_call` takes a traced index), so the 25-step
refinement is one compiled program; conditioning (CLIP/DPT/VAE towers) is
computed once up front.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.image import (
    foreground_mask_from_white,
    load_image_rgb,
)
from ..utils.video import export_to_video, import_video, tensor2vid
from .i2v import UC_ZERO_KEYS

ALPHA_POW = 40.0


def blend_refine(
    model,
    frames: np.ndarray,
    masks: Optional[np.ndarray] = None,
    elevation: float = 0.0,
    rng: Optional[jax.Array] = None,
    steps_per_launch: Optional[int] = 8,
    encoder_reuse: int = 0,
    cfg_interval=None,
    num_steps: Optional[int] = None,
    output_dtype: str = "float32",
) -> np.ndarray:
    """frames (T, H, W, 3) in [-1,1] float — or uint8, converted on
    device — → refined (T, H, W, 3) in [-1,1] (or uint8 with
    output_dtype="uint8")."""
    t = model.num_samples
    assert frames.shape[0] == t, (frames.shape, t)
    out = blend_refine_batch(
        model,
        np.asarray(frames)[None],
        masks=None if masks is None else np.asarray(masks)[None],
        elevations=[elevation],
        rng=rng,
        steps_per_launch=steps_per_launch,
        encoder_reuse=encoder_reuse,
        cfg_interval=cfg_interval,
        num_steps=num_steps,
        output_dtype=output_dtype,
    )
    return out[0]


def blend_refine_batch(
    model,
    videos: np.ndarray,  # (B, T, H, W, 3) in [-1, 1]
    masks: Optional[np.ndarray] = None,  # (B, T, H, W)
    elevations: Optional[Sequence[float]] = None,
    rng: Optional[jax.Array] = None,
    steps_per_launch: Optional[int] = 8,
    params=None,  # override weight tree (serve.py passes mesh-replicated)
    fs_params=None,  # VAE weight-tree override (serve.py, same rationale)
    shard=None,  # callable applied to per-frame arrays (mesh placement)
    init_noise: Optional[jax.Array] = None,  # (B·T, h/8, w/8, 4) unit noise
    batch_overrides: Optional[Dict] = None,  # applied after add_custom_cond
    encoder_reuse: int = 0,
    cfg_interval=None,  # (lo, hi): CFG only where σ ∈ [lo, hi] (turbo)
    num_steps: Optional[int] = None,  # override the sampler's step count
    output_dtype: str = "float32",  # "uint8": denormalize on device (4× less
    # device→host traffic; EXACT — the mp4 export quantizes to uint8 anyway)
) -> np.ndarray:
    """Batched stage-2 latent-blending refinement: B assets at once.

    The whole loop is per-frame-parallel apart from the UNet's temporal
    attention, so sharding the B·T leading axis over a mesh (see
    serve.RefineServer) scales it to N chips with only the frame-axis
    regroup crossing ICI.

    `encoder_reuse=k` (k ≥ 2) enables encoder propagation (Faster
    Diffusion, arXiv 2312.09608): the UNet encoder + middle block run only
    on every k-th step (and the last), other steps decode from the cached
    encoder features — an APPROXIMATION that changes outputs slightly; off
    by default, exact reference semantics at 0."""
    from ..utils.misc import PhaseTimer

    timer = PhaseTimer("stage2")
    b, t = videos.shape[:2]
    assert t == model.num_samples, (videos.shape, model.num_samples)
    if rng is None:
        rng = model.next_rng()
    r_custom, r_init = jax.random.split(rng)
    shard = shard if shard is not None else (lambda x: x)

    sampler = model.sampler
    num_steps = int(num_steps) if num_steps else sampler.num_steps
    sigmas = sampler.discretization(num_steps)  # (num_steps+1,) fp32
    num_sigmas = int(sigmas.shape[0])

    # ONE device copy of the video, shared by conditioning and VAE encode
    # (it was uploaded twice before — ~6 s/asset through the tunneled chip);
    # uint8 input uploads 1 byte/pixel and denormalizes on device
    videos_np = np.asarray(videos)
    if videos_np.dtype == np.uint8:
        from ..utils.video import range_from_uint8

        video_dev = range_from_uint8(jnp.asarray(videos_np))
    else:
        video_dev = jnp.asarray(videos_np, jnp.float32)
    batch: Dict = {
        "video": video_dev,
        "elevation": jnp.asarray(
            elevations if elevations is not None else [0.0] * b, jnp.float32
        ),
    }
    if masks is not None:
        # the inference path never reads masks (degradation is train-only);
        # keep them host-side so they are not uploaded
        batch["masks"] = np.asarray(masks)
    batch = model.add_custom_cond(batch, infer=True, rng=r_custom)
    if batch_overrides:
        # reproducibility/parity hook: pin stochastic conditioning inputs
        batch.update(batch_overrides)
    timer.mark("add_custom_cond", batch)

    c, uc = model.conditioner.get_unconditional_conditioning(
        batch, force_uc_zero_embeddings=list(UC_ZERO_KEYS)
    )
    c = jax.tree.map(shard, c)
    uc = jax.tree.map(shard, uc)
    timer.mark("conditioner", (c, uc))

    # per-frame latents of the conditioning video (fp32 VAE)
    flat = shard(video_dev.reshape(b * t, *video_dev.shape[2:]))
    z = model.encode_first_stage(flat, fs_params=fs_params)  # (B·T, h/8, w/8, 4)
    z = z.astype(jnp.float32)
    timer.mark("vae_encode", z)

    if init_noise is None:
        init_noise = jax.random.normal(r_init, z.shape, jnp.float32)
    init_noise = shard(jnp.asarray(init_noise, jnp.float32))
    latents = init_noise * jnp.sqrt(1.0 + sigmas[0] ** 2.0)

    indicator = jnp.zeros((2 * b, t))
    # param-threaded denoiser: weights/conds enter the jitted scan as XLA
    # arguments, not baked executable constants (see engine.make_denoiser_fn_p)
    dfn = model.make_denoiser_fn_p(t)
    s_in = jnp.ones((b * t,), jnp.float32)
    dtype = model.compute_dtype
    use_params = params if params is not None else model.params

    # the 25-step 1024² scan runs >60 s of device time in one executable,
    # which trips single-launch watchdogs; split it into several launches of
    # ONE compiled segment (the step indices are a traced argument)
    n = num_sigmas - 1
    # one executable per equal segment — same divisor normalization (and
    # persistent-cache rationale) as the stage-1 sampler scan
    from ..diffusion.samplers import _equal_chunk

    chunk = _equal_chunk(n, steps_per_launch) or n
    idx = jnp.arange(n)

    # guidance-interval turbo (arXiv 2404.07724): CFG only where σ ∈ [lo, hi],
    # single conditioned pass elsewhere. Flags are host-static (σ schedule is
    # known), so the step loop splits into constant-flag segments.
    if cfg_interval is not None:
        if encoder_reuse:
            raise ValueError(
                "cfg_interval and encoder_reuse are mutually exclusive"
            )
        lo, hi = cfg_interval
        sig_np = np.asarray(sigmas)
        cfg_on = (sig_np[:-1] >= lo) & (sig_np[:-1] <= hi)
    else:
        cfg_on = np.ones(n, bool)
    from ..diffusion.samplers import _flag_segments

    segs = _flag_segments(cfg_on, chunk)

    # the jitted segment runner is cached on the engine per shape key —
    # re-jitting a fresh closure every call cost ~25 s of retracing per
    # asset in serving
    from ..utils.misc import instance_cache

    key = ("blend", b, t, z.shape[1], z.shape[2], num_steps, chunk,
           encoder_reuse)

    if encoder_reuse:
        from ..diffusion.encoder_reuse import reuse_flags, zero_cache

        dfnc = model.make_denoiser_fn_cached(t)
        reuse_mask = reuse_flags(n, encoder_reuse)

    def make(use_cfg: bool = True):

        def run_segment(params, lat, seg_idx, z, init_noise, c, uc):
            den = lambda xx, ss, cc: dfn((params, indicator), xx, ss, cc)

            def body(carry, i):
                lat = carry
                alpha = (0.5 * (1.0 + jnp.cos(i / num_steps))) ** ALPHA_POW
                source = init_noise * sigmas[i] + z
                lat = lat * (1.0 - alpha) + source * alpha
                lat = sampler.step_call(
                    den, lat.astype(dtype), i, s_in, sigmas, num_sigmas, c,
                    uc, use_cfg=use_cfg,
                ).astype(jnp.float32)
                return lat, None

            lat, _ = jax.lax.scan(body, lat, seg_idx)
            return lat

        def run_segment_turbo(params, lat, cache, seg_idx, z, init_noise,
                              c, uc):
            extras = (params, indicator)

            def full_step(lat_, cache_, i):
                cell = {}

                def den2(xx, ss, cc):
                    out, c2 = dfnc(extras, xx, ss, cc, None)
                    cell["c"] = c2
                    return out

                out = sampler.step_call(
                    den2, lat_, i, s_in, sigmas, num_sigmas, c, uc
                )
                return out.astype(jnp.float32), cell["c"]

            def cached_step(lat_, cache_, i):
                den2 = lambda xx, ss, cc: dfnc(extras, xx, ss, cc, cache_)[0]
                out = sampler.step_call(
                    den2, lat_, i, s_in, sigmas, num_sigmas, c, uc
                )
                return out.astype(jnp.float32), cache_

            def body(carry, i):
                lat, cache = carry
                alpha = (0.5 * (1.0 + jnp.cos(i / num_steps))) ** ALPHA_POW
                source = init_noise * sigmas[i] + z
                lat = (lat * (1.0 - alpha) + source * alpha).astype(dtype)
                lat, cache = jax.lax.cond(
                    reuse_mask[i], cached_step, full_step, lat, cache, i
                )
                return (lat, cache), None

            (lat, cache), _ = jax.lax.scan(body, (lat, cache), seg_idx)
            return lat, cache

        # disk-cached traced program (utils/program_cache.py): the blend-loop
        # scan re-traced the UNet per fresh process (~45 s of the stage-2
        # cold start). Closure-captured σ schedule/indicator are keyed via
        # the discretization/sampler configs; arrays in args key by avals.
        from ..utils.program_cache import program_jit

        disc = sampler.discretization
        disc_key = (
            type(disc).__name__,
            sorted(
                (k, v) for k, v in vars(disc).items()
                if isinstance(v, (int, float, str, bool))
            ),
        )
        run_fn = run_segment_turbo if encoder_reuse else run_segment
        return program_jit(
            run_fn,
            name=f"v2v_blend{'_turbo' if encoder_reuse else ''}_cfg{int(use_cfg)}",
            extra_key=(
                getattr(dfnc if encoder_reuse else dfn, "program_key", None),
                sampler._program_key(),
                repr(disc_key),
                f"steps={num_steps},chunk={chunk},alpha={ALPHA_POW},"
                f"dtype={dtype},b={b},t={t}",
            ),
        )

    def runner_for(use_cfg: bool):
        return instance_cache(
            model, key + (use_cfg,), lambda: make(use_cfg)
        )

    run = runner_for(True)
    timer.mark("setup")
    if encoder_reuse:

        def _probe(lat):
            cell = {}

            def den2(xx, ss, cc):
                out, cell["c"] = dfnc((use_params, indicator), xx, ss, cc, None)
                return out

            sampler.step_call(
                den2, lat.astype(dtype), 0, s_in, sigmas, num_sigmas, c, uc
            )
            return cell["c"]

        # param dtype in the key: cast_weights_to_compute_dtype changes the
        # cached activations' dtype without changing any shape
        pdt = str(jax.tree_util.tree_leaves(use_params)[0].dtype)
        cache = zero_cache(model, ("turbo_cache", pdt) + key, _probe, latents)
        for s0 in range(0, n, chunk):
            latents, cache = run(
                use_params, latents, cache, idx[s0 : s0 + chunk], z,
                init_noise, c, uc,
            )
        del cache
    else:
        for s0, s1, f in segs:
            latents = runner_for(f)(
                use_params, latents, idx[s0:s1], z, init_noise, c, uc,
            )
    timer.mark("sampler_steps", latents)
    decoded = model.decode_first_stage(latents.astype(dtype), fs_params=fs_params)
    timer.mark("vae_decode", decoded)
    from ..utils.video import denorm_to_uint8

    if output_dtype == "uint8":
        out = np.asarray(denorm_to_uint8(decoded))
    else:
        out = np.asarray(jnp.clip(decoded, -1.0, 1.0), dtype=np.float32)
    timer.mark("to_host")
    timer.report()
    return out.reshape(b, t, *out.shape[1:])


def prepare_inputs(
    image_path: str,
    video_path: str,
    clip_size: int,
    resolution: Tuple[int, int],
) -> Tuple[np.ndarray, np.ndarray]:
    """Last clip_size video frames, frame 0 ← clean image; (frames, masks).

    Frames stay uint8 — blend_refine converts to [-1,1] on device (1
    byte/pixel over the host↔device link instead of 4)."""
    import cv2

    raw = import_video(video_path)
    frames = list(raw[-clip_size:])
    frames[0] = load_image_rgb(image_path)
    frames = [cv2.resize(f, (resolution[1], resolution[0])) for f in frames]
    masks = np.stack([foreground_mask_from_white(f) for f in frames])
    return np.stack(frames), masks


def run_pipeline(
    model,
    image_path: str,
    video_path: str,
    output_dir: str,
    elevation: float = 0.0,
    clip_size: int = 16,
    resolution: Sequence[int] = (1024, 1024),
    num_iter: int = 1,
    seed: Optional[int] = None,
    fps: int = 8,
    encoder_reuse: int = 0,
    cfg_interval=None,
    num_steps: Optional[int] = None,
) -> str:
    if seed is not None:
        model._rng = jax.random.PRNGKey(seed)
    model.num_samples = clip_size
    frames, masks = prepare_inputs(
        image_path, video_path, clip_size, tuple(resolution)
    )

    out_frames: List[np.ndarray] = []
    for _ in range(num_iter):
        video = blend_refine(model, frames, masks, elevation=elevation,
                             encoder_reuse=encoder_reuse,
                             cfg_interval=cfg_interval,
                             num_steps=num_steps,
                             output_dtype="uint8")
        new = tensor2vid(video)
        out_frames.extend(new if not out_frames else new[1:])
        frames = frames.copy()
        frames[0] = out_frames[-1]  # uint8 end to end

    out_path = os.path.join(output_dir, "second_step_video", "second.mp4")
    return export_to_video(out_frames, out_path, fps=fps)


def main(argv: Optional[List[str]] = None) -> None:
    p = argparse.ArgumentParser(description="Hi3D stage 2: video refinement")
    p.add_argument("--denoise_config", default="configs/inference-v02.yaml")
    p.add_argument("--denoise_checkpoint", default="ckpts/second_stage.pt")
    p.add_argument("--image_path", required=True,
                   help="clean (white-bg) conditioning image")
    p.add_argument("--video_path", default=None,
                   help="stage-1 video; default <output_dir>/first_step/first.mp4")
    p.add_argument("--output_dir", default="outputs/i2v")
    p.add_argument("--elevation", type=float, default=0)
    p.add_argument("--clip_size", type=int, default=16)
    p.add_argument("--resolution", type=int, nargs=2, default=[1024, 1024])
    p.add_argument("--num_iter", type=int, default=1)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--profile_dir", type=str, default="",
                   help="write a jax.profiler trace of the run here")
    p.add_argument("--vae_bf16", action="store_true",
                   help="cast the VAE to bf16 too (reference .half() runs "
                        "the VAE at reduced precision as well)")
    p.add_argument("--encoder_reuse", type=int, default=0,
                   help="turbo: run the UNet encoder only every k-th sampler "
                        "step, decode the rest from cached features (Faster "
                        "Diffusion; APPROXIMATE — slightly changes outputs; "
                        "0 = exact reference semantics)")
    p.add_argument("--cfg_interval", type=float, nargs=2, default=None,
                   metavar=("LO", "HI"),
                   help="turbo: apply CFG only on steps with σ in [LO, HI]; "
                        "a single conditioned UNet pass elsewhere (guidance "
                        "interval, arXiv 2404.07724; APPROXIMATE unless the "
                        "interval covers the whole σ schedule)")
    p.add_argument("--num_steps", type=int, default=None,
                   help="override the config's sampler step count "
                        "(reference default: 25)")
    args = p.parse_args(argv)

    video_path = args.video_path or os.path.join(
        args.output_dir, "first_step", "first.mp4"
    )
    from .common import load_inference_model

    t0 = time.time()
    model = load_inference_model(
        args.denoise_config, args.denoise_checkpoint, args.resolution,
        vae_bf16=args.vae_bf16, tag="v2v",
    )
    print(f"[v2v] model ready in {time.time() - t0:.1f}s")

    t0 = time.time()
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    try:
        out = run_pipeline(
            model,
            args.image_path,
            video_path,
            args.output_dir,
            elevation=args.elevation,
            clip_size=args.clip_size,
            resolution=args.resolution,
            num_iter=args.num_iter,
            seed=args.seed,
            encoder_reuse=args.encoder_reuse,
            cfg_interval=args.cfg_interval,
            num_steps=args.num_steps,
        )
    finally:
        if args.profile_dir:
            jax.profiler.stop_trace()
    print(f"[v2v] wrote {out} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
