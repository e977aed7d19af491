"""Stage-1 inference: single image → 16-frame orbital video.

Functional parity: reference pipeline_i2v_eval_v01.py —
1. rembg background removal → rgba.png / white.png (:153-168; optional here),
2. resize + center-crop to 512², [-1,1], T copies (:134-146),
3. add_custom_cond(infer) + conditioner (c, uc) with
   force_uc_zero_embeddings=['cond_frames', 'cond_frames_without_noise']
   (:71-78),
4. 25-step Euler-EDM sampling with per-frame linear CFG (:89-92),
5. VAE decode + mp4 export to <output_dir>/first_step/first.mp4 (:119-128),
6. optional autoregressive `num_iter` loop feeding the last generated frame
   back as the next conditioning image (:101-117).

TPU-native: the whole denoise loop runs as one `lax.scan` program on device
(bf16 UNet / fp32 σ-math); the VAE decodes in fp32 with frame chunking.
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
    load_image_rgb,
    remove_background,
    resize_center_crop,
)
from ..utils.video import export_to_video, tensor2vid

UC_ZERO_KEYS = ("cond_frames", "cond_frames_without_noise")


def prepare_frames(
    image_path: str, clip_size: int, resolution: Tuple[int, int]
) -> np.ndarray:
    """(T, H, W, 3) uint8: T copies of the preprocessed image (converted to
    [-1,1] on device by generate_orbit — 1 byte/pixel over the link)."""
    img = load_image_rgb(image_path)
    img = resize_center_crop(img, resolution)
    return np.repeat(img[None], clip_size, axis=0)


def generate_orbit(
    model,
    frames: np.ndarray,
    elevation: float = 0.0,
    rng: Optional[jax.Array] = None,
    num_steps: Optional[int] = None,
    randn: Optional[jax.Array] = None,  # (T, h/8, w/8, 4) unit noise
    batch_overrides: Optional[Dict] = None,  # applied after add_custom_cond
    encoder_reuse: int = 0,  # turbo: UNet encoder every k-th step (approx.)
    cfg_interval=None,  # (lo, hi): CFG only where σ ∈ [lo, hi] (turbo)
    output_dtype: str = "float32",  # "uint8": denormalize on device (4× less
    # device→host traffic; EXACT — the mp4 export quantizes to uint8 anyway)
) -> np.ndarray:
    """frames (T, H, W, 3) in [-1,1] → generated orbit (T, H, W, 3) in [-1,1].

    frames[0] is the conditioning image (all T copies at first call; the
    autoregressive loop replaces frame 0 between iterations).
    """
    from ..utils.misc import PhaseTimer

    timer = PhaseTimer("stage1")
    t = model.num_samples
    assert frames.shape[0] == t, (frames.shape, t)
    h, w = frames.shape[1:3]
    if rng is None:
        rng = model.next_rng()
    r_cond, r_custom, r_sample = jax.random.split(rng, 3)

    frames_np = np.asarray(frames)
    if frames_np.dtype == np.uint8:
        # 1 byte/pixel over the host↔device link; exact to_tensor_range math
        from ..utils.video import range_from_uint8

        video_dev = range_from_uint8(jnp.asarray(frames_np))
    else:
        video_dev = jnp.asarray(frames_np, jnp.float32)
    batch: Dict = {
        "video": video_dev[None],
        "elevation": jnp.asarray([elevation], jnp.float32),
        "fps_id": jnp.asarray([7], jnp.int32),
        "motion_bucket_id": jnp.asarray([127], jnp.int32),
    }
    batch = model.add_custom_cond(batch, infer=True, rng=r_custom)
    if batch_overrides:
        # reproducibility/parity hook: pin stochastic conditioning inputs
        batch.update(batch_overrides)

    timer.mark("add_custom_cond", batch)
    c, uc = model.conditioner.get_unconditional_conditioning(
        batch, force_uc_zero_embeddings=list(UC_ZERO_KEYS)
    )
    timer.mark("conditioner", (c, uc))

    samples = model.sample(
        cond=c,
        uc=uc,
        shape=(t, h // 8, w // 8, 4),
        num_video_frames=t,
        rng=r_sample,
        randn=randn,
        encoder_reuse=encoder_reuse,
        cfg_interval=cfg_interval,
        num_steps=num_steps,
    )
    timer.mark("sampler_steps", samples)
    decoded = model.decode_first_stage(samples)  # (T, H, W, 3) fp32
    timer.mark("vae_decode", decoded)
    from ..utils.video import denorm_to_uint8

    if output_dtype == "uint8":
        out = np.asarray(denorm_to_uint8(decoded))
    else:
        out = np.asarray(jnp.clip(decoded, -1.0, 1.0), dtype=np.float32)
    timer.mark("to_host")
    timer.report()
    return out


def run_pipeline(
    model,
    image_path: str,
    output_dir: str,
    elevation: float = 0.0,
    clip_size: int = 16,
    resolution: Sequence[int] = (512, 512),
    num_iter: int = 1,
    seed: Optional[int] = None,
    fps: int = 8,
    skip_rembg: bool = False,
    encoder_reuse: int = 0,
    cfg_interval=None,
    num_steps: Optional[int] = None,
) -> str:
    """Full stage-1 CLI behavior; returns the mp4 path."""
    if seed is not None:
        model._rng = jax.random.PRNGKey(seed)

    temp_dir = os.path.join(output_dir, "temp_image")
    os.makedirs(temp_dir, exist_ok=True)
    if not skip_rembg:
        image_path = remove_background(
            image_path,
            os.path.join(temp_dir, "rgba.png"),
            os.path.join(temp_dir, "white.png"),
        )

    model.num_samples = clip_size
    frames = prepare_frames(image_path, clip_size, tuple(resolution))

    out_frames: List[np.ndarray] = []
    for _ in range(num_iter):
        video = generate_orbit(model, frames, elevation=elevation,
                               encoder_reuse=encoder_reuse,
                               cfg_interval=cfg_interval,
                               num_steps=num_steps,
                               output_dtype="uint8")
        new = tensor2vid(video)
        # consecutive orbits share the boundary frame (reference :108-112)
        out_frames.extend(new if not out_frames else new[1:])
        frames = frames.copy()
        frames[0] = out_frames[-1]  # uint8 end to end

    out_path = os.path.join(output_dir, "first_step", "first.mp4")
    return export_to_video(out_frames, out_path, fps=fps)


def main(argv: Optional[List[str]] = None) -> None:
    p = argparse.ArgumentParser(description="Hi3D stage 1: image → orbital video")
    p.add_argument("--denoise_config", default="configs/inference-v01.yaml")
    p.add_argument("--denoise_checkpoint", default="ckpts/first_stage.pt")
    p.add_argument("--image_path", required=True)
    p.add_argument("--output_dir", default="outputs/i2v")
    p.add_argument("--elevation", type=float, default=0)
    p.add_argument("--clip_size", type=int, default=16)
    p.add_argument("--resolution", type=int, nargs=2, default=[512, 512])
    p.add_argument("--num_iter", type=int, default=1)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--profile_dir", type=str, default="",
                   help="write a jax.profiler trace of the run here")
    p.add_argument("--vae_bf16", action="store_true",
                   help="cast the VAE to bf16 too (reference .half() runs "
                        "the VAE at reduced precision as well)")
    p.add_argument("--skip_rembg", action="store_true")
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

    from .common import load_inference_model

    t0 = time.time()
    model = load_inference_model(
        args.denoise_config, args.denoise_checkpoint, args.resolution,
        vae_bf16=args.vae_bf16, tag="i2v",
    )
    print(f"[i2v] model ready in {time.time() - t0:.1f}s")

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    t0 = time.time()
    try:
        out = run_pipeline(
            model,
            args.image_path,
            args.output_dir,
            elevation=args.elevation,
            clip_size=args.clip_size,
            resolution=args.resolution,
            num_iter=args.num_iter,
            seed=args.seed,
            skip_rembg=args.skip_rembg,
            encoder_reuse=args.encoder_reuse,
            cfg_interval=args.cfg_interval,
            num_steps=args.num_steps,
        )
    finally:
        if args.profile_dir:
            jax.profiler.stop_trace()
    print(f"[i2v] wrote {out} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
