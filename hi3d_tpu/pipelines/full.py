"""Full two-stage pipeline: single image → stage-1 orbit (16×512²) →
stage-2 refined multi-view set (16×1024²) → CLIP/aesthetic metric scoring.

The reference splits this across two CLIs run by hand
(pipeline_i2v_eval_v01.py then pipeline_i2v_eval_v02.py, README.md:60-66)
and uses its `ckpts/metric_models` CLIP/aesthetic towers only as
conditioning; this runner chains both stages and additionally scores the
generated views — per-view CLIP ViT-L cosine similarity against the input
image and LAION aesthetic-MLP scores — writing `metrics.json` next to the
videos (driver BASELINE.json config 4).

Usage:
  python -m hi3d_tpu.pipelines.full \\
      --stage1_config configs/inference-v01.yaml \\
      --stage1_checkpoint ckpts/first_stage.pt \\
      --stage2_config configs/inference-v02.yaml \\
      --stage2_checkpoint ckpts/second_stage.pt \\
      --image_path demo/3.png --output_dir outputs/3 [--elevation 0]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..models.clip import clip_normalize, resize_bilinear, vit_l_14
from ..utils.image import load_image_rgb
from ..utils.video import import_video
from . import i2v, v2v


class ViewScorer:
    """CLIP ViT-L cosine similarity + LAION aesthetic score per view.

    Towers/params are injectable for tests; by default the released
    checkpoints (AesEmbedder paths, vtdm/encoders.py:59-63) are loaded when
    present, else random init (scores then only measure relative drift).
    """

    def __init__(
        self,
        clip=None,
        mlp=None,
        clip_params=None,
        mlp_params=None,
        clip_path: str = "ckpts/ViT-L-14.pt",
        mlp_path: str = "ckpts/metric_models/sac+logos+ava1-l14-linearMSE.pth",
    ):
        from ..conditioners import AestheticMLP

        self.clip = clip if clip is not None else vit_l_14()
        self.mlp = mlp if mlp is not None else AestheticMLP()
        self.clip_params = clip_params
        self.mlp_params = mlp_params
        if self.clip_params is None and os.path.exists(clip_path):
            from ..convert.torch_to_jax import load_clip_jit_visual

            self.clip_params = load_clip_jit_visual(clip_path)
        if self.mlp_params is None and os.path.exists(mlp_path):
            from ..convert.torch_to_jax import load_aesthetic_mlp

            self.mlp_params = load_aesthetic_mlp(mlp_path)
        rng = jax.random.PRNGKey(0)
        res = getattr(self.clip, "image_size", 224)
        from ..utils.misc import module_init

        if self.clip_params is None:
            self.clip_params = module_init(
                self.clip.init, rng, jnp.zeros((1, res, res, 3))
            )
        if self.mlp_params is None:
            feat_dim = getattr(self.clip, "output_dim", 768)
            self.mlp_params = module_init(
                self.mlp.init, rng, jnp.zeros((1, feat_dim))
            )
        self._res = res
        self._clip_fwd = jax.jit(self.clip.apply)
        self._mlp_fwd = jax.jit(self.mlp.apply)

    def _features(self, frames_uint8: np.ndarray) -> jax.Array:
        """(N, H, W, 3) uint8 → L2-normalized CLIP features (N, D)."""
        x = jnp.asarray(frames_uint8, jnp.float32) / 255.0
        x = resize_bilinear(x, (self._res, self._res))
        x = clip_normalize(x)
        feats = self._clip_fwd(self.clip_params, x)
        feats = feats.astype(jnp.float32)
        return feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12
        )

    def __call__(
        self, ref_image_uint8: np.ndarray, views_uint8: Sequence[np.ndarray]
    ) -> Dict:
        views = np.stack(views_uint8)
        fv = self._features(views)
        fr = self._features(ref_image_uint8[None])
        sims = np.asarray(fv @ fr[0])
        aes = np.asarray(self._mlp_fwd(self.mlp_params, fv))[:, 0]
        return {
            "clip_similarity": [round(float(s), 4) for s in sims],
            "clip_similarity_mean": round(float(sims.mean()), 4),
            "aesthetic": [round(float(a), 4) for a in aes],
            "aesthetic_mean": round(float(aes.mean()), 4),
        }


def run_two_stage(
    stage1_model,
    stage2_model,
    image_path: str,
    output_dir: str,
    elevation: float = 0.0,
    clip_size: int = 16,
    stage1_resolution: Sequence[int] = (512, 512),
    stage2_resolution: Sequence[int] = (1024, 1024),
    seed: Optional[int] = None,
    fps: int = 8,
    skip_rembg: bool = False,
    scorer: Optional[ViewScorer] = None,
    score_views: bool = True,
    encoder_reuse: int = 0,  # turbo for BOTH stages (approximate; 0 = exact)
    cfg_interval=None,  # (lo, hi): CFG only where σ ∈ [lo, hi], both stages
    num_steps: Optional[int] = None,  # sampler step override, both stages
) -> Dict:
    """Chain stage 1 → stage 2 → scoring. Returns paths + metrics.

    Either stage accepts a built model or a zero-arg factory; factories are
    built just-in-time and released after their stage so both 1.5B-param
    UNets (plus towers) are never resident together — required on 16 GB
    chips."""
    t0 = time.time()
    owns1 = callable(stage1_model)
    m1 = stage1_model() if owns1 else stage1_model
    first_mp4 = i2v.run_pipeline(
        m1,
        image_path,
        output_dir,
        elevation=elevation,
        clip_size=clip_size,
        resolution=stage1_resolution,
        seed=seed,
        fps=fps,
        skip_rembg=skip_rembg,
        encoder_reuse=encoder_reuse,
        cfg_interval=cfg_interval,
        num_steps=num_steps,
    )
    if owns1:
        m1 = None  # free stage-1 weights/towers before stage 2 loads
        # the engine participates in reference cycles (denoiser/runner caches
        # close over it) — collect now so HBM frees before stage 2 allocates
        import gc

        gc.collect()
    t1 = time.time()
    white = os.path.join(output_dir, "temp_image", "white.png")
    if not os.path.exists(white):
        white = image_path  # rembg skipped/unavailable
    owns2 = callable(stage2_model)
    m2 = stage2_model() if owns2 else stage2_model
    second_mp4 = v2v.run_pipeline(
        m2,
        white,
        first_mp4,
        output_dir,
        elevation=elevation,
        clip_size=clip_size,
        resolution=stage2_resolution,
        seed=seed,
        fps=fps,
        encoder_reuse=encoder_reuse,
        cfg_interval=cfg_interval,
        num_steps=num_steps,
    )
    if owns2:
        m2 = None
        import gc

        gc.collect()
    t2 = time.time()

    result: Dict = {
        "first_mp4": first_mp4,
        "second_mp4": second_mp4,
        "stage1_sec": round(t1 - t0, 2),
        "stage2_sec": round(t2 - t1, 2),
        "total_sec": round(t2 - t0, 2),
    }
    if score_views:
        scorer = scorer if scorer is not None else ViewScorer()
        views = import_video(second_mp4, max_frames=clip_size)
        ref = load_image_rgb(white)
        result["metrics"] = scorer(ref, views)
    with open(os.path.join(output_dir, "metrics.json"), "w") as f:
        json.dump(result, f, indent=2)
    return result


def main(argv: Optional[List[str]] = None) -> None:
    p = argparse.ArgumentParser(
        description="Hi3D full two-stage: image → 16×1024² multi-view set"
    )
    p.add_argument("--stage1_config", default="configs/inference-v01.yaml")
    p.add_argument("--stage1_checkpoint", default="ckpts/first_stage.pt")
    p.add_argument("--stage2_config", default="configs/inference-v02.yaml")
    p.add_argument("--stage2_checkpoint", default="ckpts/second_stage.pt")
    p.add_argument("--image_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--elevation", type=float, default=0.0)
    p.add_argument("--clip_size", type=int, default=16)
    p.add_argument("--stage1_resolution", type=int, nargs=2, default=[512, 512])
    p.add_argument("--stage2_resolution", type=int, nargs=2, default=[1024, 1024])
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--profile_dir", type=str, default="",
                   help="write a jax.profiler trace of the run here")
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--skip_rembg", action="store_true")
    p.add_argument("--no_metrics", action="store_true")
    p.add_argument("--vae_bf16", action="store_true",
                   help="cast the VAEs to bf16 too (reference .half() parity)")
    p.add_argument("--encoder_reuse", type=int, default=0,
                   help="turbo for both stages: run the UNet encoder only "
                        "every k-th sampler step (Faster Diffusion; "
                        "APPROXIMATE; 0 = exact reference semantics)")
    p.add_argument("--cfg_interval", type=float, nargs=2, default=None,
                   metavar=("LO", "HI"),
                   help="turbo for both stages: apply CFG only on steps "
                        "with σ in [LO, HI] (guidance interval, arXiv "
                        "2404.07724; APPROXIMATE unless it covers the whole "
                        "σ schedule)")
    p.add_argument("--num_steps", type=int, default=None,
                   help="override both stages' sampler step count "
                        "(reference default: 25)")
    args = p.parse_args(argv)

    def _load(config_path, ckpt_path, res):
        from .common import load_inference_model

        return load_inference_model(
            config_path, ckpt_path, res, vae_bf16=args.vae_bf16, tag="full"
        )

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    try:
        result = run_two_stage(
            lambda: _load(args.stage1_config, args.stage1_checkpoint,
                          args.stage1_resolution[0]),
            lambda: _load(args.stage2_config, args.stage2_checkpoint,
                          args.stage2_resolution[0]),
            args.image_path,
            args.output_dir,
            elevation=args.elevation,
            clip_size=args.clip_size,
            stage1_resolution=args.stage1_resolution,
            stage2_resolution=args.stage2_resolution,
            seed=args.seed,
            fps=args.fps,
            skip_rembg=args.skip_rembg,
            score_views=not args.no_metrics,
            encoder_reuse=args.encoder_reuse,
            cfg_interval=args.cfg_interval,
            num_steps=args.num_steps,
        )
    finally:
        if args.profile_dir:
            jax.profiler.stop_trace()
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
