"""Real-checkpoint readiness harness (round-1 VERDICT missing #5).

One-shot validation of the released reference checkpoints against this
rebuild: for every artifact the reference README expects under `ckpts/`
(README.md:42-52), the harness

1. loads the torch file (incl. DeepSpeed `.pt` `{module: {module.*}}` and
   Lightning `.ckpt` layouts, vtdm_gen_v01.py:30-56),
2. converts it with hi3d_tpu.convert.torch_to_jax,
3. overlays it on a freshly initialized param tree and reports key coverage
   (matched / missing / unexpected — the reference loads strict=False and
   prints the same report),
4. optionally runs a 2-step end-to-end sampling smoke with the converted
   stage-1 weights at 8×256² (BASELINE config 1),

and prints one PASS/SKIP/FAIL table. Artifacts that are absent SKIP cleanly,
so the harness can run in any environment; on a machine with the real
checkpoints it is the turnkey first-day check.

Usage:
    python -m tools.verify_weights [--ckpt_dir ckpts] [--smoke] \
        [--stage1 configs/inference-v01.yaml] [--stage2 configs/inference-v02.yaml]
"""

from __future__ import annotations

import argparse
import os
import traceback
from typing import Callable, Dict, List, Optional, Tuple

Result = Tuple[str, str, str]  # (check, PASS/SKIP/FAIL, detail)


def _coverage(init_tree: Dict, converted: Dict) -> str:
    import flax

    fi = flax.traverse_util.flatten_dict(init_tree)
    fc = flax.traverse_util.flatten_dict(converted)
    matched = [k for k in fc if k in fi]
    missing = [k for k in fi if k not in fc]
    unexpected = [k for k in fc if k not in fi]
    bad_shape = [
        k for k in matched if tuple(fi[k].shape) != tuple(fc[k].shape)
    ]
    detail = (
        f"{len(matched)}/{len(fi)} keys matched, "
        f"{len(missing)} missing, {len(unexpected)} unexpected"
    )
    if bad_shape:
        detail += f", {len(bad_shape)} SHAPE MISMATCHES e.g. {bad_shape[:3]}"
    return detail


def _check(
    results: List[Result], name: str, path: Optional[str], fn: Callable[[], str]
) -> None:
    if path is not None and not os.path.exists(path):
        results.append((name, "SKIP", f"{path} not found"))
        return
    try:
        results.append((name, "PASS", fn()))
    except Exception as e:
        tb = traceback.format_exc().strip().split("\n")[-1]
        results.append((name, "FAIL", f"{type(e).__name__}: {e} ({tb})"))


def verify_engine_ckpt(config_path: str, ckpt_path: str) -> str:
    """Build the engine from config, init tiny, convert + overlay + report."""
    import jax

    from hi3d_tpu.convert.torch_to_jax import (
        convert_state_dict,
        convert_unet_key,
        convert_vae_key,
        load_torch_state_dict,
        split_by_prefix,
    )
    from hi3d_tpu.pipelines.common import create_model

    model, _ = create_model(config_path)
    model.init(jax.random.PRNGKey(0))
    sd = load_torch_state_dict(ckpt_path)

    parts = []
    unet_sd = split_by_prefix(sd, "model.diffusion_model.")
    conv = convert_state_dict(unet_sd, convert_unet_key)
    parts.append("unet: " + _coverage(model.params, conv))

    vae_sd = split_by_prefix(sd, "first_stage_model.")
    if vae_sd:
        conv = convert_state_dict(vae_sd, convert_vae_key)
        parts.append(
            "vae: " + _coverage(model.first_stage_model.params, conv)
        )

    # full engine overlay exercises the embedder routing too
    model.init_from_ckpt(ckpt_path)
    parts.append("engine overlay ok")
    return "; ".join(parts)


def smoke_stage1(config_path: str, ckpt_path: str) -> str:
    """2-step 8×256² sampling smoke with converted weights."""
    import numpy as np
    import jax

    from hi3d_tpu.pipelines.common import create_model
    from hi3d_tpu.pipelines.i2v import generate_orbit

    model, _ = create_model(config_path)
    model.num_samples = 8
    model.sampler.num_steps = 2
    model.init(jax.random.PRNGKey(0), latent_hw=(32, 32), num_frames=2)
    model.init_from_ckpt(ckpt_path)
    model.cast_weights_to_compute_dtype()
    frames = np.zeros((8, 256, 256, 3), np.float32)
    out = generate_orbit(model, frames, rng=jax.random.PRNGKey(0))
    if not np.isfinite(out).all():
        raise ValueError("non-finite frames from 2-step smoke")
    return f"2-step sample finite, out {out.shape}"


def verify(
    ckpt_dir: str = "ckpts",
    stage1_cfg: str = "configs/inference-v01.yaml",
    stage2_cfg: str = "configs/inference-v02.yaml",
    smoke: bool = False,
) -> List[Result]:
    from hi3d_tpu.convert import torch_to_jax as c

    results: List[Result] = []
    p = lambda *xs: os.path.join(ckpt_dir, *xs)

    first = p("first_stage.pt")
    _check(results, "stage1 engine (first_stage.pt)", first,
           lambda: verify_engine_ckpt(stage1_cfg, first))
    second = p("second_stage.pt")
    _check(results, "stage2 engine (second_stage.pt)", second,
           lambda: verify_engine_ckpt(stage2_cfg, second))

    clip_h = p("open_clip_pytorch_model.bin")

    def check_clip_h() -> str:
        from hi3d_tpu.models.clip import vit_h_14
        import jax, jax.numpy as jnp

        params = c.load_open_clip_visual(clip_h)
        model = vit_h_14()
        init = jax.eval_shape(
            lambda r: model.init(r, jnp.zeros((1, 224, 224, 3))),
            jax.random.PRNGKey(0),
        )
        return _coverage(init, params)

    _check(results, "OpenCLIP ViT-H (open_clip_pytorch_model.bin)", clip_h,
           check_clip_h)

    clip_l = p("ViT-L-14.pt")

    def check_clip_l() -> str:
        from hi3d_tpu.models.clip import vit_l_14
        import jax, jax.numpy as jnp

        params = c.load_clip_jit_visual(clip_l)
        model = vit_l_14()
        init = jax.eval_shape(
            lambda r: model.init(r, jnp.zeros((1, 224, 224, 3))),
            jax.random.PRNGKey(0),
        )
        return _coverage(init, params)

    _check(results, "CLIP ViT-L (ViT-L-14.pt)", clip_l, check_clip_l)

    aes = p("metric_models", "sac+logos+ava1-l14-linearMSE.pth")

    def check_aes() -> str:
        from hi3d_tpu.models.clip import AestheticMLP
        import jax, jax.numpy as jnp

        params = c.load_aesthetic_mlp(aes)
        init = jax.eval_shape(
            lambda r: AestheticMLP().init(r, jnp.zeros((1, 768))),
            jax.random.PRNGKey(0),
        )
        return _coverage(init, params)

    _check(results, "aesthetic MLP (sac+logos+ava1)", aes, check_aes)

    dpt = p("dpt_hybrid_384.pt")

    def check_dpt() -> str:
        from hi3d_tpu.models.dpt import DPTDepthModel
        import jax, jax.numpy as jnp

        params = c.load_dpt_params(dpt)
        init = jax.eval_shape(
            lambda r: DPTDepthModel().init(r, jnp.zeros((1, 384, 384, 3))),
            jax.random.PRNGKey(0),
        )
        return _coverage(init, params)

    _check(results, "DPT-hybrid depth (dpt_hybrid_384.pt)", dpt, check_dpt)

    u2net = p("u2net.pth")

    def check_u2net() -> str:
        from hi3d_tpu.models.u2net import U2Net
        import jax, jax.numpy as jnp

        params = c.load_u2net(u2net)
        init = jax.eval_shape(
            lambda r: U2Net().init(r, jnp.zeros((1, 320, 320, 3))),
            jax.random.PRNGKey(0),
        )
        return _coverage(init, params)

    _check(results, "U2Net background removal (u2net.pth)", u2net, check_u2net)

    svd = p("svd_xt_image_decoder.safetensors")
    _check(results, "SVD base (training init ckpt)", svd,
           lambda: f"{len(c.load_torch_state_dict(svd))} tensors readable")

    if smoke:
        _check(results, "stage1 2-step e2e smoke",
               first if os.path.exists(first) else None,
               lambda: smoke_stage1(stage1_cfg, first))
    return results


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--ckpt_dir", default="ckpts")
    ap.add_argument("--stage1", default="configs/inference-v01.yaml")
    ap.add_argument("--stage2", default="configs/inference-v02.yaml")
    ap.add_argument("--smoke", action="store_true",
                    help="also run the 2-step e2e sampling smoke")
    args = ap.parse_args(argv)

    results = verify(args.ckpt_dir, args.stage1, args.stage2, smoke=args.smoke)
    w = max(len(r[0]) for r in results) + 2
    print("\n" + "=" * (w + 60))
    for name, status, detail in results:
        print(f"{name:<{w}} {status:<5} {detail}")
    print("=" * (w + 60))
    failed = [r for r in results if r[1] == "FAIL"]
    passed = [r for r in results if r[1] == "PASS"]
    print(f"{len(passed)} passed, {len(failed)} failed, "
          f"{len(results) - len(passed) - len(failed)} skipped")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
