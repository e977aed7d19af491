"""Model factory shared by the CLIs and the trainer.

Functional parity: reference vtdm/model.py:8-28 (`create_model` = OmegaConf
load + instantiate_from_config) — here the YAML loads through
hi3d_tpu.config (PyYAML + deep-merge + dotlist overrides) and `target`
names resolve through the alias registry, so the reference's config schema
works unchanged.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Union

from ..config import apply_dotlist, instantiate_from_config, load_config


def create_model(
    config_path: Union[str, Iterable[str]],
    overrides: Optional[List[str]] = None,
):
    from ..utils.misc import enable_persistent_compilation_cache

    # every CLI goes through here; cached executables turn the multi-minute
    # first-compile of the pipeline graphs into a one-time cost per shape
    enable_persistent_compilation_cache()
    cfg = load_config(config_path)
    if overrides:
        cfg = apply_dotlist(cfg, overrides)
    model = instantiate_from_config(cfg["model"])
    if "base_learning_rate" in cfg.get("model", {}):
        model.base_learning_rate = cfg["model"]["base_learning_rate"]
    return model, cfg


def load_inference_model(
    config_path: str,
    ckpt_path: Optional[str],
    res,  # int side or (H, W)
    vae_bf16: bool = False,
    clip_size: Optional[int] = None,
    tag: str = "load",
):
    """Build + init + checkpoint-load + inference-cast one engine — the
    shared load sequence of every inference CLI (reference CLIs do
    create_model → init_from_ckpt → .cuda().half(),
    pipeline_i2v_eval_v01.py:50-52). Missing checkpoints fall back to random
    weights with a printed smoke-mode notice."""
    import os

    h, w = (res, res) if isinstance(res, int) else tuple(res)
    have_ckpt = bool(ckpt_path) and os.path.exists(ckpt_path)
    # Cold-start: when a checkpoint will overwrite every weight anyway
    # (reference CLIs also discard init values), skip the RNG initializers —
    # eval_shape + one zero-fill program instead (utils.misc.module_init).
    # Tower weight FILES still take precedence over zeros inside each
    # embedder's init. Measured: build+init was 96 s + 67 s (stage 1) of the
    # fresh-process cold start at random init.
    zero_flag = have_ckpt and "HI3D_ZERO_INIT" not in os.environ
    if zero_flag:
        os.environ["HI3D_ZERO_INIT"] = "1"
    try:
        model, _ = create_model(config_path)
        # init shapes only fix parameter STRUCTURE (engine.init docstring) — a
        # tiny latent keeps the init trace/compile/run small. Initializing at
        # the real 128² stage-2 latent measured 107.6 s vs ~60 s at 32².
        model.init(latent_hw=(32, 32), num_frames=2)
    finally:
        if zero_flag:
            os.environ.pop("HI3D_ZERO_INIT", None)
    if have_ckpt:
        model.init_from_ckpt(ckpt_path)
    else:
        print(f"[{tag}] checkpoint {ckpt_path!r} not found — random weights "
              "(smoke mode)")
    model.cast_weights_to_compute_dtype(include_first_stage=vae_bf16)
    if clip_size is not None:
        model.num_samples = int(clip_size)
    return model
