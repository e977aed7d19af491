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
    model, _ = create_model(config_path)
    model.init(latent_hw=(h // 8, w // 8), num_frames=2)
    if ckpt_path and os.path.exists(ckpt_path):
        model.init_from_ckpt(ckpt_path)
    else:
        print(f"[{tag}] checkpoint {ckpt_path!r} not found — random weights "
              "(smoke mode)")
    model.cast_weights_to_compute_dtype(include_first_stage=vae_bf16)
    if clip_size is not None:
        model.num_samples = int(clip_size)
    return model
