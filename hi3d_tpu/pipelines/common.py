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
