"""Config loading and object instantiation.

The reference framework is configured entirely through YAML trees whose nodes are
``{target: <import path>, params: {...}}`` and instantiated recursively with
``instantiate_from_config`` (reference sgm/util.py:168-186); multiple YAML files
merge left-to-right and CLI dotlist overrides apply last (reference
train_ddp_spawn.py:223-225, via OmegaConf).

This module re-creates that surface on plain dicts + pyyaml:

- :func:`load_config` — load one or more YAML files, deep-merged left-to-right.
- :func:`apply_dotlist` — ``a.b.c=value`` overrides (values parsed as YAML).
- :func:`instantiate_from_config` — resolve ``target`` through
  :mod:`hi3d_tpu.registry` (which aliases the reference's ``sgm.*``/``vtdm.*``
  names to hi3d_tpu classes) and call it with ``params``.
"""

from __future__ import annotations

import copy
import importlib
from typing import Any, Dict, Iterable, List, Mapping, Union

import yaml


def _deep_merge(base: Dict[str, Any], overlay: Mapping[str, Any]) -> Dict[str, Any]:
    """Recursively merge `overlay` into `base` (overlay wins), returning base."""
    for k, v in overlay.items():
        if k in base and isinstance(base[k], dict) and isinstance(v, Mapping):
            _deep_merge(base[k], v)
        else:
            base[k] = copy.deepcopy(v)
    return base


def load_config(paths: Union[str, Iterable[str]]) -> Dict[str, Any]:
    """Load YAML config file(s); later files override earlier ones.

    A top-level ``include: [other.yaml, ...]`` key pulls in base files
    (paths relative to the including file) before the file's own content.
    """
    import os

    if isinstance(paths, str):
        paths = [paths]
    merged: Dict[str, Any] = {}
    for p in paths:
        with open(p, "r") as f:
            cfg = yaml.safe_load(f) or {}
        if not isinstance(cfg, dict):
            raise TypeError(f"top-level YAML in {p} must be a mapping, got {type(cfg)}")
        for inc in cfg.pop("include", []) or []:
            inc_path = inc if os.path.isabs(inc) else os.path.join(
                os.path.dirname(os.path.abspath(p)), inc
            )
            _deep_merge(merged, load_config(inc_path))
        _deep_merge(merged, cfg)
    return merged


def merge_configs(*cfgs: Mapping[str, Any]) -> Dict[str, Any]:
    """Deep-merge config dicts left-to-right into a fresh dict."""
    out: Dict[str, Any] = {}
    for c in cfgs:
        _deep_merge(out, c)
    return out


def apply_dotlist(cfg: Dict[str, Any], dotlist: List[str]) -> Dict[str, Any]:
    """Apply `key.path=value` overrides in place; values are parsed as YAML."""
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"dotlist entry {item!r} must be key=value")
        key, _, raw = item.partition("=")
        value = yaml.safe_load(raw) if raw != "" else None
        node = cfg
        parts = key.strip().split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
            if not isinstance(node, dict):
                raise TypeError(f"cannot descend into non-dict at {part!r} of {key!r}")
        node[parts[-1]] = value
    return cfg


def get_obj_from_str(string: str, reload: bool = False) -> Any:
    """Resolve a dotted import path, consulting the alias registry first."""
    from . import registry

    target = registry.resolve(string)
    if target is not None:
        return target
    module_name, _, cls_name = string.rpartition(".")
    if not module_name:
        raise ImportError(f"cannot resolve target {string!r}")
    module = importlib.import_module(module_name)
    if reload:
        importlib.reload(module)
    return getattr(module, cls_name)


def instantiate_from_config(config: Mapping[str, Any], **extra_kwargs) -> Any:
    """Build the object described by ``{target, params}``.

    Mirrors reference sgm/util.py:168-175, including the sentinel targets
    ``__is_first_stage__`` / ``__is_unconditional__`` used by some upstream
    configs.
    """
    if "target" not in config:
        if config.get("__is_first_stage__") or config.get("__is_unconditional__"):
            return None
        raise KeyError("Expected key `target` to instantiate.")
    params = dict(config.get("params") or {})
    params.update(extra_kwargs)
    return get_obj_from_str(config["target"])(**params)
