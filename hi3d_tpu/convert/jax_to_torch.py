"""JAX → torch-layout export (the inverse of torch_to_jax).

Purpose:
- `--outckpt` parity: reference train_ddp_spawn.py:441-443 exports a final
  torch state_dict; checkpoints exported here load into BOTH this framework
  (via torch_to_jax) and the original reference code.
- round-trip validation of the converter's key mapping and layout transforms
  (tests/test_convert_roundtrip.py): export ∘ import == identity.

Covers the UNet (model.diffusion_model.*) and KL-VAE (first_stage_model.*)
trees — the parts Hi3D trains. Frozen conditioner towers ship as separate
released files (open_clip / ViT-L / DPT) and are not re-exported.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

Path = Tuple[str, ...]

_NORM_WRAPPED = "norm"  # fp32 wrapper child scope


def _leaf_to_torch(leaf: str, value: np.ndarray, under_norm: bool):
    """flax leaf name/layout → torch name/layout."""
    value = np.asarray(value)
    if under_norm:
        return {"scale": "weight", "bias": "bias"}[leaf], value
    if leaf == "bias":
        return "bias", value
    if leaf == "mix_factor":
        return "mix_factor", value
    if leaf == "kernel":
        if value.ndim == 2:
            return "weight", value.T
        if value.ndim == 4:
            return "weight", value.transpose(3, 2, 0, 1)
        if value.ndim == 5:
            return "weight", value.transpose(4, 3, 0, 1, 2)
        return "weight", value
    return leaf, value


def _split_trailing_int(name: str) -> Tuple[str, ...]:
    """input_blocks_1_0 → ('input_blocks', '1', '0'); time_embed_0 →
    ('time_embed', '0')."""
    parts = name.split("_")
    head = []
    tail = []
    for p in parts:
        (tail if p.isdigit() and (tail or p == parts[-1]) else head).append(p)
    # general case: digits only at the end
    i = len(parts)
    while i > 0 and parts[i - 1].isdigit():
        i -= 1
    return ("_".join(parts[:i]),) + tuple(parts[i:])


def _tblock_to_torch(seg: Path) -> Optional[str]:
    """Transformer-block internals (inverse of torch_to_jax._tblock_rest)."""
    head = seg[0]
    if head in ("norm1", "norm2", "norm3", "norm_in"):
        return head
    if head in ("attn1", "attn2"):
        sub = seg[1]
        return f"{head}.to_out.0" if sub == "to_out_0" else f"{head}.{sub}"
    if head in ("ff", "ff_in"):
        if seg[1] == "net_0":
            return f"{head}.net.0.proj"
        return f"{head}.net.2"
    return None


def unet_path_to_torch(path: Path) -> Optional[str]:
    """flax UNet param path (sans leaf) → dotted torch name (sans leaf)."""
    # strip the fp32-norm wrapper scope
    under_norm = path and path[-1] == _NORM_WRAPPED
    if under_norm:
        path = path[:-1]
    head = path[0]

    if head.startswith("time_embed_"):
        return f"time_embed.{head.rsplit('_', 1)[1]}"
    if head.startswith("label_emb_"):
        _, a, b = head.rsplit("_", 2)
        return f"label_emb.{a}.{b}"
    if head in ("out_0", "out_2"):
        return f"out.{head[-1]}"
    if head.startswith(("input_blocks_", "output_blocks_", "middle_block_")):
        if head.startswith("middle_block_"):
            base = f"middle_block.{head.rsplit('_', 1)[1]}"
        else:
            stem, i, j = head.rsplit("_", 2)
            base = f"{stem}.{i}.{j}"
        rest = path[1:]
        if not rest:  # plain conv (input_blocks.0.0)
            return base
        r0 = rest[0]
        if r0 == "spatial":
            return f"{base}.{_res_inner_to_torch(rest[1:])}"
        if r0 == "time_stack":
            return f"{base}.time_stack.{_res_inner_to_torch(rest[1:])}"
        if r0 == "time_mixer":
            return f"{base}.time_mixer"
        if r0 in ("op", "conv", "norm", "proj_in", "proj_out"):
            return f"{base}.{r0}"
        if r0.startswith("transformer_blocks_") or r0.startswith("time_stack_"):
            stem, i = r0.rsplit("_", 1)
            sub = _tblock_to_torch(rest[1:])
            return f"{base}.{stem}.{i}.{sub}" if sub else None
        if r0.startswith("time_pos_embed_"):
            return f"{base}.time_pos_embed.{r0.rsplit('_', 1)[1]}"
    return None


def _res_inner_to_torch(seg: Path) -> Optional[str]:
    name = seg[0]
    if name == "in_layers_0":
        return "in_layers.0"
    if name == "in_layers_2":
        return "in_layers.2"
    if name == "out_layers_0":
        return "out_layers.0"
    if name == "out_layers_3":
        return "out_layers.3"
    if name == "emb_layers_1":
        return "emb_layers.1"
    if name == "skip_connection":
        return "skip_connection"
    return None


def vae_path_to_torch(path: Path) -> Optional[str]:
    under_norm = path and path[-1] == _NORM_WRAPPED
    if under_norm:
        path = path[:-1]
    head = path[0]
    if head in ("quant_conv", "post_quant_conv"):
        return head
    if head not in ("encoder", "decoder"):
        return None
    tower = head
    seg = path[1]

    def inner(rest: Path) -> str:
        if not rest:
            return ""
        name = rest[0]
        if name == "time_stack":
            return ".time_stack." + {
                "in_layers_0": "in_layers.0",
                "in_layers_2": "in_layers.2",
                "out_layers_0": "out_layers.0",
                "out_layers_3": "out_layers.3",
            }[rest[1]]
        if name == "time_mix_conv":
            return ".time_mix_conv"
        return "." + name  # norm1/conv1/q/k/v/proj_out/norm/conv

    if seg in ("conv_in", "conv_out", "norm_out"):
        return f"{tower}.{seg}{inner(path[2:])}"
    if seg.startswith("mid_"):
        return f"{tower}.mid.{seg[4:]}{inner(path[2:])}"
    if seg.startswith(("down_", "up_")):
        parts = seg.split("_")
        kind, i = parts[0], parts[1]
        if parts[2] == "block":
            return f"{tower}.{kind}.{i}.block.{parts[3]}{inner(path[2:])}"
        if parts[2] == "attn":
            return f"{tower}.{kind}.{i}.attn.{parts[3]}{inner(path[2:])}"
        if parts[2] in ("downsample", "upsample"):
            return f"{tower}.{kind}.{i}.{parts[2]}{inner(path[2:])}"
    return None


def _export_tree(tree: Dict, path_to_torch, prefix: str) -> Dict[str, np.ndarray]:
    import flax

    flat = flax.traverse_util.flatten_dict(tree.get("params", tree))
    out: Dict[str, np.ndarray] = {}
    for full_path, value in flat.items():
        *path, leaf = full_path
        under_norm = bool(path) and path[-1] == _NORM_WRAPPED
        torch_base = path_to_torch(tuple(path))
        if torch_base is None:
            raise KeyError(f"cannot export flax path {full_path}")
        torch_leaf, torch_val = _leaf_to_torch(leaf, np.asarray(value), under_norm)
        out[f"{prefix}{torch_base}.{torch_leaf}"] = torch_val
    return out


def export_engine_state_dict(engine) -> Dict[str, np.ndarray]:
    """Engine params → reference-layout state dict (UNet + VAE)."""
    sd: Dict[str, np.ndarray] = {}
    if engine.params is not None:
        sd.update(
            _export_tree(engine.params, unet_path_to_torch,
                         "model.diffusion_model.")
        )
    fsm = getattr(engine, "first_stage_model", None)
    if fsm is not None and getattr(fsm, "params", None) is not None:
        sd.update(
            _export_tree(fsm.params, vae_path_to_torch, "first_stage_model.")
        )
    return sd


def save_safetensors(sd: Dict[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v, np.float32) for k, v in sd.items()},
              path)
