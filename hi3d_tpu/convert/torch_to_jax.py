"""torch → JAX weight conversion for the released Hi3D checkpoints.

The reference ships `first_stage.pt` / `second_stage.pt` (DeepSpeed format:
top-level dict with a `module.`-prefixed state dict — reference
vtdm/vtdm_gen_v01.py:30-56), plus `.safetensors` SVD bases. This module maps
those state dicts onto hi3d_tpu's flax param trees:

- module-path rename: torch dotted names → the flax names chosen to mirror
  them (`input_blocks.1.0.in_layers.0` → `input_blocks_1_0/spatial/
  in_layers_0/norm`), see hi3d_tpu.models.* docstrings.
- layout transforms: Linear (O,I)→(I,O); Conv2d (O,I,kh,kw)→(kh,kw,I,O);
  Conv3d (O,I,kt,kh,kw)→(kt,kh,kw,I,O); norm weight→scale.

Engine-level prefixes (reference DiffusionEngine attribute names):
  model.diffusion_model.*        → UNet params
  first_stage_model.*            → VAE params
  conditioner.embedders.{n}.*    → embedder towers
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, Mapping, Optional, Tuple

import numpy as np
import jax.numpy as jnp

Path = Tuple[str, ...]

# sentinel marking "this path ends at a norm layer" (weight → scale, and our
# fp32-norm wrappers add an inner 'norm' scope)
_NORM = object()


# --------------------------------------------------------------------------
# state-dict loading
# --------------------------------------------------------------------------


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt/.ckpt/.safetensors file into numpy arrays (host, fp32).

    Handles the DeepSpeed `.pt` format (`{'module': {'module.xxx': t}}`) and
    Lightning `.ckpt` (`{'state_dict': ...}`) like reference
    vtdm_gen_v01.py:34-46.
    """
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = np.asarray(f.get_tensor(k))
        return {k: _to_np(v) for k, v in out.items()}

    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "module" in sd and isinstance(sd["module"], dict):
        sd = {k[len("module."):]: v for k, v in sd["module"].items()}
    return {k: _to_np(v) for k, v in sd.items() if hasattr(v, "shape")}


def _to_np(t) -> np.ndarray:
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().to(torch.float32).cpu().numpy()
    return np.asarray(t, dtype=np.float32)


# --------------------------------------------------------------------------
# key mapping
# --------------------------------------------------------------------------


def _resblock_rest(rest) -> Optional[Path]:
    """Map ResBlock-internal torch names (openaimodel.py:210-354 layout)."""
    head = rest[0]
    if head == "in_layers":
        return ("in_layers_0", _NORM) if rest[1] == "0" else ("in_layers_2",)
    if head == "out_layers":
        return ("out_layers_0", _NORM) if rest[1] == "0" else ("out_layers_3",)
    if head == "emb_layers":
        return ("emb_layers_1",)
    if head == "skip_connection":
        return ("skip_connection",)
    return None


def _tblock_rest(rest) -> Optional[Path]:
    """Transformer-block internals (attention.py:456-572 / video_attention.py)."""
    head = rest[0]
    if head in ("norm1", "norm2", "norm3", "norm_in"):
        return (head, _NORM)
    if head in ("attn1", "attn2"):
        if rest[1] == "to_out":
            return (head, "to_out_0")
        return (head, rest[1])  # to_q / to_k / to_v
    if head in ("ff", "ff_in"):
        # ff.net.0.proj → ff/net_0/proj ; ff.net.2 → ff/net_2
        if rest[2] == "0":
            return (head, "net_0", "proj")
        return (head, "net_2")
    return None


def _transformer_rest(rest) -> Optional[Path]:
    """SpatialVideoTransformer internals (video_attention.py:146-301)."""
    head = rest[0]
    if head == "norm":
        return ("norm", _NORM)
    if head in ("proj_in", "proj_out"):
        return (head,)
    if head == "transformer_blocks":
        sub = _tblock_rest(rest[2:])
        return (f"transformer_blocks_{rest[1]}",) + sub if sub else None
    if head == "time_stack":
        sub = _tblock_rest(rest[2:])
        return (f"time_stack_{rest[1]}",) + sub if sub else None
    if head == "time_pos_embed":
        return (f"time_pos_embed_{rest[1]}",)
    if head == "time_mixer":
        return ("time_mixer",)
    return None


def _block_rest(rest) -> Optional[Path]:
    """One entry of a TimestepEmbedSequential: VideoResBlock /
    SpatialVideoTransformer / Down/Upsample / plain conv."""
    if rest[0] in ("weight", "bias"):
        return ()  # plain conv (input_blocks.0.0)
    if rest[0] in ("in_layers", "out_layers", "emb_layers", "skip_connection"):
        sub = _resblock_rest(rest)
        return ("spatial",) + sub if sub else None
    if rest[0] == "time_stack" and not rest[1].isdigit():
        # VideoResBlock's temporal ResBlock
        sub = _resblock_rest(rest[1:])
        return ("time_stack",) + sub if sub else None
    if rest[0] == "op":
        return ("op",)
    if rest[0] == "conv":
        return ("conv",)
    return _transformer_rest(rest)


def convert_unet_key(key: str) -> Optional[Path]:
    """Map a torch VideoUNet state-dict key to a flax param path (sans leaf)."""
    parts = key.split(".")
    if parts[0] == "time_embed":
        return (f"time_embed_{parts[1]}",)
    if parts[0] == "label_emb":
        return (f"label_emb_{parts[1]}_{parts[2]}",)
    if parts[0] == "out":
        return ("out_0", _NORM) if parts[1] == "0" else ("out_2",)
    if parts[0] in ("input_blocks", "output_blocks", "middle_block"):
        if parts[0] == "middle_block":
            prefix, rest = f"middle_block_{parts[1]}", parts[2:]
        else:
            prefix, rest = f"{parts[0]}_{parts[1]}_{parts[2]}", parts[3:]
        sub = _block_rest(rest)
        if sub is None:
            return None
        return (prefix,) + sub
    return None


def convert_vae_key(key: str) -> Optional[Path]:
    """Map a torch AutoencoderKL key (model.py layout) to a flax path."""
    parts = key.split(".")
    if parts[0] in ("quant_conv", "post_quant_conv"):
        return (parts[0],)
    if parts[0] not in ("encoder", "decoder"):
        return None
    tower = parts[0]
    rest = parts[1:]

    def res_inner(r) -> Optional[Path]:
        if r[0] in ("norm1", "norm2"):
            return (r[0], _NORM)
        if r[0] in ("conv1", "conv2", "nin_shortcut"):
            return (r[0],)
        if r[0] == "mix_factor":
            return ()
        if r[0] == "time_stack":
            # VideoDecoder temporal 3-D ResBlock (temporal_ae.py:31-44)
            if r[1] == "in_layers":
                return ("time_stack", "in_layers_0", _NORM) if r[2] == "0" \
                    else ("time_stack", "in_layers_2")
            if r[1] == "out_layers":
                return ("time_stack", "out_layers_0", _NORM) if r[2] == "0" \
                    else ("time_stack", "out_layers_3")
        return None

    head = rest[0]
    if head == "conv_out" and len(rest) > 2 and rest[1] == "time_mix_conv":
        return (tower, "conv_out", "time_mix_conv")
    if head in ("conv_in", "conv_out"):
        return (tower, head)
    if head == "norm_out":
        return (tower, "norm_out", _NORM)
    if head == "mid":
        if rest[1] in ("block_1", "block_2"):
            sub = res_inner(rest[2:])
            return (tower, f"mid_{rest[1]}") + sub if sub is not None else None
        if rest[1] == "attn_1":
            leaf = rest[2]
            if leaf == "norm":
                return (tower, "mid_attn_1", "norm", _NORM)
            return (tower, "mid_attn_1", leaf)
        return None
    if head in ("down", "up"):
        i = rest[1]
        if rest[2] == "block":
            sub = res_inner(rest[4:])
            return (
                (tower, f"{head}_{i}_block_{rest[3]}") + sub
                if sub is not None
                else None
            )
        if rest[2] in ("downsample", "upsample"):
            return (tower, f"{head}_{i}_{rest[2]}", "conv")
        if rest[2] == "attn":
            leaf = rest[4]
            if leaf == "norm":
                return (tower, f"{head}_{i}_attn_{rest[3]}", "norm", _NORM)
            return (tower, f"{head}_{i}_attn_{rest[3]}", leaf)
    return None


def convert_clip_visual_key(key: str) -> Optional[Path]:
    """Map `visual.*` keys of CLIP/OpenCLIP image towers to
    hi3d_tpu.models.clip.CLIPVisionTransformer paths."""
    parts = key.split(".")
    if parts[0] == "visual":
        parts = parts[1:]
    head = parts[0]
    if head in ("class_embedding", "positional_embedding", "proj"):
        return ("_self_",)  # raw params on the module itself
    if head == "conv1":
        return ("conv1",)
    if head in ("ln_pre", "ln_post"):
        return (head, _NORM_PLAIN)
    if head == "transformer":
        i = parts[2]
        rest = parts[3:]
        block = f"resblocks_{i}"
        if rest[0] in ("ln_1", "ln_2"):
            return (block, rest[0], _NORM_PLAIN)
        if rest[0] == "attn":
            if rest[1].startswith("in_proj"):
                return (block, "attn", "in_proj")
            return (block, "attn", "out_proj")
        if rest[0] == "mlp":
            return (block, f"mlp_{rest[1]}")
    return None


# CLIP towers use bare flax LayerNorm (no fp32-wrapper child scope)
_NORM_PLAIN = object()


def _leaf_and_transform(path: Path, torch_key: str, value: np.ndarray):
    """Resolve the flax leaf name + apply the layout transform."""
    leaf_src = torch_key.split(".")[-1]
    is_norm = path and path[-1] in (_NORM, _NORM_PLAIN)
    wrapper = path and path[-1] is _NORM  # fp32 wrapper adds inner 'norm' scope
    if is_norm:
        path = path[:-1] + (("norm",) if wrapper else ())
        leaf = {"weight": "scale", "bias": "bias"}[leaf_src]
        return path, leaf, value

    if path and path[-1] == "_self_":
        # raw module params (class_embedding / positional_embedding / proj)
        return (), torch_key.split(".")[-1], value

    if path and path[-1] == "_embed_":
        # embedding tables keep their (rows, width) layout
        return (), torch_key.split(".")[0], value

    if path and path[-1] == "_embed_or_linear_":
        # 2-D UNet label_emb: int-class nn.Embedding (num_classes, dim) →
        # flax nn.Embed 'embedding' (no transpose); continuous-mode Linear
        # weight is (dim, 1) → Dense 'kernel' (transposed). Disambiguated by
        # shape: only the Linear has a trailing singleton in-dim.
        path = path[:-1]
        if leaf_src == "bias":
            return path, "bias", value
        if value.ndim == 2 and value.shape[1] == 1:
            return path, "kernel", value.T
        return path, "embedding", value

    if path and path[-1] == "time_mixer":
        return path, "mix_factor", value

    if leaf_src == "bias" or leaf_src == "in_proj_bias":
        return path, "bias", value
    # weights
    if value.ndim == 2:
        return path, "kernel", value.T
    if value.ndim == 4:
        return path, "kernel", value.transpose(2, 3, 1, 0)
    if value.ndim == 5:
        return path, "kernel", value.transpose(2, 3, 4, 1, 0)
    if value.ndim == 1:
        return path, "kernel" if leaf_src == "weight" else leaf_src, value
    return path, leaf_src, value


def convert_state_dict(
    sd: Mapping[str, np.ndarray],
    key_mapper,
    strict: bool = False,
) -> Dict:
    """Convert a torch state dict into a nested flax params dict."""
    import flax

    flat: Dict[Path, np.ndarray] = {}
    skipped = []
    for k, v in sd.items():
        path = key_mapper(k)
        if path is None:
            skipped.append(k)
            continue
        path, leaf, value = _leaf_and_transform(path, k, v)
        flat[path + (leaf,)] = jnp.asarray(value)
    if strict and skipped:
        raise KeyError(f"unmapped torch keys: {skipped[:20]} (+{len(skipped)-20})")
    return {"params": flax.traverse_util.unflatten_dict(flat)}


# --------------------------------------------------------------------------
# engine-level loading
# --------------------------------------------------------------------------


def split_by_prefix(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def load_engine_params(engine, path) -> None:
    """Populate a DiffusionEngine's param trees from a reference checkpoint.

    `path` may also be an in-memory torch-layout state dict (str → ndarray),
    e.g. `{k: v.numpy() for k, v in torch_model.state_dict().items()}` — used
    by the e2e parity tests and tools/verify_weights.py.
    """
    sd = path if isinstance(path, Mapping) else load_torch_state_dict(path)

    unet_sd = split_by_prefix(sd, "model.diffusion_model.")
    if unet_sd:
        converted = convert_state_dict(unet_sd, convert_unet_key)
        engine.params = _merge_like(engine.params, converted)

    vae_sd = split_by_prefix(sd, "first_stage_model.")
    if vae_sd and getattr(engine.first_stage_model, "params", None) is not None:
        converted = convert_state_dict(vae_sd, convert_vae_key)
        engine.first_stage_model.params = _merge_like(
            engine.first_stage_model.params, converted
        )

    # conditioner embedder towers
    if engine.conditioner is not None:
        for n, emb in enumerate(engine.conditioner.embedders):
            emb_sd = split_by_prefix(sd, f"conditioner.embedders.{n}.")
            if not emb_sd:
                continue
            _load_embedder(emb, emb_sd)


def _load_embedder(emb, sd: Dict[str, np.ndarray]) -> None:
    from ..conditioners import (
        AesEmbedder,
        FrozenOpenCLIPImageEmbedder,
        FrozenOpenCLIPImagePredictionEmbedder,
        VideoPredictionEmbedderWithEncoder,
    )

    if isinstance(emb, FrozenOpenCLIPImagePredictionEmbedder):
        clip_sd = split_by_prefix(sd, "open_clip.model.")
        if clip_sd:
            emb.open_clip.params = convert_state_dict(
                clip_sd, convert_clip_visual_key
            )
    elif isinstance(emb, FrozenOpenCLIPImageEmbedder):
        clip_sd = split_by_prefix(sd, "model.")
        if clip_sd:
            emb.params = convert_state_dict(clip_sd, convert_clip_visual_key)
    elif isinstance(emb, VideoPredictionEmbedderWithEncoder):
        enc_sd = split_by_prefix(sd, "encoder.")
        if enc_sd:
            emb.encoder.params = convert_state_dict(enc_sd, convert_vae_key)
    elif isinstance(emb, AesEmbedder):
        clip_sd = split_by_prefix(sd, "aesthetic_model.")
        if clip_sd:
            emb.clip_params = convert_state_dict(clip_sd, convert_clip_visual_key)
        mlp_sd = split_by_prefix(sd, "aesthetic_mlp.")
        if mlp_sd:
            emb.mlp_params = convert_aesthetic_mlp(mlp_sd)


def convert_aesthetic_mlp(sd: Mapping[str, np.ndarray]) -> Dict:
    """torch layers.{0,2,4,6,7} → flax layers_{0..4} (dropouts skipped)."""
    idx_map = {"0": 0, "2": 1, "4": 2, "6": 3, "7": 4}
    import flax

    flat = {}
    for k, v in sd.items():
        parts = k.split(".")  # layers.<i>.<weight|bias>
        i = idx_map[parts[1]]
        leaf = "kernel" if parts[2] == "weight" else "bias"
        val = v.T if parts[2] == "weight" else v
        flat[(f"layers_{i}", leaf)] = jnp.asarray(val)
    return {"params": flax.traverse_util.unflatten_dict(flat)}


def load_autoencoder_params(path: str) -> Dict:
    sd = load_torch_state_dict(path)
    # accept either bare VAE dicts or engine dicts
    vae_sd = split_by_prefix(sd, "first_stage_model.") or sd
    return convert_state_dict(vae_sd, convert_vae_key)


def _merge_like(base: Optional[Dict], incoming: Dict) -> Dict:
    """Overlay converted params onto an initialized tree, verifying shapes.

    Missing keys keep their initialized values (reference loads with
    strict=False and reports, vtdm_gen_v01.py:48-56).
    """
    if base is None:
        return incoming
    import flax

    flat_base = flax.traverse_util.flatten_dict(base)
    flat_in = flax.traverse_util.flatten_dict(incoming)
    missing = [k for k in flat_base if k not in flat_in]
    unexpected = [k for k in flat_in if k not in flat_base]
    for k, v in flat_in.items():
        if k in flat_base:
            if tuple(flat_base[k].shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch at {'/'.join(map(str, k))}: "
                    f"init {flat_base[k].shape} vs ckpt {v.shape}"
                )
            flat_base[k] = v.astype(flat_base[k].dtype)
    if missing:
        print(f"[convert] {len(missing)} missing keys (kept init)")
    if unexpected:
        print(f"[convert] {len(unexpected)} unexpected keys (ignored)")
    return flax.traverse_util.unflatten_dict(flat_base)


# --------------------------------------------------------------------------
# DPT (MiDaS dpt_hybrid_384.pt) and standalone tower checkpoints
# --------------------------------------------------------------------------


def convert_dpt_key(key: str) -> Optional[Path]:
    """Map a MiDaS DPT-hybrid state-dict key to hi3d_tpu.models.dpt paths.

    Reference layout: annotator/midas/vit.py:357-495 (pretrained.model =
    timm vit_base_resnet50_384; act_postprocess3/4 = readout+proj;
    scratch.* = reassemble/fusion/head from annotator/midas/blocks.py).
    """
    parts = key.split(".")
    if parts[0] == "pretrained":
        parts = parts[1:]
        if parts[0] == "model":
            parts = parts[1:]
            head = parts[0]
            if head in ("cls_token", "pos_embed"):
                return ("_self_",)
            if head == "norm":
                return None  # final ViT norm feeds the (unused) classifier
            if head == "patch_embed":
                if parts[1] == "proj":
                    return ("patch_proj",)
                # patch_embed.backbone.*
                rest = parts[2:]
                if rest[0] == "stem":
                    if rest[1] == "conv":
                        return ("backbone", "stem_conv")
                    return ("backbone", "stem_norm", _NORM)
                if rest[0] == "stages":
                    s, b = rest[1], rest[3]
                    sub = rest[4:]
                    base = ("backbone", f"stage{s}_block{b}")
                    if sub[0] == "downsample":
                        if sub[1] == "conv":
                            return base + ("downsample_conv",)
                        return base + ("downsample_norm", _NORM)
                    if sub[0].startswith("conv"):
                        return base + (sub[0],)
                    if sub[0].startswith("norm"):
                        return base + (sub[0], _NORM)
                if rest[0] == "norm":
                    return None  # absent in the post-act hybrid
                return None
            if head == "blocks":
                i = parts[1]
                rest = parts[2:]
                base = (f"block{i}",)
                if rest[0] in ("norm1", "norm2"):
                    return base + (rest[0], _NORM_PLAIN)
                if rest[0] == "attn":
                    return base + (f"attn_{rest[1]}",)
                if rest[0] == "mlp":
                    return base + (f"mlp_{rest[1]}",)
            return None
        if parts[0].startswith("act_postprocess"):
            n = parts[0][-1]  # '3' or '4'
            idx = parts[1]
            if idx == "0":  # readout: project.0 Linear
                return (f"post{n}_readout",)
            if idx == "3":
                return (f"post{n}_proj",)
            if idx == "4":
                return (f"post{n}_down",)
            return None
        return None
    if parts[0] == "scratch":
        head = parts[1]
        if head.endswith("_rn"):
            return (head,)
        if head.startswith("refinenet"):
            sub = parts[2]
            if sub == "out_conv":
                return (head, "out_conv")
            if sub.startswith("resConfUnit"):
                # refinenet4 gets no skip input (dpt_depth.py:73: path_4 =
                # refinenet4(layer_4_rn)) so its resConfUnit1 params exist in
                # the torch checkpoint but are never used — drop them
                if head == "refinenet4" and sub == "resConfUnit1":
                    return None
                return (head, f"res_conv_unit{sub[-1]}", parts[3])
            return None
        if head == "output_conv":
            name = {"0": "head_conv1", "2": "head_conv2", "4": "head_conv3"}.get(
                parts[2]
            )
            return (name,) if name else None
    return None


def load_dpt_params(path: str) -> Dict:
    """dpt_hybrid_384.pt → hi3d_tpu.models.dpt.DPTDepthModel params."""
    sd = load_torch_state_dict(path)
    return convert_state_dict(sd, convert_dpt_key)


def load_open_clip_visual(path: str) -> Dict:
    """open_clip_pytorch_model.bin (ViT-H/14) → visual-tower flax params."""
    sd = load_torch_state_dict(path)
    visual = {k: v for k, v in sd.items() if k.startswith("visual.")}
    return convert_state_dict(visual, convert_clip_visual_key)


def load_clip_jit_visual(path: str) -> Dict:
    """OpenAI CLIP ViT-L/14 TorchScript archive (ViT-L-14.pt) → flax params.

    `clip.load` ships a torch.jit archive (vtdm/encoders.py:63); its
    state_dict carries the same `visual.*` names as open_clip.
    """
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = {k: _to_np(v) for k, v in model.state_dict().items()}
    except RuntimeError:
        sd = load_torch_state_dict(path)
    visual = {k: v for k, v in sd.items() if k.startswith("visual.")}
    return convert_state_dict(visual, convert_clip_visual_key)


def load_aesthetic_mlp(path: str) -> Dict:
    """sac+logos+ava1-l14-linearMSE.pth → AestheticMLP params."""
    return convert_aesthetic_mlp(load_torch_state_dict(path))


def convert_clip_text_key(key: str) -> Optional[Path]:
    """Map open_clip TEXT-tower keys onto models.clip.CLIPTextTransformer."""
    parts = key.split(".")
    if parts[0] in ("token_embedding",):
        # embedding weight stays (vocab, width) — not a matmul kernel
        return ("_embed_",)
    if parts[0] in ("positional_embedding", "text_projection"):
        return ("_self_",)
    if parts[0] == "ln_final":
        return ("ln_final", _NORM_PLAIN)
    if parts[0] == "transformer" and parts[1] == "resblocks":
        i = parts[2]
        rest = parts[3:]
        block = f"resblocks_{i}"
        if rest[0] in ("ln_1", "ln_2"):
            return (block, rest[0], _NORM_PLAIN)
        if rest[0] == "attn":
            if rest[1].startswith("in_proj"):
                return (block, "attn", "in_proj")
            return (block, "attn", "out_proj")
        if rest[0] == "mlp":
            return (block, f"mlp_{rest[1]}")
    return None


def load_open_clip_text(path: str) -> Dict:
    """open_clip_pytorch_model.bin → text-tower flax params."""
    sd = load_torch_state_dict(path)
    text = {
        k: v for k, v in sd.items()
        if not k.startswith(("visual.", "logit_scale"))
    }
    converted = convert_state_dict(text, convert_clip_text_key)
    return converted


def load_clip_jit_text(path: str) -> Dict:
    """OpenAI CLIP TorchScript archive (ViT-L-14.pt) → TEXT-tower flax params.

    The jit state dict uses the same top-level text-tower names as open_clip
    (token_embedding / positional_embedding / transformer.resblocks.* /
    ln_final / text_projection), so it shares convert_clip_text_key.
    """
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = {k: _to_np(v) for k, v in model.state_dict().items()}
    except RuntimeError:
        sd = load_torch_state_dict(path)
    drop = ("visual.", "logit_scale", "input_resolution", "context_length",
            "vocab_size")
    text = {k: v for k, v in sd.items() if not k.startswith(drop)}
    return convert_state_dict(text, convert_clip_text_key)


# --------------------------------------------------------------------------
# U²-Net (rembg background-removal weights: u2net.pth / u2netp.pth)
# --------------------------------------------------------------------------

_U2NET_BN_LEAF = {
    "weight": "scale",
    "bias": "bias",
    "running_mean": "mean",
    "running_var": "var",
}


def convert_u2net_sd(sd: Mapping[str, np.ndarray]) -> Dict:
    """xuebinqin/U-2-Net torch state dict → flax params for models.u2net.

    Torch layout: `stage{N}[d].rebnconv{K}[d].{conv_s1,bn_s1}.*`,
    `side{N}.{weight,bias}`, `outconv.{weight,bias}`. BatchNorm running
    stats become FrozenBatchNorm mean/var parameters.
    """
    import flax

    flat: Dict[Path, np.ndarray] = {}
    for k, v in sd.items():
        parts = k.split(".")
        leaf_src = parts[-1]
        if leaf_src == "num_batches_tracked":
            continue
        if parts[0].startswith("side") or parts[0] == "outconv":
            leaf = "kernel" if leaf_src == "weight" else "bias"
            val = v.transpose(2, 3, 1, 0) if v.ndim == 4 else v
            flat[(parts[0], leaf)] = jnp.asarray(val)
            continue
        stage, block, sub = parts[0], parts[1], parts[2]
        if sub == "conv_s1":
            leaf = "kernel" if leaf_src == "weight" else "bias"
            val = v.transpose(2, 3, 1, 0) if v.ndim == 4 else v
            flat[(stage, block, "conv", leaf)] = jnp.asarray(val)
        elif sub == "bn_s1":
            flat[(stage, block, "bn", _U2NET_BN_LEAF[leaf_src])] = jnp.asarray(v)
        else:
            raise KeyError(f"unrecognised u2net key: {k}")
    return {"params": flax.traverse_util.unflatten_dict(flat)}


def load_u2net(path: str) -> Dict:
    """u2net.pth / u2netp.pth → flax params."""
    return convert_u2net_sd(load_torch_state_dict(path))


def _block2d_rest(rest) -> Optional[Path]:
    """One entry of a 2-D UNetModel TimestepEmbedSequential (openaimodel.py
    :472-853): plain ResBlock (no 'spatial' wrapper scope), SpatialTransformer,
    Down/Upsample, or the stem conv."""
    if rest[0] in ("weight", "bias"):
        return ()
    if rest[0] in ("in_layers", "out_layers", "emb_layers", "skip_connection"):
        return _resblock_rest(rest)
    if rest[0] == "op":
        return ("op",)
    if rest[0] == "conv":
        return ("conv",)
    return _transformer_rest(rest)


def convert_unet2d_key(key: str) -> Optional[Path]:
    """Map a torch 2-D UNetModel state-dict key to a flax param path."""
    parts = key.split(".")
    if parts[0] == "time_embed":
        return (f"time_embed_{parts[1]}",)
    if parts[0] == "label_emb":
        if len(parts) >= 3 and parts[1].isdigit():
            return (f"label_emb_{parts[1]}_{parts[2]}",)
        return ("label_emb", "_embed_or_linear_")
    if parts[0] == "out":
        return ("out_0", _NORM) if parts[1] == "0" else ("out_2",)
    if parts[0] in ("input_blocks", "output_blocks", "middle_block"):
        if parts[0] == "middle_block":
            prefix, rest = f"middle_block_{parts[1]}", parts[2:]
        else:
            prefix, rest = f"{parts[0]}_{parts[1]}_{parts[2]}", parts[3:]
        sub = _block2d_rest(rest)
        if sub is None:
            return None
        return (prefix,) + sub
    return None
