"""Checkpoint surgery: adapt an SVD image-to-video checkpoint into the
stage-2 vid2vid initialization.

Functional parity: reference tool_make_init_svd_to_vid2vid.py —
- `label_emb.0.0.weight` (·, 768) → (·, 512): zero the first 256 columns
  (the new elevation slot), keep columns 512: (the cond_aug slot) (:42-48);
- `diffusion_model.input_blocks.0.0.weight` (·, 8, 3, 3) → (·, 17, 3, 3):
  [latent 4ch, 9 zero depth channels, original 4 concat channels] (:50-56);
- every other matching key copies through; keys the checkpoint lacks stay at
  their fresh initialization (our init_from_ckpt merges with strict=False).

Operates directly on the torch-layout safetensors so the output loads into
BOTH this framework (via the converter) and the reference.

Usage: python tools/make_init_svd_to_vid2vid.py <svd.safetensors> <out.safetensors>
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np


def surgery(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, w in sd.items():
        w = np.asarray(w)
        if "label_emb.0.0.weight" in k:
            assert w.shape[1] == 768, w.shape
            w = np.concatenate(
                [np.zeros_like(w[:, :256]), w[:, 512:]], axis=1
            )
        if "diffusion_model.input_blocks.0.0.weight" in k:
            assert w.shape[1] == 8, w.shape
            pieces = [w[:, :4]]
            pieces.extend(np.zeros_like(w[:, :3]) for _ in range(3))
            pieces.append(w[:, 4:])
            w = np.concatenate(pieces, axis=1)
        out[k] = w
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", help="svd_xt_image_decoder.safetensors")
    p.add_argument("output", help="adapted vid2vid safetensors")
    args = p.parse_args(argv)
    assert os.path.exists(args.input), "input model does not exist"
    assert not os.path.exists(args.output), "output filename already exists"

    from safetensors.numpy import save_file

    from hi3d_tpu.convert.torch_to_jax import load_torch_state_dict

    sd = load_torch_state_dict(args.input)
    out = surgery(sd)
    save_file(out, args.output)
    print(f"wrote {args.output} ({len(out)} tensors)")


if __name__ == "__main__":
    main()
