"""TrainState and optimizer construction.

Functional parity targets:
- AdamW default optimizer: reference sgm/models/diffusion.py:44-47.
- Selective-parameter training via substring match on parameter names
  (`trained_param_keys`): reference vtdm/vtdm_gen_v01.py:167-201 — 'all'
  trains everything; otherwise a param trains iff any key is a substring of
  its dotted path. Frozen params get zero updates (optax.set_to_zero) so the
  state pytree keeps a single structure (simpler sharding than torch's
  param-group lists).
- LR scaling (lr = base_lr · world · accum · bs) happens in the Trainer
  (reference train_ddp_spawn.py:401-409), not here.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct, traverse_util


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, use_ema: bool = False):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            # real copies — aliasing params would break buffer donation
            ema_params=(
                jax.tree.map(lambda p: jnp.array(p, copy=True), params)
                if use_ema
                else None
            ),
        )


def trainable_mask(params, trained_param_keys: Sequence[str]):
    """Bool pytree: True where the dotted param path matches any key.

    Reference semantics (vtdm_gen_v01.py:169-182): 'all' → everything; else
    substring containment against torch-style names. Our flax paths differ
    from torch names, so matching runs against the flax path joined with '.'
    AND with '_' segments normalized (e.g. `time_stack`, `emb_layers`,
    `label_emb_0_0` remain matchable by the reference's documented keys
    `.time_stack.`, `.emb_layers.`, `label_emb.0.0.weight`).
    """
    keys = list(trained_param_keys)
    if "all" in keys:
        return jax.tree.map(lambda _: True, params)

    norm_keys = set()
    for k in keys:
        # reference keys address the torch tree ("model.diffusion_model.
        # label_emb.0.0.weight", inference-v01.yaml:9-13); the flax tree has
        # no such prefix — strip it so those keys match
        for pre in ("model.diffusion_model.", "diffusion_model.", "module."):
            if k.startswith(pre):
                k = k[len(pre):]
        nk = k.replace(".", "_").strip("_")
        norm_keys.add(nk)
        # torch leaf names → flax leaf names (a key naming `.weight` must
        # match ONLY the kernel — the reference's substring match would not
        # catch the layer's bias)
        norm_keys.add(nk.replace("weight", "kernel"))
    flat = traverse_util.flatten_dict(params, sep=".")
    out = {}
    for path, leaf in flat.items():
        norm_path = path.replace(".", "_")
        out[path] = any(k in norm_path for k in norm_keys)
    return traverse_util.unflatten_dict(out, sep=".")


def freeze_frozen(params, trained_param_keys: Sequence[str]):
    """stop_gradient on non-trainable leaves — reference `requires_grad=False`
    parity (vtdm_gen_v01.py:183-188 freezes params instead of masking their
    updates). Without this, autodiff computes a FULL fp32 gradient tree and
    the backward of every frozen block before the optimizer mask discards
    them — ~2× wasted backward FLOPs and +6 GB transient HBM for the
    SVD-adaptation subset at flagship size. XLA prunes the frozen backward
    entirely once the leaves are stop_gradient'ed."""
    if "all" in trained_param_keys:
        return params
    mask = trainable_mask(params, trained_param_keys)
    return jax.tree.map(
        lambda p, m: p if m else jax.lax.stop_gradient(p), params, mask
    )


def build_optimizer(
    learning_rate: float,
    params=None,
    trained_param_keys: Sequence[str] = ("all",),
    scheduler: Optional[Any] = None,
    weight_decay: float = 1e-2,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """AdamW (torch-default hyperparams) + optional LR-multiplier schedule.

    `scheduler` is one of hi3d_tpu.training.schedules (provides .as_optax),
    an optax schedule callable, or None (constant LR).
    """
    if scheduler is None:
        lr = learning_rate
    elif hasattr(scheduler, "as_optax"):
        lr = scheduler.as_optax(learning_rate)
    else:
        sched = scheduler
        lr = lambda step: learning_rate * sched(step)

    tx = optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)

    if "all" not in trained_param_keys:
        if params is None:
            raise ValueError("selective training needs `params` for the mask")
        mask = trainable_mask(params, trained_param_keys)
        # string labels, not bools: jax.export (the disk program cache)
        # serializes only string-keyed dicts, and the labels land in the
        # MultiTransformState.inner_states keys of every train-step program
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda b: "train" if b else "freeze", mask),
        )
    return tx
