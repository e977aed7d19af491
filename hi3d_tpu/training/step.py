"""The pjit-sharded training step.

Replaces the reference's Lightning `training_step` + DeepSpeed ZeRO-2 engine
(sgm/models/diffusion.py:165-187, vtdm/vtdm_gen_v01.py:78-88,
configs/train-v01.yaml:178) with one jitted, donated, mesh-sharded function:

    state, metrics = train_step(state, batch, rng)

- batch (video) axis sharded over the mesh "data" axis (DDP parity);
- params replicated, gradients psum'd by XLA;
- optimizer state sharded over "data" (ZeRO-2 parity) — XLA reduce-scatters
  grads into the shard owners and all-gathers the param update;
- optional gradient accumulation as a `lax.scan` over microbatches
  (Lightning `accumulate_grad_batches` parity, train_ddp_spawn.py:395-400);
- EMA update fused into the same program (sgm/modules/ema.py parity).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import (
    batch_sharding,
    named_shardings,
    replicated,
    zero_partition_spec,
)
from .ema import ema_update
from .state import TrainState


def make_train_step(
    loss_fn: Callable[..., jax.Array],
    tx: optax.GradientTransformation,
    mesh=None,
    ema_decay: Optional[float] = None,
    accum_steps: int = 1,
    donate: bool = True,
    param_sharding: str = "replicated",
):
    """Build the jitted train step.

    loss_fn(params, batch, rng) -> scalar loss. `batch` is a pytree whose
    leaves all have a leading (global) batch axis; it is sharded over "data".

    param_sharding: "replicated" (DDP/ZeRO-2 parity — params live on every
    chip, only optimizer state shards) or "fsdp" (ZeRO-3/FSDP-style — params
    and EMA shard over "data" like the optimizer state; XLA inserts the
    all-gathers at use and reduce-scatters of grads automatically — the
    TPU-native form of the reference's commented-out FSDP experiment,
    train_ddp_spawn.py:22-23,146-148)."""
    if param_sharding not in ("replicated", "fsdp"):
        raise ValueError(f"param_sharding {param_sharding!r}")

    def microbatch_grads(params, batch, rng):
        if accum_steps == 1:
            return jax.value_and_grad(loss_fn)(params, batch, rng)

        def slice_micro(i, leaf):
            m = leaf.shape[0] // accum_steps
            return jax.lax.dynamic_slice_in_dim(leaf, i * m, m, axis=0)

        def body(carry, i):
            loss_acc, grads_acc = carry
            micro = jax.tree.map(functools.partial(slice_micro, i), batch)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, micro, jax.random.fold_in(rng, i)
            )
            return (
                loss_acc + loss,
                jax.tree.map(jnp.add, grads_acc, grads),
            ), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        (loss, grads), _ = jax.lax.scan(
            body, (jnp.float32(0.0), zeros), jnp.arange(accum_steps)
        )
        scale = 1.0 / accum_steps
        return loss * scale, jax.tree.map(lambda g: g * scale, grads)

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = microbatch_grads(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_step = state.step + 1
        ema_params = state.ema_params
        if ema_params is not None:
            ema_params = ema_update(
                ema_params, params, new_step, decay=ema_decay or 0.9999
            )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return (
            state.replace(
                step=new_step,
                params=params,
                opt_state=opt_state,
                ema_params=ema_params,
            ),
            metrics,
        )

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    def shard_state_like(state: TrainState) -> TrainState:
        rep = replicated(mesh)
        if param_sharding == "fsdp":
            param_sh = named_shardings(
                zero_partition_spec(state.params, mesh), mesh
            )
        else:
            param_sh = jax.tree.map(lambda _: rep, state.params)
        return TrainState(
            step=rep,
            params=param_sh,
            opt_state=named_shardings(
                zero_partition_spec(state.opt_state, mesh), mesh
            ),
            ema_params=(
                None
                if state.ema_params is None
                else (
                    named_shardings(
                        zero_partition_spec(state.ema_params, mesh), mesh
                    )
                    if param_sharding == "fsdp"
                    else jax.tree.map(lambda _: rep, state.ema_params)
                )
            ),
        )

    def jit_for(state: TrainState, batch):
        """Compile with shardings inferred from this state/batch structure."""
        state_sh = shard_state_like(state)
        batch_sh = jax.tree.map(
            lambda leaf: (
                batch_sharding(mesh, jnp.ndim(leaf))
                if jnp.ndim(leaf) >= 1
                else replicated(mesh)
            ),
            batch,
        )
        return jax.jit(
            train_step,
            in_shardings=(state_sh, batch_sh, replicated(mesh)),
            out_shardings=(state_sh, replicated(mesh)),
            donate_argnums=(0,) if donate else (),
        )

    return jit_for


def place_state(
    state: TrainState, mesh, param_sharding: str = "replicated"
) -> TrainState:
    """Device-put a host TrainState onto the mesh with ZeRO sharding
    (params/EMA also shard when param_sharding="fsdp")."""
    rep = replicated(mesh)

    def put_sharded(tree):
        return jax.tree.map(
            lambda leaf, sh: jax.device_put(leaf, sh),
            tree,
            named_shardings(zero_partition_spec(tree, mesh), mesh),
        )

    fsdp = param_sharding == "fsdp"
    return TrainState(
        step=jax.device_put(state.step, rep),
        params=(
            put_sharded(state.params)
            if fsdp
            else jax.device_put(state.params, rep)
        ),
        opt_state=put_sharded(state.opt_state),
        ema_params=(
            None
            if state.ema_params is None
            else (
                put_sharded(state.ema_params)
                if fsdp
                else jax.device_put(state.ema_params, rep)
            )
        ),
    )
