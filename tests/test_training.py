"""Training layer: LR schedules (golden vs reference formulas), trainable
masks, EMA, and the mesh-sharded ZeRO train step on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from hi3d_tpu.parallel.mesh import make_mesh, zero_partition_spec
from hi3d_tpu.training.ema import ema_update
from hi3d_tpu.training.schedules import (
    LambdaLinearScheduler,
    LambdaWarmUpCosineScheduler,
    LambdaWarmUpCosineScheduler2,
)
from hi3d_tpu.training.state import TrainState, build_optimizer, trainable_mask
from hi3d_tpu.training.step import make_train_step, place_state


# --------------------------------------------------------------- schedules
def _ref_lambda_linear(n, wu, fmin, fmax, fstart, clen):
    """Reference sgm/lr_scheduler.py:117-135, single cycle."""
    if n < wu:
        return (fmax - fstart) / wu * n + fstart
    return fmin + (fmax - fmin) * (clen - n) / clen


def test_lambda_linear_matches_reference_formula():
    s = LambdaLinearScheduler(
        warm_up_steps=[1000], f_min=[1.0], f_max=[1.0], f_start=[1e-6],
        cycle_lengths=[10000000000000],
    )  # the SVD/Hi3D-style config
    for n in [0, 1, 500, 999, 1000, 5000, 100000]:
        assert s(n) == pytest.approx(
            _ref_lambda_linear(n, 1000, 1.0, 1.0, 1e-6, 10000000000000)
        )


def test_lambda_linear_optax_matches_host():
    s = LambdaLinearScheduler(
        warm_up_steps=[100, 50], f_min=[0.1, 0.0], f_max=[1.0, 0.5],
        f_start=[0.01, 0.0], cycle_lengths=[1000, 2000],
    )
    opt = s.as_optax(base_lr=2.0)
    for n in [0, 10, 99, 100, 500, 999, 1001, 1500, 2500]:
        assert float(opt(n)) == pytest.approx(2.0 * s(n), rel=1e-5)


def test_warmup_cosine_multicycle_optax_matches_host():
    s = LambdaWarmUpCosineScheduler2(
        warm_up_steps=[10, 10], f_min=[0.0, 0.0], f_max=[1.0, 0.5],
        f_start=[0.0, 0.0], cycle_lengths=[100, 100],
    )
    for n in [0, 5, 10, 50, 99, 101, 150, 199]:
        assert float(s.as_optax()(n)) == pytest.approx(s(n), rel=1e-5, abs=1e-7)


def test_warmup_cosine_single():
    s = LambdaWarmUpCosineScheduler(
        warm_up_steps=10, lr_min=0.1, lr_max=1.0, lr_start=0.0, max_decay_steps=100
    )
    assert s(0) == 0.0
    assert s(10) == pytest.approx(1.0)
    assert s(100) == pytest.approx(0.1)
    assert float(s.as_optax()(55)) == pytest.approx(s(55), rel=1e-5)


# ------------------------------------------------------------------- masks
def test_trainable_mask_all():
    params = {"params": {"a": {"kernel": jnp.ones((2, 2))}}}
    mask = trainable_mask(params, ["all"])
    assert all(jax.tree.leaves(mask))


def test_trainable_mask_substring_matches_reference_keys():
    # reference inference-v01.yaml:9-13 documents the SVD-adaptation subset
    params = {
        "params": {
            "input_blocks_1_0": {
                "time_stack": {"in_layers_2": {"kernel": 1.0}},
                "spatial": {"emb_layers_1": {"kernel": 1.0}},
            },
            "label_emb_0_0": {"kernel": 1.0},
            "out_2": {"kernel": 1.0},
        }
    }
    mask = trainable_mask(
        params, ["label_emb.0.0.weight", ".emb_layers.", ".time_stack."]
    )
    from flax import traverse_util

    flat = traverse_util.flatten_dict(mask, sep=".")
    assert flat["params.input_blocks_1_0.time_stack.in_layers_2.kernel"]
    assert flat["params.input_blocks_1_0.spatial.emb_layers_1.kernel"]
    assert flat["params.label_emb_0_0.kernel"]
    assert not flat["params.out_2.kernel"]


def test_selective_optimizer_freezes_unmatched():
    params = {
        "train_me": jnp.ones((4,)),
        "frozen": jnp.ones((4,)),
    }
    tx = build_optimizer(1e-2, params, trained_param_keys=["train_me"])
    state = tx.init(params)
    grads = {"train_me": jnp.ones((4,)), "frozen": jnp.ones((4,))}
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["frozen"]).max()) == 0.0
    assert float(jnp.abs(updates["train_me"]).max()) > 0.0


# --------------------------------------------------------------------- ema
def test_ema_warmup_decay():
    # reference sgm/modules/ema.py:31-42: d = min(decay, (1+n)/(10+n))
    ema = {"w": jnp.zeros((3,))}
    params = {"w": jnp.ones((3,))}
    out = ema_update(ema, params, num_updates=1, decay=0.9999)
    d = 2.0 / 11.0
    np.testing.assert_allclose(out["w"], (1 - d) * 1.0, rtol=1e-6)
    out2 = ema_update(ema, params, num_updates=10**9, decay=0.9999)
    np.testing.assert_allclose(out2["w"], (1 - 0.9999) * 1.0, rtol=1e-3)


# ------------------------------------------------------------- ZeRO / step
def test_zero_partition_spec_prefers_largest_divisible_axis():
    mesh = make_mesh(data=8)
    tree = {
        "big": jnp.zeros((3, 16)),     # 16 % 8 == 0 → shard axis 1
        "odd": jnp.zeros((3, 5)),      # nothing divisible → replicated
        "scalar": jnp.zeros(()),
    }
    specs = zero_partition_spec(tree, mesh)
    assert specs["big"] == jax.sharding.PartitionSpec(None, "data")
    assert specs["odd"] == jax.sharding.PartitionSpec()
    assert specs["scalar"] == jax.sharding.PartitionSpec()


def test_sharded_train_step_matches_single_device():
    """ZeRO-sharded 8-device step == unsharded step (same grads/update)."""
    mesh = make_mesh(data=8)

    def mlp(params, x):
        h = jnp.tanh(x @ params["w1"])
        return h @ params["w2"]

    def loss_fn(params, batch, rng):
        pred = mlp(params, batch["x"])
        return jnp.mean((pred - batch["y"]) ** 2)

    k = jax.random.PRNGKey(0)
    params = {
        "w1": jax.random.normal(k, (16, 32)) * 0.1,
        "w2": jax.random.normal(jax.random.fold_in(k, 1), (32, 8)) * 0.1,
    }
    batch = {
        "x": jax.random.normal(jax.random.fold_in(k, 2), (16, 16)),
        "y": jax.random.normal(jax.random.fold_in(k, 3), (16, 8)),
    }
    tx = build_optimizer(1e-2, params)

    # single-device
    st1 = TrainState.create(params, tx, use_ema=True)
    step1 = make_train_step(loss_fn, tx, mesh=None, ema_decay=0.9999, donate=False)
    st1b, m1 = step1(st1, batch, jax.random.PRNGKey(7))

    # 8-device ZeRO
    st8 = place_state(TrainState.create(params, tx, use_ema=True), mesh)
    step8 = make_train_step(loss_fn, tx, mesh=mesh, ema_decay=0.9999, donate=False)(
        st8, batch
    )
    st8b, m8 = step8(st8, batch, jax.random.PRNGKey(7))

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(st1b.params), jax.tree.leaves(st8b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)
    for a, b in zip(
        jax.tree.leaves(st1b.ema_params), jax.tree.leaves(st8b.ema_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)
    assert int(st8b.step) == 1


def test_grad_accumulation_matches_full_batch():
    def loss_fn(params, batch, rng):
        pred = batch["x"] @ params["w"]
        return jnp.mean((pred - batch["y"]) ** 2)

    k = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(k, (8, 4)) * 0.1}
    batch = {
        "x": jax.random.normal(jax.random.fold_in(k, 1), (16, 8)),
        "y": jax.random.normal(jax.random.fold_in(k, 2), (16, 4)),
    }
    tx = optax.sgd(1e-1)
    st = TrainState.create(params, tx)
    full = make_train_step(loss_fn, tx, donate=False)
    acc = make_train_step(loss_fn, tx, accum_steps=4, donate=False)
    stf, mf = full(st, batch, jax.random.PRNGKey(0))
    sta, ma = acc(st, batch, jax.random.PRNGKey(0))
    # microbatch-mean of means == full mean for equal microbatch sizes
    assert float(mf["loss"]) == pytest.approx(float(ma["loss"]), rel=1e-6)
    np.testing.assert_allclose(
        np.asarray(stf.params["w"]), np.asarray(sta.params["w"]), rtol=1e-5
    )


def test_fsdp_param_sharding_matches_replicated():
    """param_sharding='fsdp' (ZeRO-3 style) computes the same step as
    replicated DDP and actually shards the params over the mesh."""
    def loss_fn(params, batch, rng):
        pred = jnp.tanh(batch["x"] @ params["w1"]) @ params["w2"]
        return jnp.mean((pred - batch["y"]) ** 2)

    mesh = make_mesh(data=8)
    k = jax.random.PRNGKey(0)
    params = {
        "w1": jax.random.normal(k, (16, 32)) * 0.1,
        "w2": jax.random.normal(jax.random.fold_in(k, 1), (32, 8)) * 0.1,
    }
    batch = {
        "x": jax.random.normal(jax.random.fold_in(k, 2), (16, 16)),
        "y": jax.random.normal(jax.random.fold_in(k, 3), (16, 8)),
    }
    tx = build_optimizer(1e-2, params)

    st1 = TrainState.create(params, tx, use_ema=True)
    step1 = make_train_step(loss_fn, tx, mesh=None, ema_decay=0.9999, donate=False)
    st1b, m1 = step1(st1, batch, jax.random.PRNGKey(7))

    stf = place_state(
        TrainState.create(params, tx, use_ema=True), mesh,
        param_sharding="fsdp",
    )
    stepf = make_train_step(
        loss_fn, tx, mesh=mesh, ema_decay=0.9999, donate=False,
        param_sharding="fsdp",
    )(stf, batch)
    stfb, mf = stepf(stf, batch, jax.random.PRNGKey(7))

    assert float(m1["loss"]) == pytest.approx(float(mf["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(st1b.params), jax.tree.leaves(stfb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-6)
    # params are genuinely distributed: each leaf sharded over 8 devices
    for leaf in jax.tree.leaves(stfb.params):
        assert len(leaf.sharding.device_set) == 8
        assert not leaf.sharding.is_fully_replicated


def test_trainable_mask_matches_shipped_reference_keys():
    """The reference's documented SVD-adaptation subset uses torch-tree keys
    with a 'model.diffusion_model.' prefix (inference-v01.yaml:9-13); the
    flax tree has no such prefix — the mask must still match."""
    import jax.numpy as jnp

    from hi3d_tpu.training.state import trainable_mask

    params = {"params": {
        "label_emb_0_0": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros(4)},
        "input_blocks_1_0": {
            "spatial": {"emb_layers_1": {"kernel": jnp.zeros((4, 4))}},
            "time_stack": {"in_layers_2": {"kernel": jnp.zeros((4, 4))}},
        },
        "out_2": {"kernel": jnp.zeros((4, 4))},
    }}
    keys = ("model.diffusion_model.label_emb.0.0.weight",
            ".emb_layers.", ".time_stack.")
    import flax

    mask = flax.traverse_util.flatten_dict(
        trainable_mask(params, keys), sep="."
    )
    assert mask["params.label_emb_0_0.kernel"]
    assert mask["params.input_blocks_1_0.spatial.emb_layers_1.kernel"]
    assert mask["params.input_blocks_1_0.time_stack.in_layers_2.kernel"]
    assert not mask["params.out_2.kernel"]
    # bias of label_emb_0_0: the reference key names only the weight
    assert not mask["params.label_emb_0_0.bias"]
