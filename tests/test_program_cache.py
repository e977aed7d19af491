"""Disk program cache (utils/program_cache): blob round-trips, the AOT
entry bench.py uses, and export-serialization of the training pytrees.

These are the mechanisms behind the round-3/4 cold-start fix (fresh-process
trace 48 s → 3.3 s deserialize, BASELINE.md) and the round-4 bench rework —
a driver bench run must deserialize, not re-trace (VERDICT r3 #1a).
"""

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hi3d_tpu.utils import program_cache as pc


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    d = str(tmp_path / "programs")
    monkeypatch.setenv("HI3D_PROGRAM_CACHE_DIR", d)
    monkeypatch.setenv("HI3D_PROGRAM_CACHE", "1")
    return d


def _fn(x, y):
    return jnp.sin(x) @ y + 1.0


ARGS = (
    jnp.arange(12.0, dtype=jnp.float32).reshape(3, 4),
    jnp.ones((4, 2), jnp.float32),
)


def test_program_jit_blob_roundtrip(cache_dir):
    ref = jax.jit(_fn)(*ARGS)
    out1 = pc.program_jit(_fn, "t_roundtrip", extra_key="k")(*ARGS)
    blobs = glob.glob(os.path.join(cache_dir, "t_roundtrip-*.jaxprog"))
    assert len(blobs) == 1, "export blob not written"
    # fresh wrapper (new process analog): must READ the blob, not re-export
    mtime = os.path.getmtime(blobs[0])
    out2 = pc.program_jit(_fn, "t_roundtrip", extra_key="k")(*ARGS)
    assert os.path.getmtime(blobs[0]) == mtime, "blob rewritten on reuse"
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), rtol=1e-6)


def test_aot_compile_writes_and_reuses_blob(cache_dir):
    ref = jax.jit(_fn)(*ARGS)
    c1 = pc.aot_compile(jax.jit(_fn), "t_aot", "k", ARGS)
    blobs = glob.glob(os.path.join(cache_dir, "t_aot-*.jaxprog"))
    assert len(blobs) == 1
    np.testing.assert_allclose(np.asarray(c1(*ARGS)), np.asarray(ref),
                               rtol=1e-6)
    # second AOT must deserialize: poison export to prove the path taken
    import jax.export as jexport

    real_export = jexport.export
    try:
        jexport.export = None  # any re-export attempt would raise TypeError
        c2 = pc.aot_compile(jax.jit(_fn), "t_aot", "k", ARGS)
    finally:
        jexport.export = real_export
    np.testing.assert_allclose(np.asarray(c2(*ARGS)), np.asarray(ref),
                               rtol=1e-6)
    # cost analysis works through the deserialized program (bench MFU field)
    assert c2.cost_analysis() is not None


def test_aot_compile_key_separates_extra(cache_dir):
    pc.aot_compile(jax.jit(_fn), "t_key", ("a",), ARGS)
    pc.aot_compile(jax.jit(_fn), "t_key", ("b",), ARGS)
    assert len(glob.glob(os.path.join(cache_dir, "t_key-*.jaxprog"))) == 2


def test_aot_compile_trainstate_opt_state_serializes(cache_dir):
    """The bench train step's (TrainState, batch, rng) signature must export:
    optax namedtuple states and the flax TrainState dataclass are registered
    lazily (_register_export_types). A missing registration silently turns
    every fresh-process bench train into a full re-trace (round-3 failure
    mode), so the blob's existence IS the assertion."""
    from hi3d_tpu.training.state import TrainState, build_optimizer

    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
    tx = build_optimizer(1e-3, params, trained_param_keys=("kernel",))
    state = TrainState.create(params, tx, use_ema=True)

    def step(state, x):
        loss = jnp.sum(state.params["dense"]["kernel"] * x)
        return state.replace(step=state.step + 1), loss

    x = jnp.ones((4, 4))
    compiled = pc.aot_compile(jax.jit(step), "t_train", "k", (state, x))
    blobs = glob.glob(os.path.join(cache_dir, "t_train-*.jaxprog"))
    assert len(blobs) == 1, (
        "train-state program did not export — optax/TrainState "
        "serialization registration regressed"
    )
    new_state, loss = compiled(state, x)
    assert int(new_state.step) == 1
    assert float(loss) == 16.0
    assert not glob.glob(os.path.join(cache_dir, "*.tmp.*")), (
        "stale tmp blob left behind"
    )


def test_aot_compile_falls_back_on_unserializable(cache_dir):
    """A pytree type with no registered serialization must degrade to plain
    lower+compile — never an exception, never a stale tmp file."""
    import jax.tree_util as jtu

    class Weird:
        def __init__(self, a):
            self.a = a

    jtu.register_pytree_node(
        Weird, lambda w: ((w.a,), None), lambda _, c: Weird(c[0])
    )

    def g(w):
        return w.a * 2.0

    compiled = pc.aot_compile(jax.jit(g), "t_weird", "k", (Weird(jnp.ones(3)),))
    np.testing.assert_allclose(
        np.asarray(compiled(Weird(jnp.ones(3)))), 2.0 * np.ones(3)
    )
    assert not glob.glob(os.path.join(cache_dir, "t_weird-*.jaxprog"))
    assert not glob.glob(os.path.join(cache_dir, "*.tmp.*"))


def test_disabled_env_bypasses_disk(cache_dir, monkeypatch):
    monkeypatch.setenv("HI3D_PROGRAM_CACHE", "0")
    out = pc.program_jit(_fn, "t_off", extra_key="k")(*ARGS)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jax.jit(_fn)(*ARGS)), rtol=1e-6
    )
    assert not glob.glob(os.path.join(cache_dir, "t_off-*"))
    c = pc.aot_compile(jax.jit(_fn), "t_off_aot", "k", ARGS)
    np.testing.assert_allclose(
        np.asarray(c(*ARGS)), np.asarray(jax.jit(_fn)(*ARGS)), rtol=1e-6
    )
    assert not glob.glob(os.path.join(cache_dir, "t_off_aot-*"))
