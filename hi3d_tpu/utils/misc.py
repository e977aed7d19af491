"""Small tensor/pytree helpers.

Functional parity targets: reference sgm/util.py (append_dims :197-204,
append_zero :191-194, default :145-150, count_params :153-158,
expand_dims_like :117-120) — re-expressed for JAX arrays.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


def default(val: Optional[Any], d: Any) -> Any:
    """Return `val` unless it is None, else `d` (calling it if callable)."""
    if val is not None:
        return val
    return d() if callable(d) else d


def append_dims(x: jax.Array, target_ndim: int) -> jax.Array:
    """Append trailing size-1 dims until `x.ndim == target_ndim`."""
    dims_to_append = target_ndim - x.ndim
    if dims_to_append < 0:
        raise ValueError(
            f"input has {x.ndim} dims but target_ndim is {target_ndim}, which is less"
        )
    return x[(...,) + (None,) * dims_to_append]


def expand_dims_like(x: jax.Array, y: jax.Array) -> jax.Array:
    """Append trailing size-1 dims to `x` until it has `y.ndim` dims."""
    return append_dims(x, y.ndim)


def append_zero(x: jax.Array) -> jax.Array:
    """Concatenate a single zero onto the end of a 1-D array (σ-schedule tail)."""
    return jnp.concatenate([x, jnp.zeros((1,), dtype=x.dtype)])


class Identity:
    """No-op placeholder (stands in for `torch.nn.Identity` loss configs)."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, x, *args, **kwargs):
        return x


def count_params(params) -> int:
    """Total number of scalar parameters in a pytree."""
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def instance_cache(owner, key, factory):
    """Memoize `factory()` on `owner` under `key` (one `_misc_cache` dict per
    instance). Shared idiom for per-instance jitted callables and
    param-threaded closures — tower forwards, VAE appliers, sampler segment
    runners, blend runners — so cache policy lives in one place."""
    cache = owner.__dict__.setdefault("_misc_cache", {})
    if key not in cache:
        cache[key] = factory()
    return cache[key]


def instance_jit(owner, key, fn, program_key=None):
    """`jax.jit(fn)` cached on `owner` under `key` (see instance_cache).

    With `program_key` (a stable string identity of the traced graph, e.g. a
    flax module repr), the traced program is additionally disk-cached via
    utils.program_cache — fresh processes deserialize instead of re-tracing.
    """
    import jax

    if program_key is not None:
        from .program_cache import program_jit

        return instance_cache(
            owner,
            key,
            lambda: program_jit(
                fn,
                name=f"{type(owner).__name__}.{key}",
                extra_key=program_key,
            ),
        )
    return instance_cache(owner, key, lambda: jax.jit(fn))


class PhaseTimer:
    """Opt-in pipeline phase breakdown (HI3D_TIME_PHASES=1).

    Device work is async: a phase only owns its time if we block on its
    outputs at the boundary, so `mark` takes the arrays to wait on. When
    disabled (default) `mark` neither blocks nor records — zero overhead
    and no extra host↔device syncs in production runs."""

    def __init__(self, label: str):
        import os
        import time as _time

        self.enabled = os.environ.get("HI3D_TIME_PHASES", "") not in ("", "0")
        self.label = label
        self._time = _time
        self._t = _time.perf_counter() if self.enabled else 0.0
        self.rows = []

    def mark(self, name: str, block=None) -> None:
        if not self.enabled:
            return
        import sys

        import jax

        if block is not None:
            jax.block_until_ready(block)
        now = self._time.perf_counter()
        self.rows.append((name, now - self._t))
        # stream each phase to stderr as it completes: when a parent
        # timeout-kills this process mid-pipeline, the lines emitted so far
        # are the diagnosis (bench.py attaches them to the skipped entry —
        # a hang shows WHERE, an overrun shows the phase that blew the budget)
        print(f"[phase:{self.label}] {name} {now - self._t:.2f}s",
              file=sys.stderr, flush=True)
        self._t = now

    def report(self) -> None:
        if not self.enabled or not self.rows:
            return
        total = sum(dt for _, dt in self.rows)
        print(f"[phases:{self.label}] total {total:.2f}s — " + ", ".join(
            f"{name} {dt:.2f}s" for name, dt in self.rows
        ))


def zero_init_enabled() -> bool:
    """True when HI3D_ZERO_INIT=1: module inits return zero-filled params via
    eval_shape instead of running the real RNG initializers. Used when the
    values are about to be overwritten anyway (checkpoint overlay — the
    reference CLIs also discard init values, pipeline_i2v_eval_v01.py:50-52)
    or when only kernel timing matters (bench.py). Cuts the measured
    96 s + 67 s (stage-1 build+init) of tower/UNet init compile+run out of
    the cold start."""
    import os

    return os.environ.get("HI3D_ZERO_INIT", "0") == "1"


def module_init(init_fn, rng, *args, **kwargs):
    """jit(init_fn)(rng, *args) — or one zero-fill program when
    zero_init_enabled(). Zeros come from a SINGLE jitted program: a per-leaf
    eager jnp.zeros would be ~1,000 dispatches through the TPU tunnel.
    Real-init programs are disk-cached when the module identity is derivable
    (bound-method init of a flax module; utils/program_cache.py)."""
    if not zero_init_enabled():
        f = getattr(init_fn, "func", init_fn)  # unwrap functools.partial
        owner = getattr(f, "__self__", None)
        if owner is not None:
            from .program_cache import flax_module_key, program_jit

            statics = repr(sorted(getattr(init_fn, "keywords", {}).items()))
            names = sorted(kwargs)

            def call(rng, pos, kwvals):
                return init_fn(rng, *pos, **dict(zip(names, kwvals)))

            return program_jit(
                call,
                name=f"init_{type(owner).__name__}",
                extra_key=flax_module_key(owner) + statics + repr(names),
            )(rng, tuple(args), tuple(kwargs[n] for n in names))
        return jax.jit(init_fn)(rng, *args, **kwargs)
    shapes = jax.eval_shape(init_fn, rng, *args, **kwargs)

    @jax.jit
    def zeros():
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    return zeros()


def enable_persistent_compilation_cache() -> None:
    """Apply the package-owned persistent-compile-cache config.

    Single owner for the whole repo (package import, CLIs, bench tools all
    route here): dir = HI3D_COMP_CACHE_DIR (default ~/.cache/hi3d_tpu_xla),
    min-compile-time 0.5 s. Through the tunneled TPU every compile — even a
    trivial broadcast — costs ~0.5 s of server RPC, and a fresh process
    dispatches dozens of 0.5-5 s mid-size graphs (tower subgraphs, eager
    pipeline ops) that the old 5 s threshold silently re-paid every run
    (round-5 cache-probe measurement, BASELINE.md). Disk cost is a few KB
    per entry. HI3D_COMP_CACHE=0 disables entirely, including when called
    after import (so the test conftest stays the owner of its own
    aggressive CPU cache). Idempotent.
    """
    import os

    import jax

    if os.environ.get("HI3D_COMP_CACHE", "1") == "0":
        return
    path = os.environ.get(
        "HI3D_COMP_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "hi3d_tpu_xla"),
    )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
