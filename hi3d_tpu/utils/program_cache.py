"""Disk cache of traced+lowered XLA programs via jax.export.

The persistent XLA compilation cache removes *compile* time, but a fresh
process still pays Python tracing + StableHLO lowering for every big jit —
measured on the flagship stage-1 denoise step: 34 s trace+lower + 14 s
cached-compile per process, vs 0.14 s deserialize + 0.6 s lower + 2.5 s
cached-compile through a serialized jax.export blob (bit-identical outputs;
tools/proto_export_cache.py). Cold starts are trace-dominated
(BASELINE.md round-3 cold-start table), so this cache is the structural fix.

Correctness model — a cached program is reused only when ALL of these match:
- the content hash of every hi3d_tpu/*.py source file (any code change
  invalidates every entry),
- jax version and backend platform,
- every HI3D_* env flag that can change a traced graph (kernel variants,
  norm backends, remat policy, ...),
- the caller-supplied `extra_key` (model/sampler config reprs — flax module
  dataclass reprs are deterministic and complete),
- the pytree structure and avals (shape/dtype) of the call arguments.

If any step fails (export unsupported, stale blob, version skew) the call
falls back to plain jax.jit — the cache can only make things faster, never
wrong or fatal. Opt out entirely with HI3D_PROGRAM_CACHE=0.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Optional, Tuple

import jax

# env flags that do NOT affect traced graphs — everything else HI3D_* is
# conservatively part of the cache key
_ENV_IGNORE = {
    "HI3D_PROGRAM_CACHE",
    "HI3D_PROGRAM_CACHE_DIR",
    "HI3D_PROGRAM_CACHE_FORCE",  # selects the blob POLICY, not the graph
    "HI3D_COMP_CACHE",
    "HI3D_COMP_CACHE_DIR",
    "HI3D_TIME_PHASES",
    "HI3D_BENCH_BUDGET_S",
    "HI3D_BENCH_E2E",
    "HI3D_ZERO_INIT",  # changes param VALUES, not graphs
}

_FINGERPRINT: Optional[str] = None
_WARNED = set()
_TYPES_REGISTERED = False


def _register_export_types() -> None:
    """jax.export refuses to (de)serialize pytrees containing unregistered
    custom node types. Register — idempotently, best-effort — the ones our
    cached programs carry: the optax optimizer-state namedtuples (train
    step's opt_state) and the flax TrainState dataclass. Any individual
    failure is harmless: aot_compile/ProgramJit fall back to plain jit."""
    global _TYPES_REGISTERED
    if _TYPES_REGISTERED:
        return
    _TYPES_REGISTERED = True
    from jax import export as jexport

    try:
        import optax

        for n in (
            "EmptyState", "ScaleByAdamState", "ScaleByScheduleState",
            "ScaleState", "MultiTransformState", "MaskedState",
            "AddDecayedWeightsState", "TraceState", "ClipByGlobalNormState",
            "MaskedNode",
        ):
            cls = getattr(optax, n, None)
            if cls is None:
                continue
            try:
                jexport.register_namedtuple_serialization(
                    cls, serialized_name=f"optax.{n}"
                )
            except Exception:
                pass  # already registered / not a namedtuple on this version
    except Exception:
        pass
    try:
        from ..training.state import TrainState

        # flax struct dataclass: no static fields → auxdata carries nothing
        jexport.register_pytree_node_serialization(
            TrainState,
            serialized_name="hi3d_tpu.training.state.TrainState",
            serialize_auxdata=lambda aux: b"",
            deserialize_auxdata=lambda b: None,
            from_children=lambda aux, children: TrainState(*children),
        )
    except Exception:
        pass


def enabled() -> bool:
    return os.environ.get("HI3D_PROGRAM_CACHE", "1") != "0"


def blob_backend_ok() -> bool:
    """False on backends where a deserialized jax.export program is a
    pessimization. Measured on the tunneled `axon` TPU backend (round 4,
    BASELINE.md): executing a DESERIALIZED program defers its real
    server-side compile to first execution (~90-190 s, bypassing the
    persistent XLA compilation cache) and `block_until_ready` returns
    before materialization — a bench built on it recorded a physically
    impossible 162 steps/s. Plain re-trace + persistent-cache compile costs
    ~13 s there, so blobs lose — the whole blob path (write and reuse) is
    skipped and callers behave as plain jit, leaving the persistent XLA
    cache as the cross-process cache. HI3D_PROGRAM_CACHE_FORCE=1 overrides
    for A/B measurement.

    Detection: the tunnel canonicalizes its platform name to "tpu"
    (jax.default_backend() == "tpu", devices[0].platform == "tpu"), so the
    only reliable marker is the PJRT platform_version string, which carries
    "axon <version>"."""
    if os.environ.get("HI3D_PROGRAM_CACHE_FORCE", "0") == "1":
        return True
    try:
        version = jax.devices()[0].client.platform_version
    except Exception:
        return True
    return "axon" not in version.lower()


def cache_dir() -> str:
    return os.environ.get(
        "HI3D_PROGRAM_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "hi3d_tpu_programs"),
    )


def _source_fingerprint() -> str:
    """sha256 over every hi3d_tpu source file + the jax version."""
    global _FINGERPRINT
    if _FINGERPRINT is not None:
        return _FINGERPRINT
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            p = os.path.join(dirpath, fn)
            h.update(p[len(root):].encode())
            with open(p, "rb") as f:
                h.update(f.read())
    _FINGERPRINT = h.hexdigest()[:16]
    return _FINGERPRINT


def _env_key() -> str:
    items = sorted(
        (k, v) for k, v in os.environ.items()
        if k.startswith("HI3D_") and k not in _ENV_IGNORE
    )
    return repr(items)


def _args_key(args: Tuple[Any, ...]) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(args)
    import numpy as np

    parts = [repr(treedef)]
    for leaf in leaves:
        shape = getattr(leaf, "shape", None)
        if shape is None:
            parts.append(f"py:{type(leaf).__name__}:{leaf!r}")
        else:
            parts.append(f"{tuple(shape)}:{np.dtype(getattr(leaf, 'dtype', np.float64)).name}")
    return "|".join(parts)


def _warn_once(tag: str, msg: str) -> None:
    if tag not in _WARNED:
        _WARNED.add(tag)
        print(f"[program_cache] {msg}")


class ProgramJit:
    """jax.jit whose traced program round-trips through a jax.export blob."""

    def __init__(self, fn, name: str, extra_key: Any = ""):
        self._fn = fn
        self._name = name
        # any None component in extra_key means "caller could not produce a
        # stable identity" → disk cache off, plain jit semantics retained
        if isinstance(extra_key, (tuple, list)) and any(
            k is None for k in extra_key
        ):
            self._extra = None
        else:
            self._extra = repr(extra_key)
        self._plain = None  # lazy jax.jit(fn)
        self._by_key = {}

    def _plain_jit(self):
        if self._plain is None:
            self._plain = jax.jit(self._fn)
        return self._plain

    @staticmethod
    def _disk_safe(args) -> bool:
        """False for tracer args (called under an outer trace — plain jit
        inlines, export would fail) and for multi-device-sharded args (input
        shardings are not part of the key; an exported single-device program
        would silently force a resharding instead of GSPMD propagation)."""
        for leaf in jax.tree_util.tree_leaves(args):
            if isinstance(leaf, jax.core.Tracer):
                return False
            sharding = getattr(leaf, "sharding", None)
            if sharding is not None:
                try:
                    if len(sharding.device_set) > 1:
                        return False
                except Exception:
                    return False
        return True

    def __call__(self, *args):
        if (
            not enabled()
            or not blob_backend_ok()
            or self._extra is None
            or not self._disk_safe(args)
        ):
            return self._plain_jit()(*args)
        _register_export_types()
        key_src = "\x00".join(
            (
                self._name,
                _source_fingerprint(),
                jax.default_backend(),
                _env_key(),
                self._extra,
                _args_key(args),
            )
        )
        key = hashlib.sha256(key_src.encode()).hexdigest()[:24]
        cached = self._by_key.get(key)
        if cached is not None:
            return cached(*args)

        path = os.path.join(cache_dir(), f"{self._name}-{key}.jaxprog")
        call = None
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    exp = jax.export.deserialize(f.read())
                call = jax.jit(exp.call)
            except Exception as e:  # stale/corrupt/version-skewed blob
                _warn_once(
                    f"load:{self._name}",
                    f"ignoring stale program blob {path}: {type(e).__name__}",
                )
                try:
                    os.remove(path)
                except OSError:
                    pass
        if call is None:
            try:
                exp = jax.export.export(jax.jit(self._fn))(*args)
                os.makedirs(cache_dir(), exist_ok=True)
                tmp = f"{path}.tmp.{os.getpid()}"
                try:
                    blob = exp.serialize()
                    with open(tmp, "wb") as f:
                        f.write(blob)
                    os.replace(tmp, path)
                finally:
                    if os.path.exists(tmp):
                        os.remove(tmp)
                call = jax.jit(exp.call)
            except Exception as e:
                _warn_once(
                    f"export:{self._name}",
                    f"export failed for {self._name} "
                    f"({type(e).__name__}: {e}) — plain jit fallback",
                )
                call = self._plain_jit()
        self._by_key[key] = call
        return call(*args)


def aot_compile(jitted_fn, name: str, extra_key: Any, args: Tuple[Any, ...],
                donate_argnums: Tuple[int, ...] = ()):
    """AOT-compile `jitted_fn` at `args`, disk-caching the traced program.

    Returns a compiled executable (``.cost_analysis()``-capable, call it with
    ``args``). When a cached jax.export blob exists for (source fingerprint,
    env flags, extra_key, arg avals), the Python re-trace is skipped — the
    blob deserializes in ~0.1 s and the compile hits the persistent XLA
    cache. bench.py uses this so a driver process after a pre-warmed round
    pays seconds, not minutes, per metric graph (VERDICT r3 #1a). Any
    failure falls back to ``jitted_fn.lower(*args).compile()``."""
    fallback = lambda: jitted_fn.lower(*args).compile()
    if not enabled() or not blob_backend_ok():
        return fallback()
    try:
        _register_export_types()
        key_src = "\x00".join(
            (
                name,
                _source_fingerprint(),
                jax.default_backend(),
                _env_key(),
                repr(extra_key),
                _args_key(args),
            )
        )
        key = hashlib.sha256(key_src.encode()).hexdigest()[:24]
        path = os.path.join(cache_dir(), f"{name}-{key}.jaxprog")
        exp = None
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    exp = jax.export.deserialize(f.read())
            except Exception as e:
                _warn_once(
                    f"load:{name}",
                    f"ignoring stale program blob {path}: {type(e).__name__}",
                )
                try:
                    os.remove(path)
                except OSError:
                    pass
        if exp is None:
            exp = jax.export.export(jitted_fn)(*args)
            os.makedirs(cache_dir(), exist_ok=True)
            tmp = f"{path}.tmp.{os.getpid()}"
            try:
                blob = exp.serialize()  # before open: may raise on exotic trees
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)
            finally:
                if os.path.exists(tmp):
                    os.remove(tmp)
        return (
            jax.jit(exp.call, donate_argnums=donate_argnums)
            .lower(*args)
            .compile()
        )
    except Exception as e:
        _warn_once(
            f"aot:{name}",
            f"aot_compile failed for {name} "
            f"({type(e).__name__}: {e}) — plain lower+compile fallback",
        )
        return fallback()


def program_jit(fn, name: str, extra_key: Any = "") -> ProgramJit:
    """Wrap `fn` like jax.jit, with the traced program disk-cached.

    `extra_key` must capture everything that changes the traced graph but is
    not visible in the argument avals (module configs, static flags, scan
    lengths that live in closures). Pass a tuple containing None to disable
    the disk path when no stable identity exists."""
    return ProgramJit(fn, name, extra_key)


def flax_module_key(*modules) -> str:
    """Stable identity for flax linen modules: the dataclass repr includes
    every config field. Deterministic across processes (no addresses)."""
    return "||".join(repr(m) for m in modules)
