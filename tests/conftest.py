"""Test configuration: run everything on CPU with 8 virtual devices so that
mesh/sharding tests exercise real multi-device partitioning without TPU
hardware (SURVEY.md §4 test strategy).

Note: the environment's axon site-hook forces JAX_PLATFORMS=axon (the tunneled
TPU); plain env vars don't stick, so the platform is forced via jax.config
before any backend is initialized. Without this, every op in the un-jitted
test paths round-trips the TPU tunnel at ~6 ms/op.
"""

import os

# hi3d_tpu installs its own compilation-cache config (dir ~/.cache/hi3d_tpu_xla,
# min-compile-time 5 s — tuned for the minutes-long TPU UNet compiles) both on
# package import and whenever a CLI/create_model path calls
# enable_persistent_compilation_cache(). Either would silently override the
# aggressive CPU-test cache below, and a 5 s threshold skips nearly every CPU
# test compile. HI3D_COMP_CACHE=0 gates ALL package writers (the helper
# respects it too), keeping this conftest the single owner of the cache config.
os.environ["HI3D_COMP_CACHE"] = "0"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent XLA compile cache: the suite's fixture engines (UNet/VAE/CLIP
# towers) dominate wall time via jit compiles; caching them keeps the
# `-m "not slow"` subset under the 2-minute CI budget on warm runs
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "HI3D_XLA_CACHE_CPU", os.path.expanduser("~/.cache/hi3d_xla_cpu")
    ),
)
# the suite's wall time is spread over hundreds of sub-second compiles —
# cache aggressively (entries are a few KB each on CPU)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy test (torch reference towers, serve meshes, e2e parity); "
        "deselect with -m 'not slow' for the <2-min CI subset",
    )
