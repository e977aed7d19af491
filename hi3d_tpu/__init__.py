"""hi3d_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
Hi3D (yanghb22-fdu/Hi3D-Official): two-stage image-to-3D generation via orbital
video diffusion.

This is a ground-up redesign, not a port: pure-functional flax modules, params as
pytrees, `lax.scan` sampler loops, pjit/shard_map parallelism over device meshes,
and Pallas kernels on the hot attention paths.

Public surface mirrors the reference's config-driven instantiation
(`instantiate_from_config({target, params})`, reference sgm/util.py:168-186) so
that the shipped YAML configs keep working; the `sgm.*` / `vtdm.*` target names
resolve to hi3d_tpu classes via `hi3d_tpu.registry`.
"""

__version__ = "0.1.0"

import os as _os

# persistent XLA compilation cache: the 320-channel UNet programs take
# minutes to compile; caching them across processes turns pipeline cold
# starts into warm starts. Opt out with HI3D_COMP_CACHE=0; the config logic
# lives in ONE place (utils.misc.enable_persistent_compilation_cache) so the
# package import, CLIs, and bench tools can't fight over the cache settings.
if _os.environ.get("HI3D_COMP_CACHE", "1") != "0":
    from .utils.misc import enable_persistent_compilation_cache as _epcc

    _epcc()

from .config import (  # noqa: F401
    apply_dotlist,
    instantiate_from_config,
    load_config,
)


def create_model(config_path, overrides=None):
    """vtdm.model.create_model parity — see hi3d_tpu.pipelines.common."""
    from .pipelines.common import create_model as _create

    return _create(config_path, overrides)
