"""Prototype: does a jax.export disk cache beat re-tracing the flagship UNet?

Measures, for the full-size stage-1 CFG denoise step on the real chip:
  (a) trace+lower time of jax.jit(fn).lower(*args)   [what every cold start pays]
  (b) export + serialize time and blob size
  (c) deserialize + jit(exported.call) lower time    [what a program cache would pay]
  (d) numerical equality of the two paths

Run twice: the second run (fresh process) reads the blob from disk, which is
the realistic cold-start path. Informs whether to build
utils.program_cache (BASELINE.md round-3 cold-start section).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOB = "/tmp/hi3d_export_proto.bin"


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hi3d_tpu.diffusion.denoiser import Denoiser
    from hi3d_tpu.models.wrappers import ConcatConditionWrapper
    from __graft_entry__ import _unet, _zero_params

    T, H, W = 16, 64, 64
    dtype = jnp.bfloat16
    model = _unet(scale=1.0, dtype=dtype)
    bt = 2 * T
    x = jnp.zeros((bt, H, W, 4), dtype)
    concat = jnp.zeros((bt, H, W, model.in_channels - 4), dtype)
    ctx = jnp.zeros((2, 1, model.context_dim), dtype)
    y = jnp.zeros((2, model.adm_in_channels), dtype)
    ind = jnp.zeros((2, T))
    sigma = jnp.full((bt,), 1.0, jnp.float32)
    params = _zero_params(
        model, jnp.concatenate([x, concat], axis=-1), jnp.zeros((bt,)),
        context=ctx, y=y, num_video_frames=T, image_only_indicator=ind,
    )
    wrapper = ConcatConditionWrapper(model)
    denoiser = Denoiser(
        {"target": "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"}
    )

    def fn(params, x, sigma, concat, ctx, y):
        network = wrapper.bind(params, num_video_frames=T, image_only_indicator=ind)
        return denoiser(
            network, x, sigma, {"concat": concat, "crossattn": ctx, "vector": y}
        )

    args = (params, x, sigma, concat, ctx, y)

    if os.path.exists(BLOB) and "--fresh" in sys.argv:
        t0 = time.perf_counter()
        with open(BLOB, "rb") as f:
            exp = jax.export.deserialize(f.read())
        t_deser = time.perf_counter() - t0
        t0 = time.perf_counter()
        jf = jax.jit(exp.call)
        lowered = jf.lower(*args)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = jax.block_until_ready(compiled(*args))
        t_run = time.perf_counter() - t0
        print(f"[fresh] deserialize {t_deser:.2f}s, lower(exp.call) "
              f"{t_lower:.2f}s, compile {t_comp:.2f}s, run {t_run:.2f}s")
        return

    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t_trace = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_comp = time.perf_counter() - t0
    out_ref = jax.block_until_ready(compiled(*args))
    print(f"[base] trace+lower {t_trace:.2f}s, compile {t_comp:.2f}s")

    t0 = time.perf_counter()
    exp = jax.export.export(jax.jit(fn))(*args)
    t_exp = time.perf_counter() - t0
    blob = exp.serialize()
    with open(BLOB, "wb") as f:
        f.write(blob)
    print(f"[export] export {t_exp:.2f}s, blob {len(blob)/1e6:.1f} MB")

    t0 = time.perf_counter()
    exp2 = jax.export.deserialize(blob)
    jf = jax.jit(exp2.call)
    lowered2 = jf.lower(*args)
    t_lower2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled2 = lowered2.compile()
    t_comp2 = time.perf_counter() - t0
    out2 = jax.block_until_ready(compiled2(*args))
    print(f"[reload same-proc] deser+lower {t_lower2:.2f}s, compile {t_comp2:.2f}s")
    err = float(jnp.abs(out_ref.astype(jnp.float32) - out2.astype(jnp.float32)).max())
    print(f"[equality] max abs diff = {err:.3e}")


if __name__ == "__main__":
    main()
