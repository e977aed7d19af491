"""Stage-2 non-UNet tail microbenchmark: VAE encode / tiled decode / DPT.

The stage-2 marginal per asset is ~83 s of which ~61 s is UNet sampler steps
(BASELINE.md); the rest is the conditioning + VAE tail:
  - 16-frame fp32 VAE encode at 1024² (twice: blend source z + cond-video
    latents), chunked by `en_and_decode_n_samples_a_time`
  - 16-frame tiled VAE decode 128²→1024² (9 tiles/frame at tile=64)
  - DPT depth tower on 16 frames at 384²
This tool times each component on the real chip at several chunk sizes and
dtypes so the shipped defaults are measured, not guessed. Timing is
dedupe-proof (unique tag input + scalar host fetch per call — the TPU tunnel
dedupes repeated identical launches, see BASELINE.md measurement notes).

Usage: python tools/bench_tail.py [--only encode|decode|dpt] [--frames 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hi3d_tpu.utils.misc import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

# sd-vae ddconfig (configs/inference-v02.yaml first_stage_config)
DDCONFIG = dict(
    double_z=True, z_channels=4, resolution=256, in_channels=3, out_ch=3,
    ch=128, ch_mult=[1, 2, 4, 4], num_res_blocks=2, attn_resolutions=[],
    dropout=0.0,
)


def _timed(fn, *args, reps: int = 3) -> float:
    """Median-free simple mean of `reps` real executions (unique tag each)."""
    fn(*args, 0.0)  # compile + warm
    t0 = time.perf_counter()
    for r in range(reps):
        acc = fn(*args, 1e-6 * (r + 1))
    dt = (time.perf_counter() - t0) / reps
    assert acc == acc
    return dt


def bench_encode(frames: int, hw: int, dtype, chunk: int) -> dict:
    from hi3d_tpu.models.vae import AutoencoderKLModeOnly

    vae = AutoencoderKLModeOnly(DDCONFIG, dtype=dtype)
    vae.init(jax.random.PRNGKey(0), image_hw=(64, 64))
    if dtype == jnp.bfloat16:
        vae.params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), vae.params)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (frames, hw, hw, 3), jnp.float32
    ) * 0.5

    enc = vae._applier("encode_moments", vae.module.encode_moments)

    def run(x, tag):
        xs = x + tag
        outs = [
            enc(vae.params, xs[i : i + chunk].astype(dtype))
            for i in range(0, frames, chunk)
        ]
        return float(jnp.sum(jnp.stack(
            [o.astype(jnp.float32).sum() for o in outs]
        )))

    dt = _timed(run, x)
    return {
        "component": "vae_encode", "frames": frames, "hw": hw,
        "dtype": jnp.dtype(dtype).name, "chunk": chunk,
        "ms": round(dt * 1e3, 1),
    }


def bench_decode(frames: int, latent: int, dtype, chunk: int,
                 tile: int) -> dict:
    from hi3d_tpu.models.vae import AutoencoderKLModeOnly

    vae = AutoencoderKLModeOnly(DDCONFIG, dtype=dtype)
    vae.init(jax.random.PRNGKey(0), image_hw=(64, 64))
    if dtype == jnp.bfloat16:
        vae.params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), vae.params)
    z = jax.random.normal(
        jax.random.PRNGKey(1), (frames, latent, latent, 4), dtype
    )

    def dec(v):
        if tile and latent > tile:
            return vae.decode_tiled(v, tile=tile)
        return vae.decode(v)

    def run(z, tag):
        zs = z + jnp.asarray(tag, dtype)
        outs = [dec(zs[i : i + chunk]) for i in range(0, frames, chunk)]
        return float(jnp.sum(jnp.stack(
            [o.astype(jnp.float32).sum() for o in outs]
        )))

    dt = _timed(run, z)
    return {
        "component": "vae_decode", "frames": frames, "latent": latent,
        "dtype": jnp.dtype(dtype).name, "chunk": chunk, "tile": tile,
        "ms": round(dt * 1e3, 1),
    }


def bench_dpt(frames: int, hw: int, dtype) -> dict:
    from hi3d_tpu.models.dpt import DPTDepthModel

    model = DPTDepthModel(dtype=dtype)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 384, 384, 3))
    )
    if dtype == jnp.bfloat16:
        params = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, params
        )
    x = jax.random.normal(
        jax.random.PRNGKey(1), (frames, hw, hw, 3), jnp.float32
    ) * 0.5
    app = jax.jit(model.apply)

    def run(x, tag):
        y = app(params, (x + tag).astype(dtype))
        return float(y.astype(jnp.float32).sum())

    dt = _timed(run, x)
    return {
        "component": "dpt", "frames": frames, "hw": hw,
        "dtype": jnp.dtype(dtype).name, "ms": round(dt * 1e3, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()

    runs = []
    if args.only in ("", "encode"):
        for dtype in (jnp.float32, jnp.bfloat16):
            for chunk in (1, 4, 16):
                runs.append(lambda d=dtype, c=chunk: bench_encode(
                    args.frames, 1024, d, c
                ))
    if args.only in ("", "decode"):
        for dtype in (jnp.float32, jnp.bfloat16):
            for chunk, tile in ((1, 64), (4, 64), (16, 64),
                                (1, 0), (4, 0)):
                runs.append(lambda d=dtype, c=chunk, t=tile: bench_decode(
                    args.frames, 128, d, c, t
                ))
    if args.only in ("", "dpt"):
        for dtype in (jnp.float32, jnp.bfloat16):
            runs.append(lambda d=dtype: bench_dpt(args.frames, 384, d))

    for make in runs:
        try:
            print(json.dumps(make()), flush=True)
        except Exception as e:  # OOM configs are data, not failures
            print(json.dumps({"error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
