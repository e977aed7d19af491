"""Flash-attention kernel microbenchmark across forward variants.

Times the Pallas forward at the stage-2 spatial shape (s=16384, d=64 —
reference sgm/modules/attention.py:417-435 run through xformers at this
site) with the per-call dispatch amortized away: N calls are chained
through a `lax.fori_loop` data dependency inside ONE jit, so the tunnel's
~6 ms eager dispatch cost (see BASELINE.md measurement notes) divides by N.

Prints one JSON line per (variant, shape): ms/call and achieved TF/s
(attention FLOPs = 4·bh·sq·sk·d for the two matmuls).

Usage:
  python tools/bench_flash.py                      # default variant sweep
  python tools/bench_flash.py --variants "" vaug   # subset
  python tools/bench_flash.py --bh 160 --sq 16384  # stage-2 top level
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_one(variant: str, bh: int, sq: int, sk: int, d: int,
              block_q: int, block_k: int, iters: int, dtype_name: str,
              heads: int = 5) -> dict:
    os.environ["HI3D_FLASH_VARIANT"] = variant
    import jax
    import jax.numpy as jnp
    from hi3d_tpu.ops.flash_attention import flash_attention
    from hi3d_tpu.utils.misc import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    # public BSHD entry so per-variant layout work (the 3-D path's
    # transposes vs the packed path's free reshapes) is part of the timing
    b = bh // heads
    dtype = jnp.dtype(dtype_name)
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, heads, d), dtype)
    k = jax.random.normal(kk, (b, sk, heads, d), dtype)
    v = jax.random.normal(kv, (b, sk, heads, d), dtype)

    @jax.jit
    def run(q, k, v, tag):
        # `tag` differs per call: the tunnel dedupes repeated identical
        # launches and reports impossible wall-times (BASELINE.md notes).
        # Cast tag into q's dtype — a float32 tag silently promotes the
        # whole bench to fp32 attention.
        def body(_, x):
            # output shape == q shape: chain it back in as q so the calls
            # serialize (no overlap) while k/v stay resident
            return flash_attention(x, k, v, block_q=block_q, block_k=block_k)
        out = jax.lax.fori_loop(0, iters, body, q + tag.astype(q.dtype))
        # scalar result: the host fetch below cannot complete early
        return jnp.sum(out.astype(jnp.float32))

    float(run(q, k, v, jnp.float32(0.0)))  # compile + warm
    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        acc = float(run(q, k, v, jnp.float32(1e-2 * (r + 1))))
    dt = (time.perf_counter() - t0) / (reps * iters)
    assert acc == acc  # not NaN
    flops = 4.0 * bh * sq * sk * d
    return {
        "variant": variant or "base",
        "bh": bh, "sq": sq, "sk": sk, "d": d,
        "block": [block_q, block_k],
        "ms_per_call": round(dt * 1e3, 3),
        "tf_per_sec": round(flops / dt / 1e12, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="*",
                    default=["", "vaug", "kt", "vaug_kt"])
    ap.add_argument("--bh", type=int, default=160)   # 2·16 frames × 5 heads
    ap.add_argument("--sq", type=int, default=16384)
    ap.add_argument("--sk", type=int, default=0, help="defaults to sq")
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--block-q", type=int, default=1024)
    ap.add_argument("--block-k", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    sk = args.sk or args.sq
    for variant in args.variants:
        r = bench_one(variant, args.bh, args.sq, sk, args.d,
                      args.block_q, args.block_k, args.iters, args.dtype)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
