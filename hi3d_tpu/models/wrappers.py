"""Network wrappers: route the conditioner's output dict into UNet kwargs.

Functional parity: reference sgm/modules/diffusionmodules/wrappers.py:9-34 —
`OpenAIWrapper` concatenates cond["concat"] onto x along channels and maps
{crossattn → context, vector → y}. Here the wrapper produces the closure that
hi3d_tpu.diffusion.denoiser.Denoiser calls, binding a flax apply-fn + params.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


class IdentityWrapper:
    def __init__(self, module, compile_model: bool = False):
        self.module = module

    def bind(self, params, **static_kwargs) -> Callable:
        def network(x, c_noise, cond, **extra):
            return self.module.apply(params, x, c_noise, **static_kwargs, **extra)

        return network


class ConcatConditionWrapper(IdentityWrapper):
    """`OpenAIWrapper` equivalent (concat-cond + context/y routing)."""

    def bind(self, params, **static_kwargs) -> Callable:
        module = self.module

        def network(x, c_noise, cond: Dict[str, jax.Array], **extra):
            if "concat" in cond:
                x = jnp.concatenate(
                    [x, cond["concat"].astype(x.dtype)], axis=-1
                )
            return module.apply(
                params,
                x,
                c_noise,
                context=cond.get("crossattn"),
                y=cond.get("vector"),
                **static_kwargs,
                **extra,
            )

        return network
