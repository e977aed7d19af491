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
            # bound statics win on duplicates: the loss's batch2model_keys
            # (train-v01.yaml:143) forwards num_video_frames /
            # image_only_indicator that make_loss_fn also pre-binds with the
            # same values. The duplicates must not TypeError, and under jit
            # the batch-forwarded num_video_frames is a TRACED int — only the
            # bound static Python value can drive the UNet's shape logic.
            kw = {**extra, **static_kwargs}
            return self.module.apply(params, x, c_noise, **kw)

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
            kw = {**extra, **static_kwargs}  # bound statics win (see above)
            return module.apply(
                params,
                x,
                c_noise,
                context=cond.get("crossattn"),
                y=cond.get("vector"),
                **kw,
            )

        return network
