"""Network wrappers (models/wrappers.py): the cond-dict → UNet kwarg routing
contract of the reference's OpenAIWrapper/IdentityWrapper
(sgm/modules/diffusionmodules/wrappers.py:9-34), tested directly on a stub
module — every other test reaches these only through DiffusionEngine.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hi3d_tpu.models.wrappers import ConcatConditionWrapper, IdentityWrapper


class Probe(nn.Module):
    """Records the kwargs it was applied with; returns x unchanged."""

    @nn.compact
    def __call__(self, x, c_noise, context=None, y=None,
                 num_video_frames=None, image_only_indicator=None):
        self.sow("intermediates", "seen", {
            "context": context, "y": y,
            "num_video_frames": num_video_frames,
            "channels": x.shape[-1],
        })
        return x


def _apply(wrapper_cls, cond, **static_kwargs):
    module = Probe()
    x = jnp.ones((2, 4, 4, 3), jnp.bfloat16)
    params = module.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)))
    seen = {}

    real_apply = module.apply

    def spy_apply(p, x, c_noise, **kw):
        seen.update(kw)
        seen["channels"] = x.shape[-1]
        return real_apply(p, x, c_noise, **kw)

    module.apply = spy_apply
    net = wrapper_cls(module).bind(params, **static_kwargs)
    out = net(x, jnp.zeros((2,)), cond)
    return out, seen


def test_concat_wrapper_routes_cond_dict():
    concat = jnp.full((2, 4, 4, 5), 2.0, jnp.float32)  # fp32 on purpose
    ctx = jnp.ones((2, 1, 8))
    vec = jnp.ones((2, 16))
    out, seen = _apply(
        ConcatConditionWrapper,
        {"concat": concat, "crossattn": ctx, "vector": vec},
    )
    # concat joins x along channels, cast to x's dtype (reference
    # wrappers.py:28-31 torch.cat along dim=1 — channels-last here)
    assert seen["channels"] == 3 + 5
    assert seen["context"] is ctx and seen["y"] is vec
    assert out.dtype == jnp.bfloat16


def test_concat_optional_and_missing_keys():
    out, seen = _apply(ConcatConditionWrapper, {})
    assert seen["channels"] == 3          # no concat → x untouched
    assert seen["context"] is None and seen["y"] is None


def test_identity_wrapper_does_not_touch_x_or_cond():
    concat = jnp.ones((2, 4, 4, 5))
    _, seen = _apply(IdentityWrapper, {"concat": concat})
    assert seen["channels"] == 3          # IdentityWrapper ignores cond


def test_bound_statics_win_over_batch_forwarded_duplicates():
    # the loss's batch2model_keys forward num_video_frames as a TRACED value
    # while bind() already holds the static Python int; the duplicate must
    # not TypeError and the bound static must win (wrappers.py:22-30)
    module = Probe()
    x = jnp.ones((2, 4, 4, 3))
    params = module.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)))
    seen = {}
    real_apply = module.apply

    def spy_apply(p, x, c_noise, **kw):
        seen.update(kw)
        return real_apply(p, x, c_noise, **kw)

    module.apply = spy_apply
    net = ConcatConditionWrapper(module).bind(params, num_video_frames=2)

    @jax.jit
    def run(x):
        # extra kwarg carries a traced duplicate, as make_loss_fn does
        return net(x, jnp.zeros((2,)), {},
                   num_video_frames=jnp.asarray(2))

    np.testing.assert_allclose(np.asarray(run(x)), np.asarray(x))
    assert seen["num_video_frames"] == 2          # the static Python int
    assert not isinstance(seen["num_video_frames"], jax.core.Tracer)
