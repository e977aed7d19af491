"""VideoUNet structure/shape tests at toy size (full-size parity is covered by
the converter tests once real checkpoints are available)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hi3d_tpu.models.unet import VideoUNet, _build_plan

pytestmark = pytest.mark.slow



def tiny_unet(**kw):
    cfg = dict(
        in_channels=8,
        model_channels=16,
        out_channels=4,
        num_res_blocks=1,
        attention_resolutions=[1, 2],
        channel_mult=[1, 2],
        num_classes="sequential",
        num_head_channels=8,
        transformer_depth=1,
        context_dim=16,
        extra_ff_mix_layer=True,
        use_spatial_context=True,
        merge_strategy="learned_with_images",
        video_kernel_size=[3, 1, 1],
        use_linear_in_transformer=True,
        adm_in_channels=12,
    )
    cfg.update(kw)
    return VideoUNet(**cfg)


B, T, H, W = 1, 2, 8, 8


def japply(model, params, x, ts, ctx, y, ind):
    """Jitted apply — eager per-op dispatch dominates test time otherwise."""

    @jax.jit
    def run(params, x, ts, ctx, y, ind):
        return model.apply(
            params, x, ts, context=ctx, y=y, num_video_frames=T,
            image_only_indicator=ind,
        )

    return run(params, x, ts, ctx, y, ind)


def make_inputs(bt=B * T, per_frame=False):
    x = jax.random.normal(jax.random.PRNGKey(0), (bt, H, W, 8))
    ts = jnp.full((bt,), 0.5)
    n_vid = bt // T
    n_cond = bt if per_frame else n_vid
    ctx = jax.random.normal(jax.random.PRNGKey(1), (n_cond, 1, 16))
    y = jax.random.normal(jax.random.PRNGKey(2), (n_cond, 12))
    ind = jnp.zeros((n_vid, T))
    return x, ts, ctx, y, ind


@pytest.fixture(scope="module")
def unet_and_params():
    model = tiny_unet()
    x, ts, ctx, y, ind = make_inputs()
    params = model.init(
        jax.random.PRNGKey(0), x, ts, context=ctx, y=y,
        num_video_frames=T, image_only_indicator=ind,
    )
    return model, params


def test_output_shape_and_zero_init(unet_and_params):
    model, params = unet_and_params
    x, ts, ctx, y, ind = make_inputs()
    out = model.apply(
        params, x, ts, context=ctx, y=y, num_video_frames=T,
        image_only_indicator=ind,
    )
    assert out.shape == (B * T, H, W, 4)
    # final conv is zero-initialized (reference video_model.py:436-440)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_per_video_vs_per_frame_conditioning(unet_and_params):
    """Passing y/context per-video must equal passing them pre-broadcast
    per-frame (reference fast path, video_model.py:459-465)."""
    model, params = unet_and_params
    # non-zero out conv so differences would show
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * jnp.ones_like(p), params
    )
    x, ts, ctx, y, ind = make_inputs()
    out_video = model.apply(
        params, x, ts, context=ctx, y=y, num_video_frames=T,
        image_only_indicator=ind,
    )
    ctx_f = jnp.repeat(ctx, T, axis=0)
    y_f = jnp.repeat(y, T, axis=0)
    out_frame = model.apply(
        params, x, ts, context=ctx_f, y=y_f, num_video_frames=T,
        image_only_indicator=ind,
    )
    np.testing.assert_allclose(
        np.asarray(out_video), np.asarray(out_frame), rtol=1e-5, atol=1e-6
    )


def test_remat_matches_no_remat(unet_and_params):
    model, params = unet_and_params
    params = jax.tree_util.tree_map(lambda p: p + 0.01 * jnp.ones_like(p), params)
    model_ckpt = tiny_unet(use_checkpoint=True)
    x, ts, ctx, y, ind = make_inputs()
    out = japply(model, params, x, ts, ctx, y, ind)
    out_ckpt = japply(model_ckpt, params, x, ts, ctx, y, ind)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ckpt), rtol=1e-5)

    # gradients must flow through the remat path (jitted — eager remat grad
    # dispatches each rematerialized primitive separately and takes minutes)
    def loss(p):
        o = model_ckpt.apply(
            p, x, ts, context=ctx, y=y, num_video_frames=T,
            image_only_indicator=ind,
        )
        return jnp.sum(o**2)

    g = jax.jit(jax.grad(loss))(params)
    gnorm = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_encoder_cache_contract(unet_and_params):
    """Decoder-only forward from a returned encoder cache must equal the
    full forward on the same inputs exactly (encoder propagation support,
    models/unet.py encoder_cache/return_encoder_cache)."""
    model, params = unet_and_params
    params = jax.tree_util.tree_map(lambda p: p + 0.01 * jnp.ones_like(p), params)
    x, ts, ctx, y, ind = make_inputs()

    @jax.jit
    def full(p):
        return model.apply(
            p, x, ts, context=ctx, y=y, num_video_frames=T,
            image_only_indicator=ind, return_encoder_cache=True,
        )

    out_full, cache = full(params)

    @jax.jit
    def decode_only(p, cache):
        return model.apply(
            p, x, ts, context=ctx, y=y, num_video_frames=T,
            image_only_indicator=ind, encoder_cache=cache,
        )

    out_cached = decode_only(params, cache)
    np.testing.assert_allclose(
        np.asarray(out_cached), np.asarray(out_full), rtol=1e-5, atol=1e-6
    )
    # plain path unchanged by the new kwargs
    out_plain = japply(model, params, x, ts, ctx, y, ind)
    np.testing.assert_allclose(
        np.asarray(out_full), np.asarray(out_plain), rtol=1e-6, atol=1e-7
    )


@pytest.mark.slow
@pytest.mark.parametrize("policy", ["dots", "all"])
def test_remat_policy_grads_match_default(unet_and_params, policy, monkeypatch):
    """HI3D_REMAT_POLICY variants change only what is saved vs recomputed;
    outputs and gradients must be identical to the save-nothing default."""
    model, params = unet_and_params
    params = jax.tree_util.tree_map(lambda p: p + 0.01 * jnp.ones_like(p), params)
    x, ts, ctx, y, ind = make_inputs()

    def grads(use_policy):
        if use_policy:
            monkeypatch.setenv("HI3D_REMAT_POLICY", policy)
        else:
            monkeypatch.delenv("HI3D_REMAT_POLICY", raising=False)
        m = tiny_unet(use_checkpoint=True)

        def loss(p):
            o = m.apply(
                p, x, ts, context=ctx, y=y, num_video_frames=T,
                image_only_indicator=ind,
            )
            return jnp.sum(o**2)

        return jax.jit(jax.grad(loss))(params)

    g_default = grads(False)
    g_policy = grads(True)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_default), jax.tree_util.tree_leaves(g_policy)
    ):
        # not bitwise: saving vs recomputing intermediates changes XLA's
        # fusion boundaries and hence fp32 rounding (measured ≤3.3e-6 abs /
        # ≤1e-3 rel on isolated elements across both policies)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=1e-5)


def test_build_plan_hi3d_structure():
    """The full Hi3D config must produce the SVD block layout."""
    inp, mid, outp, ch = _build_plan(
        320, [1, 2, 4, 4], 2, [4, 2, 1], [1, 1, 1, 1], 64
    )
    assert len(inp) == 12
    assert inp[0] == [("conv_in", 320)]
    # levels 0-2 have attention, level 3 (ds=8) does not
    assert inp[1] == [("res", 320), ("attn", 320, 1)]
    assert inp[3] == [("down", 320)]
    assert inp[10] == [("res", 1280)]
    assert mid == [("res", 1280), ("attn", 1280, 1), ("res", 1280)]
    assert len(outp) == 12
    assert outp[0] == [("res", 1280)]
    assert outp[2] == [("res", 1280), ("up", 1280)]
    assert outp[-1] == [("res", 320), ("attn", 320, 1)]
    assert ch == 320


def test_image_only_indicator_disables_temporal():
    """With indicator=1 the alpha blenders pick the pure-spatial branch, so
    temporal-layer params must not affect the output."""
    model = tiny_unet()
    x, ts, ctx, y, _ = make_inputs()
    ind0 = jnp.zeros((B, T))
    ind1 = jnp.ones((B, T))
    params = model.init(
        jax.random.PRNGKey(0), x, ts, context=ctx, y=y,
        num_video_frames=T, image_only_indicator=ind1,
    )
    params = jax.tree_util.tree_map(lambda p: p + 0.01 * jnp.ones_like(p), params)

    def perturb_time_stack(tree, eps):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        out = {}
        for path, leaf in flat:
            keys = tuple(getattr(p, "key", str(p)) for p in path)
            if any("time_stack" in str(k) for k in keys):
                leaf = leaf + eps
            out[keys] = leaf
        return out

    out1 = model.apply(
        params, x, ts, context=ctx, y=y, num_video_frames=T,
        image_only_indicator=ind1,
    )
    params2 = jax.tree_util.tree_map(lambda p: p, params)  # copy
    # bump every time_stack weight; with indicator=1 output must not change
    import flax

    flat = flax.traverse_util.flatten_dict(params2["params"])
    for k in list(flat):
        if any("time_stack" in part for part in k):
            flat[k] = flat[k] + 0.5
    params2 = {"params": flax.traverse_util.unflatten_dict(flat)}
    out2 = model.apply(
        params2, x, ts, context=ctx, y=y, num_video_frames=T,
        image_only_indicator=ind1,
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5)

    # sanity: with indicator=0 the same perturbation DOES change the output
    out3 = model.apply(
        params, x, ts, context=ctx, y=y, num_video_frames=T,
        image_only_indicator=ind0,
    )
    out4 = model.apply(
        params2, x, ts, context=ctx, y=y, num_video_frames=T,
        image_only_indicator=ind0,
    )
    assert not np.allclose(np.asarray(out3), np.asarray(out4))


def test_time_conv_matmul_lowering_matches_conv(monkeypatch):
    """HI3D_TIME_CONV=matmul (TimeKernelConv: kt shifted matmuls) is exactly
    the nn.Conv((3,1,1)) lowering on the same param tree — measured-negative
    perf opt-in (see models/layers._time_conv_as_matmul), kept correct."""
    from hi3d_tpu.models.layers import ResBlock

    rnd = np.random.RandomState(0)
    x = jnp.asarray(rnd.rand(2, 5, 4, 4, 8).astype(np.float32))
    emb = jnp.asarray(rnd.rand(2, 5, 16).astype(np.float32))
    rb = ResBlock(out_channels=8, dims=3, kernel_size=(3, 1, 1),
                  exchange_temb_dims=True)

    monkeypatch.setenv("HI3D_TIME_CONV", "conv")
    params = rb.init(jax.random.PRNGKey(0), x, emb)
    y_conv = rb.apply(params, x, emb)

    monkeypatch.setenv("HI3D_TIME_CONV", "matmul")
    params_mm = rb.init(jax.random.PRNGKey(0), x, emb)
    assert jax.tree_util.tree_structure(params) == (
        jax.tree_util.tree_structure(params_mm)
    )
    y_mm = rb.apply(params, x, emb)
    np.testing.assert_allclose(
        np.asarray(y_mm), np.asarray(y_conv), rtol=2e-5, atol=2e-5
    )


def test_time_conv_4d_lowering_matches_conv(monkeypatch):
    """HI3D_TIME_CONV=conv4d (opt-in bracket — shipped default is "conv",
    which measured faster: 0.4275 vs 0.4166 steps/s stage-2) runs the whole
    time-stack ResBlock on (B, T, H·W, C) with a (kt,1) 2-D conv; it must be
    exactly the nn.Conv((3,1,1)) lowering on the same param tree — including
    the skip_connection pointwise conv when channels change."""
    from hi3d_tpu.models.layers import ResBlock

    rnd = np.random.RandomState(1)
    x = jnp.asarray(rnd.rand(2, 5, 4, 6, 8).astype(np.float32))
    emb = jnp.asarray(rnd.rand(2, 5, 16).astype(np.float32))
    for out_ch in (8, 12):  # identity skip and 1×1×1-conv skip
        rb = ResBlock(out_channels=out_ch, dims=3, kernel_size=(3, 1, 1),
                      exchange_temb_dims=True)

        monkeypatch.setenv("HI3D_TIME_CONV", "conv")
        params = rb.init(jax.random.PRNGKey(0), x, emb)
        y_conv = rb.apply(params, x, emb)

        monkeypatch.setenv("HI3D_TIME_CONV", "conv4d")
        params_4d = rb.init(jax.random.PRNGKey(0), x, emb)
        assert jax.tree_util.tree_structure(params) == (
            jax.tree_util.tree_structure(params_4d)
        )
        y_4d = rb.apply(params, x, emb)
        assert y_4d.shape == y_conv.shape
        np.testing.assert_allclose(
            np.asarray(y_4d), np.asarray(y_conv), rtol=2e-5, atol=2e-5
        )
