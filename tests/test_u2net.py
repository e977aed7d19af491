"""U²-Net port: activation parity vs an inline torch implementation of the
upstream architecture (xuebinqin/U-2-Net layout, the model rembg runs for
the reference's background-removal step — pipeline_i2v_eval_v01.py:153-156),
plus converter key-coverage and pre/post-processing checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from hi3d_tpu.models.u2net import U2Net, postprocess, preprocess, segment
from hi3d_tpu.convert.torch_to_jax import convert_u2net_sd

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

pytestmark = pytest.mark.slow


# ---- inline torch reference (upstream u2net.py architecture) -------------


class TREBNCONV(tnn.Module):
    def __init__(self, in_ch, out_ch, dirate=1):
        super().__init__()
        self.conv_s1 = tnn.Conv2d(in_ch, out_ch, 3, padding=dirate, dilation=dirate)
        self.bn_s1 = tnn.BatchNorm2d(out_ch)

    def forward(self, x):
        return F.relu(self.bn_s1(self.conv_s1(x)))


def _up_like(src, tar):
    return F.interpolate(src, size=tar.shape[2:], mode="bilinear")


class TRSU(tnn.Module):
    def __init__(self, height, in_ch, mid_ch, out_ch):
        super().__init__()
        self.height = height
        self.rebnconvin = TREBNCONV(in_ch, out_ch)
        self.pool = tnn.MaxPool2d(2, stride=2, ceil_mode=True)
        for i in range(1, height):
            ic = out_ch if i == 1 else mid_ch
            setattr(self, f"rebnconv{i}", TREBNCONV(ic, mid_ch))
        setattr(self, f"rebnconv{height}", TREBNCONV(mid_ch, mid_ch, dirate=2))
        for i in range(height - 1, 0, -1):
            oc = out_ch if i == 1 else mid_ch
            setattr(self, f"rebnconv{i}d", TREBNCONV(mid_ch * 2, oc))

    def forward(self, x):
        hxin = self.rebnconvin(x)
        feats, hx = [], hxin
        for i in range(1, self.height):
            hx = getattr(self, f"rebnconv{i}")(hx)
            feats.append(hx)
            if i <= self.height - 2:
                hx = self.pool(hx)
        hx = getattr(self, f"rebnconv{self.height}")(feats[-1])
        for i in range(self.height - 1, 0, -1):
            skip = feats[i - 1]
            if hx.shape[2:] != skip.shape[2:]:
                hx = _up_like(hx, skip)
            hx = getattr(self, f"rebnconv{i}d")(torch.cat([hx, skip], 1))
        return hx + hxin


class TRSU4F(tnn.Module):
    def __init__(self, in_ch, mid_ch, out_ch):
        super().__init__()
        self.rebnconvin = TREBNCONV(in_ch, out_ch)
        self.rebnconv1 = TREBNCONV(out_ch, mid_ch, 1)
        self.rebnconv2 = TREBNCONV(mid_ch, mid_ch, 2)
        self.rebnconv3 = TREBNCONV(mid_ch, mid_ch, 4)
        self.rebnconv4 = TREBNCONV(mid_ch, mid_ch, 8)
        self.rebnconv3d = TREBNCONV(mid_ch * 2, mid_ch, 4)
        self.rebnconv2d = TREBNCONV(mid_ch * 2, mid_ch, 2)
        self.rebnconv1d = TREBNCONV(mid_ch * 2, out_ch, 1)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        hx1 = self.rebnconv1(hxin)
        hx2 = self.rebnconv2(hx1)
        hx3 = self.rebnconv3(hx2)
        hx4 = self.rebnconv4(hx3)
        hx3d = self.rebnconv3d(torch.cat([hx4, hx3], 1))
        hx2d = self.rebnconv2d(torch.cat([hx3d, hx2], 1))
        hx1d = self.rebnconv1d(torch.cat([hx2d, hx1], 1))
        return hx1d + hxin


class TU2NETP(tnn.Module):
    def __init__(self, in_ch=3, out_ch=1):
        super().__init__()
        self.stage1 = TRSU(7, in_ch, 16, 64)
        self.stage2 = TRSU(6, 64, 16, 64)
        self.stage3 = TRSU(5, 64, 16, 64)
        self.stage4 = TRSU(4, 64, 16, 64)
        self.stage5 = TRSU4F(64, 16, 64)
        self.stage6 = TRSU4F(64, 16, 64)
        self.stage5d = TRSU4F(128, 16, 64)
        self.stage4d = TRSU(4, 128, 16, 64)
        self.stage3d = TRSU(5, 128, 16, 64)
        self.stage2d = TRSU(6, 128, 16, 64)
        self.stage1d = TRSU(7, 128, 16, 64)
        self.pool = tnn.MaxPool2d(2, stride=2, ceil_mode=True)
        for i in range(1, 7):
            setattr(self, f"side{i}", tnn.Conv2d(64, out_ch, 3, padding=1))
        self.outconv = tnn.Conv2d(6 * out_ch, out_ch, 1)

    def forward(self, x):
        skips, hx = [], x
        for i in range(1, 6):
            hx = getattr(self, f"stage{i}")(hx)
            skips.append(hx)
            hx = self.pool(hx)
        hx6 = self.stage6(hx)
        outs, hx = [hx6], hx6
        for i in range(5, 0, -1):
            hx = getattr(self, f"stage{i}d")(
                torch.cat([_up_like(hx, skips[i - 1]), skips[i - 1]], 1)
            )
            outs.append(hx)
        sides = []
        for i, feat in enumerate(reversed(outs)):
            d = getattr(self, f"side{i + 1}")(feat)
            if d.shape[2:] != x.shape[2:]:
                d = _up_like(d, x)
            sides.append(d)
        d0 = self.outconv(torch.cat(sides, 1))
        return [torch.sigmoid(d) for d in [d0] + sides]


def _randomize_bn_stats(model, rng):
    """Frozen-BN parity only matters with non-trivial running stats."""
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(m.num_features).astype(np.float32) * 0.3))
            m.running_var.copy_(torch.from_numpy(
                np.abs(rng.randn(m.num_features)).astype(np.float32) + 0.5))


@pytest.fixture(scope="module")
def torch_u2netp():
    torch.manual_seed(0)
    model = TU2NETP().eval()
    with torch.no_grad():
        _randomize_bn_stats(model, np.random.RandomState(1))
    return model


def test_u2netp_parity(torch_u2netp):
    """Converted torch weights reproduce torch activations at 64²."""
    rng = np.random.RandomState(2)
    x = rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1

    with torch.no_grad():
        ref = torch_u2netp(torch.from_numpy(x).permute(0, 3, 1, 2))

    sd = {k: v.detach().numpy() for k, v in torch_u2netp.state_dict().items()}
    params = convert_u2net_sd(sd)
    model = U2Net(full=False)
    d0, sides = model.apply(params, jnp.asarray(x))

    np.testing.assert_allclose(
        np.asarray(d0)[..., 0], ref[0].squeeze(1).numpy(), rtol=1e-4, atol=2e-5
    )
    for ours, theirs in zip(sides, ref[1:]):
        np.testing.assert_allclose(
            np.asarray(ours)[..., 0], theirs.squeeze(1).numpy(),
            rtol=1e-4, atol=2e-5,
        )


def test_converter_consumes_all_keys(torch_u2netp):
    sd = {k: v.detach().numpy() for k, v in torch_u2netp.state_dict().items()}
    params = convert_u2net_sd(sd)["params"]
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    n_bn_tracked = sum(1 for k in sd if k.endswith("num_batches_tracked"))
    assert len(flat) == len(sd) - n_bn_tracked

    # init-shape agreement with the flax module
    import jax

    shapes = jax.eval_shape(
        lambda: U2Net(full=False).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
        )
    )["params"]
    flat_init = flax.traverse_util.flatten_dict(shapes)
    assert set(flat.keys()) == set(flat_init.keys())
    for k, v in flat.items():
        assert v.shape == flat_init[k].shape, k


def test_full_variant_builds():
    import jax

    shapes = jax.eval_shape(
        lambda: U2Net(full=True).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )
    )
    import flax

    n = sum(int(np.prod(s.shape))
            for s in jax.tree.leaves(shapes["params"]))
    assert 40_000_000 < n < 50_000_000  # u2net full ≈ 44M params


def test_segment_mask_range(torch_u2netp):
    sd = {k: v.detach().numpy() for k, v in torch_u2netp.state_dict().items()}
    params = convert_u2net_sd(sd)
    img = (np.random.RandomState(3).rand(70, 50, 3) * 255).astype(np.uint8)
    mask = np.asarray(segment(U2Net(full=False), params, img, size=64))
    assert mask.shape == (70, 50)
    assert mask.min() >= 0.0 and mask.max() <= 1.0 + 1e-6


def test_preprocess_normalization():
    img = np.full((40, 40, 3), 255, np.uint8)
    x = np.asarray(preprocess(img, size=32))
    assert x.shape == (1, 32, 32, 3)
    # max-normalized to 1.0 then ImageNet-normalized
    np.testing.assert_allclose(
        x[0, 0, 0], (1.0 - np.array([0.485, 0.456, 0.406]))
        / np.array([0.229, 0.224, 0.225]), rtol=1e-5,
    )


def test_postprocess_minmax():
    d0 = jnp.asarray(np.random.RandomState(4).rand(1, 16, 16, 1) * 0.4 + 0.3)
    m = np.asarray(postprocess(d0, (16, 16)))
    assert abs(m.min()) < 1e-5 and abs(m.max() - 1.0) < 1e-5


class TU2NET(tnn.Module):
    """Full-width torch u2net (xuebinqin layout) for converter parity."""

    def __init__(self, in_ch=3, out_ch=1):
        super().__init__()
        self.stage1 = TRSU(7, in_ch, 32, 64)
        self.stage2 = TRSU(6, 64, 32, 128)
        self.stage3 = TRSU(5, 128, 64, 256)
        self.stage4 = TRSU(4, 256, 128, 512)
        self.stage5 = TRSU4F(512, 256, 512)
        self.stage6 = TRSU4F(512, 256, 512)
        self.stage5d = TRSU4F(1024, 256, 512)
        self.stage4d = TRSU(4, 1024, 128, 256)
        self.stage3d = TRSU(5, 512, 64, 128)
        self.stage2d = TRSU(6, 256, 32, 64)
        self.stage1d = TRSU(7, 128, 16, 64)
        self.pool = tnn.MaxPool2d(2, stride=2, ceil_mode=True)
        for i, ch in enumerate([64, 64, 128, 256, 512, 512]):
            setattr(self, f"side{i + 1}", tnn.Conv2d(ch, out_ch, 3, padding=1))
        self.outconv = tnn.Conv2d(6 * out_ch, out_ch, 1)

    forward = TU2NETP.forward


def test_u2net_full_parity():
    """Full-width u2net: converted torch weights reproduce activations."""
    torch.manual_seed(3)
    ref = TU2NET().eval()
    with torch.no_grad():
        _randomize_bn_stats(ref, np.random.RandomState(4))

    rng = np.random.RandomState(5)
    x = rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 3, 1, 2))

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_u2net_sd(sd)
    d0, sides = U2Net(full=True).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(d0)[..., 0], want[0].squeeze(1).numpy(),
        rtol=1e-4, atol=3e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sides[-1])[..., 0], want[6].squeeze(1).numpy(),
        rtol=1e-4, atol=3e-5,
    )
