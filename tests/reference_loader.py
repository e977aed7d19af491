"""Import the reference torch implementation (read-only at /root/reference)
for activation-parity tests, stubbing out its unavailable heavy deps.

Only leaf modules with pure-torch math are imported (video_model, attention,
autoencoder model blocks); nothing from the reference is executed beyond
building modules and running forwards for golden outputs.
"""

import sys
import types


def _stub(name, **attrs):
    m = sys.modules.get(name) or types.ModuleType(name)
    if getattr(m, "__spec__", None) is None:
        import importlib.machinery

        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        m.__path__ = []  # behave like a package for submodule imports
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


_LOADED = False


def load_reference():
    """Make `sgm` importable from /root/reference; returns the sgm package."""
    global _LOADED
    if not _LOADED:
        import torch

        om = _stub("omegaconf")
        om.OmegaConf = types.SimpleNamespace(to_container=lambda x, **k: x)
        om.ListConfig = list
        om.DictConfig = dict
        pl = _stub("pytorch_lightning")
        pl.LightningModule = torch.nn.Module
        pl.Callback = object
        _stub("pytorch_lightning.utilities", rank_zero_only=lambda f: f)
        _stub("pytorch_lightning.loggers", WandbLogger=object)
        k = _stub("kornia")
        k.geometry = _stub("kornia.geometry", resize=None)
        k.enhance = _stub("kornia.enhance", normalize=None)
        _stub(
            "open_clip",
            create_model_and_transforms=lambda *a, **kw: (None, None, None),
        )
        tv = _stub("torchvision")
        tv.utils = _stub("torchvision.utils", make_grid=lambda *a, **k: None)
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        _LOADED = True
    import sgm

    return sgm


def make_reference_unet(**overrides):
    """Reference VideoUNet at the shared toy config (CPU, fp32, softmax attn)."""
    load_reference()
    from sgm.modules.diffusionmodules.video_model import VideoUNet

    cfg = dict(
        in_channels=8,
        model_channels=32,
        out_channels=4,
        num_res_blocks=1,
        attention_resolutions=[1, 2],
        channel_mult=[1, 2],
        num_classes="sequential",
        num_head_channels=16,
        transformer_depth=1,
        context_dim=64,
        extra_ff_mix_layer=True,
        use_spatial_context=True,
        merge_strategy="learned_with_images",
        video_kernel_size=[3, 1, 1],
        use_linear_in_transformer=True,
        adm_in_channels=48,
        spatial_transformer_attn_type="softmax",
    )
    cfg.update(overrides)
    return VideoUNet(**cfg), cfg


def load_reference_midas(backbone_factory):
    """Import the reference's vendored DPT (annotator/midas) with a stubbed
    `timm` whose create_model returns `backbone_factory(name)` — timm is not
    installed; the test supplies a layout-compatible vit_base_resnet50_384.
    Returns the annotator.midas.dpt_depth module."""
    t = _stub("timm")
    t.create_model = lambda name, pretrained=False, **kw: backbone_factory(name)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import annotator.midas.dpt_depth as dd

    return dd


def make_reference_unet2d(**overrides):
    """Reference 2-D UNetModel (openaimodel.py:472-853) at a toy config."""
    load_reference()
    from sgm.modules.diffusionmodules.openaimodel import UNetModel

    cfg = dict(
        in_channels=4,
        model_channels=32,
        out_channels=4,
        num_res_blocks=1,
        attention_resolutions=[1, 2],
        channel_mult=[1, 2],
        num_classes="sequential",
        num_head_channels=16,
        transformer_depth=1,
        context_dim=64,
        use_linear_in_transformer=True,
        spatial_transformer_attn_type="softmax",
        adm_in_channels=48,
    )
    cfg.update(overrides)
    return UNetModel(**cfg), cfg
