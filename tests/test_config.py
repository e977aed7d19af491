"""Config system: YAML merge semantics, dotlist overrides, registry aliasing."""

import textwrap

import pytest

from hi3d_tpu.config import (
    apply_dotlist,
    instantiate_from_config,
    load_config,
    merge_configs,
)
from hi3d_tpu.diffusion.scaling import VScalingWithEDMcNoise
from hi3d_tpu.diffusion.discretization import EDMDiscretization

pytestmark = pytest.mark.slow



def test_load_and_merge(tmp_path):
    a = tmp_path / "a.yaml"
    a.write_text(
        textwrap.dedent(
            """
            model:
              params:
                num_samples: 16
                scale_factor: 0.18215
            data:
              width: 512
            """
        )
    )
    b = tmp_path / "b.yaml"
    b.write_text(
        textwrap.dedent(
            """
            model:
              params:
                num_samples: 8
            """
        )
    )
    cfg = load_config([str(a), str(b)])
    assert cfg["model"]["params"]["num_samples"] == 8  # right file wins
    assert cfg["model"]["params"]["scale_factor"] == 0.18215  # untouched keys kept
    assert cfg["data"]["width"] == 512


def test_dotlist_overrides():
    cfg = {"model": {"params": {"num_samples": 16}}}
    apply_dotlist(cfg, ["model.params.num_samples=4", "data.width=256", "flag=true"])
    assert cfg["model"]["params"]["num_samples"] == 4
    assert cfg["data"]["width"] == 256
    assert cfg["flag"] is True


def test_merge_configs_does_not_mutate():
    a = {"x": {"y": 1}}
    b = {"x": {"z": 2}}
    out = merge_configs(a, b)
    assert out == {"x": {"y": 1, "z": 2}}
    assert a == {"x": {"y": 1}}


def test_instantiate_reference_target_names():
    # reference configs use sgm.* paths; they must resolve to hi3d_tpu classes
    obj = instantiate_from_config(
        {
            "target": "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise"
        }
    )
    assert isinstance(obj, VScalingWithEDMcNoise)

    disc = instantiate_from_config(
        {
            "target": "sgm.modules.diffusionmodules.discretizer.EDMDiscretization",
            "params": {"sigma_max": 700.0},
        }
    )
    assert isinstance(disc, EDMDiscretization)
    assert disc.sigma_max == 700.0


def test_instantiate_hi3d_target_names():
    obj = instantiate_from_config(
        {"target": "hi3d_tpu.diffusion.scaling.EDMScaling", "params": {"sigma_data": 1.0}}
    )
    assert obj.sigma_data == 1.0


def test_aux_embedder_aliases_resolve():
    from hi3d_tpu import registry

    for name in [
        "sgm.modules.encoders.modules.IdentityEncoder",
        "sgm.modules.encoders.modules.ClassEmbedder",
        "sgm.modules.encoders.modules.SpatialRescaler",
        "sgm.modules.encoders.modules.FrozenT5Embedder",
        "sgm.models.autoencoder.AutoencodingEngine",
        "sgm.modules.autoencoding.temporal_ae.VideoDecoder",
        "sgm.modules.diffusionmodules.sampling.DPMPP2SAncestralSampler",
        "sgm.modules.diffusionmodules.sampling.LinearMultistepSampler",
        "sgm.modules.autoencoding.lpips.loss.lpips.LPIPS",
    ]:
        assert registry.resolve(name) is not None, name


def test_class_embedder_and_rescaler():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hi3d_tpu.conditioners import ClassEmbedder, SpatialRescaler

    emb = ClassEmbedder(16, n_classes=10)
    emb.input_key = "cls"
    emb.init_params(jax.random.PRNGKey(0))
    out = emb(jnp.asarray([0, 9]))
    assert out.shape == (2, 16)
    uc = emb.get_unconditional_conditioning(3)
    assert int(uc["cls"][0]) == 9

    resc = SpatialRescaler(n_stages=2, multiplier=0.5)
    out = resc(jnp.ones((1, 32, 32, 3)))
    assert out.shape == (1, 8, 8, 3)
    vid = SpatialRescaler(n_stages=1, multiplier=0.5, wrap_video=True)
    out = vid(jnp.ones((2, 4, 16, 16, 3)))
    assert out.shape == (2, 4, 8, 8, 3)


import pytest


@pytest.mark.parametrize("name,in_ch,adm", [
    ("inference-v01.yaml", 8, 768),
    ("inference-v02.yaml", 17, 512),
    ("train-v01.yaml", 8, 768),
    ("train-v02.yaml", 17, 512),
])
def test_shipped_configs_instantiate(name, in_ch, adm):
    """The four reference-schema YAMLs build the full module graph (no param
    init — cheap) with the documented channel wiring (SURVEY.md §2.4:
    stage-1 4+4 concat / adm 768; stage-2 4+9+4 / adm 512)."""
    import os

    from hi3d_tpu.pipelines.common import create_model

    path = os.path.join(os.path.dirname(__file__), "..", "configs", name)
    model, cfg = create_model(path)
    assert model.model.in_channels == in_ch
    assert model.model.adm_in_channels == adm
    assert model.model.model_channels == 320
    assert model.sampler is not None
    assert model.conditioner is not None and len(model.conditioner.embedders) >= 3
    if name.startswith("train"):
        assert model.loss_fn is not None
        assert "data" in cfg
