"""Target-name registry: maps the reference's config `target` strings to
hi3d_tpu classes so the shipped YAML configs (reference configs/train-v01.yaml
etc.) instantiate the TPU-native implementations unchanged.

Entries are lazy ("module:attr" strings) to keep import time low and avoid
cycles. `hi3d_tpu.*` names may also be used directly in configs.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict, Optional

# reference target name -> "hi3d_tpu module path:attribute"
_ALIASES: Dict[str, str] = {
    # --- diffusion math (reference sgm/modules/diffusionmodules/*) ---
    "sgm.modules.diffusionmodules.denoiser.Denoiser": "hi3d_tpu.diffusion.denoiser:Denoiser",
    "sgm.modules.diffusionmodules.denoiser.DiscreteDenoiser": "hi3d_tpu.diffusion.denoiser:DiscreteDenoiser",
    "sgm.modules.diffusionmodules.denoiser_scaling.EDMScaling": "hi3d_tpu.diffusion.scaling:EDMScaling",
    "sgm.modules.diffusionmodules.denoiser_scaling.EpsScaling": "hi3d_tpu.diffusion.scaling:EpsScaling",
    "sgm.modules.diffusionmodules.denoiser_scaling.VScaling": "hi3d_tpu.diffusion.scaling:VScaling",
    "sgm.modules.diffusionmodules.denoiser_scaling.VScalingWithEDMcNoise": "hi3d_tpu.diffusion.scaling:VScalingWithEDMcNoise",
    "sgm.modules.diffusionmodules.discretizer.EDMDiscretization": "hi3d_tpu.diffusion.discretization:EDMDiscretization",
    "sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization": "hi3d_tpu.diffusion.discretization:LegacyDDPMDiscretization",
    "sgm.modules.diffusionmodules.sigma_sampling.EDMSampling": "hi3d_tpu.diffusion.sigma_sampling:EDMSampling",
    "sgm.modules.diffusionmodules.sigma_sampling.DiscreteSampling": "hi3d_tpu.diffusion.sigma_sampling:DiscreteSampling",
    "sgm.modules.diffusionmodules.loss_weighting.UnitWeighting": "hi3d_tpu.diffusion.weighting:UnitWeighting",
    "sgm.modules.diffusionmodules.loss_weighting.EDMWeighting": "hi3d_tpu.diffusion.weighting:EDMWeighting",
    "sgm.modules.diffusionmodules.loss_weighting.VWeighting": "hi3d_tpu.diffusion.weighting:VWeighting",
    "sgm.modules.diffusionmodules.loss_weighting.EpsWeighting": "hi3d_tpu.diffusion.weighting:EpsWeighting",
    "sgm.modules.diffusionmodules.guiders.VanillaCFG": "hi3d_tpu.diffusion.guiders:VanillaCFG",
    "sgm.modules.diffusionmodules.guiders.IdentityGuider": "hi3d_tpu.diffusion.guiders:IdentityGuider",
    "sgm.modules.diffusionmodules.guiders.LinearPredictionGuider": "hi3d_tpu.diffusion.guiders:LinearPredictionGuider",
    "sgm.modules.diffusionmodules.sampling.EulerEDMSampler": "hi3d_tpu.diffusion.samplers:EulerEDMSampler",
    "sgm.modules.diffusionmodules.sampling.HeunEDMSampler": "hi3d_tpu.diffusion.samplers:HeunEDMSampler",
    "sgm.modules.diffusionmodules.sampling.EulerAncestralSampler": "hi3d_tpu.diffusion.samplers:EulerAncestralSampler",
    "sgm.modules.diffusionmodules.sampling.DPMPP2MSampler": "hi3d_tpu.diffusion.samplers:DPMPP2MSampler",
    "sgm.modules.diffusionmodules.sampling.DPMPP2SAncestralSampler": "hi3d_tpu.diffusion.samplers:DPMPP2SAncestralSampler",
    "sgm.modules.diffusionmodules.sampling.LinearMultistepSampler": "hi3d_tpu.diffusion.samplers:LinearMultistepSampler",
    "sgm.modules.diffusionmodules.loss.StandardDiffusionLoss": "hi3d_tpu.diffusion.loss:StandardDiffusionLoss",
    # --- networks ---
    "sgm.modules.diffusionmodules.video_model.VideoUNet": "hi3d_tpu.models.unet:VideoUNet",
    "sgm.modules.diffusionmodules.openaimodel.UNetModel": "hi3d_tpu.models.unet:UNetModel",
    "sgm.modules.diffusionmodules.wrappers.OpenAIWrapper": "hi3d_tpu.models.wrappers:ConcatConditionWrapper",
    "sgm.modules.diffusionmodules.wrappers.IdentityWrapper": "hi3d_tpu.models.wrappers:IdentityWrapper",
    # --- autoencoder ---
    "sgm.models.autoencoder.AutoencoderKL": "hi3d_tpu.models.vae:AutoencoderKL",
    "sgm.models.autoencoder.AutoencoderKLModeOnly": "hi3d_tpu.models.vae:AutoencoderKLModeOnly",
    "sgm.modules.autoencoding.temporal_ae.VideoDecoder": "hi3d_tpu.models.temporal_ae:VideoDecoder",
    "sgm.models.autoencoder.AutoencodingEngine": "hi3d_tpu.models.autoencoding:AutoencodingEngine",
    "sgm.models.autoencoder.AutoencodingEngineLegacy": "hi3d_tpu.models.autoencoding:AutoencodingEngine",
    "sgm.modules.autoencoding.regularizers.DiagonalGaussianRegularizer": "hi3d_tpu.models.autoencoding:DiagonalGaussianRegularizer",
    "sgm.modules.autoencoding.lpips.loss.lpips.LPIPS": "hi3d_tpu.models.lpips:LPIPS",
    "sgm.modules.autoencoding.lpips.model.model.NLayerDiscriminator": "hi3d_tpu.models.discriminator:NLayerDiscriminator",
    "sgm.modules.autoencoding.losses.GeneralLPIPSWithDiscriminator": "hi3d_tpu.models.discriminator:GeneralLPIPSWithDiscriminator",
    "sgm.modules.autoencoding.losses.discriminator_loss.GeneralLPIPSWithDiscriminator": "hi3d_tpu.models.discriminator:GeneralLPIPSWithDiscriminator",
    "sgm.modules.autoencoding.losses.LatentLPIPS": "hi3d_tpu.models.discriminator:LatentLPIPS",
    "sgm.modules.autoencoding.losses.lpips.LatentLPIPS": "hi3d_tpu.models.discriminator:LatentLPIPS",
    "sgm.modules.autoencoding.regularizers.quantize.VectorQuantizer": "hi3d_tpu.models.quantizers:VectorQuantizer",
    "sgm.modules.autoencoding.regularizers.quantize.GumbelQuantizer": "hi3d_tpu.models.quantizers:GumbelQuantizer",
    "sgm.modules.autoencoding.regularizers.quantize.EMAVectorQuantizer": "hi3d_tpu.models.quantizers:EMAVectorQuantizer",
    "sgm.modules.autoencoding.regularizers.quantize.VectorQuantizerWithInputProjection": "hi3d_tpu.models.quantizers:VectorQuantizerWithInputProjection",
    "sgm.modules.diffusionmodules.model.Encoder": "hi3d_tpu.models.vae:Encoder",
    "sgm.modules.diffusionmodules.model.Decoder": "hi3d_tpu.models.vae:Decoder",
    # --- conditioners ---
    "sgm.modules.GeneralConditioner": "hi3d_tpu.conditioners:GeneralConditioner",
    "sgm.modules.encoders.modules.GeneralConditioner": "hi3d_tpu.conditioners:GeneralConditioner",
    "sgm.modules.encoders.modules.FrozenOpenCLIPImageEmbedder": "hi3d_tpu.conditioners:FrozenOpenCLIPImageEmbedder",
    "sgm.modules.encoders.modules.FrozenOpenCLIPImagePredictionEmbedder": "hi3d_tpu.conditioners:FrozenOpenCLIPImagePredictionEmbedder",
    "sgm.modules.encoders.modules.ConcatTimestepEmbedderND": "hi3d_tpu.conditioners:ConcatTimestepEmbedderND",
    "sgm.modules.encoders.modules.VideoPredictionEmbedderWithEncoder": "hi3d_tpu.conditioners:VideoPredictionEmbedderWithEncoder",
    "vtdm.encoders.AesEmbedder": "hi3d_tpu.conditioners:AesEmbedder",
    "vtdm.encoders.DepthEmbedder": "hi3d_tpu.conditioners:DepthEmbedder",
    "sgm.modules.encoders.modules.FrozenOpenCLIPEmbedder": "hi3d_tpu.conditioners:FrozenOpenCLIPEmbedder",
    "sgm.modules.encoders.modules.FrozenOpenCLIPEmbedder2": "hi3d_tpu.conditioners:FrozenOpenCLIPEmbedder",
    "sgm.modules.encoders.modules.IdentityEncoder": "hi3d_tpu.conditioners:IdentityEncoder",
    "sgm.modules.encoders.modules.ClassEmbedder": "hi3d_tpu.conditioners:ClassEmbedder",
    "sgm.modules.encoders.modules.SpatialRescaler": "hi3d_tpu.conditioners:SpatialRescaler",
    "sgm.modules.encoders.modules.FrozenT5Embedder": "hi3d_tpu.conditioners:FrozenT5Embedder",
    "sgm.modules.encoders.modules.FrozenByT5Embedder": "hi3d_tpu.conditioners:FrozenByT5Embedder",
    "sgm.modules.encoders.modules.FrozenCLIPEmbedder": "hi3d_tpu.conditioners:FrozenCLIPEmbedder",
    "sgm.modules.encoders.modules.FrozenCLIPT5Encoder": "hi3d_tpu.conditioners:FrozenCLIPT5Encoder",
    "sgm.modules.encoders.modules.ClassEmbedderForMultiCond": "hi3d_tpu.conditioners:ClassEmbedderForMultiCond",
    "sgm.modules.encoders.modules.LowScaleEncoder": "hi3d_tpu.conditioners:LowScaleEncoder",
    "sgm.modules.encoders.modules.GaussianEncoder": "hi3d_tpu.conditioners:GaussianEncoder",
    "sgm.modules.encoders.modules.InceptionV3": "hi3d_tpu.models.inception:InceptionV3",
    # --- task layer ---
    "vtdm.vtdm_gen_v01.VideoLDM": "hi3d_tpu.engine:VideoLDM",
    "vtdm.vtdm_gen_stage2_degradeImage.VideoLDM": "hi3d_tpu.engine:VideoLDMStage2",
    # --- data ---
    "sgm.data.video_dataset.VideoDataset": "hi3d_tpu.data.video_dataset:VideoDataset",
    "sgm.data.video_dataset_stage2_degradeImages.VideoDataset": "hi3d_tpu.data.video_dataset:VideoDatasetStage2",
    # --- misc ---
    "torch.nn.Identity": "hi3d_tpu.utils.misc:Identity",  # loss placeholder; unused
}


def register(name: str, target: str) -> None:
    """Register (or override) an alias, e.g. for plugins."""
    _ALIASES[name] = target


def resolve(name: str) -> Optional[Any]:
    """Return the class for `name` if it is aliased or a hi3d_tpu path, else None."""
    spec = _ALIASES.get(name)
    if spec is None:
        if name.startswith("hi3d_tpu."):
            module_name, _, attr = name.rpartition(".")
            return getattr(importlib.import_module(module_name), attr)
        return None
    module_name, _, attr = spec.partition(":")
    return getattr(importlib.import_module(module_name), attr)
