"""Pure-functional diffusion math: preconditioning scalings, σ-schedules,
σ-samplers, loss weightings, CFG guiders, denoiser wrappers, and samplers.

Everything here is jit-friendly: static hyperparameters live on small Python
objects, all data-path math is jax.numpy on arrays, and sampler loops are
`lax.scan`/single-step functions.
"""

from .scaling import (  # noqa: F401
    EDMScaling,
    EpsScaling,
    VScaling,
    VScalingWithEDMcNoise,
)
from .discretization import EDMDiscretization, LegacyDDPMDiscretization  # noqa: F401
from .sigma_sampling import EDMSampling, DiscreteSampling  # noqa: F401
from .weighting import (  # noqa: F401
    UnitWeighting,
    EDMWeighting,
    VWeighting,
    EpsWeighting,
)
from .guiders import IdentityGuider, VanillaCFG, LinearPredictionGuider  # noqa: F401
from .denoiser import Denoiser, DiscreteDenoiser  # noqa: F401
from .samplers import (  # noqa: F401
    EulerEDMSampler,
    HeunEDMSampler,
    EulerAncestralSampler,
    DPMPP2MSampler,
)
