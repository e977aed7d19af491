"""Training subsystem: optimizer, EMA, LR schedules, pjit train step.

Replaces the reference's PyTorch-Lightning + DeepSpeed orchestration
(train_ddp_spawn.py, vtdm/vtdm_gen_v01.py:167-201) with a functional JAX
training loop: one jitted `train_step(state, batch) -> (state, metrics)`
sharded over a device mesh.
"""

from .schedules import (
    LambdaLinearScheduler,
    LambdaWarmUpCosineScheduler,
    LambdaWarmUpCosineScheduler2,
)
from .ema import ema_update
from .state import TrainState, build_optimizer, trainable_mask
from .step import make_train_step

__all__ = [
    "LambdaLinearScheduler",
    "LambdaWarmUpCosineScheduler",
    "LambdaWarmUpCosineScheduler2",
    "ema_update",
    "TrainState",
    "build_optimizer",
    "trainable_mask",
    "make_train_step",
]
