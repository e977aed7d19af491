"""Device-mesh parallelism for Hi3D-TPU.

The reference's distributed story is PyTorch-Lightning DDP + DeepSpeed ZeRO-2
over NCCL (train_ddp_spawn.py:230, configs/train-v01.yaml:178). The TPU-native
equivalent is a single-controller `jax.sharding.Mesh`:

- "data" axis: batch (video) sharding — DDP parity. Gradients are reduced by
  XLA (psum / reduce-scatter over ICI) when outputs are requested replicated.
- ZeRO-2 parity: optimizer state is sharded along "data" via NamedShardings
  picked by `zero_partition_spec`; XLA then reduce-scatters grads into the
  shard owners and all-gathers updated params, exactly the ZeRO dataflow.
- "tensor" axis (optional): attention-head / FFN sharding for the UNet at
  sizes beyond one chip's HBM (not needed for reference parity; sized 1 by
  default).
"""

from .mesh import (
    get_mesh,
    make_mesh,
    batch_sharding,
    replicated,
    zero_partition_spec,
    named_shardings,
)

__all__ = [
    "get_mesh",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "zero_partition_spec",
    "named_shardings",
]
