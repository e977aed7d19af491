"""Checkpoint conversion: torch (reference layout, NCHW) → hi3d_tpu flax
pytrees (NHWC)."""
