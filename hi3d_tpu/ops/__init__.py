"""TPU compute kernels: attention (XLA fused and Pallas flash), and layer
primitives shared across models."""

from .attention import dot_product_attention  # noqa: F401
