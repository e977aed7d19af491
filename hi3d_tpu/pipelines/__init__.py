"""Inference pipelines (the reference's pipeline_i2v_eval_v01/v02 CLIs)."""

from .common import create_model

__all__ = ["create_model"]
