"""tools/verify_weights.py readiness harness (round-1 VERDICT missing #5).

The real released checkpoints don't exist in this environment, so the PASS
path is exercised with a synthetic checkpoint: the toy torch stage-1
VideoLDM from the e2e parity test, saved in the DeepSpeed `.pt` layout the
reference ships (`{'module': {'module.<key>': tensor}}`,
vtdm_gen_v01.py:38-42)."""

import os

import pytest
import yaml

from test_parity_pipeline import build_torch_model, model_config

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow


def test_verify_engine_ckpt_passes_on_toy_deepspeed_pt(tmp_path):
    from tools.verify_weights import verify_engine_ckpt

    tm = build_torch_model(1)
    sd = {"module": {f"module.{k}": v for k, v in tm.state_dict().items()}}
    ckpt = str(tmp_path / "first_stage.pt")
    torch.save(sd, ckpt)

    cfg_path = str(tmp_path / "toy-v01.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"model": model_config("jax", 1)}, f)

    detail = verify_engine_ckpt(cfg_path, ckpt)
    assert "0 missing" in detail and "0 unexpected" in detail, detail
    assert "SHAPE MISMATCH" not in detail
    assert "engine overlay ok" in detail


def test_verify_skips_cleanly_when_absent(tmp_path):
    from tools.verify_weights import verify

    results = verify(ckpt_dir=str(tmp_path / "nonexistent"))
    assert results and all(status == "SKIP" for _, status, _ in results)
