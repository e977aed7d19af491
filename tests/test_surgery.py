"""Checkpoint surgery (SVD → vid2vid init) semantics."""

import numpy as np

from tools.make_init_svd_to_vid2vid import surgery


def test_label_emb_surgery():
    w = np.arange(2 * 768, dtype=np.float32).reshape(2, 768)
    out = surgery({"model.diffusion_model.label_emb.0.0.weight": w})
    v = out["model.diffusion_model.label_emb.0.0.weight"]
    assert v.shape == (2, 512)
    np.testing.assert_allclose(v[:, :256], 0.0)     # new elevation slot
    np.testing.assert_allclose(v[:, 256:], w[:, 512:])  # cond_aug slot kept


def test_input_conv_surgery():
    w = np.random.RandomState(0).rand(320, 8, 3, 3).astype(np.float32)
    out = surgery({"model.diffusion_model.input_blocks.0.0.weight": w})
    v = out["model.diffusion_model.input_blocks.0.0.weight"]
    assert v.shape == (320, 17, 3, 3)
    np.testing.assert_allclose(v[:, :4], w[:, :4])      # latent channels
    np.testing.assert_allclose(v[:, 4:13], 0.0)         # depth channels zeroed
    np.testing.assert_allclose(v[:, 13:], w[:, 4:])     # cond-latent channels


def test_other_keys_pass_through():
    w = np.ones((3, 3), np.float32)
    out = surgery({"model.diffusion_model.out.2.weight": w})
    np.testing.assert_allclose(out["model.diffusion_model.out.2.weight"], w)
