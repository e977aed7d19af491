"""Full two-stage chained pipeline (stage 1 → stage 2 → CLIP/aesthetic
scoring) at toy size with random weights — driver BASELINE.json config 4."""

import json
import os

import numpy as np
import pytest

from hi3d_tpu.pipelines.full import ViewScorer, run_two_stage
from test_pipeline_i2v import tiny_config
from test_pipeline_v2v import T, RES, tiny_stage2_config

pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def models():
    from hi3d_tpu.config import instantiate_from_config

    m1 = instantiate_from_config(tiny_config(num_steps=2))
    m1.init(latent_hw=(RES // 8, RES // 8), num_frames=2)
    m2 = instantiate_from_config(tiny_stage2_config())
    m2.init(latent_hw=(RES // 8, RES // 8), num_frames=2)
    return m1, m2


@pytest.fixture(scope="module")
def tiny_scorer():
    from hi3d_tpu.models.clip import CLIPVisionTransformer
    from hi3d_tpu.conditioners import AestheticMLP

    clip = CLIPVisionTransformer(
        width=32, layers=1, heads=2, patch_size=8, image_size=32,
        output_dim=16,
    )
    return ViewScorer(clip=clip, mlp=AestheticMLP())


def test_view_scorer_shapes(tiny_scorer):
    rnd = np.random.RandomState(0)
    ref = rnd.randint(0, 255, (40, 40, 3), np.uint8)
    views = [rnd.randint(0, 255, (40, 40, 3), np.uint8) for _ in range(3)]
    m = tiny_scorer(ref, views)
    assert len(m["clip_similarity"]) == 3
    assert len(m["aesthetic"]) == 3
    assert all(np.isfinite(v) for v in m["clip_similarity"] + m["aesthetic"])
    # identical image scores similarity 1 with itself
    m_same = tiny_scorer(ref, [ref])
    assert m_same["clip_similarity"][0] == pytest.approx(1.0, abs=1e-3)


def test_run_two_stage(models, tiny_scorer, tmp_path):
    import cv2

    m1, m2 = models
    img = np.full((RES, RES, 3), 255, np.uint8)
    img[16:48, 16:48] = [200, 30, 40]
    img_path = str(tmp_path / "in.png")
    cv2.imwrite(img_path, img[..., ::-1])

    out_dir = str(tmp_path / "out")
    result = run_two_stage(
        m1, m2, img_path, out_dir,
        clip_size=T,
        stage1_resolution=(RES, RES),
        stage2_resolution=(RES, RES),
        seed=7,
        skip_rembg=True,
        scorer=tiny_scorer,
    )
    assert os.path.exists(result["first_mp4"])
    assert os.path.exists(result["second_mp4"])
    assert result["total_sec"] > 0
    assert len(result["metrics"]["clip_similarity"]) == T
    with open(os.path.join(out_dir, "metrics.json")) as f:
        on_disk = json.load(f)
    assert on_disk["metrics"]["aesthetic_mean"] == (
        result["metrics"]["aesthetic_mean"]
    )
