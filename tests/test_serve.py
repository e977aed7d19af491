"""Batched serving on the 8-device CPU mesh: sharded multi-asset stage-1
generation (BASELINE config 5 analog at toy size)."""

import numpy as np
import jax
import pytest

from hi3d_tpu.parallel.mesh import make_mesh
from hi3d_tpu.pipelines.serve import OrbitServer
from test_pipeline_i2v import T, RES, tiny_config


@pytest.fixture(scope="module")
def model():
    from hi3d_tpu.config import instantiate_from_config

    m = instantiate_from_config(tiny_config(num_steps=2))
    m.init(latent_hw=(RES // 8, RES // 8), num_frames=2)
    return m


def test_batched_generation_sharded(model):
    mesh = make_mesh(data=4)
    server = OrbitServer(model, mesh=mesh)
    rnd = np.random.RandomState(0)
    images = (rnd.rand(4, RES, RES, 3).astype(np.float32)) * 2.0 - 1.0
    out = server.generate(images, elevations=[0, 10, 20, 30],
                          rng=jax.random.PRNGKey(5))
    assert out.shape == (4, T, RES, RES, 3)
    assert np.all(np.isfinite(out))
    # different conditioning images → different orbits
    assert float(np.abs(out[0] - out[1]).mean()) > 1e-4


def test_batch_must_divide_mesh(model):
    mesh = make_mesh(data=4)
    server = OrbitServer(model, mesh=mesh)
    with pytest.raises(ValueError):
        server.generate(np.zeros((3, RES, RES, 3), np.float32))
