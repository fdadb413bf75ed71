"""Data-parallel mesh training on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import pytest

from eigentrajectory_tpu.config import ExpConfig
from eigentrajectory_tpu.parallel.mesh import make_mesh, shard_batch
from eigentrajectory_tpu.train.trainer import ETJaxTrainer
from tests.test_trainer import _synthetic_data


def test_mesh_construction():
    mesh = make_mesh(n_data=8)
    assert mesh.shape == {"data": 8, "model": 1}


def test_sharded_training_matches_single_device(tmp_path, monkeypatch):
    """Data-parallel training over an 8-way mesh computes the same losses as
    single-device training (parameters drift only by float reassociation,
    which AdamW's 1/sqrt(v) normalization amplifies — so we compare the
    per-epoch loss trajectory, which is the well-conditioned quantity)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    def build(mesh_axes):
        cfg = ExpConfig(baseline="stgcnn", batch_size=8, num_epochs=1,
                        checkpoint_dir=str(tmp_path), dataset="synthetic",
                        mesh_data_axis=mesh_axes)
        data = tuple(_synthetic_data(np.random.default_rng(1)) for _ in range(3))
        tr = ETJaxTrainer(cfg, tag=f"mesh{mesh_axes}", test_mode=True, datasets=data)
        tr.init_descriptor()
        for epoch in range(3):
            tr.train(epoch)
        return tr

    t1 = build(1)
    t8 = build(8)
    np.testing.assert_allclose(t1.log["train_loss"], t8.log["train_loss"],
                               rtol=2e-3)
    # and training actually progressed identically in direction
    assert t8.log["train_loss"][-1] < t8.log["train_loss"][0]
