"""End-to-end trainer smoke tests on a tiny synthetic dataset (CPU)."""
import numpy as np
import pytest

from eigentrajectory_tpu.config import ExpConfig
from eigentrajectory_tpu.data.dataset import TrajectoryData
from eigentrajectory_tpu.train.trainer import ETJaxTrainer
from tests.conftest import make_scene


def _synthetic_data(rng, n_scenes=12, max_ped=6):
    obs_list, pred_list, npis = [], [], []
    for _ in range(n_scenes):
        n = int(rng.integers(2, max_ped + 1))
        o, p = make_scene(rng, n_ped=n)
        obs_list.append(o)
        pred_list.append(p)
        npis.append(n)
    obs = np.concatenate(obs_list)
    pred = np.concatenate(pred_list)
    cum = np.concatenate([[0], np.cumsum(npis)])
    return TrajectoryData(
        obs_traj=obs, pred_traj=pred,
        non_linear_ped=np.zeros(obs.shape[0], np.float32),
        loss_mask=np.ones((obs.shape[0], 20), np.float32),
        num_peds_in_seq=np.asarray(npis),
        seq_start_end=[(int(a), int(b)) for a, b in zip(cum, cum[1:])])


@pytest.fixture
def tiny_trainer(rng, tmp_path, monkeypatch):
    def build(baseline="stgcnn", batch_size=4):
        cfg = ExpConfig(baseline=baseline, batch_size=batch_size, num_epochs=2,
                        checkpoint_dir=str(tmp_path), dataset="synthetic")
        monkeypatch.setattr(
            "eigentrajectory_tpu.train.trainer.load_trajectory_data",
            lambda *a, **k: _synthetic_data(np.random.default_rng(1)))
        return ETJaxTrainer(cfg, tag="test")
    return build


@pytest.mark.parametrize("baseline", ["stgcnn", "sgcn", "pecnet", "lbebm", "agentformer",
                                      "dmrgcn", "gpgraphsgcn", "gpgraphstgcnn",
                                      "graphtern", "implicit"])
def test_fit_and_test(tiny_trainer, baseline):
    tr = tiny_trainer(baseline)
    tr.init_descriptor()
    tr.fit(num_epochs=2, verbose=False)
    assert len(tr.log["train_loss"]) == 2
    assert all(np.isfinite(v) for v in tr.log["train_loss"])
    results = tr.test()
    for k in ("ADE", "FDE", "TCC", "COL"):
        assert np.isfinite(results[k]), results


@pytest.mark.parametrize("baseline", ["stgcnn", "pecnet", "agentformer", "lbebm"])
def test_packed_eval_matches_per_scene(tiny_trainer, baseline):
    """test() packs many scenes per dispatch; metrics must match the
    reference's one-scene-per-step evaluation (trainer.py:118,172-195) —
    cross-scene isolation comes from the vmap rows (sequenced) or the
    block-diagonal scene_ids masks (collated)."""
    tr = tiny_trainer(baseline)
    tr.init_descriptor()
    tr.fit(num_epochs=1, verbose=False)
    packed = tr.test()
    # eval_batch/eval_ped_batch = 1 -> exactly one scene per dispatch.
    per_scene = tr.test(eval_batch=1, eval_ped_batch=1)
    for k in packed:
        np.testing.assert_allclose(packed[k], per_scene[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)


def test_loss_decreases(tiny_trainer):
    tr = tiny_trainer("stgcnn")
    tr.init_descriptor()
    tr.fit(num_epochs=5, verbose=False)
    assert tr.log["train_loss"][-1] < tr.log["train_loss"][0]


def test_checkpoint_roundtrip(tiny_trainer):
    tr = tiny_trainer("stgcnn")
    tr.init_descriptor()
    tr.fit(num_epochs=1, verbose=False)
    tr.load_model()
    r1 = tr.test()
    tr2 = tiny_trainer("stgcnn")
    tr2.load_model()
    r2 = tr2.test()
    for k in r1:
        np.testing.assert_allclose(r1[k], r2[k], atol=1e-5)


def test_eval_cache_tracks_dataset_replacement(tiny_trainer):
    """Replacing data_test must rebuild the device-resident eval cache.

    The cache was once keyed on id(data_test); CPython recycles addresses,
    so a replaced split could silently evaluate against the previous split's
    cached device batches. The key now holds the dataset object itself."""
    tr = tiny_trainer("stgcnn")
    tr.init_descriptor()
    tr.fit(num_epochs=1, verbose=False)
    r1 = tr.test()
    cache1 = tr._eval_batches

    tr.data_test = _synthetic_data(np.random.default_rng(99))
    r2 = tr.test()
    assert tr._eval_batches is not cache1, "cache not rebuilt on swap"
    assert tr._eval_batches_data is tr.data_test
    # different synthetic split -> different metrics (same split would match)
    assert abs(r1["ADE"] - r2["ADE"]) > 1e-9
