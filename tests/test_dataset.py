"""Data pipeline parity with the reference TrajectoryDataset (utils/dataloader.py)."""
import os

import numpy as np
import pytest

from eigentrajectory_tpu.data.batching import CollatedBatcher, SceneBatcher
from eigentrajectory_tpu.data.dataset import augment_trajectory, load_trajectory_data
from tests._reference import has_reference, reference_module


def _write_synthetic_split(tmp_path, rng, n_frames=80, n_peds=15):
    """Emit a frame/ped/x/y txt in the ETH-UCY format."""
    rows = []
    for ped in range(n_peds):
        t0 = int(rng.integers(0, 30))
        length = int(rng.integers(10, n_frames - t0))
        x0, y0 = rng.normal(size=2) * 5
        vx, vy = rng.normal(size=2)
        for i in range(length):
            f = (t0 + i) * 10
            rows.append((f, ped + 1, x0 + vx * i * 0.4, y0 + vy * i * 0.4))
    rows.sort()
    d = tmp_path / "split"
    d.mkdir()
    with open(d / "synthetic.txt", "w") as f:
        for r in rows:
            f.write("\t".join(str(v) for v in r) + "\n")
    return str(d)


def test_windowing_parity_with_reference(tmp_path, rng):
    pytest.importorskip("torch")
    ref_dl = reference_module("utils.dataloader")
    data_dir = _write_synthetic_split(tmp_path, rng)

    ref_ds = ref_dl.TrajectoryDataset(data_dir + "/", obs_len=8, pred_len=12)
    ours = load_trajectory_data(data_dir, obs_len=8, pred_len=12)

    np.testing.assert_array_equal(ours.num_peds_in_seq, ref_ds.num_peds_in_seq)
    np.testing.assert_allclose(ours.obs_traj, ref_ds.obs_traj.numpy(), atol=1e-6)
    np.testing.assert_allclose(ours.pred_traj, ref_ds.pred_traj.numpy(), atol=1e-6)
    np.testing.assert_allclose(ours.non_linear_ped, ref_ds.non_linear_ped.numpy(), atol=1e-6)


def test_real_split_parity():
    """Golden parity on the smallest real split when datasets are present."""
    pytest.importorskip("torch")
    path = "/root/reference/datasets/eth/test"
    if not os.path.isdir(path):
        pytest.skip("reference datasets not available")
    ref_dl = reference_module("utils.dataloader")
    ref_ds = ref_dl.TrajectoryDataset(path + "/", obs_len=8, pred_len=12)
    ours = load_trajectory_data(path, obs_len=8, pred_len=12)
    assert ours.num_scenes == len(ref_ds.seq_start_end)
    np.testing.assert_allclose(ours.obs_traj, ref_ds.obs_traj.numpy(), atol=1e-6)
    np.testing.assert_allclose(ours.pred_traj, ref_ds.pred_traj.numpy(), atol=1e-6)


def test_augment_flip(rng):
    obs = rng.normal(size=(4, 8, 2)).astype(np.float32)
    pred = rng.normal(size=(4, 12, 2)).astype(np.float32)
    o2, p2 = augment_trajectory(obs, pred)
    assert o2.shape[0] == 8
    np.testing.assert_allclose(o2[4:, :, 0], obs[:, :, 0])
    np.testing.assert_allclose(o2[4:, :, 1], -obs[:, :, 1])
    np.testing.assert_allclose(p2[4:, :, 1], -pred[:, :, 1])


def test_scene_batcher_shapes(tmp_path, rng):
    data_dir = _write_synthetic_split(tmp_path, rng)
    data = load_trajectory_data(data_dir)
    b = SceneBatcher(data, batch_size=4, shuffle=True, seed=0)
    batches = list(b)
    assert all(x.obs.shape == batches[0].obs.shape for x in batches)
    total_valid = sum(int(x.ped_valid.sum()) for x in batches)
    assert total_valid == data.num_peds
    # padded slots are exactly zero
    for x in batches:
        assert np.all(x.obs[~x.ped_valid] == 0)


def test_collated_batcher_pack(tmp_path, rng):
    data_dir = _write_synthetic_split(tmp_path, rng)
    data = load_trajectory_data(data_dir)
    b = CollatedBatcher(data, batch_size=8, shuffle=False)
    batches = list(b)
    total_valid = sum(int(x.ped_valid.sum()) for x in batches)
    assert total_valid == data.num_peds
    for x in batches:
        assert x.obs.shape[0] == b.p_max
        # scene ids are contiguous blocks
        sid = x.scene_ids[x.ped_valid]
        assert np.all(np.diff(sid) >= 0)
