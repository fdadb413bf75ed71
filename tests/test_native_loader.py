"""Native C++ preprocessor vs pure-Python loader: bitwise parity."""
import numpy as np
import pytest

from eigentrajectory_tpu.data.dataset import load_trajectory_data
from eigentrajectory_tpu.data.native_loader import (
    load_trajectory_data_native,
    native_available,
)
from tests.test_dataset import _write_synthetic_split


@pytest.fixture(autouse=True)
def _need_native():
    if not native_available():
        pytest.skip("native loader not built (make -C native)")


def test_exact_parity_synthetic(tmp_path, rng):
    data_dir = _write_synthetic_split(tmp_path, rng, n_frames=120, n_peds=25)
    py = load_trajectory_data(data_dir, use_native=False)
    nat = load_trajectory_data_native(data_dir)
    np.testing.assert_array_equal(py.num_peds_in_seq, nat.num_peds_in_seq)
    np.testing.assert_array_equal(py.obs_traj, nat.obs_traj)
    np.testing.assert_array_equal(py.pred_traj, nat.pred_traj)
    np.testing.assert_array_equal(py.loss_mask, nat.loss_mask)
    np.testing.assert_array_equal(py.non_linear_ped, nat.non_linear_ped)
    assert py.seq_start_end == nat.seq_start_end


def test_exact_parity_real_split():
    import os

    path = "/root/reference/datasets/hotel/val"
    if not os.path.isdir(path):
        pytest.skip("reference datasets not available")
    py = load_trajectory_data(path, use_native=False)
    nat = load_trajectory_data_native(path)
    np.testing.assert_array_equal(py.obs_traj, nat.obs_traj)
    np.testing.assert_array_equal(py.pred_traj, nat.pred_traj)
    np.testing.assert_array_equal(py.non_linear_ped, nat.non_linear_ped)
