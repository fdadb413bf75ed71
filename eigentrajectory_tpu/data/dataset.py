"""ETH-UCY trajectory dataset ingestion.

Reproduces the preprocessing semantics of the reference TrajectoryDataset
(/root/reference/utils/dataloader.py:158-232): sliding windows of
obs_len+pred_len frames, keeping only pedestrians observed over the full
window, 4-decimal rounding, min_ped filtering, and a quadratic-polyfit
non-linearity flag. Host-side NumPy only; device arrays are produced by the
batching layer (batching.py) as padded, masked, static-shape scene tensors
for XLA.
"""
from __future__ import annotations

import dataclasses
import math
import os
from typing import List, Tuple

import numpy as np


def read_file(path: str, delim: str = "\t") -> np.ndarray:
    """Parse a `frame ped x y` text file (dataloader.py:122-133)."""
    if delim == "tab":
        delim = "\t"
    elif delim == "space":
        delim = " "
    rows = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip().split(delim)
            rows.append([float(i) for i in line])
    return np.asarray(rows)


def poly_fit(traj: np.ndarray, traj_len: int, threshold: float) -> float:
    """Non-linearity flag via quadratic polyfit residual (dataloader.py:136-151).

    traj: (2, seq_len); returns 1.0 if residual >= threshold else 0.0.
    """
    t = np.linspace(0, traj_len - 1, traj_len)
    res_x = np.polyfit(t, traj[0, -traj_len:], 2, full=True)[1]
    res_y = np.polyfit(t, traj[1, -traj_len:], 2, full=True)[1]
    return 1.0 if res_x + res_y >= threshold else 0.0


@dataclasses.dataclass
class TrajectoryData:
    """Flat per-pedestrian arrays plus scene boundaries.

    Mirrors the reference dataset's members (dataloader.py:224-232):
    obs_traj (N, obs_len, 2), pred_traj (N, pred_len, 2) float32,
    non_linear_ped (N,), loss_mask (N, seq_len), num_peds_in_seq (S,),
    seq_start_end list of (start, end) per scene.
    """

    obs_traj: np.ndarray
    pred_traj: np.ndarray
    non_linear_ped: np.ndarray
    loss_mask: np.ndarray
    num_peds_in_seq: np.ndarray
    seq_start_end: List[Tuple[int, int]]

    @property
    def num_scenes(self) -> int:
        return len(self.seq_start_end)

    @property
    def num_peds(self) -> int:
        return int(self.obs_traj.shape[0])

    @property
    def max_peds_per_scene(self) -> int:
        return int(self.num_peds_in_seq.max())

    def scene(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        s, e = self.seq_start_end[i]
        return self.obs_traj[s:e], self.pred_traj[s:e]


def load_trajectory_data(
    data_dir: str,
    obs_len: int = 8,
    pred_len: int = 12,
    skip: int = 1,
    threshold: float = 0.02,
    min_ped: int = 1,
    delim: str = "\t",
    use_native: bool = True,
) -> TrajectoryData:
    """Build TrajectoryData from a directory of raw txt files.

    Window construction follows dataloader.py:183-222 exactly, including the
    `range(0, num_sequences * skip + 1, skip)` off-by-design loop bound and the
    strict `num_peds_considered > min_ped` filter.

    When the native C++ preprocessor (native/libetloader.so) is built it is
    used instead — bitwise-identical output, ~35x faster (see
    tests/test_native_loader.py); pass use_native=False to force Python.
    """
    if use_native and delim == "\t":
        from .native_loader import load_trajectory_data_native

        native = load_trajectory_data_native(
            data_dir, obs_len, pred_len, skip, threshold, min_ped)
        if native is not None:
            return native
    all_files = sorted(os.listdir(data_dir))
    all_files = [os.path.join(data_dir, p) for p in all_files]
    seq_len = obs_len + pred_len

    num_peds_in_seq: List[int] = []
    seq_list: List[np.ndarray] = []
    loss_mask_list: List[np.ndarray] = []
    non_linear_ped: List[float] = []

    for path in all_files:
        data = read_file(path, delim)
        frames = np.unique(data[:, 0]).tolist()
        frame_data = [data[frame == data[:, 0], :] for frame in frames]
        num_sequences = int(math.ceil((len(frames) - seq_len + 1) / skip))

        for idx in range(0, num_sequences * skip + 1, skip):
            curr_seq_data = np.concatenate(frame_data[idx:idx + seq_len], axis=0)
            peds_in_curr_seq = np.unique(curr_seq_data[:, 1])
            curr_seq = np.zeros((len(peds_in_curr_seq), 2, seq_len))
            curr_loss_mask = np.zeros((len(peds_in_curr_seq), seq_len))
            num_peds_considered = 0
            _non_linear_ped: List[float] = []
            for ped_id in peds_in_curr_seq:
                curr_ped_seq = curr_seq_data[curr_seq_data[:, 1] == ped_id, :]
                curr_ped_seq = np.around(curr_ped_seq, decimals=4)
                pad_front = frames.index(curr_ped_seq[0, 0]) - idx
                pad_end = frames.index(curr_ped_seq[-1, 0]) - idx + 1
                if pad_end - pad_front != seq_len:
                    continue
                xy = np.transpose(curr_ped_seq[:, 2:])
                _idx = num_peds_considered
                curr_seq[_idx, :, pad_front:pad_end] = xy
                _non_linear_ped.append(poly_fit(xy, pred_len, threshold))
                curr_loss_mask[_idx, pad_front:pad_end] = 1
                num_peds_considered += 1

            if num_peds_considered > min_ped:
                non_linear_ped += _non_linear_ped
                num_peds_in_seq.append(num_peds_considered)
                loss_mask_list.append(curr_loss_mask[:num_peds_considered])
                seq_list.append(curr_seq[:num_peds_considered])

    seq_arr = np.concatenate(seq_list, axis=0)
    loss_mask_arr = np.concatenate(loss_mask_list, axis=0)
    nl = np.asarray(non_linear_ped)
    npis = np.array(num_peds_in_seq)

    obs_traj = seq_arr[:, :, :obs_len].astype(np.float32).transpose(0, 2, 1)   # NTC
    pred_traj = seq_arr[:, :, obs_len:].astype(np.float32).transpose(0, 2, 1)  # NTC
    cum = [0] + np.cumsum(npis).tolist()
    seq_start_end = [(int(s), int(e)) for s, e in zip(cum, cum[1:])]

    return TrajectoryData(
        obs_traj=obs_traj,
        pred_traj=pred_traj,
        non_linear_ped=nl.astype(np.float32),
        loss_mask=loss_mask_arr.astype(np.float32),
        num_peds_in_seq=npis,
        seq_start_end=seq_start_end,
    )


def augment_trajectory(
    obs_traj: np.ndarray, pred_traj: np.ndarray, flip: bool = True, reverse: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """Flip augmentation (utils/utils.py:69-86).

    Matches the reference control flow: the flip branch short-circuits reverse
    (utils.py:79-86), so with defaults only y-flip doubling is applied.
    """
    if flip:
        flip_mul = np.array([[[1.0, -1.0]]], dtype=obs_traj.dtype)
        obs_traj = np.concatenate([obs_traj, obs_traj * flip_mul], axis=0)
        pred_traj = np.concatenate([pred_traj, pred_traj * flip_mul], axis=0)
    elif reverse:
        obs_len = obs_traj.shape[1]
        full = np.concatenate([obs_traj, pred_traj], axis=1)
        rev = full[:, ::-1]
        obs_traj = np.concatenate([obs_traj, rev[:, :obs_len]], axis=0)
        pred_traj = np.concatenate([pred_traj, rev[:, obs_len:]], axis=0)
    return obs_traj, pred_traj
