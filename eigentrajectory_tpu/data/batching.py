"""Static-shape batch construction for XLA.

The reference feeds ragged per-scene tensors (one scene per step, sequenced
trainer at utils/trainer.py:120-154) or ped-packed collated batches
(utils/dataloader.py:38-119). XLA wants static shapes, so both regimes become
padded, masked, fixed-shape arrays:

* sequenced  -> (B, N_max, T, 2) scene batches + (B, N_max) ped validity +
               (B,) scene validity. One optimizer step over B scenes is
               mathematically identical to the reference's gradient
               accumulation over B sequential scenes (trainer.py:135-152),
               since grad((1/B) * sum_b loss_b) == (1/B) * sum_b grad(loss_b).
* collated   -> (P_max, T, 2) flat ped batches + (P_max,) validity + scene ids
               from which the block-diagonal scene mask (dataloader.py:57-62)
               is reconstructed on device.
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence

import numpy as np

from .dataset import TrajectoryData


@dataclasses.dataclass
class SceneBatch:
    """Padded batch of scenes (sequenced regime). All arrays NumPy host-side."""

    obs: np.ndarray          # (B, N, obs_len, 2) float32
    pred: np.ndarray         # (B, N, pred_len, 2) float32
    ped_valid: np.ndarray    # (B, N) bool
    scene_valid: np.ndarray  # (B,) bool
    non_linear: np.ndarray   # (B, N) float32


@dataclasses.dataclass
class CollatedBatch:
    """Padded flat ped batch (collated regime)."""

    obs: np.ndarray        # (P, obs_len, 2) float32
    pred: np.ndarray       # (P, pred_len, 2) float32
    ped_valid: np.ndarray  # (P,) bool
    scene_ids: np.ndarray  # (P,) int32; padded slots get -1
    non_linear: np.ndarray  # (P,) float32


def pad_scenes(
    data: TrajectoryData, indices: Sequence[int], n_max: int, batch: int
) -> SceneBatch:
    """Pad `indices` scenes to a (batch, n_max, ...) block."""
    obs_len = data.obs_traj.shape[1]
    pred_len = data.pred_traj.shape[1]
    obs = np.zeros((batch, n_max, obs_len, 2), np.float32)
    pred = np.zeros((batch, n_max, pred_len, 2), np.float32)
    ped_valid = np.zeros((batch, n_max), bool)
    scene_valid = np.zeros((batch,), bool)
    non_linear = np.zeros((batch, n_max), np.float32)
    for b, idx in enumerate(indices):
        s, e = data.seq_start_end[idx]
        n = e - s
        obs[b, :n] = data.obs_traj[s:e]
        pred[b, :n] = data.pred_traj[s:e]
        ped_valid[b, :n] = True
        scene_valid[b] = True
        non_linear[b, :n] = data.non_linear_ped[s:e]
    return SceneBatch(obs, pred, ped_valid, scene_valid, non_linear)


class SceneBatcher:
    """Iterates padded scene batches; shuffles with NumPy RNG when training.

    Every batch has identical shape (batch_size, n_max, ...) so the train step
    compiles exactly once. The epoch tail is padded with invalid scenes; the
    reference also divides the tail's accumulated loss by the full batch_size
    (trainer.py:146), so padding reproduces the same effective step.
    """

    def __init__(
        self,
        data: TrajectoryData,
        batch_size: int,
        shuffle: bool,
        n_max: Optional[int] = None,
        drop_last: bool = False,
        seed: int = 0,
    ):
        self.data = data
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.n_max = n_max or data.max_peds_per_scene
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = self.data.num_scenes
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[SceneBatch]:
        order = np.arange(self.data.num_scenes)
        if self.shuffle:
            self._rng.shuffle(order)
        bs = self.batch_size
        for i in range(0, len(order), bs):
            chunk = order[i:i + bs]
            if len(chunk) < bs and self.drop_last:
                return
            yield pad_scenes(self.data, chunk.tolist(), self.n_max, bs)


def _collate_groups(
    data: TrajectoryData, order: np.ndarray, batch_size: int, drop_last: bool
) -> List[List[int]]:
    """Greedy ped-count packing (TrajBatchSampler semantics, dataloader.py:87-111)."""
    groups: List[List[int]] = []
    batch: List[int] = []
    total = 0
    for idx in order:
        batch.append(int(idx))
        total += int(data.num_peds_in_seq[idx])
        if total >= batch_size:
            groups.append(batch)
            batch, total = [], 0
    if batch and not drop_last:
        groups.append(batch)
    return groups


def max_collated_peds(data: TrajectoryData, batch_size: int) -> int:
    """Upper bound on the ped count of any greedy-packed batch.

    The packer stops as soon as total >= batch_size, so a batch holds at most
    (batch_size - 1) peds plus one final scene.
    """
    return batch_size - 1 + data.max_peds_per_scene


class CollatedBatcher:
    """Iterates padded flat ped batches (collated regime)."""

    def __init__(
        self,
        data: TrajectoryData,
        batch_size: int,
        shuffle: bool,
        p_max: Optional[int] = None,
        drop_last: bool = False,
        seed: int = 0,
    ):
        self.data = data
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.p_max = p_max or max_collated_peds(data, batch_size)
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self._cached_len: Optional[int] = None

    def __len__(self) -> int:
        if self._cached_len is None:
            order = np.arange(self.data.num_scenes)
            self._cached_len = len(
                _collate_groups(self.data, order, self.batch_size, self.drop_last)
            )
        return self._cached_len

    def __iter__(self) -> Iterator[CollatedBatch]:
        order = np.arange(self.data.num_scenes)
        if self.shuffle:
            self._rng.shuffle(order)
        obs_len = self.data.obs_traj.shape[1]
        pred_len = self.data.pred_traj.shape[1]
        for group in _collate_groups(self.data, order, self.batch_size, self.drop_last):
            obs = np.zeros((self.p_max, obs_len, 2), np.float32)
            pred = np.zeros((self.p_max, pred_len, 2), np.float32)
            valid = np.zeros((self.p_max,), bool)
            scene_ids = np.full((self.p_max,), -1, np.int32)
            non_linear = np.zeros((self.p_max,), np.float32)
            pos = 0
            for sid, idx in enumerate(group):
                s, e = self.data.seq_start_end[idx]
                n = e - s
                obs[pos:pos + n] = self.data.obs_traj[s:e]
                pred[pos:pos + n] = self.data.pred_traj[s:e]
                valid[pos:pos + n] = True
                scene_ids[pos:pos + n] = sid
                non_linear[pos:pos + n] = self.data.non_linear_ped[s:e]
                pos += n
            yield CollatedBatch(obs, pred, valid, scene_ids, non_linear)
