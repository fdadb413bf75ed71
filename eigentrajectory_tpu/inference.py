"""Serving-oriented inference API.

The reference exposes prediction only through its test loop
(utils/trainer.py:172-195). For production serving this module wraps a trained
checkpoint behind a single compiled predict function: raw observed
trajectories in, multi-modal futures out, with scene batching handled
internally. One compiled shape per (max_peds) bucket.

    predictor = ETPredictor.from_checkpoint(cfg, tag)
    futures = predictor.predict(obs_traj, scene_ids)   # (S, N, t_pred, 2)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ExpConfig
from .train.trainer import ETJaxTrainer


class ETPredictor:
    """Compiled multi-modal trajectory predictor for one experiment.

    Pass a `jax.sharding.Mesh` (e.g. `parallel.make_mesh()`) to shard the
    scene axis over the mesh's 'data' axis: params are replicated, each
    device predicts its shard of scenes, XLA handles layout — the serving
    equivalent of SURVEY §2c P1 (the reference scales serving only by
    running more single-GPU processes)."""

    def __init__(self, trainer: ETJaxTrainer, bucket: int = 128, mesh=None):
        self.trainer = trainer
        self.cfg = trainer.cfg
        self.bucket = bucket
        self.mesh = mesh
        self._fn = None

    @classmethod
    def from_checkpoint(cls, cfg: ExpConfig, tag: str, bucket: int = 128,
                        datasets=None, mesh=None) -> "ETPredictor":
        tr = ETJaxTrainer(cfg, tag=tag, test_mode=True, datasets=datasets)
        tr.load_model()
        return cls(tr, bucket=bucket, mesh=mesh)

    def _build(self, n_slots: int):
        """Compiled per-scene-batch forward.

        Sequenced predictors build their interaction graph over every ped they
        see, so each scene must be its own padded row (exactly the reference's
        one-scene-per-step semantics); collated predictors take the flat batch
        with a block-diagonal scene mask. Both cases are served by a vmapped
        per-scene function here — for collated models each scene row simply is
        its own block.
        """
        tr = self.trainer

        def fn(params, batch_stats, obs, valid):
            def one(o, v):
                aux = tr._make_aux_template(n_slots)
                out = tr._scene_forward(params, batch_stats, o, None, v,
                                        None, aux, train=False)
                return out["recon_traj"]

            return jax.vmap(one)(obs, valid)

        if self.mesh is None:
            return jax.jit(fn)
        from .parallel import batch_sharding, replicated

        rep, data = replicated(self.mesh), batch_sharding(self.mesh)
        # Scenes shard over 'data'; params/batch_stats replicate. The vmapped
        # per-scene rows are independent, so no collectives are needed — XLA
        # just partitions the scene axis across the mesh.
        return jax.jit(fn, in_shardings=(rep, rep, data, data),
                       out_shardings=data)

    def predict(self, obs_traj: np.ndarray,
                scene_ids: Optional[np.ndarray] = None) -> np.ndarray:
        """obs_traj: (N, t_obs, 2) world coordinates; scene_ids: (N,) ints
        grouping peds into scenes (one scene if None).
        Returns (num_samples, N, t_pred, 2)."""
        n = obs_traj.shape[0]
        if scene_ids is None:
            scene_ids = np.zeros(n, np.int32)
        scene_ids = np.asarray(scene_ids)
        uniq = np.unique(scene_ids)
        max_scene = max(int((scene_ids == u).sum()) for u in uniq)
        n_slots = ((max_scene + self.bucket - 1) // self.bucket) * self.bucket

        if self._fn is None or getattr(self, "_fn_slots", None) != n_slots:
            self._fn = self._build(n_slots)
            self._fn_slots = n_slots

        b = len(uniq)
        if self.mesh is not None:
            # The sharded scene axis must divide evenly over 'data'; pad with
            # all-invalid scenes (masked out, results discarded below).
            n_data = self.mesh.shape["data"]
            b = -(-b // n_data) * n_data
        obs = np.zeros((b, n_slots, obs_traj.shape[1], 2), np.float32)
        valid = np.zeros((b, n_slots), bool)
        index = []
        for i, u in enumerate(uniq):
            sel = np.nonzero(scene_ids == u)[0]
            obs[i, :len(sel)] = obs_traj[sel]
            valid[i, :len(sel)] = True
            index.append(sel)

        out = np.asarray(self._fn(self.trainer.params, self.trainer.batch_stats,
                                  jnp.asarray(obs), jnp.asarray(valid)))
        s = out.shape[1]
        result = np.zeros((s, n, out.shape[3], 2), np.float32)
        for i, sel in enumerate(index):
            result[:, sel] = out[i, :, :len(sel)]
        return result
