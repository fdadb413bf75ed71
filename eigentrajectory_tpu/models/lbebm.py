"""ET-LB-EBM: the LB-EBM predictor's `.predict()` path in ET coefficient space.

Rebuilt from the behaviour of baseline/lbebm/model.py used through `.predict()`
only (bridge.py:7): past-MLP + destination-MLP + predictor MLP. The EBM prior,
Langevin sampler, and replay memory (model.py:84-92, 159-188, 42-59) are never
executed in the ET pipeline (SURVEY §2b), so only the predict-path submodules
are instantiated.

ET wiring (utils/trainer.py:406-427): enc_past (512,256), enc_dest (256,128),
predictor (1024,512,256), fdim=16, sub_goal_indexes=[11] so the destination is
2-D, past_length=k//2, future_length=k*s/2 so the predictor emits k*s values;
the scene origin doubles as the pseudo-destination (bridge.py:1-4).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import TorchMLP, zero_invalid

ENC_PAST_SIZE = (512, 256)
ENC_DEST_SIZE = (256, 128)
PREDICTOR_SIZE = (1024, 512, 256)
FDIM = 16


class LBEBMPredict(nn.Module):
    """LBEBM.predict (lbebm/model.py:190-196)."""

    future_length: int
    fdim: int = FDIM

    @nn.compact
    def __call__(self, past, generated_dest, train: bool = False):
        ftraj = TorchMLP(ENC_PAST_SIZE, self.fdim, name="encoder_past")(past)
        dest_feat = TorchMLP(ENC_DEST_SIZE, self.fdim, name="encoder_dest")(generated_dest)
        feat = jnp.concatenate([ftraj, dest_feat], axis=1)
        return TorchMLP(PREDICTOR_SIZE, 2 * self.future_length, name="predictor")(feat)


def make_model(cfg):
    return LBEBMPredict(future_length=cfg.k * cfg.num_samples // 2)


def prepare(c_obs: jnp.ndarray, obs_ori: jnp.ndarray, aux: Dict) -> Tuple:
    """Pre-hook (lbebm/bridge.py:1-4): (C_obs^T, ori^T)."""
    valid = aux["ped_valid"]
    past = jax.lax.stop_gradient(zero_invalid(c_obs, valid, 1)).T   # (N, k)
    ori = jax.lax.stop_gradient(zero_invalid(obs_ori, valid, 1)).T  # (N, 2)
    return (past, ori)


def finalize(output_data: jnp.ndarray, aux: Dict) -> jnp.ndarray:
    """Post-hook (lbebm/bridge.py:12-17): (N, k*s) -> (k, N, s)."""
    n, nk = output_data.shape
    s = aux["num_samples"]
    return jnp.transpose(output_data.reshape(n, nk // s, s), (1, 0, 2))


BATCHING = "collated"
