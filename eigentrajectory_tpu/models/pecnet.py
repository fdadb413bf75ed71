"""ET-PECNet: endpoint-conditioned MLP predictor in ET coefficient space.

Rebuilt from the behaviour of baseline/pecnet/model.py (PECNet) used through
its `.predict()` path only (bridge.py:9): past-MLP encoder + destination-MLP +
non-local social pooling + predictor MLP. The CVAE `forward` with latent
sampling (model.py:113-163) is never executed in the ET pipeline
(SURVEY §2b), so only the predict-path submodules are instantiated.

ET wiring (utils/trainer.py:307-313 + baseline/pecnet/optimal.yaml):
past_length=k//2 so encoder input is k coefficients; future_length=k*s/2+1 so
the predictor emits 2*(future_length-1)=k*s values; the scene origin doubles
as the "destination" and "initial position" (bridge.py:1-4).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import TorchMLP, zero_invalid

# From baseline/pecnet/optimal.yaml (loaded at utils/trainer.py:304-305).
ENC_PAST_SIZE = (512, 256)
ENC_DEST_SIZE = (8, 16)
PREDICTOR_SIZE = (1024, 512, 256)
NON_LOCAL_THETA = (256, 128, 64)
NON_LOCAL_PHI = (256, 128, 64)
NON_LOCAL_G = (256, 128, 64)
FDIM = 16
NON_LOCAL_DIM = 128
NONLOCAL_POOLS = 3


class PECNetPredict(nn.Module):
    """PECNet.predict (pecnet/model.py:166-176) with social pooling
    (model.py:91-111). Row-renormalized masked softmax matches the reference's
    softmax -> mask -> F.normalize(p=1) composition exactly."""

    future_length: int
    fdim: int = FDIM

    @nn.compact
    def __call__(self, past, generated_dest, mask, initial_pos, train: bool = False):
        ftraj = TorchMLP(ENC_PAST_SIZE, self.fdim, name="encoder_past")(past)
        dest_feat = TorchMLP(ENC_DEST_SIZE, self.fdim, name="encoder_dest")(generated_dest)
        feat = jnp.concatenate([ftraj, dest_feat, initial_pos], axis=1)

        theta = TorchMLP(NON_LOCAL_THETA, NON_LOCAL_DIM, name="non_local_theta")
        phi = TorchMLP(NON_LOCAL_PHI, NON_LOCAL_DIM, name="non_local_phi")
        g = TorchMLP(NON_LOCAL_G, 2 * self.fdim + 2, name="non_local_g")

        m = mask.astype(feat.dtype)
        for _ in range(NONLOCAL_POOLS):
            f = theta(feat) @ phi(feat).T                 # (N, N)
            w = jax.nn.softmax(f, axis=-1) * m
            w = w / jnp.maximum(jnp.sum(jnp.abs(w), axis=1, keepdims=True), 1e-12)
            feat = w @ g(feat) + feat

        return TorchMLP(PREDICTOR_SIZE, 2 * (self.future_length - 1),
                        name="predictor")(feat)


def make_model(cfg):
    return PECNetPredict(future_length=cfg.k * cfg.num_samples // 2 + 1)


def prepare(c_obs: jnp.ndarray, obs_ori: jnp.ndarray, aux: Dict) -> Tuple:
    """Pre-hook (pecnet/bridge.py:1-4): (C_obs^T, ori^T, scene_mask, ori^T)."""
    valid = aux["ped_valid"]
    past = jax.lax.stop_gradient(zero_invalid(c_obs, valid, 1)).T     # (N, k)
    ori = jax.lax.stop_gradient(zero_invalid(obs_ori, valid, 1)).T    # (N, 2)
    mask = aux["scene_mask"] & valid[:, None] & valid[None, :]
    return (past, ori, mask, ori)


def finalize(output_data: jnp.ndarray, aux: Dict) -> jnp.ndarray:
    """Post-hook (pecnet/bridge.py:14-17): (N, k*s) -> (k, N, s)."""
    n, nk = output_data.shape
    s = aux["num_samples"]
    return jnp.transpose(output_data.reshape(n, nk // s, s), (1, 0, 2))


BATCHING = "collated"
