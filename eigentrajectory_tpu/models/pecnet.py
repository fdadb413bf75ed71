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
ENC_LATENT_SIZE = (8, 50)
DEC_SIZE = (1024, 512, 1024)
PREDICTOR_SIZE = (1024, 512, 256)
NON_LOCAL_THETA = (256, 128, 64)
NON_LOCAL_PHI = (256, 128, 64)
NON_LOCAL_G = (256, 128, 64)
FDIM = 16
ZDIM = 16
SIGMA = 1.3
NON_LOCAL_DIM = 128
NONLOCAL_POOLS = 3


def _social_pool(theta, phi, g, feat, mask):
    """Non-local social pooling round (pecnet/model.py:91-111): masked
    row-softmax attention with the reference's softmax -> mask ->
    F.normalize(p=1) composition, plus residual."""
    m = mask.astype(feat.dtype)
    f = theta(feat) @ phi(feat).T                     # (N, N)
    w = jax.nn.softmax(f, axis=-1) * m
    w = w / jnp.maximum(jnp.sum(jnp.abs(w), axis=1, keepdims=True), 1e-12)
    return w @ g(feat) + feat


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

        for _ in range(NONLOCAL_POOLS):
            feat = _social_pool(theta, phi, g, feat, mask)

        return TorchMLP(PREDICTOR_SIZE, 2 * (self.future_length - 1),
                        name="predictor")(feat)


class PECNetCVAE(nn.Module):
    """Full PECNet CVAE forward (pecnet/model.py:113-163) — DORMANT in the ET
    pipeline: the bridge drives only predict() (pecnet/bridge.py:9), so this
    module exists for reference-component completeness and is exercised by
    tests (tests/test_dormant_stochastic.py), never by the trainer.

    train=True reproduces the reference's training branch: the destination is
    encoded, a latent (mu, logvar) is inferred, z is reparameterized, and the
    model returns (generated_dest, mu, logvar, pred_future). train=False
    draws z ~ N(0, sigma^2) (the reference's eval branch, model.py:138-143)
    and returns the generated destination only. `eps` injects the standard-
    normal draw for deterministic parity tests; otherwise it comes from the
    'latent' RNG stream.
    """

    future_length: int
    fdim: int = FDIM
    zdim: int = ZDIM
    sigma: float = SIGMA

    @nn.compact
    def __call__(self, past, initial_pos, mask=None, dest=None, eps=None,
                 train: bool = False):
        encoder_past = TorchMLP(ENC_PAST_SIZE, self.fdim, name="encoder_past")
        encoder_dest = TorchMLP(ENC_DEST_SIZE, self.fdim, name="encoder_dest")

        ftraj = encoder_past(past)
        if train and (mask is None or dest is None):
            # Mirror the reference's precondition (pecnet/model.py:117-118,
            # `assert self.training ^ (mask is None)`): the training branch
            # needs the GT destination and the social-pool mask.
            raise ValueError("train=True requires both `dest` and `mask`")
        if train:
            latent = TorchMLP(ENC_LATENT_SIZE, 2 * self.zdim,
                              name="encoder_latent")(
                jnp.concatenate([ftraj, encoder_dest(dest)], axis=1))
            mu, logvar = latent[:, :self.zdim], latent[:, self.zdim:]
            if eps is None:
                eps = jax.random.normal(self.make_rng("latent"), mu.shape)
            z = eps * jnp.exp(0.5 * logvar) + mu
        else:
            if eps is None:
                eps = jax.random.normal(self.make_rng("latent"),
                                        (past.shape[0], self.zdim))
            z = eps * self.sigma
        generated_dest = TorchMLP(DEC_SIZE, 2, name="decoder")(
            jnp.concatenate([ftraj, z], axis=1))
        if not train:
            return generated_dest

        feat = jnp.concatenate(
            [ftraj, encoder_dest(generated_dest), initial_pos], axis=1)
        theta = TorchMLP(NON_LOCAL_THETA, NON_LOCAL_DIM, name="non_local_theta")
        phi = TorchMLP(NON_LOCAL_PHI, NON_LOCAL_DIM, name="non_local_phi")
        g = TorchMLP(NON_LOCAL_G, 2 * self.fdim + 2, name="non_local_g")
        for _ in range(NONLOCAL_POOLS):
            feat = _social_pool(theta, phi, g, feat, mask)
        pred_future = TorchMLP(PREDICTOR_SIZE, 2 * (self.future_length - 1),
                               name="predictor")(feat)
        return generated_dest, mu, logvar, pred_future


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
