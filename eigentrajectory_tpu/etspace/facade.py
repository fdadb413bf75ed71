"""The EigenTrajectory facade as a pure function.

Replaces the reference EigenTrajectory nn.Module (EigenTrajectory/model.py:7-125).
The reference splits peds into moving/static groups by boolean indexing
(model.py:73-77) — ragged and hostile to XLA. Here both descriptor variants run
densely on *all* peds and results are selected per-ped with jnp.where
(SURVEY §7 hard part 1); numerics on the selected lanes are identical because
normalization/projection are per-ped operations.

Gradient topology matches the reference: C_obs, the bases U, anchors, and the
GT coefficients are all detached (descriptor.py:159, anchor.py:87,
model.py:117); gradients flow only through the predictor output.
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .anchor import generate_anchors, refine
from .descriptor import ETBasis, fit_basis, project, reconstruct
from .normalizer import compute_norm_params, normalize

# Guard for the scale denominator of exactly-static peds; the guarded values
# are only ever used on lanes discarded by the moving/static select.
_SCALE_EPS = 1e-8


class ETParams(NamedTuple):
    """Frozen ET-space parameters (saved in checkpoints, never optimized)."""

    basis_m: ETBasis       # moving-ped descriptor (norm_sca=True, model.py:29)
    basis_s: ETBasis       # static-ped descriptor (norm_sca=False, model.py:30)
    anchor_m: jnp.ndarray  # (k, s)
    anchor_s: jnp.ndarray  # (k, s)


def moving_mask(obs_traj: jnp.ndarray, static_dist: float) -> jnp.ndarray:
    """Moving/static split (model.py:46, model.py:73):
    ||(obs[-1] - obs[-3]) / 2|| > static_dist."""
    d = (obs_traj[:, -1, :] - obs_traj[:, -3, :]) / 2.0
    return jnp.linalg.norm(d, axis=-1) > static_dist


def calculate_parameters(
    key: jax.Array,
    obs_traj: np.ndarray,
    pred_traj: np.ndarray,
    k: int,
    num_samples: int,
    static_dist: float,
) -> ETParams:
    """One-time descriptor + anchor fit (model.py:34-56).

    Host-side ragged gather is fine here (runs once before training); the SVD
    and k-means run on device.
    """
    obs_traj = np.asarray(obs_traj, np.float32)
    pred_traj = np.asarray(pred_traj, np.float32)
    d = (obs_traj[:, -1, :] - obs_traj[:, -3, :]) / 2.0
    mask = np.linalg.norm(d, axis=-1) > static_dist

    obs_m, pred_m = jnp.asarray(obs_traj[mask]), jnp.asarray(pred_traj[mask])
    obs_s, pred_s = jnp.asarray(obs_traj[~mask]), jnp.asarray(pred_traj[~mask])

    basis_m, pred_m_norm = fit_basis(obs_m, pred_m, k, norm_sca=True, eps=_SCALE_EPS)
    basis_s, pred_s_norm = fit_basis(obs_s, pred_s, k, norm_sca=False)

    key_m, key_s = jax.random.split(key)
    anchor_m = generate_anchors(key_m, pred_m_norm, basis_m.U_pred, num_samples)
    anchor_s = generate_anchors(key_s, pred_s_norm, basis_s.U_pred, num_samples)

    return ETParams(basis_m=basis_m, basis_s=basis_s, anchor_m=anchor_m, anchor_s=anchor_s)


def et_forward(
    et: ETParams,
    predictor_fn: Callable[[jnp.ndarray, jnp.ndarray, Dict], jnp.ndarray],
    obs_traj: jnp.ndarray,
    ped_valid: jnp.ndarray,
    static_dist: float,
    pred_traj: Optional[jnp.ndarray] = None,
    aux: Optional[Dict] = None,
    return_coefficients: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Forward pass (model.py:58-125), masked-dense.

    Args:
      et: frozen ET parameters.
      predictor_fn: (C_obs (k, N), obs_ori (2, N), aux) -> C_pred_refine
        (k, N, s) — the bridged baseline predictor (hook triple, model.py:93-95).
      obs_traj: (N, t_obs, 2) padded ped batch.
      ped_valid: (N,) bool validity of each ped slot.
      pred_traj: optional (N, t_pred, 2) GT for the training loss branch.
      aux: extra inputs forwarded to predictor_fn (scene masks etc.).

    Returns dict with recon_traj (s, N, t_pred, 2) and, when pred_traj is
    given, the three losses (masked means over valid peds).
    """
    aux = dict(aux or {})
    n_ped = obs_traj.shape[0]
    mask = moving_mask(obs_traj, static_dist)        # (N,) True = moving

    # Normalization params are shared; only the use of `sca` differs per branch.
    p = compute_norm_params(obs_traj, eps=_SCALE_EPS)

    # --- Projection (model.py:80-83; descriptor.py:144-160) ---
    obs_norm_m = normalize(obs_traj, p, sca=True)
    obs_norm_s = normalize(obs_traj, p, sca=False)
    c_obs_m = project(obs_norm_m, et.basis_m.U_obs)  # (k, N)
    c_obs_s = project(obs_norm_s, et.basis_s.U_obs)
    c_obs = jnp.where(mask[None, :], c_obs_m, c_obs_s)
    c_obs = jax.lax.stop_gradient(c_obs)

    # --- Absolute coordinate, scene-centered (model.py:85-90) ---
    # The reference subtracts the mean origin of the whole forward batch:
    # one scene per forward in the sequenced regime and at eval
    # (trainer.py:118), the full multi-scene collated batch during collated
    # training. `center_scene_ids` (set by the packed eval path) reproduces
    # the per-scene mean via a segment mean so many scenes can share one
    # dispatch without changing the numbers.
    obs_ori = p.ori[:, 0, :].T                        # (2, N)
    valid_f = ped_valid.astype(obs_ori.dtype)
    denom = jnp.maximum(valid_f.sum(), 1.0)
    center_sid = aux.pop("center_scene_ids", None)
    if center_sid is None:
        center = (obs_ori * valid_f[None, :]).sum(axis=1, keepdims=True) / denom
        obs_ori = (obs_ori - center) * valid_f[None, :]
    else:
        same = ((center_sid[:, None] == center_sid[None, :])
                .astype(obs_ori.dtype) * valid_f[None, :])          # (N, N)
        cnt = jnp.maximum(same.sum(axis=1), 1.0)                    # (N,)
        centers = (same @ (obs_ori.T * valid_f[:, None])) / cnt[:, None]  # (N, 2)
        obs_ori = (obs_ori - centers.T) * valid_f[None, :]

    # --- Prediction via the bridged baseline (model.py:93-95) ---
    # OVERWRITE any placeholder: the predictor's interaction graph must see
    # exactly the scene's real peds (a stale all-ones template here once let
    # padded "ghost" peds join the graph — caught by the reference-checkpoint
    # import eval, tests/test_interop.py::test_trainer_eval_matches_plain_path).
    aux["ped_valid"] = ped_valid
    pred_out = predictor_fn(c_obs, obs_ori, aux)       # (k, N, s)
    extras = None
    if isinstance(pred_out, tuple):
        c_pred_refine, extras = pred_out
    else:
        c_pred_refine = pred_out

    # --- Anchor refinement (model.py:98-99; anchor.py:87) ---
    c_pred_m = refine(et.anchor_m, c_pred_refine)
    c_pred_s = refine(et.anchor_s, c_pred_refine)
    c_pred = jnp.where(mask[None, :, None], c_pred_m, c_pred_s)  # (k, N, s)

    if return_coefficients:
        # Defer reconstruction to the caller (e.g. the flattened fused-Pallas
        # eval path); everything needed to reconstruct + denormalize ships out.
        return {
            "c_pred_m": c_pred_m, "c_pred_s": c_pred_s, "moving_mask": mask,
            "norm_ori": p.ori[:, 0, :], "norm_rot": p.rot,
            "norm_sca": p.sca[:, 0, 0],
        }

    # --- Reconstruction (model.py:102-105; descriptor.py:162-176) ---
    recon_m = reconstruct(c_pred_m, et.basis_m.U_pred, p, norm_sca=True)
    recon_s = reconstruct(c_pred_s, et.basis_s.U_pred, p, norm_sca=False)
    recon = jnp.where(mask[None, :, None, None], recon_m, recon_s)  # (s, N, T, 2)

    output = {"recon_traj": recon, "moving_mask": mask}
    if extras is not None:
        output["extras"] = extras

    if pred_traj is not None:
        # GT low-rank approximation (model.py:108-117), detached.
        pred_norm_m = normalize(pred_traj, p, sca=True)
        pred_norm_s = normalize(pred_traj, p, sca=False)
        c_gt_m = project(pred_norm_m, et.basis_m.U_pred)
        c_gt_s = project(pred_norm_s, et.basis_s.U_pred)
        c_pred_gt = jax.lax.stop_gradient(jnp.where(mask[None, :], c_gt_m, c_gt_s))

        # Losses (model.py:119-123) with masked means over valid peds.
        err_coeff = jnp.linalg.norm(c_pred - c_pred_gt[:, :, None], axis=0)  # (N, s)
        err_disp = jnp.linalg.norm(recon - pred_traj[None], axis=-1)         # (s, N, T)

        def masked_mean(x):
            return jnp.sum(x * valid_f) / denom

        output["loss_eigentraj"] = masked_mean(jnp.min(err_coeff, axis=-1))
        output["loss_euclidean_ade"] = masked_mean(jnp.min(jnp.mean(err_disp, axis=-1), axis=0))
        output["loss_euclidean_fde"] = masked_mean(jnp.min(err_disp[:, :, -1], axis=0))

    return output
