"""EigenTrajectory descriptor: truncated-SVD basis fit, projection and
reconstruction, as pure functions.

Replaces the reference ETDescriptor (EigenTrajectory/descriptor.py:6-181).
The reference reconstructs sample-by-sample in a Python loop
(descriptor.py:173-174); here both projection and reconstruction are single
einsums batched over peds and samples, which XLA fuses onto the MXU.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .normalizer import NormParams, compute_norm_params, denormalize, normalize


class ETBasis(NamedTuple):
    """Truncated SVD bases (descriptor.py:26-27). Frozen after init."""

    U_obs: jnp.ndarray   # (t_obs * dim, k)
    U_pred: jnp.ndarray  # (t_pred * dim, k)


def truncated_svd(traj_norm: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Truncated SVD of stacked normalized trajectories (descriptor.py:91-114).

    traj_norm: (N, T, dim). The data matrix is M = reshape(N, T*dim).T with
    shape (T*dim, N); returns (U_trunc (T*dim, k), S_trunc (k,), V_trunc (N, k)).

    Singular-vector signs are canonicalized so each column's largest-magnitude
    entry is positive. torch.linalg.svd has its own arbitrary sign convention
    (SURVEY §7 hard part 2); end-to-end metrics are sign-invariant because the
    basis, anchors, and training all share one convention.

    The factorization itself runs host-side in float64 LAPACK: it executes once
    at init (descriptor.py:116-142 equivalent), and jnp's float32 SVD is ~1e-3
    off-orthonormal — too loose for checkpoint-level parity.
    """
    import numpy as np

    n, t, dim = traj_norm.shape
    m = np.asarray(traj_norm, np.float64).reshape(n, t * dim).T
    u, s, vt = np.linalg.svd(m, full_matrices=False)
    u_t, s_t, v_t = u[:, :k], s[:k], vt[:k, :].T
    # Deterministic sign fix.
    idx = np.argmax(np.abs(u_t), axis=0)
    signs = np.sign(u_t[idx, np.arange(u_t.shape[1])])
    signs = np.where(signs == 0, 1.0, signs)
    return (
        jnp.asarray(u_t * signs, jnp.float32),
        jnp.asarray(s_t, jnp.float32),
        jnp.asarray(v_t * signs, jnp.float32),
    )


def fit_basis(
    obs_traj: jnp.ndarray,
    pred_traj: jnp.ndarray,
    k: int,
    norm_sca: bool,
    eps: float = 0.0,
) -> Tuple[ETBasis, jnp.ndarray]:
    """Fit the truncated bases (parameter_initialization, descriptor.py:116-142).

    Normalization params are computed from the *observed* part and applied to
    both segments (descriptor.py:29-44). Returns the basis and the normalized
    pred trajectories (reused for anchor generation, descriptor.py:141-142).
    """
    p = compute_norm_params(obs_traj, eps=eps)
    obs_norm = normalize(obs_traj, p, sca=norm_sca)
    pred_norm = normalize(pred_traj, p, sca=norm_sca)
    u_obs, _, _ = truncated_svd(obs_norm, k)
    u_pred, _, _ = truncated_svd(pred_norm, k)
    return ETBasis(U_obs=u_obs, U_pred=u_pred), pred_norm


def project(traj_norm: jnp.ndarray, evec: jnp.ndarray) -> jnp.ndarray:
    """Euclidean -> ET space (to_ET_space, descriptor.py:59-73).

    traj_norm: (N, T, dim), evec: (T*dim, k). Returns C (k, N).
    """
    n = traj_norm.shape[0]
    m = traj_norm.reshape(n, -1)               # (N, T*dim)
    return jnp.einsum("tk,nt->kn", evec, m, precision="highest")


def reconstruct_norm(c_pred: jnp.ndarray, evec: jnp.ndarray, dim: int = 2) -> jnp.ndarray:
    """ET -> normalized Euclidean, batched over the sample axis.

    c_pred: (k, N, s), evec: (T*dim, k). Returns (s, N, T, dim).
    Replaces the per-sample Python loop at descriptor.py:173-174 with one
    einsum.
    """
    k, n, s = c_pred.shape
    m = jnp.einsum("tk,kns->snt", evec, c_pred, precision="highest")
    t = evec.shape[0] // dim
    return m.reshape(s, n, t, dim)


def reconstruct(
    c_pred: jnp.ndarray,
    evec: jnp.ndarray,
    p: NormParams,
    norm_sca: bool,
    dim: int = 2,
) -> jnp.ndarray:
    """Full reconstruction incl. denormalization (descriptor.py:162-176).

    Returns (s, N, T, dim) trajectories in world coordinates.
    """
    traj_norm = reconstruct_norm(c_pred, evec, dim=dim)
    return denormalize(traj_norm, p, sca=norm_sca)
