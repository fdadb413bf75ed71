"""SVD descriptor identities + parity (reference: EigenTrajectory/descriptor.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from eigentrajectory_tpu.etspace.descriptor import (
    fit_basis,
    project,
    reconstruct,
    reconstruct_norm,
    truncated_svd,
)
from eigentrajectory_tpu.etspace.normalizer import compute_norm_params, normalize
from tests._reference import reference_module
from tests.conftest import make_scene


def test_full_rank_identity(rng):
    """With k = T*dim, project->reconstruct is the identity."""
    obs, pred = make_scene(rng, n_ped=40)
    p = compute_norm_params(jnp.asarray(obs))
    pred_norm = normalize(jnp.asarray(pred), p)
    u, _, _ = truncated_svd(pred_norm, k=pred.shape[1] * 2)
    c = project(pred_norm, u)                       # (k, N)
    back = reconstruct_norm(c[:, :, None], u)[0]    # (N, T, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pred_norm), atol=1e-3)


def test_error_monotone_in_k(rng):
    obs, pred = make_scene(rng, n_ped=200)
    p = compute_norm_params(jnp.asarray(obs))
    pred_norm = normalize(jnp.asarray(pred), p)
    errs = []
    for k in [1, 2, 4, 6, 8]:
        u, _, _ = truncated_svd(pred_norm, k=k)
        c = project(pred_norm, u)
        back = reconstruct_norm(c[:, :, None], u)[0]
        errs.append(float(jnp.linalg.norm(back - pred_norm)))
    assert all(a >= b - 1e-5 for a, b in zip(errs, errs[1:])), errs


def test_orthonormal_basis(rng):
    obs, pred = make_scene(rng, n_ped=100)
    p = compute_norm_params(jnp.asarray(obs))
    pred_norm = normalize(jnp.asarray(pred), p)
    u, _, _ = truncated_svd(pred_norm, k=6)
    np.testing.assert_allclose(np.asarray(u.T @ u), np.eye(6), atol=1e-5)


def test_reconstruction_error_parity_with_reference(rng):
    """Reconstruction error through our basis matches the reference's SVD path.

    Signs/column choices may differ between SVD backends, but the subspace and
    hence the reconstruction error must agree (descriptor.py:91-176).
    """
    torch = pytest.importorskip("torch")
    et = reference_module("EigenTrajectory")
    obs, pred = make_scene(rng, n_ped=300)
    k = 6

    class HP(dict):
        __getattr__ = dict.get

    hp = HP(obs_len=8, pred_len=12, obs_svd=True, pred_svd=True, k=k,
            num_samples=1, traj_dim=2)
    ref_desc = et.model.ETDescriptor(hyper_params=hp, norm_sca=True)
    ref_desc.parameter_initialization(torch.from_numpy(obs), torch.from_numpy(pred))
    ref_c_obs, ref_c_pred = ref_desc.projection(torch.from_numpy(obs), torch.from_numpy(pred))
    ref_recon = ref_desc.reconstruction(ref_c_pred.unsqueeze(-1)).detach().numpy()

    basis, _ = fit_basis(jnp.asarray(obs), jnp.asarray(pred), k, norm_sca=True)
    p = compute_norm_params(jnp.asarray(obs))
    c_pred = project(normalize(jnp.asarray(pred), p, sca=True), basis.U_pred)
    recon = np.asarray(reconstruct(c_pred[:, :, None], basis.U_pred, p, norm_sca=True))

    # Low-rank reconstructions agree even if basis signs differ.
    np.testing.assert_allclose(recon, ref_recon, atol=2e-3)
