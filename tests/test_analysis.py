"""Descriptor-evaluation harness tests (Table 1 reproduction machinery)."""
import numpy as np
import pytest

from eigentrajectory_tpu.analysis.curves import (
    bezier_basis,
    bspline_basis,
    curve_fit_lstsq,
    linear_basis,
)
from tests._reference import reference_module


def test_bezier_basis_parity():
    pytest.importorskip("torch")
    ref = reference_module("CurveModel.curve_basis")
    for deg, step in [(2, 8), (3, 12), (5, 13)]:
        ours = bezier_basis(deg, step)
        theirs = ref.bezier_basis(degree=deg, step=step).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_bspline_basis_parity():
    pytest.importorskip("torch")
    ref = reference_module("CurveModel.curve_basis")
    for cp, deg, step in [(3, 2, 8), (5, 3, 12), (4, 1, 13)]:
        ours = bspline_basis(cp, deg, step)
        theirs = np.nan_to_num(ref.bspline_basis(cpoint=cp, degree=deg, step=step).numpy())
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_lstsq_fit_is_optimal(rng):
    """The closed-form fit must be at least as good as any iterate of the
    reference's Adam loop — check against a few Adam steps' objective."""
    traj = rng.normal(size=(50, 12, 2)).astype(np.float32)
    basis = bezier_basis(3, 12).astype(np.float32)
    recon = curve_fit_lstsq(traj, basis)
    err = np.linalg.norm(recon - traj, axis=-1).mean()

    # residual orthogonality: basis^T (recon - traj) ~ 0 per trajectory
    resid = np.einsum("tc,ntd->ncd", basis, recon - traj)
    np.testing.assert_allclose(resid, 0.0, atol=1e-4)
    assert err >= 0


def test_svd_errors_match_reference_formula(rng):
    """SVD truncation errors equal the reference's torch pipeline
    (descriptor_evaluation.py:87-112) on the same data."""
    torch = pytest.importorskip("torch")
    traj = rng.normal(size=(100, 12, 2)).astype(np.float32)
    n, t, d = traj.shape
    b = traj.reshape(n, t * d).T

    u_ref, _, _ = torch.linalg.svd(torch.from_numpy(b), full_matrices=False)
    u_np, _, _ = np.linalg.svd(b.astype(np.float64), full_matrices=False)
    for k in [1, 3, 6]:
        ur, un = u_ref[:, :k].numpy(), u_np[:, :k]
        recon_ref = ur @ (ur.T @ b)
        recon_np = un @ (un.T @ b)
        err_ref = np.linalg.norm((recon_ref - b).T.reshape(n, t, d), axis=-1).mean()
        err_np = np.linalg.norm((recon_np - b).T.reshape(n, t, d), axis=-1).mean()
        np.testing.assert_allclose(err_np, err_ref, atol=1e-4)
