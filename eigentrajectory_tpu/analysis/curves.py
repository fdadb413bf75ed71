"""Curve bases and fitting for descriptor evaluation.

Rebuilt from /root/reference/CurveModel/curve_basis.py (Bézier via log-gamma
binomials, B-spline via scipy) and curve_fitting.py. The reference fits
control points with a 100k-step Adam loop (curve_fitting.py:25-43); the
problem is ordinary linear least squares (recon = basis @ cp), so we solve it
in closed form via the pseudo-inverse — same minimizer, ~10^5x faster
(SURVEY §7.8).
"""
from __future__ import annotations

import numpy as np
from scipy.special import gammaln


def binom(n: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Binomial coefficients via lgamma (curve_basis.py:5-10)."""
    mask = n >= k
    n, k = mask * n, mask * k
    a = gammaln(n + 1) - gammaln(n - k + 1) - gammaln(k + 1)
    return np.exp(a) * mask


def bezier_basis(degree: int = 3, step: int = 13) -> np.ndarray:
    """Bernstein basis polynomials (curve_basis.py:31-37). (step, degree+1)."""
    t = np.linspace(0.0, 1.0, step)[:, None]
    i = np.arange(0, degree + 1, dtype=float)[None, :]
    coef = binom(np.full(degree + 1, float(degree)), np.arange(degree + 1, dtype=float))
    # NOTE: the reference raises (1-t) to i.flip(0) == degree - i.
    return coef[None, :] * (t ** i) * ((1 - t) ** (degree - i))


def bspline_basis(cpoint: int = 7, degree: int = 2, step: int = 13) -> np.ndarray:
    """B-spline basis via scipy (curve_basis.py:40-50). (step, cpoint+1)."""
    from scipy.interpolate import BSpline

    cpoint = cpoint + 1
    steps = np.linspace(0.0, 1.0, step)
    knot = cpoint - degree + 1
    knots_qu = np.concatenate([np.zeros(degree), np.linspace(0, 1, knot), np.ones(degree)])
    bs = np.zeros([step, cpoint])
    for i in range(cpoint):
        bs[:, i] = BSpline(knots_qu, (np.arange(cpoint) == i).astype(float),
                           degree, extrapolate=False)(steps)
    return np.nan_to_num(bs)


def linear_basis(step: int) -> np.ndarray:
    """Two-endpoint linear basis (descriptor_evaluation.py:40-44)."""
    return np.stack([np.linspace(0, 1, step), np.linspace(1, 0, step)], axis=1)


def curve_fit_lstsq(traj: np.ndarray, basis: np.ndarray) -> np.ndarray:
    """Least-squares control-point fit + reconstruction.

    traj: (N, T, dim); basis: (T, n_cp). Returns recon (N, T, dim) — the exact
    optimum of the objective the reference approaches with Adam
    (curve_fitting.py:25-43).
    """
    pinv = np.linalg.pinv(basis)                 # (n_cp, T)
    cp = np.einsum("ct,ntd->ncd", pinv, traj)
    return np.einsum("tc,ncd->ntd", basis, cp)
