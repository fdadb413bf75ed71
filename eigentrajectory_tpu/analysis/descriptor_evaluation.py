"""Descriptor evaluation harness (Table 1 of the paper).

Rebuilt from /root/reference/script/descriptor_evaluation.py:17-124: compares
Linear / Bézier (degree 2-5) / B-spline / truncated-SVD (k=1..12)
reconstruction error on each split's test set, with ori+rot (no sca)
normalization. Curve fits use the closed-form least-squares solve
(analysis/curves.py) instead of the reference's 100k-step Adam loop.

Run: python -m eigentrajectory_tpu.analysis.descriptor_evaluation
       [--dataset_dir DIR] [--datasets eth hotel ...] [--json out.json]
"""
from __future__ import annotations

import argparse
import json
from typing import Dict, List

import numpy as np

from ..config import resolve_dataset_dir
from ..data.dataset import load_trajectory_data
from ..etspace.normalizer import compute_norm_params, denormalize, normalize
from .curves import bezier_basis, bspline_basis, curve_fit_lstsq, linear_basis


def _recon_error(recon: np.ndarray, target: np.ndarray) -> float:
    return float(np.linalg.norm(recon - target, axis=-1).mean())


def eval_dataset(dataset_dir: str, obs_len: int = 8, pred_len: int = 12) -> List[Dict]:
    """Evaluate all descriptor families on one split's test data."""
    import jax.numpy as jnp

    data = load_trajectory_data(dataset_dir + "/test", obs_len, pred_len)
    obs, pred = data.obs_traj, data.pred_traj
    n_ped, t_obs, dim = obs.shape
    t_pred = pred.shape[1]

    p = compute_norm_params(jnp.asarray(obs))
    obs_norm = np.asarray(normalize(jnp.asarray(obs), p, sca=False))
    pred_norm = np.asarray(normalize(jnp.asarray(pred), p, sca=False))

    def denorm(x):
        return np.asarray(denormalize(jnp.asarray(x), p, sca=False))

    results = []

    def add(method, params, o_recon_norm, p_recon_norm, **extra):
        results.append(dict(
            method=method, num_params=params,
            obs_error=_recon_error(denorm(o_recon_norm), obs),
            pred_error=_recon_error(denorm(p_recon_norm), pred), **extra))

    # Linear (descriptor_evaluation.py:39-49)
    add("linear", 2 * dim,
        curve_fit_lstsq(obs_norm, linear_basis(t_obs)),
        curve_fit_lstsq(pred_norm, linear_basis(t_pred)))

    # Bézier degree 2..5 (descriptor_evaluation.py:51-65)
    for deg in range(2, 6):
        add("bezier", (deg + 1) * dim,
            curve_fit_lstsq(obs_norm, bezier_basis(deg, t_obs)),
            curve_fit_lstsq(pred_norm, bezier_basis(deg, t_pred)),
            degree=deg)

    # B-spline (descriptor_evaluation.py:67-85)
    for deg in range(1, 4):
        for n_curve in range(2, 6):
            if n_curve <= deg:
                continue
            add("bspline", (n_curve + 1) * dim,
                curve_fit_lstsq(obs_norm, bspline_basis(n_curve, deg, t_obs)),
                curve_fit_lstsq(pred_norm, bspline_basis(n_curve, deg, t_pred)),
                degree=deg, n_curve=n_curve)

    # Truncated SVD k=1..12 (descriptor_evaluation.py:87-112)
    a = obs_norm.reshape(n_ped, t_obs * dim).T.astype(np.float64)
    b = pred_norm.reshape(n_ped, t_pred * dim).T.astype(np.float64)
    u_obs, _, _ = np.linalg.svd(a, full_matrices=False)
    u_pred, _, _ = np.linalg.svd(b, full_matrices=False)
    for k in range(1, 13):
        uo, up = u_obs[:, :k], u_pred[:, :k]
        a_recon = (uo @ (uo.T @ a)).T.reshape(n_ped, t_obs, dim)
        b_recon = (up @ (up.T @ b)).T.reshape(n_ped, t_pred, dim)
        add("svd", k, a_recon.astype(np.float32), b_recon.astype(np.float32), k=k)

    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_dir", default="./datasets/")
    parser.add_argument("--datasets", nargs="+",
                        default=["eth", "hotel", "univ", "zara1", "zara2"])
    parser.add_argument("--obs_len", type=int, default=8)
    parser.add_argument("--pred_len", type=int, default=12)
    parser.add_argument("--json", default=None, help="optional JSON output path")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (leaves a busy TPU alone; "
                             "the JAX_PLATFORMS env var is too late once the "
                             "accelerator plugin has registered)")
    args = parser.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    all_results = {}
    for scene in args.datasets:
        print(f"Scene: {scene}")
        rows = eval_dataset(resolve_dataset_dir(args.dataset_dir, scene),
                            args.obs_len, args.pred_len)
        all_results[scene] = rows
        for r in rows:
            extra = {k: v for k, v in r.items()
                     if k not in ("method", "num_params", "obs_error", "pred_error")}
            print(f"  {r['method']:8s} params={r['num_params']:2d} "
                  f"obs={r['obs_error']:.4f} pred={r['pred_error']:.4f} {extra}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(all_results, f, indent=2)


if __name__ == "__main__":
    main()
