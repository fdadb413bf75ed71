"""Metric parity with the reference (utils/metrics.py) + hand-computed cases."""
import numpy as np
import jax.numpy as jnp
import pytest

from eigentrajectory_tpu import metrics as M
from tests._reference import reference_module


def _random_preds(rng, s=20, n=7, t=12):
    gt = rng.normal(size=(n, t, 2)).astype(np.float32)
    pred = gt[None] + rng.normal(size=(s, n, t, 2)).astype(np.float32) * 0.5
    return pred, gt


def test_ade_hand_case():
    gt = np.zeros((1, 2, 2), np.float32)
    pred = np.zeros((2, 1, 2, 2), np.float32)
    pred[0] += 1.0   # distance sqrt(2) at both steps
    pred[1] += 0.5   # distance sqrt(0.5)
    out = np.asarray(M.ade(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(out, [np.sqrt(0.5)], atol=1e-6)


def test_fde_hand_case():
    gt = np.zeros((1, 3, 2), np.float32)
    pred = np.zeros((2, 1, 3, 2), np.float32)
    pred[0, 0, -1] = [3.0, 4.0]   # final err 5
    pred[1, 0, -1] = [0.0, 1.0]   # final err 1
    out = np.asarray(M.fde(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(out, [1.0], atol=1e-6)


def test_parity_with_reference(rng):
    torch = pytest.importorskip("torch")
    ref = reference_module("utils.metrics")
    pred, gt = _random_preds(rng)
    tp, tg = torch.from_numpy(pred), torch.from_numpy(gt)

    np.testing.assert_allclose(
        np.asarray(M.ade(jnp.asarray(pred), jnp.asarray(gt))),
        ref.compute_batch_ade(tp, tg), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(M.fde(jnp.asarray(pred), jnp.asarray(gt))),
        ref.compute_batch_fde(tp, tg), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(M.tcc(jnp.asarray(pred), jnp.asarray(gt))),
        ref.compute_batch_tcc(tp, tg), atol=1e-4)
    valid = jnp.ones(pred.shape[1], bool)
    np.testing.assert_allclose(
        np.asarray(M.col(jnp.asarray(pred), valid)),
        ref.compute_batch_col(tp, tg), atol=1e-4)


def test_col_padding_invariance(rng):
    """Padded slots (zeros) must not create phantom collisions."""
    pred, _ = _random_preds(rng, n=5)
    valid = jnp.ones(5, bool)
    base = np.asarray(M.col(jnp.asarray(pred), valid))

    padded = np.concatenate([pred, np.zeros((pred.shape[0], 3, 12, 2), np.float32)], axis=1)
    pvalid = jnp.asarray([True] * 5 + [False] * 3)
    out = np.asarray(M.col(jnp.asarray(padded), pvalid))
    np.testing.assert_allclose(out[:5], base, atol=1e-6)


def test_col_short_horizon(rng):
    """T < 5 must yield a (shorter) window, not a broadcast error.

    The reference densifies all T-1 segments then slices the first 14
    positions (metrics.py:139-143); _dense_window computes only the
    contributing segments and must clamp when fewer exist.
    """
    pred, _ = _random_preds(rng, t=4)

    # numpy reference: full densify (num_interp=4) then [:14]
    p = np.transpose(pred, (0, 2, 1, 3))                  # (S, T, N, 2)
    rel = (p[:, 1:] - p[:, :-1]) / 4.0
    dense = np.concatenate([p[:, :1], np.repeat(rel, 4, axis=1)],
                           axis=1).cumsum(axis=1)[:, :14]
    ours = np.asarray(M._dense_window(jnp.asarray(pred)))
    assert ours.shape == dense.shape == (20, 13, 7, 2)
    np.testing.assert_allclose(ours, dense, atol=1e-5)

    # end-to-end: col() runs without shape errors on the short horizon
    out = np.asarray(M.col(jnp.asarray(pred), jnp.ones(7, bool)))
    assert out.shape == (7,) and np.isfinite(out).all()
