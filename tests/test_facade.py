"""Facade forward parity + padding invariance (reference: EigenTrajectory/model.py:58-125)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eigentrajectory_tpu.etspace.facade import (
    calculate_parameters,
    et_forward,
    moving_mask,
)
from tests._reference import reference_module
from tests.conftest import make_scene

K, S, STATIC_DIST = 6, 20, 0.35


def _mixed_scene(rng, n_moving=8, n_static=4):
    """Scene with both moving and near-static peds."""
    obs_m, pred_m = make_scene(rng, n_ped=n_moving, speed=1.5)
    obs_s, pred_s = make_scene(rng, n_ped=n_static, speed=0.01)
    return (np.concatenate([obs_m, obs_s]), np.concatenate([pred_m, pred_s]))


def _fit_params(rng):
    obs, pred = _mixed_scene(rng, 150, 60)
    et = calculate_parameters(jax.random.PRNGKey(0), obs, pred, K, S, STATIC_DIST)
    return et, obs, pred


def zero_predictor(c_obs, obs_ori, aux):
    return jnp.zeros((c_obs.shape[0], c_obs.shape[1], S), c_obs.dtype)


def test_forward_shapes_and_losses(rng):
    et, obs, pred = _fit_params(rng)
    o, p = _mixed_scene(rng)
    valid = jnp.ones(o.shape[0], bool)
    out = et_forward(et, zero_predictor, jnp.asarray(o), valid, STATIC_DIST,
                     pred_traj=jnp.asarray(p))
    assert out["recon_traj"].shape == (S, o.shape[0], 12, 2)
    for k in ["loss_eigentraj", "loss_euclidean_ade", "loss_euclidean_fde"]:
        v = float(out[k])
        assert np.isfinite(v) and v >= 0, (k, v)


def test_padding_invariance(rng):
    """Adding invalid padded slots must not change any valid output or loss."""
    et, _, _ = _fit_params(rng)
    o, p = _mixed_scene(rng)
    n = o.shape[0]
    valid = jnp.ones(n, bool)
    out = et_forward(et, zero_predictor, jnp.asarray(o), valid, STATIC_DIST,
                     pred_traj=jnp.asarray(p))

    pad = 5
    o_pad = np.concatenate([o, np.zeros((pad, 8, 2), np.float32)])
    p_pad = np.concatenate([p, np.zeros((pad, 12, 2), np.float32)])
    valid_pad = jnp.asarray([True] * n + [False] * pad)
    out_pad = et_forward(et, zero_predictor, jnp.asarray(o_pad), valid_pad,
                         STATIC_DIST, pred_traj=jnp.asarray(p_pad))

    np.testing.assert_allclose(
        np.asarray(out_pad["recon_traj"][:, :n]),
        np.asarray(out["recon_traj"]), atol=1e-4)
    for k in ["loss_eigentraj", "loss_euclidean_ade", "loss_euclidean_fde"]:
        np.testing.assert_allclose(float(out_pad[k]), float(out[k]), atol=1e-4)


def test_forward_parity_with_reference(rng):
    """Inject our fitted basis/anchors into the reference module, run both
    forwards with a zero predictor, and compare recon + losses."""
    torch = pytest.importorskip("torch")
    et_mod = reference_module("EigenTrajectory")
    et, _, _ = _fit_params(rng)
    o, p = _mixed_scene(rng)

    class HP(dict):
        __getattr__ = dict.get

    hp = HP(obs_len=8, pred_len=12, obs_svd=True, pred_svd=True, k=K,
            num_samples=S, traj_dim=2, static_dist=STATIC_DIST)

    class ZeroBaseline(torch.nn.Module):
        def forward(self, x):
            return torch.zeros(K, x.shape[1], S)

    hooks = HP(model_forward_pre_hook=lambda c, ori, aux: torch.cat([c, ori], dim=0),
               model_forward=lambda x, m: m(x),
               model_forward_post_hook=lambda y, aux: y)
    ref = et_mod.EigenTrajectory(ZeroBaseline(), hooks, hp)
    with torch.no_grad():
        ref.ET_m_descriptor.U_obs_trunc.copy_(torch.from_numpy(np.asarray(et.basis_m.U_obs)))
        ref.ET_m_descriptor.U_pred_trunc.copy_(torch.from_numpy(np.asarray(et.basis_m.U_pred)))
        ref.ET_s_descriptor.U_obs_trunc.copy_(torch.from_numpy(np.asarray(et.basis_s.U_obs)))
        ref.ET_s_descriptor.U_pred_trunc.copy_(torch.from_numpy(np.asarray(et.basis_s.U_pred)))
        ref.ET_m_anchor.C_anchor.copy_(torch.from_numpy(np.asarray(et.anchor_m)))
        ref.ET_s_anchor.C_anchor.copy_(torch.from_numpy(np.asarray(et.anchor_s)))

    ref_out = ref(torch.from_numpy(o), torch.from_numpy(p))

    valid = jnp.ones(o.shape[0], bool)
    out = et_forward(et, zero_predictor, jnp.asarray(o), valid, STATIC_DIST,
                     pred_traj=jnp.asarray(p))

    np.testing.assert_allclose(
        np.asarray(out["recon_traj"]),
        ref_out["recon_traj"].detach().numpy(), atol=2e-3)
    for ours, theirs in [("loss_eigentraj", "loss_eigentraj"),
                         ("loss_euclidean_ade", "loss_euclidean_ade"),
                         ("loss_euclidean_fde", "loss_euclidean_fde")]:
        np.testing.assert_allclose(float(out[ours]), float(ref_out[theirs]), atol=1e-3)


def test_moving_mask():
    # Deterministic scene: constant-velocity movers, frozen statics.
    t = np.arange(8, dtype=np.float32)[None, :, None]
    vel = np.array([[[2.0, 0.0]]], np.float32)
    movers = vel * t * np.ones((5, 1, 1), np.float32) * 0.4
    statics = np.zeros((5, 8, 2), np.float32) + np.arange(5, dtype=np.float32)[:, None, None]
    o = np.concatenate([movers, statics])
    m = np.asarray(moving_mask(jnp.asarray(o), STATIC_DIST))
    assert m[:5].all() and not m[5:].any()
