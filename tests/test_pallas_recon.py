"""Fused Pallas reconstruction kernel vs the reference einsum path
(interpret mode on CPU; the driver exercises the compiled path on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from eigentrajectory_tpu.etspace.descriptor import reconstruct
from eigentrajectory_tpu.etspace.normalizer import NormParams
from eigentrajectory_tpu.ops.pallas_recon import fused_reconstruct


def test_fused_reconstruct_matches_einsum_path(rng):
    k, n, s, t = 6, 37, 20, 12
    c_m = jnp.asarray(rng.normal(size=(k, n, s)).astype(np.float32))
    c_s = jnp.asarray(rng.normal(size=(k, n, s)).astype(np.float32))
    u_m = jnp.asarray(rng.normal(size=(t * 2, k)).astype(np.float32))
    u_s = jnp.asarray(rng.normal(size=(t * 2, k)).astype(np.float32))
    ori = rng.normal(size=(n, 2)).astype(np.float32)
    ang = rng.normal(size=(n,)).astype(np.float32)
    rot = np.stack([np.stack([np.cos(ang), -np.sin(ang)], 1),
                    np.stack([np.sin(ang), np.cos(ang)], 1)], 1).astype(np.float32)
    sca = (2.0 / (0.5 + np.abs(rng.normal(size=(n,))))).astype(np.float32)
    mask = rng.random(n) > 0.3

    p = NormParams(ori=jnp.asarray(ori[:, None, :]), rot=jnp.asarray(rot),
                   sca=jnp.asarray(sca[:, None, None]))
    recon_m = reconstruct(c_m, u_m, p, norm_sca=True)
    recon_s = reconstruct(c_s, u_s, p, norm_sca=False)
    expected = jnp.where(jnp.asarray(mask)[None, :, None, None], recon_m, recon_s)

    got = fused_reconstruct(c_m, c_s, u_m, u_s, jnp.asarray(ori), jnp.asarray(rot),
                            jnp.asarray(sca), jnp.asarray(mask), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-4, rtol=1e-4)


def test_fused_recon_metrics_matches_reference_metrics(rng):
    from eigentrajectory_tpu import metrics as M
    from eigentrajectory_tpu.ops.pallas_recon import fused_recon_metrics

    k, n, s, t = 6, 45, 20, 12
    c_m = jnp.asarray(rng.normal(size=(k, n, s)).astype(np.float32))
    c_s = jnp.asarray(rng.normal(size=(k, n, s)).astype(np.float32))
    u_m = jnp.asarray(rng.normal(size=(t * 2, k)).astype(np.float32))
    u_s = jnp.asarray(rng.normal(size=(t * 2, k)).astype(np.float32))
    ori = rng.normal(size=(n, 2)).astype(np.float32)
    ang = rng.normal(size=(n,)).astype(np.float32)
    rot = np.stack([np.stack([np.cos(ang), -np.sin(ang)], 1),
                    np.stack([np.sin(ang), np.cos(ang)], 1)], 1).astype(np.float32)
    sca = (2.0 / (0.5 + np.abs(rng.normal(size=(n,))))).astype(np.float32)
    mask = rng.random(n) > 0.4
    gt = jnp.asarray(rng.normal(size=(n, t, 2)).astype(np.float32))

    recon, ade, fde, tcc = fused_recon_metrics(
        c_m, c_s, u_m, u_s, jnp.asarray(ori), jnp.asarray(rot),
        jnp.asarray(sca), jnp.asarray(mask), gt, interpret=True)

    from eigentrajectory_tpu.ops.pallas_recon import fused_reconstruct
    expected_recon = fused_reconstruct(c_m, c_s, u_m, u_s, jnp.asarray(ori),
                                       jnp.asarray(rot), jnp.asarray(sca),
                                       jnp.asarray(mask), interpret=True)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(expected_recon),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ade), np.asarray(M.ade(recon, gt)),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(fde), np.asarray(M.fde(recon, gt)),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tcc), np.asarray(M.tcc(recon, gt)),
                               atol=1e-4, rtol=1e-4)
