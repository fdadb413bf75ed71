"""TrajNorm parity + round-trip identities (reference: EigenTrajectory/normalizer.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from eigentrajectory_tpu.etspace.normalizer import (
    compute_norm_params,
    denormalize,
    normalize,
)
from tests._reference import reference_module


def test_round_trip(scene):
    obs, pred = scene
    p = compute_norm_params(jnp.asarray(obs))
    for flags in [dict(), dict(sca=False), dict(rot=False), dict(ori=False)]:
        nrm = normalize(jnp.asarray(pred), p, **flags)
        back = denormalize(nrm, p, **flags)
        np.testing.assert_allclose(np.asarray(back), pred, atol=1e-4)


def test_last_obs_maps_to_origin(scene):
    obs, _ = scene
    p = compute_norm_params(jnp.asarray(obs))
    nrm = np.asarray(normalize(jnp.asarray(obs), p))
    np.testing.assert_allclose(nrm[:, -1], 0.0, atol=1e-5)


def test_heading_alignment(scene):
    """After rotation, the (last - 3rd-last) direction lies on +x with length 2."""
    obs, _ = scene
    p = compute_norm_params(jnp.asarray(obs))
    nrm = np.asarray(normalize(jnp.asarray(obs), p))
    d = nrm[:, -1] - nrm[:, -3]
    np.testing.assert_allclose(d[:, 1], 0.0, atol=1e-4)
    np.testing.assert_allclose(d[:, 0], 2.0, atol=1e-4)


@pytest.mark.parametrize("sca", [True, False])
def test_parity_with_reference(scene, sca):
    torch = pytest.importorskip("torch")
    et = reference_module("EigenTrajectory")
    obs, pred = scene

    ref_norm = et.TrajNorm(ori=True, rot=True, sca=sca)
    ref_norm.calculate_params(torch.from_numpy(obs))
    ref_out = ref_norm.normalize(torch.from_numpy(pred)).numpy()
    ref_back = ref_norm.denormalize(torch.from_numpy(ref_out)).numpy()

    p = compute_norm_params(jnp.asarray(obs))
    out = np.asarray(normalize(jnp.asarray(pred), p, sca=sca))
    back = np.asarray(denormalize(jnp.asarray(out), p, sca=sca))

    np.testing.assert_allclose(out, ref_out, atol=1e-4)
    np.testing.assert_allclose(back, ref_back, atol=1e-4)
