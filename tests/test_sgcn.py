"""ET-SGCN predictor tests: shapes, padding invariance, zero-softmax parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eigentrajectory_tpu.models import sgcn

K, S = 6, 20


class CFG:
    k = K
    num_samples = S


def test_zero_softmax_matches_reference_formula(rng):
    torch = pytest.importorskip("torch")
    from tests._reference import reference_module
    ref_model = reference_module("baseline.sgcn.model")
    x = rng.normal(size=(3, 4, 5, 5)).astype(np.float32)
    ref = ref_model.ZeroSoftmax()(torch.from_numpy(x), dim=-1).numpy()
    ours = np.asarray(sgcn.zero_softmax(jnp.asarray(x), axis=-1))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_forward_shape(rng):
    model = sgcn.make_model(CFG)
    n = 7
    c_obs = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    aux = {"ped_valid": jnp.ones(n, bool)}
    inputs = sgcn.prepare(c_obs, ori, aux)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    out = model.apply(variables, *inputs, train=False)
    c = sgcn.finalize(out, aux)
    assert c.shape == (K, n, S)
    assert np.all(np.isfinite(np.asarray(c)))


def test_padding_invariance(rng):
    model = sgcn.make_model(CFG)
    n, pad = 6, 5
    c_obs = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    aux = {"ped_valid": jnp.ones(n, bool)}
    inputs = sgcn.prepare(c_obs, ori, aux)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    base = sgcn.finalize(model.apply(variables, *inputs, train=False), aux)

    c_p = jnp.concatenate([c_obs, jnp.ones((K, pad)) * 7], axis=1)
    o_p = jnp.concatenate([ori, jnp.ones((2, pad)) * 7], axis=1)
    auxp = {"ped_valid": jnp.asarray([True] * n + [False] * pad)}
    inp = sgcn.prepare(c_p, o_p, auxp)
    outp = sgcn.finalize(model.apply(variables, *inp, train=False), auxp)
    np.testing.assert_allclose(np.asarray(outp[:, :n]), np.asarray(base), atol=2e-5)
