"""ET-DMRGCN tests: shapes, padding invariance, band disentanglement parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eigentrajectory_tpu.models import dmrgcn

K, S = 6, 20


class CFG:
    k = K
    num_samples = S


def test_disentangle_parity_with_reference(rng):
    torch = pytest.importorskip("torch")
    from tests._reference import reference_module
    ref = reference_module("baseline.dmrgcn.dmrgcn")
    a = np.abs(rng.normal(size=(1, 8, 6, 6))).astype(np.float32)
    ref_bands = ref.get_disentangled_adjacency_matrix(
        torch.from_numpy(a), [0, 0.25, 0.5, 0.75, 1.0]).numpy()
    ours = np.asarray(dmrgcn.disentangle(jnp.asarray(a), (0, 0.25, 0.5, 0.75, 1.0)))
    np.testing.assert_allclose(ours, ref_bands, atol=1e-6)


def test_adjacency_parity_with_reference(rng):
    torch = pytest.importorskip("torch")
    from tests._reference import reference_module
    ref = reference_module("baseline.dmrgcn.bridge")
    v = rng.normal(size=(1, 1, 8, 7)).astype(np.float32)
    ref_a = ref.generate_adjacency_matrix(torch.from_numpy(v)).numpy()
    ours = np.asarray(dmrgcn.generate_adjacency(jnp.asarray(v), jnp.ones(7, bool)))
    np.testing.assert_allclose(ours, ref_a, atol=1e-5)


def test_forward_shape_and_padding(rng):
    model = dmrgcn.make_model(CFG)
    n, pad = 6, 4
    c_obs = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    aux = {"ped_valid": jnp.ones(n, bool)}
    inputs = dmrgcn.prepare(c_obs, ori, aux)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    base = dmrgcn.finalize(model.apply(variables, *inputs, train=False), aux)
    assert base.shape == (K, n, S)

    c_p = jnp.concatenate([c_obs, jnp.ones((K, pad)) * 2], axis=1)
    o_p = jnp.concatenate([ori, jnp.ones((2, pad)) * 2], axis=1)
    auxp = {"ped_valid": jnp.asarray([True] * n + [False] * pad)}
    inp = dmrgcn.prepare(c_p, o_p, auxp)
    outp = dmrgcn.finalize(model.apply(variables, *inp, train=False), auxp)
    np.testing.assert_allclose(np.asarray(outp[:, :n]), np.asarray(base), atol=2e-5)


def test_dropedge_active_in_train(rng):
    model = dmrgcn.make_model(CFG)
    c_obs = jnp.asarray(rng.normal(size=(K, 6)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(2, 6)).astype(np.float32))
    aux = {"ped_valid": jnp.ones(6, bool)}
    inputs = dmrgcn.prepare(c_obs, ori, aux)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    o1 = model.apply(variables, *inputs, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = model.apply(variables, *inputs, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
