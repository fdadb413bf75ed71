"""ET-STGCNN predictor tests: shapes, padding invariance, adjacency parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eigentrajectory_tpu.models import stgcnn
from tests._reference import reference_module

K, S = 6, 20


class CFG:
    k = K
    num_samples = S


def _inputs(rng, n=9):
    c_obs = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    return c_obs, ori


def test_adjacency_parity_with_reference(rng):
    torch = pytest.importorskip("torch")
    ref = reference_module("baseline.stgcnn.bridge")
    x = rng.normal(size=(1, 1, 8, 7)).astype(np.float32)
    ref_a = ref.generate_adjacency_matrix(torch.from_numpy(x)).squeeze(0).numpy()
    ours = np.asarray(stgcnn.generate_adjacency_matrix(
        jnp.asarray(x), jnp.ones(7, bool)))
    np.testing.assert_allclose(ours, ref_a, atol=1e-5)


def test_adjacency_padding_isolation(rng):
    x = rng.normal(size=(1, 1, 8, 5)).astype(np.float32)
    xp = np.concatenate([x, rng.normal(size=(1, 1, 8, 3)).astype(np.float32)], axis=3)
    valid = jnp.asarray([True] * 5 + [False] * 3)
    a = np.asarray(stgcnn.generate_adjacency_matrix(jnp.asarray(xp), valid))
    base = np.asarray(stgcnn.generate_adjacency_matrix(
        jnp.asarray(x), jnp.ones(5, bool)))
    np.testing.assert_allclose(a[:, :5, :5], base, atol=1e-6)
    assert np.allclose(a[:, 5:, :5], 0) and np.allclose(a[:, :5, 5:], 0)


def test_forward_shape(rng):
    model = stgcnn.make_model(CFG)
    c_obs, ori = _inputs(rng)
    aux = {"ped_valid": jnp.ones(9, bool)}
    inputs = stgcnn.prepare(c_obs, ori, aux)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    out = model.apply(variables, *inputs, train=False)
    c = stgcnn.finalize(out, aux)
    assert c.shape == (K, 9, S)


def test_padding_invariance(rng):
    """Same scene with extra padded slots -> identical output at valid slots."""
    model = stgcnn.make_model(CFG)
    c_obs, ori = _inputs(rng, n=6)
    aux = {"ped_valid": jnp.ones(6, bool)}
    inputs = stgcnn.prepare(c_obs, ori, aux)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    base = stgcnn.finalize(model.apply(variables, *inputs, train=False), aux)

    pad = 4
    c_p = jnp.concatenate([c_obs, jnp.ones((K, pad))], axis=1)
    o_p = jnp.concatenate([ori, jnp.ones((2, pad))], axis=1)
    auxp = {"ped_valid": jnp.asarray([True] * 6 + [False] * pad)}
    inp = stgcnn.prepare(c_p, o_p, auxp)
    outp = stgcnn.finalize(model.apply(variables, *inp, train=False), auxp)
    np.testing.assert_allclose(np.asarray(outp[:, :6]), np.asarray(base), atol=1e-5)


def test_train_mode_updates_stats(rng):
    model = stgcnn.make_model(CFG)
    c_obs, ori = _inputs(rng)
    aux = {"ped_valid": jnp.ones(9, bool)}
    inputs = stgcnn.prepare(c_obs, ori, aux)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    out, updates = model.apply(variables, *inputs, train=True, mutable=["batch_stats"])
    leaves = jax.tree_util.tree_leaves(updates["batch_stats"])
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(leaves, old))
