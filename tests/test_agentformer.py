"""ET-AgentFormer tests: shapes, padding invariance, decode-collapse sanity."""
import numpy as np
import jax
import jax.numpy as jnp

from eigentrajectory_tpu.models import agentformer

K, S = 6, 20


class CFG:
    k = K
    num_samples = S


def _inputs(rng, n):
    c_obs = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    return c_obs, ori


def test_forward_shape(rng):
    model = agentformer.make_model(CFG)
    n = 5
    c_obs, ori = _inputs(rng, n)
    aux = {"ped_valid": jnp.ones(n, bool)}
    inputs = agentformer.prepare(c_obs, ori, aux)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    out = model.apply(variables, *inputs, train=False)
    c = agentformer.finalize(out, aux)
    assert c.shape == (K, n, S)
    assert np.all(np.isfinite(np.asarray(c)))


def test_padding_invariance(rng):
    model = agentformer.make_model(CFG)
    n, pad = 4, 3
    c_obs, ori = _inputs(rng, n)
    aux = {"ped_valid": jnp.ones(n, bool)}
    inputs = agentformer.prepare(c_obs, ori, aux)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    base = agentformer.finalize(model.apply(variables, *inputs, train=False), aux)

    c_p = jnp.concatenate([c_obs, jnp.ones((K, pad)) * 3], axis=1)
    o_p = jnp.concatenate([ori, jnp.ones((2, pad)) * 3], axis=1)
    auxp = {"ped_valid": jnp.asarray([True] * n + [False] * pad)}
    inp = agentformer.prepare(c_p, o_p, auxp)
    outp = agentformer.finalize(model.apply(variables, *inp, train=False), auxp)
    np.testing.assert_allclose(np.asarray(outp[:, :n]), np.asarray(base),
                               atol=1e-4, rtol=1e-4)


def test_dropout_rng_changes_train_output(rng):
    model = agentformer.make_model(CFG)
    c_obs, ori = _inputs(rng, 4)
    aux = {"ped_valid": jnp.ones(4, bool)}
    inputs = agentformer.prepare(c_obs, ori, aux)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    o1 = model.apply(variables, *inputs, train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = model.apply(variables, *inputs, train=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
