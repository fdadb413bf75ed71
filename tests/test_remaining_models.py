"""GP-Graph (x2), Graph-TERN, Social-Implicit: shapes + padding invariance."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eigentrajectory_tpu.models import get_baseline

K, S = 6, 20


class CFG:
    k = K
    num_samples = S


MODELS = ["gpgraphsgcn", "gpgraphstgcnn", "graphtern", "implicit"]


def _run(mod, c_obs, ori, valid, variables=None):
    aux = {"ped_valid": valid, "num_samples": S}
    inputs = mod.prepare(c_obs, ori, aux)
    if variables is None:
        variables = mod.make_model(CFG).init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            *inputs, train=False)
    out = mod.make_model(CFG).apply(variables, *inputs, train=False)
    return mod.finalize(out, aux), variables


@pytest.mark.parametrize("name", MODELS)
def test_forward_shape(rng, name):
    mod = get_baseline(name)
    n = 7
    c_obs = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    c, _ = _run(mod, c_obs, ori, jnp.ones(n, bool))
    assert c.shape == (K, n, S)
    assert np.all(np.isfinite(np.asarray(c)))


@pytest.mark.parametrize("name", MODELS)
def test_padding_invariance(rng, name):
    mod = get_baseline(name)
    n, pad = 6, 4
    c_obs = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    base, variables = _run(mod, c_obs, ori, jnp.ones(n, bool))

    c_p = jnp.concatenate([c_obs, jnp.ones((K, pad)) * 5], axis=1)
    o_p = jnp.concatenate([ori, jnp.ones((2, pad)) * 5], axis=1)
    valid_p = jnp.asarray([True] * n + [False] * pad)
    outp, _ = _run(mod, c_p, o_p, valid_p, variables)
    np.testing.assert_allclose(np.asarray(outp[:, :n]), np.asarray(base),
                               atol=3e-5, rtol=1e-4)


def test_group_indices_parity_with_reference(rng):
    """find_group_indices sequential relabeling vs the reference loop."""
    torch = pytest.importorskip("torch")
    from tests._reference import reference_module
    from eigentrajectory_tpu.models.gpgraph_common import find_group_indices
    gw = reference_module("baseline.gpgraphsgcn.model_groupwrapper")

    n = 12
    dist = np.abs(rng.normal(size=(n, n))).astype(np.float32)
    dist = (dist + dist.T) / 2
    np.fill_diagonal(dist, 0.0)

    gen = gw.GroupGenerator(d_type="learned_l2norm", th="learned", in_channels=1)
    with torch.no_grad():
        gen.th.copy_(torch.tensor([1.0]))
    ref_idx = gen.find_group_indices(torch.zeros(1, 1, 1, n),
                                     torch.from_numpy(dist)).numpy()

    ranks, n_groups = find_group_indices(
        jnp.asarray(dist), jnp.asarray(1.0), jnp.ones(n, bool))
    np.testing.assert_array_equal(np.asarray(ranks), ref_idx)
    assert int(n_groups) == len(np.unique(ref_idx))
