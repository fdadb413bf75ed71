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


def test_weight_injection_full_forward_parity(rng):
    """Copy our initialized params into the reference social_stgcnn and compare
    the FULL forward (graph conv + tcn + residual + txp-cnn stack) end to end
    (reference: baseline/stgcnn/model.py:111-146, bridge.py:24-43)."""
    torch = pytest.importorskip("torch")
    reference_module("baseline")  # ensures sys.path + skip-if-absent
    from baseline.stgcnn import model as ref_model
    from baseline.stgcnn import bridge as ref_bridge

    n = 7
    c_obs, ori = _inputs(rng, n)
    aux = {"ped_valid": jnp.ones(n, bool)}
    inputs = stgcnn.prepare(c_obs, ori, aux)
    model = stgcnn.make_model(CFG)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    p = variables["params"]

    ref = ref_model.social_stgcnn(n_stgcnn=1, n_txpcnn=5, input_feat=1,
                                  output_feat=S, seq_len=K + 2, pred_seq_len=K,
                                  kernel_size=3)
    ref.eval()

    def cp(t, arr):
        with torch.no_grad():
            t.copy_(torch.from_numpy(np.asarray(arr).copy()))

    g = p["st_gcn_0"]
    cp(ref.st_gcns[0].gcn.conv.weight, g["gcn_conv"]["kernel"])
    cp(ref.st_gcns[0].gcn.conv.bias, g["gcn_conv"]["bias"])
    cp(ref.st_gcns[0].tcn[0].weight, g["tcn_bn1"]["scale"])
    cp(ref.st_gcns[0].tcn[0].bias, g["tcn_bn1"]["bias"])
    cp(ref.st_gcns[0].tcn[1].weight, g["tcn_prelu"]["alpha"])
    cp(ref.st_gcns[0].tcn[2].weight, g["tcn_conv"]["kernel"])
    cp(ref.st_gcns[0].tcn[2].bias, g["tcn_conv"]["bias"])
    cp(ref.st_gcns[0].tcn[3].weight, g["tcn_bn2"]["scale"])
    cp(ref.st_gcns[0].tcn[3].bias, g["tcn_bn2"]["bias"])
    cp(ref.st_gcns[0].residual[0].weight, g["res_conv"]["kernel"])
    cp(ref.st_gcns[0].residual[0].bias, g["res_conv"]["bias"])
    cp(ref.st_gcns[0].residual[1].weight, g["res_bn"]["scale"])
    cp(ref.st_gcns[0].residual[1].bias, g["res_bn"]["bias"])
    cp(ref.st_gcns[0].prelu.weight, g["out_prelu"]["alpha"])
    # tpcnns[4]/prelus[4] exist in both implementations but are never called
    # (model.py:133-137 stops at n_txpcnn-2); Flax materializes no params for
    # uncalled submodules, so only the 4 live layers are copied.
    for i in range(4):
        cp(ref.tpcnns[i].weight, p[f"tpcnn_{i}"]["kernel"])
        cp(ref.tpcnns[i].bias, p[f"tpcnn_{i}"]["bias"])
        cp(ref.prelus[i].weight, p[f"prelu_{i}"]["alpha"])
    cp(ref.tpcnn_ouput.weight, p["tpcnn_output"]["kernel"])
    cp(ref.tpcnn_ouput.bias, p["tpcnn_output"]["bias"])

    obs_t = torch.from_numpy(np.asarray(c_obs).copy())
    ori_t = torch.from_numpy(np.asarray(ori).copy())
    with torch.no_grad():
        tin = ref_bridge.model_forward_pre_hook(obs_t, ori_t)
        tout = ref_bridge.model_forward(tin, ref)
        ref_pred = ref_bridge.model_forward_post_hook(tout).numpy()  # (k, N, s)

    ours = np.asarray(stgcnn.finalize(model.apply(variables, *inputs, train=False), aux))
    np.testing.assert_allclose(ours, ref_pred, atol=1e-4)
