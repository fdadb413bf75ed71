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


def test_weight_injection_full_forward_parity(rng):
    """Copy our initialized params into the reference social_dmrgcn and compare
    the FULL forward (disentangled multi-relational GCN + TPCNN/GTA stack) end
    to end (reference: baseline/dmrgcn/predictor.py:61-98, bridge.py:21-41)."""
    torch = pytest.importorskip("torch")
    from tests._reference import patch_torch_cpu, reference_module

    reference_module("baseline")
    patch_torch_cpu()
    from baseline.dmrgcn.predictor import social_dmrgcn
    from baseline.dmrgcn import bridge as ref_bridge

    n = 7
    c_obs = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    aux = {"ped_valid": jnp.ones(n, bool)}
    inputs = dmrgcn.prepare(c_obs, ori, aux)
    model = dmrgcn.make_model(CFG)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    p = variables["params"]

    ref = social_dmrgcn(n_stgcn=1, n_tpcnn=4, input_feat=1, output_feat=S,
                        seq_len=K + 2, pred_seq_len=K, kernel_size=3)
    ref.eval()

    def cp(t, arr):
        with torch.no_grad():
            t.copy_(torch.from_numpy(np.asarray(arr).copy()))

    g = p["st_dmrgcn_0"]
    tg = ref.st_dmrgcns[0]
    for r in range(2):
        cp(tg.gcns[r].conv.weight, g[f"gcn_{r}"]["conv"]["kernel"])
        cp(tg.gcns[r].conv.bias, g[f"gcn_{r}"]["conv"]["bias"])
    cp(tg.tcn[0].weight, g["tcn_prelu"]["alpha"])
    cp(tg.tcn[1].weight, g["tcn_conv"]["kernel"])
    cp(tg.tcn[1].bias, g["tcn_conv"]["bias"])
    cp(tg.residual[0].weight, g["res_conv"]["kernel"])
    cp(tg.residual[0].bias, g["res_conv"]["bias"])
    cp(tg.prelu.weight, g["out_prelu"]["alpha"])

    for i in range(4):
        q = p[f"tpcnn_{i}"]
        tp = ref.tpcnns[i]
        for j in range(2):
            cp(tp.tpcn[j][0].weight, q[f"tpcn_{j}"]["kernel"])
            cp(tp.tpcn[j][0].bias, q[f"tpcn_{j}"]["bias"])
            cp(tp.tpcn[j][1].weight, q[f"tpcn_prelu_{j}"]["alpha"])
        cp(tp.gtacn[0][0].weight, q["gta_0"]["kernel"])
        cp(tp.gtacn[0][0].bias, q["gta_0"]["bias"])
        cp(tp.gtacn[0][1].weight, q["gta_prelu_0"]["alpha"])
        if i == 0:
            cp(tp.residual[0].weight, q["res_conv"]["kernel"])
            cp(tp.residual[0].bias, q["res_conv"]["bias"])

    obs_t = torch.from_numpy(np.asarray(c_obs).copy())
    ori_t = torch.from_numpy(np.asarray(ori).copy())
    with torch.no_grad():
        tin = ref_bridge.model_forward_pre_hook(obs_t, ori_t)
        tout = ref_bridge.model_forward(tin, ref)
        ref_pred = ref_bridge.model_forward_post_hook(tout).numpy()  # (k, N, s)

    ours = np.asarray(dmrgcn.finalize(model.apply(variables, *inputs, train=False), aux))
    np.testing.assert_allclose(ours, ref_pred, atol=1e-4)
