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


def test_weight_injection_full_forward_parity(rng):
    """Copy our initialized params into the reference TrajectoryModel and
    compare the FULL forward (sparse attention adjacency, interaction masks,
    dual GCN streams, TCN stack, output head) end to end
    (reference: baseline/sgcn/model.py:224-272, bridge.py:4-24)."""
    import pytest
    torch = pytest.importorskip("torch")
    from tests._reference import patch_torch_cpu, reference_module

    reference_module("baseline")
    patch_torch_cpu()
    from baseline.sgcn.model import TrajectoryModel
    from baseline.sgcn import bridge as ref_bridge

    n = 7
    c_obs = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    aux = {"ped_valid": jnp.ones(n, bool)}
    inputs = sgcn.prepare(c_obs, ori, aux)
    model = sgcn.make_model(CFG)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    p = variables["params"]

    ref = TrajectoryModel(number_asymmetric_conv_layer=7, embedding_dims=64,
                          number_gcn_layers=1, dropout=0, obs_len=K + 2,
                          pred_len=K, n_tcn=5, in_dims=1, out_dims=S,
                          num_heads=4)
    ref.eval()

    def cp(t, arr):
        with torch.no_grad():
            t.copy_(torch.from_numpy(np.asarray(arr).copy()))

    def cp_linear(tmod, q):
        cp(tmod.weight, q["kernel"].T)
        if tmod.bias is not None and "bias" in q:
            cp(tmod.bias, q["bias"])

    adj = p["sparse_adjacency"]
    swa = ref.sparse_weighted_adjacency_matrices
    for name, tattn in (("spatial_attention", swa.spatial_attention),
                        ("temporal_attention", swa.temporal_attention)):
        q = adj[name]
        cp_linear(tattn.embedding, q["embedding"])
        cp_linear(tattn.query, q["query"])
        cp_linear(tattn.key, q["key"])
    cp(swa.spa_fusion.conv[0].weight, adj["spa_fusion_conv"]["kernel"])
    cp(swa.spa_fusion.conv[0].bias, adj["spa_fusion_conv"]["bias"])
    cp(swa.spa_fusion.conv[1].weight, adj["spa_fusion_prelu"]["alpha"])
    im = adj["interaction_mask"]
    for j in range(7):
        for stream, tconvs in (("spatial", swa.interaction_mask.spatial_asymmetric_convolutions),
                               ("temporal", swa.interaction_mask.temporal_asymmetric_convolutions)):
            q = im[f"{stream}_{j}"]
            cp(tconvs[j].conv1.weight, q["conv1"]["kernel"])
            cp(tconvs[j].conv2.weight, q["conv2"]["kernel"])
            cp(tconvs[j].conv2.bias, q["conv2"]["bias"])
            cp(tconvs[j].activation.weight, q["activation"]["alpha"])

    st = p["stsgcn"]
    for ours_name, tmods in (("st_gcn", ref.stsgcn.spatial_temporal_sparse_gcn),
                             ("ts_gcn", ref.stsgcn.temporal_spatial_sparse_gcn)):
        for i in range(2):
            q = st[f"{ours_name}_{i}"]
            cp_linear(tmods[i].embedding, q["embedding"])
            cp(tmods[i].activation.weight, q["activation"]["alpha"])

    cp(ref.fusion_.weight, p["fusion"]["kernel"])
    for j in range(5):
        cp(ref.tcns[j][0].weight, p[f"tcn_{j}"]["kernel"])
        cp(ref.tcns[j][0].bias, p[f"tcn_{j}"]["bias"])
        cp(ref.tcns[j][1].weight, p[f"tcn_prelu_{j}"]["alpha"])
    cp_linear(ref.output, p["output"])

    obs_t = torch.from_numpy(np.asarray(c_obs).copy())
    ori_t = torch.from_numpy(np.asarray(ori).copy())
    with torch.no_grad():
        tin = ref_bridge.model_forward_pre_hook(obs_t, ori_t)
        tout = ref_bridge.model_forward(tin, ref)
        ref_pred = ref_bridge.model_forward_post_hook(tout).numpy()  # (k, N, s)

    ours = np.asarray(sgcn.finalize(model.apply(variables, *inputs, train=False), aux))
    np.testing.assert_allclose(ours, ref_pred, atol=1e-4)
