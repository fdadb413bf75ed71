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


def test_graphtern_weight_injection_full_forward_parity(rng):
    """Copy our initialized params into the reference graph_tern_light and
    compare the FULL forward (4-relation st_mrgcn + 6 replicate-padded epcnn
    blocks) end to end (reference: baseline/graphtern/model.py:220-264,
    stmrgcn.py:26-113, bridge.py:4-26)."""
    torch = pytest.importorskip("torch")
    from tests._reference import patch_torch_cpu, reference_module

    reference_module("baseline")
    patch_torch_cpu()
    from baseline.graphtern.model import graph_tern_light
    from baseline.graphtern import bridge as ref_bridge
    from eigentrajectory_tpu.models import graphtern

    n = 7
    c_obs = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    aux = {"ped_valid": jnp.ones(n, bool)}
    inputs = graphtern.prepare(c_obs, ori, aux)
    model = graphtern.make_model(CFG)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    p = variables["params"]

    ref = graph_tern_light(n_epgcn=1, n_epcnn=6, input_feat=1,
                           seq_len=K + 2, pred_seq_len=K, n_smpl=S)
    ref.eval()

    def cp(t, arr):
        with torch.no_grad():
            t.copy_(torch.from_numpy(np.asarray(arr).copy()))

    g = p["tp_mrgcn_0"]
    tg = ref.tp_mrgcns[0]
    cp(tg.gcn.conv.weight, g["gcn"]["conv"]["kernel"])
    cp(tg.gcn.conv.bias, g["gcn"]["conv"]["bias"])
    cp(tg.tcn[0].weight, g["tcn_prelu"]["alpha"])
    cp(tg.tcn[1].weight, g["tcn_conv"]["kernel"])
    cp(tg.tcn[1].bias, g["tcn_conv"]["bias"])
    cp(tg.residual[0].weight, g["res_conv"]["kernel"])
    cp(tg.residual[0].bias, g["res_conv"]["bias"])

    for k in range(6):
        q = p[f"epcnn_{k}"]
        te = ref.tpcnns[k]
        cp(te.tpcns[0][0].weight, q["tpcn"]["conv"]["kernel"])
        cp(te.tpcns[0][0].bias, q["tpcn"]["conv"]["bias"])
        cp(te.tpcns[0][1].weight, q["tpcn_prelu"]["alpha"])
        cp(te.cpcns[0][0].weight, q["cpcn"]["conv"]["kernel"])
        cp(te.cpcns[0][0].bias, q["cpcn"]["conv"]["bias"])
        cp(te.cpcns[0][1].weight, q["cpcn_prelu"]["alpha"])
        if k == 0:  # seq 8 -> 6, channels equal: restconv only
            cp(te.restconv[0].weight, q["restconv"]["kernel"])
            cp(te.restconv[0].bias, q["restconv"]["bias"])
        elif k == 5:  # channels 16 -> 20, seq equal: rescconv only
            cp(te.rescconv[0].weight, q["rescconv"]["kernel"])
            cp(te.rescconv[0].bias, q["rescconv"]["bias"])

    obs_t = torch.from_numpy(np.asarray(c_obs).copy())
    ori_t = torch.from_numpy(np.asarray(ori).copy())
    with torch.no_grad():
        tin = ref_bridge.model_forward_pre_hook(obs_t, ori_t)
        tout = ref_bridge.model_forward(tin, ref)
        ref_pred = ref_bridge.model_forward_post_hook(tout).numpy()  # (k, N, s)

    ours = np.asarray(graphtern.finalize(model.apply(variables, *inputs, train=False), aux))
    np.testing.assert_allclose(ours, ref_pred, atol=1e-4)


def test_implicit_weight_injection_full_forward_parity(rng):
    """Copy our initialized params into the reference SocialImplicitLight and
    compare the FULL forward (zone bucketize + per-zone global/local cells,
    compaction/scatter vs the reference's boolean gather) end to end
    (reference: baseline/implicit/model.py:126-159, bridge.py:4-23)."""
    torch = pytest.importorskip("torch")
    from tests._reference import patch_torch_cpu, reference_module

    reference_module("baseline")
    patch_torch_cpu()
    from baseline.implicit.model import SocialImplicitLight
    from baseline.implicit import bridge as ref_bridge
    from eigentrajectory_tpu.models import implicit

    n = 9
    # Spread first-coefficient magnitudes so several zones are populated.
    c_obs = rng.normal(size=(K, n)).astype(np.float32)
    c_obs[0] = np.asarray([0.0, 0.005, 0.005, 0.05, 0.05, 0.5, 0.5, 2.0, 2.0])
    c_obs = jnp.asarray(c_obs)
    ori = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    aux = {"ped_valid": jnp.ones(n, bool)}
    inputs = implicit.prepare(c_obs, ori, aux)
    model = implicit.make_model(CFG)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    p = variables["params"]

    ref = SocialImplicitLight(spatial_input=1, spatial_output=S,
                              temporal_input=K + 2, temporal_output=K,
                              bins=[0, 0.01, 0.1, 1.2],
                              noise_weight=[0.05, 1, 4, 8])
    ref.eval()

    def cp(t, arr):
        with torch.no_grad():
            t.copy_(torch.from_numpy(np.asarray(arr).copy()))

    for i in range(4):
        q = p[f"cell_{i}"]
        tc = ref.implicit_cells[i]
        # global/local/noise fusion scalars are zeros-init on both sides; set
        # them to nonzero values so both streams contribute to the output.
        with torch.no_grad():
            tc.global_w.fill_(0.7)
            tc.local_w.fill_(0.3)
        q["global_w"] = jnp.asarray([0.7])
        q["local_w"] = jnp.asarray([0.3])
        cp(tc.feat.weight, q["feat"]["kernel"])
        cp(tc.feat.bias, q["feat"]["bias"])
        cp(tc.highway_input.weight, q["highway_input"]["kernel"])
        cp(tc.highway_input.bias, q["highway_input"]["bias"])
        cp(tc.highway.weight, q["highway"]["kernel"])
        cp(tc.highway.bias, q["highway"]["bias"])
        cp(tc.tpcnn.weight, q["tpcnn"]["kernel"])
        cp(tc.tpcnn.bias, q["tpcnn"]["bias"])
        lp = q["ped"]
        cp(tc.ped.feat.weight, lp["feat"]["conv"]["kernel"][..., 0])
        cp(tc.ped.feat.bias, lp["feat"]["conv"]["bias"])
        cp(tc.ped.highway_input.weight, lp["highway_input"]["conv"]["kernel"][..., 0])
        cp(tc.ped.highway_input.bias, lp["highway_input"]["conv"]["bias"])
        cp(tc.ped.highway.weight, lp["highway"]["conv"]["kernel"][..., 0])
        cp(tc.ped.highway.bias, lp["highway"]["conv"]["bias"])
        cp(tc.ped.tpcnn.weight, lp["tpcnn"]["conv"]["kernel"][..., 0])
        cp(tc.ped.tpcnn.bias, lp["tpcnn"]["conv"]["bias"])

    variables = {"params": p}

    obs_t = torch.from_numpy(np.asarray(c_obs).copy())
    ori_t = torch.from_numpy(np.asarray(ori).copy())
    with torch.no_grad():
        tin = ref_bridge.model_forward_pre_hook(obs_t, ori_t)
        tout = ref_bridge.model_forward(tin, ref)
        ref_pred = ref_bridge.model_forward_post_hook(tout).numpy()  # (k, N, s)

    ours = np.asarray(implicit.finalize(model.apply(variables, *inputs, train=False), aux))
    np.testing.assert_allclose(ours, ref_pred, atol=1e-4)
