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


def _cp_factory(torch):
    def cp(t, arr):
        with torch.no_grad():
            t.copy_(torch.from_numpy(np.asarray(arr).copy()))
    return cp


def _copy_sgcn_trajectory_model(torch, ref, p):
    """Copy our SGCNTrajectoryModel params into a reference TrajectoryModel
    (same layout for baseline/sgcn/model.py and the GP-Graph reformatted copy
    in baseline/gpgraphsgcn/model_baseline.py)."""
    cp = _cp_factory(torch)

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


def _copy_stgcnn_model(torch, ref, p):
    """Copy our SocialSTGCNN params into a reference social_stgcnn (same layout
    for baseline/stgcnn/model.py and gpgraphstgcnn/model_baseline.py)."""
    cp = _cp_factory(torch)
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
    for i in range(4):  # tpcnns[4]/prelus[4] constructed-but-unused both sides
        cp(ref.tpcnns[i].weight, p[f"tpcnn_{i}"]["kernel"])
        cp(ref.tpcnns[i].bias, p[f"tpcnn_{i}"]["bias"])
        cp(ref.prelus[i].weight, p[f"prelu_{i}"]["alpha"])
    cp(ref.tpcnn_ouput.weight, p["tpcnn_output"]["kernel"])
    cp(ref.tpcnn_ouput.bias, p["tpcnn_output"]["bias"])


def _copy_gpgraph_wrapper(torch, ref, p):
    """Copy GroupGenerator (learned_l2norm conv + learned th) and
    GroupIntegrator (mlp) params (model_groupwrapper.py:8-37, 125-152)."""
    cp = _cp_factory(torch)
    cp(ref.group_gen.group_cnn[0].weight, p["group_gen"]["group_cnn"]["kernel"])
    cp(ref.group_gen.group_cnn[0].bias, p["group_gen"]["group_cnn"]["bias"])
    cp(ref.group_gen.th, p["group_gen"]["th"])
    cp(ref.group_mix.st_gcns_mix[0].weight, p["group_mix"]["mix_prelu"]["alpha"])
    cp(ref.group_mix.st_gcns_mix[1].weight, p["group_mix"]["mix_conv"]["kernel"])
    cp(ref.group_mix.st_gcns_mix[1].bias, p["group_mix"]["mix_conv"]["bias"])


def _gpgraph_parity_inputs(rng, mod, n=8):
    c_obs = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    aux = {"ped_valid": jnp.ones(n, bool)}
    inputs = mod.prepare(c_obs, ori, aux)
    model = mod.make_model(CFG)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    return c_obs, ori, aux, inputs, model, variables


def test_gpgraphsgcn_weight_injection_full_forward_parity(rng):
    """Copy our initialized params into the reference GPGraph(SGCN) and compare
    the FULL forward (group generation via fori_loop relabeling + rank
    compaction, 3 weight-shared streams, MLP integrator) end to end
    (reference: baseline/gpgraphsgcn/model_groupwrapper.py:181-240)."""
    torch = pytest.importorskip("torch")
    from tests._reference import patch_torch_cpu, reference_module

    reference_module("baseline")
    patch_torch_cpu()
    from baseline.gpgraphsgcn.model import get_GPGraph_SGCN_model
    from baseline.gpgraphsgcn import bridge as ref_bridge
    from eigentrajectory_tpu.models import gpgraphsgcn

    c_obs, ori, aux, inputs, model, variables = _gpgraph_parity_inputs(
        rng, gpgraphsgcn)
    p = variables["params"]

    ref = get_GPGraph_SGCN_model(obs_len=K + 2, pred_len=K, in_dims=1, out_dims=S)
    ref.eval()
    _copy_sgcn_trajectory_model(torch, ref.baseline_model, p["baseline_model"])
    _copy_gpgraph_wrapper(torch, ref, p)

    obs_t = torch.from_numpy(np.asarray(c_obs).copy())
    ori_t = torch.from_numpy(np.asarray(ori).copy())
    with torch.no_grad():
        tin = ref_bridge.model_forward_pre_hook(obs_t, ori_t)
        tout = ref_bridge.model_forward(tin, ref)
        ref_pred = ref_bridge.model_forward_post_hook(tout).numpy()  # (k, N, s)

    ours = np.asarray(gpgraphsgcn.finalize(
        model.apply(variables, *inputs, train=False), aux))
    np.testing.assert_allclose(ours, ref_pred, atol=1e-4)


def test_gpgraphstgcnn_weight_injection_full_forward_parity(rng):
    """Same as above for the STGCNN variant: per-stream inverse-distance
    adjacency (identity vs masked) instead of identity matrices
    (reference: baseline/gpgraphstgcnn/model_groupwrapper.py:201-233)."""
    torch = pytest.importorskip("torch")
    from tests._reference import patch_torch_cpu, reference_module

    reference_module("baseline")
    patch_torch_cpu()
    from baseline.gpgraphstgcnn.model import get_GPGraph_STGCNN_model
    from baseline.gpgraphstgcnn import bridge as ref_bridge
    from eigentrajectory_tpu.models import gpgraphstgcnn

    c_obs, ori, aux, inputs, model, variables = _gpgraph_parity_inputs(
        rng, gpgraphstgcnn)
    p = variables["params"]

    ref = get_GPGraph_STGCNN_model(obs_len=K + 2, pred_len=K, in_dims=1, out_dims=S)
    ref.eval()
    _copy_stgcnn_model(torch, ref.baseline_model, p["baseline_model"])
    _copy_gpgraph_wrapper(torch, ref, p)

    obs_t = torch.from_numpy(np.asarray(c_obs).copy())
    ori_t = torch.from_numpy(np.asarray(ori).copy())
    with torch.no_grad():
        tin = ref_bridge.model_forward_pre_hook(obs_t, ori_t)
        tout = ref_bridge.model_forward(tin, ref)
        ref_pred = ref_bridge.model_forward_post_hook(tout).numpy()  # (k, N, s)

    ours = np.asarray(gpgraphstgcnn.finalize(
        model.apply(variables, *inputs, train=False), aux))
    np.testing.assert_allclose(ours, ref_pred, atol=1e-4)
