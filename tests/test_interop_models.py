"""Per-baseline reference-checkpoint import validation (interop.py).

Direction is the REVERSE of the weight-injection parity tests: the torch
module keeps its own random init, its state_dict goes through the interop
converter, and our Flax model must reproduce the torch forward exactly. This
validates every converter against the reference modules end to end.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eigentrajectory_tpu.interop import CONVERTERS
from eigentrajectory_tpu.models import get_baseline

K, S = 6, 20


class CFG:
    k = K
    num_samples = S
    baseline_config = {}


def _torch_ref(name, torch):
    """Instantiate the reference predictor under the ET wiring
    (utils/trainer.py:267-564) and return (module, bridge)."""
    import importlib

    if name == "stgcnn":
        from baseline.stgcnn.model import social_stgcnn
        mod = social_stgcnn(n_stgcnn=1, n_txpcnn=5, input_feat=1, output_feat=S,
                            seq_len=K + 2, pred_seq_len=K, kernel_size=3)
    elif name == "sgcn":
        from baseline.sgcn.model import TrajectoryModel
        mod = TrajectoryModel(number_asymmetric_conv_layer=7, embedding_dims=64,
                              number_gcn_layers=1, dropout=0, obs_len=K + 2,
                              pred_len=K, n_tcn=5, in_dims=1, out_dims=S,
                              num_heads=4)
    elif name == "dmrgcn":
        from baseline.dmrgcn.predictor import social_dmrgcn
        mod = social_dmrgcn(n_stgcn=1, n_tpcnn=4, input_feat=1, output_feat=S,
                            seq_len=K + 2, pred_seq_len=K, kernel_size=3)
    elif name == "graphtern":
        from baseline.graphtern.model import graph_tern_light
        mod = graph_tern_light(n_epgcn=1, n_epcnn=6, input_feat=1,
                               seq_len=K + 2, pred_seq_len=K, n_smpl=S)
    elif name == "implicit":
        from baseline.implicit.model import SocialImplicitLight
        mod = SocialImplicitLight(spatial_input=1, spatial_output=S,
                                  temporal_input=K + 2, temporal_output=K,
                                  bins=[0, 0.01, 0.1, 1.2],
                                  noise_weight=[0.05, 1, 4, 8])
    elif name == "gpgraphsgcn":
        from baseline.gpgraphsgcn.model import get_GPGraph_SGCN_model
        mod = get_GPGraph_SGCN_model(obs_len=K + 2, pred_len=K, in_dims=1,
                                     out_dims=S)
    elif name == "gpgraphstgcnn":
        from baseline.gpgraphstgcnn.model import get_GPGraph_STGCNN_model
        mod = get_GPGraph_STGCNN_model(obs_len=K + 2, pred_len=K, in_dims=1,
                                       out_dims=S)
    else:
        raise KeyError(name)
    bridge = importlib.import_module(f"baseline.{name}.bridge")
    mod.eval()
    return mod, bridge


GRAPH_BASELINES = ["stgcnn", "sgcn", "dmrgcn", "graphtern", "implicit",
                   "gpgraphsgcn", "gpgraphstgcnn"]


@pytest.mark.parametrize("name", GRAPH_BASELINES)
def test_import_graph_baseline_forward_parity(rng, name):
    torch = pytest.importorskip("torch")
    from tests._reference import patch_torch_cpu, reference_module

    reference_module("baseline")
    patch_torch_cpu()
    ref, bridge = _torch_ref(name, torch)

    ours = get_baseline(name)
    n = 8
    c_obs = rng.normal(size=(K, n)).astype(np.float32)
    if name == "implicit":  # spread zones
        c_obs[0] = np.linspace(0.0, 2.0, n)
    ori = rng.normal(size=(2, n)).astype(np.float32)
    aux = {"ped_valid": jnp.ones(n, bool)}
    inputs = ours.prepare(jnp.asarray(c_obs), jnp.asarray(ori), aux)

    params, batch_stats = CONVERTERS[name](
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    model = ours.make_model(CFG)
    out = ours.finalize(model.apply(variables, *inputs, train=False), aux)

    with torch.no_grad():
        tin = bridge.model_forward_pre_hook(torch.from_numpy(c_obs.copy()),
                                            torch.from_numpy(ori.copy()))
        ref_pred = bridge.model_forward_post_hook(
            bridge.model_forward(tin, ref)).numpy()

    np.testing.assert_allclose(np.asarray(out), ref_pred, atol=1e-4)


@pytest.mark.parametrize("name", ["pecnet", "lbebm"])
def test_import_mlp_baseline_forward_parity(rng, name):
    torch = pytest.importorskip("torch")
    from tests._reference import patch_torch_cpu, reference_module

    reference_module("baseline")
    patch_torch_cpu()
    from tests.test_pecnet_lbebm import _aux

    if name == "pecnet":
        from baseline.pecnet.model import PECNet
        ref = PECNet((512, 256), (8, 16), (8, 50), (1024, 512, 1024),
                     (1024, 512, 256), (256, 128, 64), (256, 128, 64),
                     (256, 128, 64), 16, 16, 3, 128, 1.3, K // 2,
                     K * S // 2 + 1, False)
    else:
        from baseline.lbebm.model import LBEBM

        class Args(dict):
            __getattr__ = dict.get

        args = Args(nonlocal_pools=3, non_local_dim=128,
                    non_local_phi_size=(256, 128, 64),
                    non_local_g_size=(256, 128, 64),
                    non_local_theta_size=(256, 128, 64),
                    sub_goal_indexes=[11], ny=1, memory_size=8)
        ref = LBEBM((512, 256), (256, 128), (256, 512), (1024, 512, 1024),
                    (1024, 512, 256), 16, 16, 1.3, K // 2, K * S // 2, args)
    ref.eval()

    ours = get_baseline(name)
    n = 7
    c_obs = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    aux = _aux(n)
    inputs = ours.prepare(c_obs, ori, aux)

    params, _ = CONVERTERS[name](
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    model = ours.make_model(CFG)
    out = model.apply({"params": params}, *inputs, train=False)

    with torch.no_grad():
        targs = [torch.from_numpy(np.asarray(x, np.float32).copy()) for x in inputs]
        ref_out = ref.predict(*targs).numpy()
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4)


def test_import_agentformer_forward_parity(rng):
    torch = pytest.importorskip("torch")
    from tests._reference import has_reference, patch_torch_cpu

    if not has_reference():
        pytest.skip("reference tree not available")
    patch_torch_cpu()
    from tests.test_agentformer import _build_reference, _run_reference

    ref = _build_reference(torch)
    ours = get_baseline("agentformer")
    n = 5
    c_obs = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    aux = {"ped_valid": jnp.ones(n, bool)}
    inputs = ours.prepare(c_obs, ori, aux)

    params, _ = CONVERTERS["agentformer"](
        {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    model = ours.make_model(CFG)
    out = np.asarray(model.apply({"params": params}, *inputs, train=False))

    ref_out = _run_reference(torch, ref, c_obs, ori)
    np.testing.assert_allclose(out, ref_out, atol=1e-4)
