"""ET-AgentFormer tests: shapes, padding invariance, decode-collapse sanity."""
import pytest
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


def _build_reference(torch, conn_dist=None):
    """Instantiate the reference AgentFormerLight under the ET wiring."""
    import os
    import sys

    from tests._reference import REFERENCE_PATH

    sys.path.insert(0, REFERENCE_PATH)
    from baseline.agentformer.model import AgentFormerLight
    from baseline.agentformer.utils.config import Config

    cwd = os.getcwd()
    try:
        os.chdir(REFERENCE_PATH)
        cfg_t = Config("./baseline/agentformer/agentformer_pre.yml", create_dirs=True)
    finally:
        os.chdir(cwd)
    cfg_t.past_frames, cfg_t.future_frames = K + 2, K
    cfg_t.motion_dim, cfg_t.forecast_dim = 1, S
    cfg_t.input_type, cfg_t.pred_type = ["pos"], "pos"
    cfg_t.sn_out_type, cfg_t.scene_orig_all_past = None, False
    cfg_t.nz, cfg_t.ar_train, cfg_t.learn_prior = 0, False, False
    if conn_dist is not None:
        cfg_t.yml_dict["conn_dist"] = conn_dist
    ref = AgentFormerLight(cfg_t)
    ref.eval()
    return ref


def _run_reference(torch, ref, c_obs, ori, agent_mask=None):
    from collections import defaultdict

    pre_motion = np.asarray(jnp.concatenate([c_obs, ori], axis=0))[:, :, None]
    data = defaultdict(lambda: None)
    data["pre_motion"] = torch.from_numpy(pre_motion.copy())
    with torch.no_grad():
        ref.set_data(data)
        if agent_mask is not None:
            ref.data["agent_mask"] = agent_mask
        ref()
    return ref.data["_dec_motion"].numpy()  # (N, k, S)


def test_weight_injection_parity_with_reference(rng):
    """Copy our initialized params into the reference AgentFormerLight and
    compare full forward outputs (agent-aware attention, pos encoding, the
    collapsed decode — everything)."""
    torch = pytest.importorskip("torch")
    from tests._reference import has_reference, patch_torch_cpu

    if not has_reference():
        pytest.skip("reference tree not available")
    patch_torch_cpu()
    ref = _build_reference(torch)

    model = agentformer.make_model(CFG)
    n = 5
    c_obs, ori = _inputs(rng, n)
    aux = {"ped_valid": jnp.ones(n, bool)}
    inputs = agentformer.prepare(c_obs, ori, aux)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    p = variables["params"]

    _inject_params(torch, ref, p)

    ref_out = _run_reference(torch, ref, c_obs, ori)
    ours = np.asarray(model.apply(variables, *inputs, train=False))
    np.testing.assert_allclose(ours, ref_out, atol=1e-4)


def _inject_params(torch, ref, p):
    def cp(t, arr):
        with torch.no_grad():
            t.copy_(torch.from_numpy(np.asarray(arr).copy()))

    cp(ref.context_encoder.input_fc.weight, p["ctx_input_fc"]["kernel"].T)
    cp(ref.context_encoder.input_fc.bias, p["ctx_input_fc"]["bias"])
    cp(ref.context_encoder.pos_encoder.fc.weight, p["ctx_pos_encoder"]["fc"]["kernel"].T)
    cp(ref.context_encoder.pos_encoder.fc.bias, p["ctx_pos_encoder"]["fc"]["bias"])
    cp(ref.future_decoder.input_fc.weight, p["dec_input_fc"]["kernel"].T)
    cp(ref.future_decoder.input_fc.bias, p["dec_input_fc"]["bias"])
    cp(ref.future_decoder.pos_encoder.fc.weight, p["dec_pos_encoder"]["fc"]["kernel"].T)
    cp(ref.future_decoder.pos_encoder.fc.bias, p["dec_pos_encoder"]["fc"]["bias"])
    cp(ref.future_decoder.out_fc.weight, p["out_fc_kernel"].T)
    cp(ref.future_decoder.out_fc.bias, p["out_fc_bias"])

    def copy_attn_self(tmod, q):
        cp(tmod.in_proj_weight, q["in_proj"]["kernel"].T)
        cp(tmod.in_proj_bias, q["in_proj"]["bias"])
        cp(tmod.in_proj_weight_self, q["in_proj_self"]["kernel"].T)
        cp(tmod.in_proj_bias_self, q["in_proj_self"]["bias"])
        cp(tmod.out_proj.weight, q["out_proj"]["kernel"].T)
        cp(tmod.out_proj.bias, q["out_proj"]["bias"])

    def copy_attn_cross(tmod, q):
        cp(tmod.in_proj_weight, q["in_proj_kernel"].T)
        cp(tmod.in_proj_bias, q["in_proj_bias"])
        cp(tmod.in_proj_weight_self, q["in_proj_self_kernel"].T)
        cp(tmod.in_proj_bias_self, q["in_proj_self_bias"])
        cp(tmod.out_proj.weight, q["out_proj"]["kernel"].T)
        cp(tmod.out_proj.bias, q["out_proj"]["bias"])

    def copy_layer_common(tl, q):
        cp(tl.linear1.weight, q["linear1"]["kernel"].T)
        cp(tl.linear1.bias, q["linear1"]["bias"])
        cp(tl.linear2.weight, q["linear2"]["kernel"].T)
        cp(tl.linear2.bias, q["linear2"]["bias"])
        cp(tl.norm1.weight, q["norm1"]["scale"])
        cp(tl.norm1.bias, q["norm1"]["bias"])
        cp(tl.norm2.weight, q["norm2"]["scale"])
        cp(tl.norm2.bias, q["norm2"]["bias"])

    for i in range(2):
        tl = ref.context_encoder.tf_encoder.layers[i]
        q = p[f"enc_layer_{i}"]
        copy_attn_self(tl.self_attn, q["self_attn"])
        copy_layer_common(tl, q)
    for i in range(2):
        tl = ref.future_decoder.tf_decoder.layers[i]
        q = p[f"dec_layer_{i}"]
        copy_attn_self(tl.self_attn, q["self_attn"])
        copy_attn_cross(tl.multihead_attn, q["multihead_attn"])
        copy_layer_common(tl, q)
        cp(tl.norm3.weight, q["norm3"]["scale"])
        cp(tl.norm3.bias, q["norm3"]["bias"])


def test_conn_dist_masking_parity_with_reference(rng):
    """conn_dist branch (reference model.py:505-534): agents beyond the
    distance threshold at the last observed step are mutually unattendable.
    Verified by weight injection with conn_dist active and inputs spread so
    the mask is non-trivial."""
    torch = pytest.importorskip("torch")
    from tests._reference import has_reference, patch_torch_cpu

    if not has_reference():
        pytest.skip("reference tree not available")
    patch_torch_cpu()
    conn = 0.8
    # The reference's own set_data crashes on torch>=2 (`D += D.T` in-place
    # aliasing, model.py:529), so the distance mask of model.py:522-531 is
    # built here with the aliasing fixed and injected after set_data; the
    # reference's mask CONSUMPTION (generate_mask / generate_ar_mask tiling
    # into every attention) runs unmodified.
    ref = _build_reference(torch)

    class CFGConn(CFG):
        baseline_config = {"conn_dist": conn}

    model = agentformer.make_model(CFGConn)
    assert model.conn_dist == conn
    n = 6
    c_obs, ori = _inputs(rng, n)
    # Spread the last pre_motion row (= ori[-1] lane) so some pairs exceed
    # the threshold and some do not.
    ori = ori.at[1].set(jnp.asarray([0.0, 0.3, 0.5, 1.5, 1.7, 4.0]))
    aux = {"ped_valid": jnp.ones(n, bool)}
    inputs = agentformer.prepare(c_obs, ori, aux)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    _inject_params(torch, ref, variables["params"])

    cur = torch.from_numpy(
        np.asarray(jnp.concatenate([c_obs, ori], axis=0))[-1][:, None].copy())
    pd = torch.nn.functional.pdist(cur)
    D = torch.zeros(n, n)
    D[np.triu_indices(n, 1)] = pd
    D = D + D.T.clone()
    tmask = torch.zeros_like(D)
    tmask[D > conn] = float("-inf")

    ref_out = _run_reference(torch, ref, c_obs, ori, agent_mask=tmask)
    ours = np.asarray(model.apply(variables, *inputs, train=False))
    np.testing.assert_allclose(ours, ref_out, atol=1e-4)

    # And the mask actually bites: with conn_dist disabled the output differs.
    base = agentformer.make_model(CFG).apply(variables, *inputs, train=False)
    assert not np.allclose(np.asarray(base), ours, atol=1e-5)


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
