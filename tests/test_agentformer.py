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


def test_weight_injection_parity_with_reference(rng):
    """Copy our initialized params into the reference AgentFormerLight and
    compare full forward outputs (agent-aware attention, pos encoding, the
    collapsed decode — everything)."""
    import os
    import sys

    torch = pytest.importorskip("torch")
    from tests._reference import REFERENCE_PATH, has_reference

    if not has_reference():
        pytest.skip("reference tree not available")
    sys.path.insert(0, REFERENCE_PATH)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
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
    ref = AgentFormerLight(cfg_t)
    ref.eval()

    model = agentformer.make_model(CFG)
    n = 5
    c_obs, ori = _inputs(rng, n)
    aux = {"ped_valid": jnp.ones(n, bool)}
    inputs = agentformer.prepare(c_obs, ori, aux)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    p = variables["params"]

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

    from collections import defaultdict

    pre_motion = np.asarray(jnp.concatenate([c_obs, ori], axis=0))[:, :, None]
    data = defaultdict(lambda: None)
    data["pre_motion"] = torch.from_numpy(pre_motion.copy())
    with torch.no_grad():
        ref.set_data(data)
        ref()
    ref_out = ref.data["_dec_motion"].numpy()  # (N, k, S)

    ours = np.asarray(model.apply(variables, *inputs, train=False))
    np.testing.assert_allclose(ours, ref_out, atol=1e-4)


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
