"""ET-PECNet / ET-LB-EBM tests incl. numerical parity with the reference
predict() path (identical weights injected)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eigentrajectory_tpu.models import lbebm, pecnet
from tests._reference import reference_module

K, S = 6, 20


class CFG:
    k = K
    num_samples = S


def _aux(n, valid=None):
    ids = jnp.zeros(n, jnp.int32)
    return {
        "ped_valid": valid if valid is not None else jnp.ones(n, bool),
        "num_samples": S,
        "scene_ids": ids,
        "scene_mask": jnp.ones((n, n), bool),
    }


@pytest.mark.parametrize("mod", [pecnet, lbebm])
def test_forward_shape(rng, mod):
    n = 8
    model = mod.make_model(CFG)
    c_obs = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    inputs = mod.prepare(c_obs, ori, _aux(n))
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    out = model.apply(variables, *inputs, train=False)
    c = mod.finalize(out, _aux(n))
    assert c.shape == (K, n, S)


def _copy_mlp_to_torch(t_mlp, params):
    import torch
    for i, layer in enumerate(t_mlp.layers):
        w = np.asarray(params[f"layer_{i}"]["kernel"]).T
        b = np.asarray(params[f"layer_{i}"]["bias"])
        with torch.no_grad():
            layer.weight.copy_(torch.from_numpy(w))
            layer.bias.copy_(torch.from_numpy(b))


def test_pecnet_parity_with_reference(rng):
    torch = pytest.importorskip("torch")
    ref_mod = reference_module("baseline.pecnet.model")
    n = 9
    future_length = K * S // 2 + 1
    ref = ref_mod.PECNet(
        (512, 256), (8, 16), (8, 50), (1024, 512, 1024), (1024, 512, 256),
        (256, 128, 64), (256, 128, 64), (256, 128, 64), 16, 16, 3, 128, 1.3,
        K // 2, future_length, False)
    ref.eval()

    model = pecnet.make_model(CFG)
    c_obs = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    aux = _aux(n)
    inputs = pecnet.prepare(c_obs, ori, aux)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    p = variables["params"]
    for ours, theirs in [("encoder_past", ref.encoder_past),
                         ("encoder_dest", ref.encoder_dest),
                         ("non_local_theta", ref.non_local_theta),
                         ("non_local_phi", ref.non_local_phi),
                         ("non_local_g", ref.non_local_g),
                         ("predictor", ref.predictor)]:
        _copy_mlp_to_torch(theirs, p[ours])

    out = model.apply(variables, *inputs, train=False)
    with torch.no_grad():
        ref_out = ref.predict(
            torch.from_numpy(np.asarray(inputs[0])),
            torch.from_numpy(np.asarray(inputs[1])),
            torch.from_numpy(np.asarray(inputs[2], np.float32)),
            torch.from_numpy(np.asarray(inputs[3]))).numpy()
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4)


def test_lbebm_parity_with_reference(rng):
    torch = pytest.importorskip("torch")
    ref_mod = reference_module("baseline.lbebm.model")
    n = 7

    class Args(dict):
        __getattr__ = dict.get

    args = Args(nonlocal_pools=3, non_local_dim=128,
                non_local_phi_size=(256, 128, 64), non_local_g_size=(256, 128, 64),
                non_local_theta_size=(256, 128, 64), sub_goal_indexes=[11],
                ny=1, memory_size=8)
    ref = ref_mod.LBEBM((512, 256), (256, 128), (256, 512), (1024, 512, 1024),
                        (1024, 512, 256), 16, 16, 1.3, K // 2, K * S // 2, args)
    ref.eval()

    model = lbebm.make_model(CFG)
    c_obs = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32))
    ori = jnp.asarray(rng.normal(size=(2, n)).astype(np.float32))
    inputs = lbebm.prepare(c_obs, ori, _aux(n))
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    p = variables["params"]
    for ours, theirs in [("encoder_past", ref.encoder_past),
                         ("encoder_dest", ref.encoder_dest),
                         ("predictor", ref.predictor)]:
        _copy_mlp_to_torch(theirs, p[ours])

    out = model.apply(variables, *inputs, train=False)
    with torch.no_grad():
        ref_out = ref.predict(
            torch.from_numpy(np.asarray(inputs[0])),
            torch.from_numpy(np.asarray(inputs[1]))).numpy()
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4)
