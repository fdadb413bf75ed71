"""Parity tests for the reference's DORMANT stochastic machinery.

These paths are never executed by the ET pipeline (the bridges drive only the
deterministic predict() paths; SURVEY §2b), but they are reference components,
so they exist here behind explicit modules and are pinned against the
reference implementation with injected randomness:

* PECNet CVAE forward (baseline/pecnet/model.py:113-163)
* LB-EBM EBM prior + Langevin sampler + CVAE branch (baseline/lbebm/model.py:42-188)
* Social-Implicit zoned N(0,I) sampling forward (baseline/implicit/model.py:91-123)
* Graph-TERN GMM endpoint sampling / pruning (baseline/graphtern/model.py:18-217)

The reference draws its noise internally (torch RNG), so each test either
injects the same standard-normal draw on both sides or composes the
reference's own submodules into a deterministic oracle.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eigentrajectory_tpu.models import lbebm, pecnet
from tests._reference import reference_module

K, S = 6, 20


def _copy_mlp_to_torch(t_mlp, params):
    import torch

    for i, layer in enumerate(t_mlp.layers):
        w = np.asarray(params[f"layer_{i}"]["kernel"]).T
        b = np.asarray(params[f"layer_{i}"]["bias"])
        with torch.no_grad():
            layer.weight.copy_(torch.from_numpy(w))
            layer.bias.copy_(torch.from_numpy(b))


# --------------------------------------------------------------- PECNet CVAE
def _pecnet_pair(rng, n):
    """Our initialized PECNetCVAE + the reference PECNet with copied weights."""
    torch = pytest.importorskip("torch")
    ref_mod = reference_module("baseline.pecnet.model")
    future_length = K * S // 2 + 1
    ref = ref_mod.PECNet(
        (512, 256), (8, 16), (8, 50), (1024, 512, 1024), (1024, 512, 256),
        (256, 128, 64), (256, 128, 64), (256, 128, 64), 16, 16, 3, 128, 1.3,
        K // 2, future_length, False)

    model = pecnet.PECNetCVAE(future_length=future_length)
    past = jnp.asarray(rng.normal(size=(n, K)).astype(np.float32))
    ip = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
    dest = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
    mask = jnp.ones((n, n), bool)
    eps = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)},
        past, ip, mask, dest, eps=eps, train=True)
    p = variables["params"]
    for name in ("encoder_past", "encoder_dest", "encoder_latent", "decoder",
                 "non_local_theta", "non_local_phi", "non_local_g",
                 "predictor"):
        _copy_mlp_to_torch(getattr(ref, name), p[name])
    return model, variables, ref, (past, ip, dest, mask, eps)


def test_pecnet_cvae_eval_parity(rng):
    """Eval branch (model.py:138-146): z = noise * sigma -> decoder. The
    reference accepts an injected `noise`, so this compares its real forward."""
    import torch

    n = 9
    model, variables, ref, (past, ip, _, _, eps) = _pecnet_pair(rng, n)
    ref.eval()
    ours = model.apply(variables, past, ip, eps=eps, train=False)
    with torch.no_grad():
        theirs = ref.forward(torch.from_numpy(np.asarray(past)),
                             torch.from_numpy(np.asarray(ip)),
                             noise=torch.from_numpy(np.asarray(eps))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)


def test_pecnet_cvae_train_parity(rng):
    """Training branch (model.py:126-161) vs a deterministic oracle composed
    of the reference's own submodules (its train-mode eps is not injectable)."""
    import torch

    n = 7
    model, variables, ref, (past, ip, dest, mask, eps) = _pecnet_pair(rng, n)
    gd, mu, logvar, pf = model.apply(variables, past, ip, mask, dest,
                                     eps=eps, train=True)
    with torch.no_grad():
        x = torch.from_numpy(np.asarray(past))
        ftraj = ref.encoder_past(x)
        feats = torch.cat((ftraj, ref.encoder_dest(
            torch.from_numpy(np.asarray(dest)))), dim=1)
        latent = ref.encoder_latent(feats)
        t_mu, t_logvar = latent[:, :16], latent[:, 16:]
        z = (torch.from_numpy(np.asarray(eps))
             * (t_logvar * 0.5).exp() + t_mu)
        t_gd = ref.decoder(torch.cat((ftraj, z), dim=1))
        feat = torch.cat((ftraj, ref.encoder_dest(t_gd),
                          torch.from_numpy(np.asarray(ip))), dim=1)
        m = torch.ones(n, n)
        for _ in range(3):
            feat = ref.non_local_social_pooling(feat, m)
        t_pf = ref.predictor(feat)
    np.testing.assert_allclose(np.asarray(mu), t_mu.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(logvar), t_logvar.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gd), t_gd.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pf), t_pf.numpy(), atol=5e-4)


# ------------------------------------------------------------------- LB-EBM
def _lbebm_pair(rng, n, with_noise=False):
    torch = pytest.importorskip("torch")
    ref_mod = reference_module("baseline.lbebm.model")

    class Args(dict):
        __getattr__ = dict.get

    args = Args(nonlocal_pools=3, non_local_dim=128,
                non_local_phi_size=(256, 128, 64),
                non_local_g_size=(256, 128, 64),
                non_local_theta_size=(256, 128, 64), sub_goal_indexes=[11],
                ny=1, memory_size=8, e_prior_sig=2.0, e_init_sig=2.0,
                e_l_steps=20, e_l_steps_pcd=20, e_l_step_size=0.4,
                e_l_with_noise=with_noise)
    ref = ref_mod.LBEBM((512, 256), (256, 128), (256, 512), (1024, 512, 1024),
                        (1024, 512, 256), 16, 16, 1.3, K // 2, K * S // 2,
                        args)
    model = lbebm.LBEBMCVAE(future_length=K * S // 2)
    past = jnp.asarray(rng.normal(size=(n, K)).astype(np.float32))
    dest = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
    z0 = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32) * 2.0)
    eps = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)},
        past, dest, z_e_0=z0, eps=eps, train=True, langevin_noise=False)
    p = variables["params"]
    for name in ("encoder_past", "encoder_dest", "encoder_latent", "decoder",
                 "predictor"):
        _copy_mlp_to_torch(getattr(ref, name), p[name])
    for ours_i, theirs_i in ((0, 0), (1, 2), (2, 4)):
        with torch.no_grad():
            ref.EBM[theirs_i].weight.copy_(torch.from_numpy(
                np.asarray(p[f"EBM_layers_{ours_i}_kernel"]).T))
            ref.EBM[theirs_i].bias.copy_(torch.from_numpy(
                np.asarray(p[f"EBM_layers_{ours_i}_bias"])))
    return model, variables, ref, (past, dest, z0, eps)


def test_lbebm_langevin_and_eval_parity(rng):
    """Eval branch: Langevin prior chain (noise off on both sides, same z0)
    -> decoder. The chain runs 20 steps of grad-through-the-EBM dynamics, so
    this pins the EBM head, the energy, and the sampler update rule at once."""
    import torch

    n = 6
    model, variables, ref, (past, _, z0, _) = _lbebm_pair(rng, n)
    ref.eval()
    ours = model.apply(variables, past, z_e_0=z0, train=False,
                       langevin_noise=False)
    with torch.no_grad():
        ftraj = ref.encoder_past(torch.from_numpy(np.asarray(past)))
    z_t = torch.from_numpy(np.asarray(z0))
    z_e_k, _ = ref.sample_langevin_prior_z(z_t, ftraj)
    with torch.no_grad():
        theirs = ref.decoder(torch.cat((ftraj, z_e_k), dim=1)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-4)


def test_lbebm_cvae_train_parity(rng):
    """Training branch: posterior reparameterization, decoder, predictor, and
    the contrastive-divergence energy terms (model.py:116-152)."""
    import torch

    n = 5
    model, variables, ref, (past, dest, z0, eps) = _lbebm_pair(rng, n)
    gd, mu, logvar, pf, cd, en_pos, en_neg = model.apply(
        variables, past, dest, z_e_0=z0, eps=eps, train=True,
        langevin_noise=False)
    with torch.no_grad():
        ftraj = ref.encoder_past(torch.from_numpy(np.asarray(past)))
    z_e_k, _ = ref.sample_langevin_prior_z(torch.from_numpy(np.asarray(z0)),
                                           ftraj)
    with torch.no_grad():
        latent = ref.encoder_latent(torch.cat(
            (ftraj, ref.encoder_dest(torch.from_numpy(np.asarray(dest)))),
            dim=1))
        t_mu, t_logvar = latent[:, :16], latent[:, 16:]
        z_g = (torch.from_numpy(np.asarray(eps)) * (t_logvar * 0.5).exp()
               + t_mu)
        t_gd = ref.decoder(torch.cat((ftraj, z_g), dim=1))
        t_pf = ref.predictor(torch.cat(
            (ftraj, ref.encoder_dest(t_gd)), dim=1))
        t_en_pos = ref.ebm(z_g, ftraj).mean()
        t_en_neg = ref.ebm(z_e_k, ftraj).mean()
    np.testing.assert_allclose(np.asarray(mu), t_mu.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(logvar), t_logvar.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gd), t_gd.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(pf), t_pf.numpy(), atol=5e-4)
    np.testing.assert_allclose(float(en_pos), float(t_en_pos), atol=5e-4)
    np.testing.assert_allclose(float(en_neg), float(t_en_neg), atol=5e-4)
    np.testing.assert_allclose(float(cd), float(t_en_pos - t_en_neg),
                               atol=1e-3)


def test_lbebm_replay_memory_ring():
    """ReplayMemory semantics (model.py:42-59): ring overwrite + uniform
    sample without replacement."""
    mem = lbebm.ReplayMemory(capacity=3)
    for i in range(5):
        # Rows arrive as z_e_k.split(1) chunks of shape (1, zdim) in the
        # reference's PCD loop (model.py:180-182); zdim=2 here.
        mem.push(np.full((1, 2), i, np.float32))
    assert len(mem) == 3
    vals = sorted(float(v[0, 0]) for v in mem.memory)
    assert vals == [2.0, 3.0, 4.0]  # 0 and 1 overwritten
    got = mem.sample(np.random.default_rng(0), n=3)
    # torch.cat semantics: (n, zdim), NOT (n, 1, zdim)
    assert got.shape == (3, 2)
    assert sorted(got[:, 0].tolist()) == [2.0, 3.0, 4.0]


# ---------------------------------------------------------- Social-Implicit
def test_social_implicit_full_noise_parity(rng):
    """Full SocialImplicit forward (model.py:91-123): zoned dispatch with a
    shared N(0, I2) draw scaled per zone. The reference samples internally,
    so its dispatch loop is replicated with the same injected noise, using
    the reference's own cells (dtype quirks of the dormant torch code aside:
    everything runs float32 here)."""
    torch = pytest.importorskip("torch")
    from tests._reference import patch_torch_cpu, reference_module

    reference_module("baseline")
    patch_torch_cpu()
    from baseline.implicit.model import SocialImplicit as RefSocialImplicit

    from eigentrajectory_tpu.models import implicit

    n, ksteps = 9, 3
    v = rng.normal(size=(1, 2, 8, n)).astype(np.float32)
    # Spread first-timestep inf-norms across zones.
    v[0, :, 0, :] = np.asarray(
        [[0.0, 0.005, 0.005, 0.05, 0.05, 0.5, 0.5, 2.0, 2.0],
         [0.0, 0.001, 0.002, 0.03, 0.01, 0.2, 0.4, 1.5, 0.1]], np.float32)
    noise = rng.normal(size=(ksteps, 2)).astype(np.float32)

    model = implicit.SocialImplicit()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(v),
                           jnp.ones(n, bool), noise=jnp.asarray(noise))
    p = dict(variables["params"])

    ref = RefSocialImplicit()
    ref.eval()

    def cp(t, arr):
        with torch.no_grad():
            t.copy_(torch.from_numpy(np.asarray(arr).copy()))

    for i in range(4):
        q = dict(p[f"cell_{i}"])
        tc = ref.implicit_cells[i]
        # Fusion + noise scalars are zeros-init on both sides; set nonzero so
        # both streams AND the noise path contribute.
        with torch.no_grad():
            tc.global_w.fill_(0.7)
            tc.local_w.fill_(0.3)
            tc.noise_w.fill_(0.9)
        q["global_w"] = jnp.asarray([0.7])
        q["local_w"] = jnp.asarray([0.3])
        q["noise_w"] = jnp.asarray([0.9])
        p[f"cell_{i}"] = q
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

    ours = np.asarray(model.apply({"params": p}, jnp.asarray(v),
                                  jnp.ones(n, bool),
                                  noise=jnp.asarray(noise)))

    # Reference forward with injected noise (its dispatch loop, its cells).
    v_t = torch.from_numpy(v)
    noise_t = torch.from_numpy(noise)[:, :, None, None]
    bins_t = torch.tensor([0, 0.01, 0.1, 1.2])
    with torch.no_grad():
        nrm = torch.linalg.norm(v_t.permute(0, 3, 1, 2)[0, :, :, 0],
                                float("inf"), dim=1)
        idx = torch.bucketize(nrm, bins_t, right=True) - 1
        theirs = torch.zeros(ksteps, 2, 12, n)
        for i in range(4):
            select = idx == i
            if torch.any(select):
                theirs[..., select] = ref.implicit_cells[i](
                    v_t[..., select].contiguous(), noise_t, weight_select=i)
    np.testing.assert_allclose(ours, theirs.numpy(), atol=1e-4)


# --------------------------------------------------------------- Graph-TERN
def test_graphtern_gmm_sample_deterministic_collapse(rng):
    """GMM endpoint sampling (model.py:108-124) pinned without shared RNG:
    with one dominant mixture logit and log_std = -20 the draw collapses to
    the argmax component's mu on BOTH frameworks, so the parameter layout
    (chunk-into-ways, NVMC transpose, [mu, log_std, pi] unpacking) is exact."""
    torch = pytest.importorskip("torch")
    from torch.distributions import (Categorical, Independent,
                                     MixtureSameFamily, Normal)

    from eigentrajectory_tpu.models.graphtern import gmm_endpoint_sample

    m, v, ways, n_smpl = 8, 5, 3, 6
    v_init = rng.normal(size=(1, m, v, 5 * ways)).astype(np.float32)
    for w in range(ways):
        v_init[..., 5 * w + 2] = -20.0   # log_std_x
        v_init[..., 5 * w + 3] = -20.0   # log_std_y
        logits = np.full((m, v), -5.0, np.float32)
        top = rng.integers(0, m, size=v)
        logits[top, np.arange(v)] = 15.0
        v_init[0, :, :, 5 * w + 4] = logits

    ours = np.asarray(gmm_endpoint_sample(jax.random.PRNGKey(0),
                                          jnp.asarray(v_init), n_smpl, ways))

    t = torch.from_numpy(v_init)
    dest_list = []
    for chunk in t.chunk(ways, dim=-1):   # reference sampling verbatim
        tt = chunk.transpose(1, 2).contiguous()
        mix = Categorical(torch.nn.functional.softmax(tt[:, :, :, 4], dim=-1))
        comp = Independent(Normal(tt[:, :, :, 0:2], tt[:, :, :, 2:4].exp()), 1)
        gmm = MixtureSameFamily(mix, comp)
        dest_list.append(gmm.sample((n_smpl,)).squeeze(dim=1))
    theirs = torch.stack(dest_list, dim=3).mean(dim=3).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_graphtern_prune_masks_low_pi_components(rng):
    """Pruning (model.py:157-163): with near-uniform logits, prune=M-1 must
    force every draw onto the single highest-pi component."""
    from eigentrajectory_tpu.models.graphtern import gmm_endpoint_sample

    m, v, ways = 8, 4, 3
    v_init = rng.normal(size=(1, m, v, 5 * ways)).astype(np.float32)
    tops = []
    for w in range(ways):
        v_init[..., 5 * w + 2:5 * w + 4] = -20.0
        logits = rng.normal(size=(m, v)).astype(np.float32)  # near-uniform pi
        v_init[0, :, :, 5 * w + 4] = logits
        tops.append(np.argmax(logits, axis=0))

    out = np.asarray(gmm_endpoint_sample(jax.random.PRNGKey(1),
                                         jnp.asarray(v_init), 16, ways,
                                         prune=m - 1))
    expect = np.mean([v_init[0, tops[w], np.arange(v), 5 * w:5 * w + 2]
                      for w in range(ways)], axis=0)
    np.testing.assert_allclose(out, np.broadcast_to(expect, out.shape),
                               atol=1e-4)
    # sanity: unpruned near-uniform sampling does NOT collapse
    free = np.asarray(gmm_endpoint_sample(jax.random.PRNGKey(1),
                                          jnp.asarray(v_init), 16, ways))
    assert np.abs(free - expect[None]).max() > 1e-3


def test_graphtern_prune_select_parity(rng):
    """Most-diverse-round selection (model.py:166-171) vs the reference's
    exact kthvalue math on injected endpoint sets."""
    torch = pytest.importorskip("torch")

    from eigentrajectory_tpu.models.graphtern import prune_select

    r, s, v = 7, 6, 5
    sets = rng.normal(size=(r, s, v, 2)).astype(np.float32)
    ours = np.asarray(prune_select(jnp.asarray(sets)))

    esp = torch.from_numpy(sets)
    diff = esp.unsqueeze(dim=2) - esp.unsqueeze(dim=1)
    am = diff.norm(p=2, dim=-1).kthvalue(k=2, dim=2)[0].sum(dim=1).argmax(dim=0)
    theirs = esp[am, :, torch.arange(v)].transpose(0, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_graphtern_guided_sample_and_gamma_mask(rng):
    """Guided sampling + Gamma validity mask (model.py:100-134) with injected
    uniforms vs the reference formulas."""
    torch = pytest.importorskip("torch")

    from eigentrajectory_tpu.models.graphtern import guided_endpoint_sample

    n_smpl, v = 6, 5
    v_obs_rel = rng.normal(size=(1, 8, v, 2)).astype(np.float32)
    v_dest_rel = rng.normal(size=(v, 2)).astype(np.float32)
    eps_r_u = rng.uniform(size=(n_smpl, v)).astype(np.float32)
    eps_t = rng.uniform(size=(n_smpl, v)).astype(np.float32)

    # Gamma (model.py:100-103): mean step-norm / gamma / pred_len
    t = torch.from_numpy(v_obs_rel)
    gamma_t = t.mean(dim=1).norm(p=2, dim=-1).squeeze(dim=0) / 8.0 / 12.0
    eps_r = torch.from_numpy(eps_r_u) * gamma_t
    tx = eps_r * torch.from_numpy(eps_t).cos()
    ty = eps_r * torch.from_numpy(eps_t).sin()
    theirs = (torch.from_numpy(v_dest_rel)
              + torch.stack([tx, ty], dim=-1)).numpy()

    gamma = (jnp.linalg.norm(jnp.asarray(v_obs_rel).mean(axis=1), axis=-1)[0]
             / 8.0 / 12.0)
    np.testing.assert_allclose(np.asarray(gamma), gamma_t.numpy(), atol=1e-6)
    ours = np.asarray(guided_endpoint_sample(
        None, jnp.asarray(v_dest_rel), gamma, n_smpl,
        eps_r=jnp.asarray(eps_r_u) * gamma[None, :], eps_t=jnp.asarray(eps_t)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_graphtern_full_forward_parity(rng):
    """GraphTERNFull end to end vs the reference graph_tern with our params
    injected and the endpoint set injected on both sides: pins the GMM head
    (v_init), the linear interpolation, and the whole refinement stack
    (st_mrgcn + 4 trcnns), i.e. every deterministic piece of model.py:71-216."""
    torch = pytest.importorskip("torch")
    from tests._reference import patch_torch_cpu, reference_module

    reference_module("baseline")
    patch_torch_cpu()
    from baseline.graphtern import model as ref_mod

    from eigentrajectory_tpu.models import graphtern

    n, n_smpl = 5, 4
    obs = rng.normal(size=(1, 8, n, 2)).astype(np.float32)
    rel = np.concatenate([np.zeros_like(obs[:, :1]),
                          obs[:, 1:] - obs[:, :-1]], axis=1)
    s_obs = np.stack([obs, rel], axis=1)                   # (1, 2, 8, n, 2)
    endpoint = rng.normal(size=(n_smpl, n, 2)).astype(np.float32)
    valid = jnp.ones(n, bool)

    model = graphtern.GraphTERNFull(n_smpl=n_smpl)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(s_obs), valid,
                           endpoint_set=jnp.asarray(endpoint), train=False)
    p = variables["params"]
    v_init, v_pred, v_refi = model.apply(
        variables, jnp.asarray(s_obs), valid,
        endpoint_set=jnp.asarray(endpoint), train=False)

    ref = ref_mod.graph_tern(n_epgcn=1, n_epcnn=6, n_trgcn=1, n_trcnn=4,
                             seq_len=8, pred_seq_len=12, n_ways=3,
                             n_smpl=n_smpl)
    ref.eval()

    def cp(t, arr):
        with torch.no_grad():
            t.copy_(torch.from_numpy(np.asarray(arr).copy()))

    def cp_mrgcn(tg, g):
        cp(tg.gcn.conv.weight, g["gcn"]["conv"]["kernel"])
        cp(tg.gcn.conv.bias, g["gcn"]["conv"]["bias"])
        cp(tg.tcn[0].weight, g["tcn_prelu"]["alpha"])
        cp(tg.tcn[1].weight, g["tcn_conv"]["kernel"])
        cp(tg.tcn[1].bias, g["tcn_conv"]["bias"])
        cp(tg.residual[0].weight, g["res_conv"]["kernel"])
        cp(tg.residual[0].bias, g["res_conv"]["bias"])

    def cp_pcnn(te, q):
        cp(te.tpcns[0][0].weight, q["tpcn"]["conv"]["kernel"])
        cp(te.tpcns[0][0].bias, q["tpcn"]["conv"]["bias"])
        cp(te.tpcns[0][1].weight, q["tpcn_prelu"]["alpha"])
        cp(te.cpcns[0][0].weight, q["cpcn"]["conv"]["kernel"])
        cp(te.cpcns[0][0].bias, q["cpcn"]["conv"]["bias"])
        cp(te.cpcns[0][1].weight, q["cpcn_prelu"]["alpha"])

    cp_mrgcn(ref.tp_mrgcns[0], p["tp_mrgcn_0"])
    cp_mrgcn(ref.st_mrgcns[0], p["st_mrgcn_0"])
    for k in range(6):
        cp_pcnn(ref.tpcnns[k], p[f"epcnn_{k}"])
    # epcnn residuals: k=0 identity (8==n_gmms, ch equal), k=5 rescconv
    cp(ref.tpcnns[5].rescconv[0].weight, p["epcnn_5"]["rescconv"]["kernel"])
    cp(ref.tpcnns[5].rescconv[0].bias, p["epcnn_5"]["rescconv"]["bias"])
    for j in range(4):
        cp_pcnn(ref.trcnns[j], p[f"trcnn_{j}"])
    cp(ref.trcnns[3].resconv[0].weight, p["trcnn_3"]["resconv"]["kernel"])
    cp(ref.trcnns[3].resconv[0].bias, p["trcnn_3"]["resconv"]["bias"])

    # Reference forward with the endpoint set injected: replicate
    # model.py:71-97 (control points) and :174-216 (refinement) with the
    # reference's own modules, skipping only the internal GMM draw.
    with torch.no_grad():
        S_obs = torch.from_numpy(s_obs)
        A_obs = ref_mod.generate_adjacency_matrix(S_obs)
        V_obs_abs, V_obs_rel = S_obs[:, 0], S_obs[:, 1]
        V = V_obs_rel.permute(0, 3, 1, 2).contiguous()
        V, A = ref.tp_mrgcns[0](V, A_obs)
        V = V.permute(0, 2, 1, 3).contiguous()
        for k in range(6):
            V = ref.tpcnns[k](V)
        t_v_init = V.transpose(2, 3).contiguous()

        ep = torch.from_numpy(endpoint)
        V_pred = ep.unsqueeze(dim=1).repeat_interleave(repeats=12, dim=1)
        V_pred_abs = V_pred.cumsum(dim=1) + V_obs_abs.squeeze(dim=0)[-1]
        V_obs_rept = V_obs_rel.repeat_interleave(n_smpl, dim=0)
        A_rept = A_obs.repeat_interleave(n_smpl, dim=0)
        A_pred = ref_mod.generate_adjacency_matrix(
            torch.stack([V_pred_abs, V_pred], dim=1))
        Vf = torch.cat([V_obs_rept, V_pred], dim=1)
        Af = torch.cat([A_rept, A_pred], dim=2)
        Vc = Vf.permute(0, 3, 1, 2).contiguous()
        Vc, Af = ref.st_mrgcns[0](Vc, Af)
        Vc = Vc.permute(0, 2, 1, 3).contiguous()
        for k in range(4):
            Vc = ref.trcnns[k](Vc)
        V_corr = Vc.transpose(2, 3).contiguous()
        t_v_refi = V_pred_abs.clone()
        t_v_refi[:, :-1] += V_corr[:, :-1]

    np.testing.assert_allclose(np.asarray(v_init), t_v_init.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(v_pred),
                               V_pred.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_refi), t_v_refi.numpy(), atol=5e-4)
