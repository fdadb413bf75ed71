"""ET-Graph-TERN: multi-relational GCN + endpoint-CNN predictor in ET space.

Rebuilt from baseline/graphtern/{model,stmrgcn}.py via the `graph_tern_light`
path actually used by the ET pipeline (model.py:220-264; the full graph_tern
with GMM endpoint sampling/pruning is unused, SURVEY §2b): a 4-relation
adjacency [dist, disp, dist_inv, disp_inv] (model.py:7-15), one st_mrgcn over
a normalized-adjacency-tilde with DropEdge 0.8 (stmrgcn.py:7-57), and six
epcnn blocks (stmrgcn.py:60-113). ET wiring: n_epgcn=1, n_epcnn=6,
input_feat=1, seq k+2 -> k, n_smpl=s (utils/trainer.py:540-541).

The epcnn convs use REPLICATE padding over (channel, ped) planes
(stmrgcn.py:67-81). Under ped padding, the replicate edge must sit at the
last *valid* ped, so invalid slots are clamped to the last valid column before
each such conv (valid slots are front-contiguous by construction).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import PReLU, TorchConv2d, zero_invalid
from .dmrgcn import DropEdge


def normalized_adjacency_tilde(a: jnp.ndarray) -> jnp.ndarray:
    """A~norm = D~^-1/2 (A + I) D~^-1/2 (graphtern/normalizer.py)."""
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)
    a_t = a + eye
    deg = a_t.sum(axis=-1)
    dinv = jnp.where(deg > 0, deg ** -0.5, 0.0)
    return dinv[..., :, None] * a_t * dinv[..., None, :]


def clamp_to_valid(x: jnp.ndarray, valid: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Replace trailing invalid slots with the last valid slot's values so a
    replicate-padded conv sees the reference's edge. Assumes front-contiguous
    validity."""
    n = x.shape[axis]
    nv = jnp.maximum(jnp.sum(valid.astype(jnp.int32)), 1)
    idx = jnp.minimum(jnp.arange(n), nv - 1)
    return jnp.take(x, idx, axis=axis)


class ReplicateConv2d(nn.Module):
    """Conv2d with padding_mode='replicate' (NCHW); manual edge pad + VALID conv."""

    in_channels: int
    out_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        p = self.kernel_size // 2
        x = jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p)), mode="edge")
        return TorchConv2d(self.in_channels, self.out_channels,
                           (self.kernel_size, self.kernel_size), name="conv")(x)


class MultiRelationalGCN(nn.Module):
    """MultiRelationalGCN (stmrgcn.py:7-23): adjacency-tilde einsum + DropEdge."""

    in_channels: int
    out_channels: int
    relation: int = 4

    @nn.compact
    def __call__(self, x, a, train: bool):
        h = TorchConv2d(self.in_channels, self.out_channels * self.relation,
                        (1, 1), name="conv")(x)
        h = h.reshape(h.shape[0], self.relation, self.out_channels,
                      h.shape[-2], h.shape[-1])
        a = DropEdge(name="drop_edge")(a, train)
        adj = normalized_adjacency_tilde(a)
        return jnp.einsum("nrtwv,nrctv->nctw", adj, h)


class STMRGCN(nn.Module):
    """st_mrgcn (stmrgcn.py:26-57); use_mdn=True so no output PReLU."""

    in_channels: int
    out_channels: int
    t_kernel: int = 3

    @nn.compact
    def __call__(self, x, a, train: bool):
        if self.in_channels == self.out_channels:
            res = x
        else:
            res = TorchConv2d(self.in_channels, self.out_channels, (1, 1),
                              name="res_conv")(x)
        h = MultiRelationalGCN(self.in_channels, self.out_channels,
                               relation=4, name="gcn")(x, a, train)
        pad = (self.t_kernel - 1) // 2
        h = PReLU(name="tcn_prelu")(h)
        h = TorchConv2d(self.out_channels, self.out_channels,
                        (self.t_kernel, 1), padding=(pad, 0), name="tcn_conv")(h)
        return h + res


class EPCNN(nn.Module):
    """epcnn (stmrgcn.py:60-113): time-wise + channel-wise replicate convs."""

    obs_seq_len: int
    pred_seq_len: int
    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, valid):
        # x: (1, T, C, V)
        # residual (stmrgcn.py:84-97)
        if self.obs_seq_len == self.pred_seq_len and self.in_channels == self.out_channels:
            res = x
        elif self.obs_seq_len == self.pred_seq_len:
            r = jnp.transpose(x, (0, 2, 1, 3))
            r = TorchConv2d(self.in_channels, self.out_channels, (1, 1),
                            name="rescconv")(r)
            res = jnp.transpose(r, (0, 2, 1, 3))
        elif self.in_channels == self.out_channels:
            res = TorchConv2d(self.obs_seq_len, self.pred_seq_len, (1, 1),
                              name="restconv")(x)
        else:
            r = TorchConv2d(self.obs_seq_len, self.pred_seq_len, (1, 1),
                            name="restconv")(x)
            r = jnp.transpose(r, (0, 2, 1, 3))
            r = TorchConv2d(self.in_channels, self.out_channels, (1, 1),
                            name="rescconv")(r)
            res = jnp.transpose(r, (0, 2, 1, 3))

        # time-wise (NTCV; replicate edge must sit at the last valid ped)
        h = clamp_to_valid(x, valid, 3)
        h = PReLU(name="tpcn_prelu")(
            ReplicateConv2d(self.obs_seq_len, self.pred_seq_len, 3,
                            name="tpcn")(h))
        # channel-wise (NCTV)
        h = jnp.transpose(h, (0, 2, 1, 3))
        h = clamp_to_valid(h, valid, 3)
        h = PReLU(name="cpcn_prelu")(
            ReplicateConv2d(self.in_channels, self.out_channels, 3,
                            name="cpcn")(h))
        h = jnp.transpose(h, (0, 2, 1, 3))
        return h + res


class GraphTERNLight(nn.Module):
    """graph_tern_light (model.py:220-264)."""

    n_epgcn: int = 1
    n_epcnn: int = 6
    input_feat: int = 1
    seq_len: int = 8
    pred_seq_len: int = 6
    n_smpl: int = 20
    hidden_feat: int = 16

    @nn.compact
    def __call__(self, s_obs, valid, train: bool = False):
        # s_obs: (1, 2, T, N, C=1)  [abs, rel]
        v_init = jnp.transpose(s_obs[:, 0], (0, 3, 1, 2))  # NTVC -> NCTV
        a_obs = jax.lax.stop_gradient(generate_adjacency(s_obs, valid))

        for k in range(self.n_epgcn):
            cin = self.input_feat if k == 0 else self.hidden_feat
            v_init = STMRGCN(cin, self.hidden_feat, name=f"tp_mrgcn_{k}")(
                v_init, a_obs, train)

        v_init = jnp.transpose(v_init, (0, 2, 1, 3))       # NCTV -> NTCV
        v_init = zero_invalid(v_init, valid, 3)

        seqs = [self.seq_len] + [self.pred_seq_len] * (self.n_epcnn - 1)
        chans = ([self.hidden_feat] * (self.n_epcnn - 1)) + [self.n_smpl]
        for k in range(self.n_epcnn):
            cin = self.hidden_feat
            v_init = EPCNN(seqs[k], self.pred_seq_len, cin, chans[k],
                           name=f"epcnn_{k}")(v_init, valid)
            v_init = zero_invalid(v_init, valid, 3)

        return jnp.swapaxes(v_init, 2, 3)                  # NTCV -> NTVC


class TRCNN(nn.Module):
    """trcnn (stmrgcn.py:116-163): the refinement twin of EPCNN with a
    configurable channel-wise kernel and a (k,1)-conv time residual."""

    total_seq_len: int
    pred_seq_len: int
    in_channels: int
    out_channels: int
    t_ksize: int = 3

    @nn.compact
    def __call__(self, x, valid):
        # x: (B, T, C, V)
        if self.total_seq_len == self.pred_seq_len:
            res = x
        else:
            k_size = self.total_seq_len - self.pred_seq_len + 1
            r = jnp.transpose(x, (0, 2, 1, 3))
            r = TorchConv2d(self.in_channels, self.out_channels, (k_size, 1),
                            name="resconv")(r)
            res = jnp.transpose(r, (0, 2, 1, 3))

        h = clamp_to_valid(x, valid, 3)
        h = PReLU(name="tpcn_prelu")(
            ReplicateConv2d(self.total_seq_len, self.pred_seq_len, 3,
                            name="tpcn")(h))
        h = jnp.transpose(h, (0, 2, 1, 3))
        h = clamp_to_valid(h, valid, 3)
        h = PReLU(name="cpcn_prelu")(
            ReplicateConv2d(self.in_channels, self.out_channels, self.t_ksize,
                            name="cpcn")(h))
        h = jnp.transpose(h, (0, 2, 1, 3))
        return h + res


# ---------------------------------------------------------------------------
# Dormant full graph_tern machinery (model.py:18-217). The ET pipeline drives
# only graph_tern_light (utils/trainer.py:540-541), so everything below exists
# for reference-component completeness and is pinned by
# tests/test_dormant_stochastic.py; the live ET path is unchanged.
# ---------------------------------------------------------------------------

def gmm_endpoint_sample(rng, v_init: jnp.ndarray, n_smpl: int, n_ways: int,
                        prune=None) -> jnp.ndarray:
    """Sample endpoints from the n_ways GMM heads (model.py:108-124, 146-156).

    v_init: (1, M, V, 5*n_ways) with per-component [mu_x, mu_y, log_std_x,
    log_std_y, pi_logit]; returns (n_smpl, V, 2) — the mean over ways of a
    MixtureSameFamily(Categorical(softmax(pi)), Normal(mu, exp(log_std)))
    draw. `prune` masks that many lowest-pi components to -1e8 before
    sampling (the test-phase pruning, model.py:157-163).
    """
    dests = []
    for i, chunk in enumerate(jnp.split(v_init, n_ways, axis=-1)):
        t = jnp.transpose(chunk, (0, 2, 1, 3))[0]          # (V, M, 5)
        logits = t[..., 4]                                 # (V, M)
        if prune is not None:
            ranks = jnp.argsort(jnp.argsort(logits, axis=-1), axis=-1)
            logits = jnp.where(ranks < prune, -1e8, logits)
        kc, ke = jax.random.split(jax.random.fold_in(rng, i))
        v = t.shape[0]
        comp = jax.random.categorical(kc, logits, axis=-1,
                                      shape=(n_smpl, v))   # (S, V)
        mu, std = t[..., :2], jnp.exp(t[..., 2:4])
        eps = jax.random.normal(ke, (n_smpl, v, 2))
        vi = jnp.arange(v)[None, :]
        # The reference's MixtureSameFamily.sample() is detached (no grad_fn,
        # model.py:117-121): gradients must not flow into the GMM head
        # through the sampled endpoints.
        dests.append(jax.lax.stop_gradient(mu[vi, comp] + std[vi, comp] * eps))
    return jnp.stack(dests, axis=3).mean(axis=3)           # (S, V, 2)


def prune_select(endpoint_sets: jnp.ndarray) -> jnp.ndarray:
    """Most-diverse-round selection (model.py:166-171): per ped, keep the
    sampling round whose samples maximize the summed distance to their
    nearest other sample (kthvalue k=2 of the pairwise-distance matrix).

    endpoint_sets: (R, S, V, 2) -> (S, V, 2).
    """
    d = jnp.linalg.norm(endpoint_sets[:, None] - endpoint_sets[:, :, None],
                        axis=-1)                            # (R, S, S, V)
    nearest = jnp.sort(d, axis=2)[:, :, 1]                  # (R, S, V)
    r = jnp.argmax(nearest.sum(axis=1), axis=0)             # (V,)
    v = jnp.arange(endpoint_sets.shape[2])
    return jnp.transpose(endpoint_sets[r, :, v], (1, 0, 2))


def guided_endpoint_sample(rng, v_dest_rel: jnp.ndarray, gamma: jnp.ndarray,
                           n_smpl: int, eps_r=None, eps_t=None):
    """Training-phase guided sampling (model.py:126-134): polar perturbations
    of the GT mean step, radius U[0, Gamma_v], angle U[0, 1] *radians* (the
    reference's quirk — the angle never exceeds one radian — is preserved)."""
    v = v_dest_rel.shape[0]
    if eps_r is None:
        kr, kt = jax.random.split(rng)
        eps_r = jax.random.uniform(kr, (n_smpl, v)) * gamma[None, :]
        eps_t = jax.random.uniform(kt, (n_smpl, v))
    return v_dest_rel[None] + jnp.stack(
        [eps_r * jnp.cos(eps_t), eps_r * jnp.sin(eps_t)], axis=-1)


class GraphTERNFull(nn.Module):
    """Full graph_tern (model.py:18-217) — DORMANT in the ET pipeline.

    Control-point GMM head (5*n_ways output channels over n_gmms components)
    -> endpoint sampling (validation: plain GMM draw; test: `pruning` rounds
    + most-diverse selection; training: callers combine gmm_endpoint_sample
    with guided_endpoint_sample and the Gamma validity mask) -> linear
    endpoint interpolation -> graph trajectory refinement over the n_smpl
    sample batch. Returns (v_init, v_pred, v_refi) like the reference.
    `endpoint_set` injects the sampled endpoints for deterministic tests.
    """

    n_epgcn: int = 1
    n_epcnn: int = 6
    n_trgcn: int = 1
    n_trcnn: int = 4
    seq_len: int = 8
    pred_seq_len: int = 12
    n_ways: int = 3
    n_smpl: int = 20
    hidden_feat: int = 16
    n_gmms: int = 8
    input_feat: int = 2
    output_feat: int = 5
    gamma: float = 8.0

    @nn.compact
    def __call__(self, s_obs, valid, rng=None, endpoint_set=None,
                 pruning=None, train: bool = False):
        # s_obs: (1, 2, T_obs, V, 2) [abs, rel]
        a_obs = jax.lax.stop_gradient(generate_adjacency(s_obs, valid))
        v_obs_abs, v_obs_rel = s_obs[:, 0], s_obs[:, 1]

        # Control-point prediction (model.py:77-97); the full model feeds the
        # RELATIVE stream (the light variant feeds the absolute one).
        h = jnp.transpose(v_obs_rel, (0, 3, 1, 2))          # NTVC -> NCTV
        for k in range(self.n_epgcn):
            cin = self.input_feat if k == 0 else self.hidden_feat
            h = STMRGCN(cin, self.hidden_feat, name=f"tp_mrgcn_{k}")(
                h, a_obs, train)
        h = jnp.transpose(h, (0, 2, 1, 3))                  # NCTV -> NTCV
        h = zero_invalid(h, valid, 3)
        seqs = [self.seq_len] + [self.n_gmms] * (self.n_epcnn - 1)
        chans = ([self.hidden_feat] * (self.n_epcnn - 1)
                 + [self.output_feat * self.n_ways])
        for k in range(self.n_epcnn):
            h = EPCNN(seqs[k], self.n_gmms, self.hidden_feat, chans[k],
                      name=f"epcnn_{k}")(h, valid)
            h = zero_invalid(h, valid, 3)
        v_init = jnp.swapaxes(h, 2, 3)                      # (1, M, V, 5*K)

        # Endpoint sampling (model.py:136-171)
        if endpoint_set is None:
            if rng is None:
                rng = self.make_rng("gmm")
            if pruning is None:
                endpoint_set = gmm_endpoint_sample(
                    rng, v_init, self.n_smpl, self.n_ways)
            else:
                rounds = jnp.stack([
                    gmm_endpoint_sample(jax.random.fold_in(rng, 1000 + r),
                                        v_init, self.n_smpl, self.n_ways,
                                        prune=pruning)
                    for r in range(self.n_smpl)])
                endpoint_set = prune_select(rounds)

        # Linear interpolation + refinement (model.py:174-216)
        s = endpoint_set.shape[0]
        v_pred = jnp.repeat(endpoint_set[:, None], self.pred_seq_len, axis=1)
        v_pred_abs = jax.lax.stop_gradient(
            jnp.cumsum(v_pred, axis=1) + v_obs_abs[0, -1])
        a_pred = generate_adjacency(
            jnp.stack([v_pred_abs, v_pred], axis=1), valid)
        v_full = jax.lax.stop_gradient(jnp.concatenate(
            [jnp.repeat(v_obs_rel, s, axis=0), v_pred], axis=1))
        a_full = jax.lax.stop_gradient(jnp.concatenate(
            [jnp.repeat(a_obs, s, axis=0), a_pred], axis=2))

        total = self.seq_len + self.pred_seq_len
        h = jnp.transpose(v_full, (0, 3, 1, 2))             # NTVC -> NCTV
        for k in range(self.n_trgcn):
            cin = self.input_feat if k == 0 else self.hidden_feat
            h = STMRGCN(cin, self.hidden_feat, name=f"st_mrgcn_{k}")(
                h, a_full, train)
        h = jnp.transpose(h, (0, 2, 1, 3))                  # NCTV -> NTCV
        for j in range(self.n_trcnn - 1):
            h = TRCNN(total, total, self.hidden_feat, self.hidden_feat,
                      t_ksize=(self.n_trcnn - j) * 2 + 1,
                      name=f"trcnn_{j}")(h, valid)
        h = TRCNN(total, self.pred_seq_len, self.hidden_feat, self.input_feat,
                  t_ksize=3, name=f"trcnn_{self.n_trcnn - 1}")(h, valid)
        v_corr = jnp.swapaxes(h, 2, 3)                      # NTCV -> NTVC

        v_refi = v_pred_abs.at[:, :-1].add(v_corr[:, :-1])
        return v_init, v_pred, v_refi


def generate_adjacency(s_obs: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """4-relation adjacency (graphtern/model.py:7-15), padding-masked.

    s_obs: (1, 2, T, N, C) -> (1, 4, T, N, N).
    """
    diff = s_obs[:, :, :, :, None, :] - s_obs[:, :, :, None, :, :]
    a = jnp.linalg.norm(diff, axis=-1)                    # (1, 2, T, N, N)
    mask = (valid[:, None] & valid[None, :]).astype(a.dtype)
    a = a * mask
    a_inv = jnp.where(a == 0, 0.0, 1.0 / jnp.where(a == 0, 1.0, a))
    return jnp.concatenate([a, a_inv], axis=1)


def make_model(cfg):
    return GraphTERNLight(n_epgcn=1, n_epcnn=6, input_feat=1,
                          seq_len=cfg.k + 2, pred_seq_len=cfg.k,
                          n_smpl=cfg.num_samples)


def prepare(c_obs: jnp.ndarray, obs_ori: jnp.ndarray, aux: Dict) -> Tuple:
    """Pre-hook (graphtern/bridge.py:4-16): stack [abs, frame-diff rel]."""
    valid = aux["ped_valid"]
    obs = jnp.concatenate([c_obs, obs_ori], axis=0)
    obs = zero_invalid(obs, valid, axis=1)
    s_abs = jax.lax.stop_gradient(obs)[None, :, :, None]  # (1, T, N, 1)
    s_rel = jnp.concatenate(
        [jnp.zeros_like(s_abs[:, :1]), s_abs[:, 1:] - s_abs[:, :-1]], axis=1)
    s_obs = jnp.stack([s_abs, s_rel], axis=1)             # (1, 2, T, N, 1)
    return (s_obs, valid)


def finalize(output_data: jnp.ndarray, aux: Dict) -> jnp.ndarray:
    """Post-hook (graphtern/bridge.py:24-26): (1, k, N, s) -> (k, N, s)."""
    return output_data[0]


BATCHING = "sequenced"
