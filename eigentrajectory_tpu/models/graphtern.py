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
