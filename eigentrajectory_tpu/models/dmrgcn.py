"""ET-DMRGCN: disentangled multi-relational GCN predictor in ET space.

Rebuilt from the behaviour of baseline/dmrgcn/{dmrgcn,gcn,predictor,normalizer,
dropedge}.py: two relation stacks (displacement / distance adjacency,
bridge.py:4-18) split into binary scale bands (dmrgcn.py:22-46), per-band graph
convs over a normalized-Laplacian-tilde with DropEdge p=0.8 during training
(dropedge.py:7-16), then a temporal-CNN + global-temporal-aggregation predictor
(predictor.py:9-58). ET wiring: n_stgcn=1, n_tpcnn=4, input_feat=1,
output_feat=s, seq_len=k+2 -> pred k (utils/trainer.py:498-499).

Scale-band splits (predictor.py:68-70): disp [0,1/4,2/4,3/4,1], dist
[0,1/2,1,2,4] — five bands each (upper sentinel 1e10).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import PReLU, TorchConv2d, zero_invalid

SPLIT = ((0.0, 0.25, 0.5, 0.75, 1.0), (0.0, 0.5, 1.0, 2.0, 4.0))


def disentangle(a: jnp.ndarray, split) -> jnp.ndarray:
    """Binary scale bands (dmrgcn.py:14-35): band_i = 1 iff s_i < a < s_{i+1}.

    a: (1, T, V, V) -> (1, R, T, V, V) with R = len(split) bands.
    """
    bounds = list(split) + [1e10]
    bands = [jnp.logical_and(a > lo, a < hi).astype(a.dtype)
             for lo, hi in zip(bounds[:-1], bounds[1:])]
    return jnp.stack(bands, axis=1)


def normalized_laplacian_tilde(a: jnp.ndarray) -> jnp.ndarray:
    """L~ = I - D~^-1/2 (A + I) D~^-1/2 (dmrgcn/normalizer.py:10-37),
    batched over leading dims."""
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)
    a_t = a + eye
    deg = a_t.sum(axis=-1)
    dinv = jnp.where(deg > 0, deg ** -0.5, 0.0)
    norm = dinv[..., :, None] * a_t * dinv[..., None, :]
    return eye - norm


class DropEdge(nn.Module):
    """DropEdge (dropedge.py:7-16): keep each edge with prob `percent`."""

    percent: float = 0.8

    @nn.compact
    def __call__(self, a, train: bool):
        if not train:
            return a
        rng = self.make_rng("dropout")
        keep = jax.random.uniform(rng, a.shape) <= self.percent
        return a * keep.astype(a.dtype)


class MultiRelationalGCN(nn.Module):
    """MultiRelationalGCN (dmrgcn.py:49-69): per-band conv + einsum over L~."""

    in_channels: int
    out_channels: int
    relation: int  # number of scale bands

    @nn.compact
    def __call__(self, x, a_bands, train: bool):
        # x: (1, C, T, V); a_bands: (1, R, T, V, V)
        h = TorchConv2d(self.in_channels, self.out_channels * self.relation,
                        (1, 1), name="conv")(x)
        h = h.reshape(h.shape[0], self.relation, self.out_channels,
                      h.shape[-2], h.shape[-1])
        a = DropEdge(name="drop_edge")(a_bands, train)
        lap = normalized_laplacian_tilde(a)
        return jnp.einsum("nrtwv,nrctv->nctw", lap, h)


class STDMRGCN(nn.Module):
    """st_dmrgcn (dmrgcn.py:184-239)."""

    in_channels: int
    out_channels: int
    t_kernel: int = 3

    @nn.compact
    def __call__(self, x, a, valid, train: bool):
        # x: (1, C, T, V); a: (1, 2, T, V, V) [disp, dist]
        if self.in_channels == self.out_channels:
            res = x
        else:
            res = TorchConv2d(self.in_channels, self.out_channels, (1, 1),
                              name="res_conv")(x)

        x_r = None
        for r, split in enumerate(SPLIT):
            bands = disentangle(a[:, r], split)
            h = MultiRelationalGCN(self.in_channels, self.out_channels,
                                   len(split), name=f"gcn_{r}")(x, bands, train)
            x_r = h if x_r is None else x_r + h

        pad = (self.t_kernel - 1) // 2
        h = PReLU(name="tcn_prelu")(x_r)
        h = TorchConv2d(self.out_channels, self.out_channels,
                        (self.t_kernel, 1), padding=(pad, 0), name="tcn_conv")(h)
        return PReLU(name="out_prelu")(h + res)


class TPCNN(nn.Module):
    """tpcnn (predictor.py:9-58): TCN + global temporal aggregation."""

    seq_len: int
    pred_seq_len: int
    output_feat: int
    n_tpcn: int = 2
    n_gtacn: int = 1

    @nn.compact
    def __call__(self, x, valid, train: bool):
        # x: (1, T, C, V) — the 3x3 TCN convs mix (C, V) spatially.
        if self.seq_len == self.pred_seq_len:
            res = x
        else:
            res = TorchConv2d(self.seq_len, self.pred_seq_len, (1, 1),
                              name="res_conv")(x)

        x = zero_invalid(x, valid, 3)
        h = PReLU(name="tpcn_prelu_0")(
            TorchConv2d(self.seq_len, self.pred_seq_len, (3, 3), padding=(1, 1),
                        name="tpcn_0")(x)) + res
        for i in range(1, self.n_tpcn):
            h = zero_invalid(h, valid, 3)
            h = PReLU(name=f"tpcn_prelu_{i}")(
                TorchConv2d(self.pred_seq_len, self.pred_seq_len, (3, 3),
                            padding=(1, 1), name=f"tpcn_{i}")(h)) + h

        # GTA (predictor.py:24-33, :52-56): NTCV -> NCTV, (Tp,1) conv, back.
        g = jnp.transpose(h, (0, 2, 1, 3))
        g = PReLU(name="gta_prelu_0")(
            TorchConv2d(self.output_feat, self.output_feat,
                        (self.pred_seq_len, 1), name="gta_0")(g)) + g
        for i in range(1, self.n_gtacn):
            g = PReLU(name=f"gta_prelu_{i}")(
                TorchConv2d(self.output_feat, self.output_feat, (1, 1),
                            name=f"gta_{i}")(g)) + g
        return jnp.transpose(g, (0, 2, 1, 3))


class SocialDMRGCN(nn.Module):
    """social_dmrgcn (predictor.py:61-98) with the ET wiring."""

    n_stgcn: int = 1
    n_tpcnn: int = 4
    input_feat: int = 1
    output_feat: int = 20
    seq_len: int = 8
    pred_seq_len: int = 6

    @nn.compact
    def __call__(self, v, a, valid, train: bool = False):
        for i in range(self.n_stgcn):
            cin = self.input_feat if i == 0 else self.output_feat
            v = STDMRGCN(cin, self.output_feat, name=f"st_dmrgcn_{i}")(
                v, a, valid, train)

        v = jnp.transpose(v, (0, 2, 1, 3))          # NCTV -> NTCV (real permute)
        for i in range(self.n_tpcnn):
            seq = self.seq_len if i == 0 else self.pred_seq_len
            v = TPCNN(seq, self.pred_seq_len, self.output_feat,
                      name=f"tpcnn_{i}")(v, valid, train)
        return jnp.transpose(v, (0, 2, 1, 3))


def make_model(cfg):
    return SocialDMRGCN(n_stgcn=1, n_tpcnn=4, input_feat=1,
                        output_feat=cfg.num_samples, seq_len=cfg.k + 2,
                        pred_seq_len=cfg.k)


def generate_adjacency(v: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Two-relation adjacency (dmrgcn/bridge.py:4-18): [A_disp, A_dist] from
    absolute and frame-difference coefficient distances, padding-masked."""
    x = v[0, 0]                                      # (T, V)
    x_rel = jnp.concatenate([jnp.zeros_like(x[:1]), x[1:] - x[:-1]], axis=0)
    mask = (valid[:, None] & valid[None, :]).astype(x.dtype)
    a_dist = jnp.abs(x[:, :, None] - x[:, None, :]) * mask[None]
    a_disp = jnp.abs(x_rel[:, :, None] - x_rel[:, None, :]) * mask[None]
    return jnp.stack([a_disp, a_dist], axis=0)[None]  # (1, 2, T, V, V)


def prepare(c_obs: jnp.ndarray, obs_ori: jnp.ndarray, aux: Dict) -> Tuple:
    """Pre-hook (dmrgcn/bridge.py:21-29)."""
    valid = aux["ped_valid"]
    obs = jnp.concatenate([c_obs, obs_ori], axis=0)
    obs = zero_invalid(obs, valid, axis=1)
    v = jax.lax.stop_gradient(obs)[None, None]       # (1, 1, T, V)
    a = jax.lax.stop_gradient(generate_adjacency(v, valid))
    return (v, a, valid)


def finalize(output_data: jnp.ndarray, aux: Dict) -> jnp.ndarray:
    """Post-hook (dmrgcn/bridge.py:38-41): (1, s, k, V) -> (k, V, s)."""
    return jnp.transpose(output_data, (0, 2, 3, 1))[0]


BATCHING = "sequenced"
