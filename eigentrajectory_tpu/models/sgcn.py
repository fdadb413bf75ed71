"""ET-SGCN: sparse-graph-convolution predictor in ET coefficient space.

Rebuilt from the behaviour of baseline/sgcn/model.py (TrajectoryModel: sparse
self-attention adjacency with asymmetric-conv interaction masks and zero
softmax, dual spatial<->temporal GCN streams, TCN stack) and
baseline/sgcn/bridge.py (identity matrices instead of adjacency), with the ET
wiring number_asymmetric_conv_layer=7, embedding_dims=64, obs_len=k+2,
pred_len=k, n_tcn=5, in_dims=1, out_dims=s (utils/trainer.py:288-290).

Padding discipline: the spatial attention softmax, zero-softmax row sums, and
the (N, N) asymmetric convolutions all mix ped slots, so invalid slots are
masked at the logits and re-zeroed around every conv (the temporal stream
keeps peds on the batch axis and needs no masking).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import PReLU, TorchConv2d, TorchLinear, zero_invalid


def zero_softmax(x: jnp.ndarray, axis: int = -1, eps: float = 1e-5) -> jnp.ndarray:
    """ZeroSoftmax (sgcn/model.py:60-68): (exp(x)-1)^2 normalized rows."""
    x_exp = (jnp.exp(x) - 1.0) ** 2
    return x_exp / (jnp.sum(x_exp, axis=axis, keepdims=True) + eps)


class SelfAttention(nn.Module):
    """SelfAttention (sgcn/model.py:71-109): embed -> Q/K -> scaled softmax."""

    in_dims: int
    d_model: int = 64
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, logit_mask=None):
        # x: (B, L, in_dims); logit_mask: (L,) bool — True = attendable key.
        emb = TorchLinear(self.d_model, name="embedding")(x)
        q = TorchLinear(self.d_model, name="query")(emb)
        k = TorchLinear(self.d_model, name="key")(emb)

        def split(h):  # (B, L, D) -> (B, H, L, D/H)
            b, l, d = h.shape
            return h.reshape(b, l, self.num_heads, d // self.num_heads).transpose(0, 2, 1, 3)

        attn = split(q) @ jnp.swapaxes(split(k), -1, -2)   # (B, H, L, L)
        attn = attn / jnp.sqrt(jnp.asarray(self.d_model, x.dtype))
        if logit_mask is not None:
            attn = jnp.where(logit_mask[None, None, None, :], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1)
        return attn, emb


class AsymmetricConvolution(nn.Module):
    """AsymmetricConvolution (sgcn/model.py:9-25): (3,1)+(1,3) convs, PReLU."""

    in_cha: int
    out_cha: int

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if self.in_cha != self.out_cha:
            shortcut = TorchConv2d(self.in_cha, self.out_cha, (1, 1),
                                   use_bias=False, name="shortcut")(x)
        x1 = TorchConv2d(self.in_cha, self.out_cha, (3, 1), padding=(1, 0),
                         use_bias=False, name="conv1")(x)
        x2 = TorchConv2d(self.in_cha, self.out_cha, (1, 3), padding=(0, 1),
                         name="conv2")(x)
        x2 = PReLU(name="activation")(x2 + x1)
        return x2 + shortcut


class InteractionMask(nn.Module):
    """InteractionMask (sgcn/model.py:28-57): stacked asymmetric convs +
    sigmoid threshold 0.5."""

    n_layers: int = 7
    spatial_channels: int = 4
    temporal_channels: int = 4

    @nn.compact
    def __call__(self, dense_spatial, dense_temporal, valid, threshold=0.5):
        # dense_spatial: (T, 4, N, N) — asymmetric convs mix ped rows/cols,
        # so re-zero invalid slots around each layer.
        for j in range(self.n_layers):
            dense_spatial = zero_invalid(zero_invalid(dense_spatial, valid, 2), valid, 3)
            dense_spatial = AsymmetricConvolution(
                self.spatial_channels, self.spatial_channels, name=f"spatial_{j}")(dense_spatial)
            dense_temporal = AsymmetricConvolution(
                self.temporal_channels, self.temporal_channels, name=f"temporal_{j}")(dense_temporal)
        spatial_mask = nn.sigmoid(dense_spatial)
        temporal_mask = nn.sigmoid(dense_temporal)
        spatial_mask = jnp.where(spatial_mask > threshold, spatial_mask, 0.0)
        temporal_mask = jnp.where(temporal_mask > threshold, temporal_mask, 0.0)
        return spatial_mask, temporal_mask


class SparseWeightedAdjacency(nn.Module):
    """SparseWeightedAdjacency (sgcn/model.py:126-171)."""

    spa_in_dims: int = 1
    tem_in_dims: int = 1
    embedding_dims: int = 64
    obs_len: int = 8
    n_asym: int = 7
    drop_first_channel: bool = False  # GP-Graph variant: loc_pos channel is
                                      # excluded from spatial attention
                                      # (gpgraphsgcn/model_baseline.py:~178)

    @nn.compact
    def __call__(self, graph, identity, valid, pair_mask=None):
        # graph: (T, N, in_dims)
        spatial_graph = graph[:, :, 1:] if self.drop_first_channel else graph
        temporal_graph = jnp.transpose(graph, (1, 0, 2))   # (N, T, d)

        dense_spatial, _ = SelfAttention(
            self.spa_in_dims, self.embedding_dims, name="spatial_attention")(
            spatial_graph, logit_mask=valid)               # (T, 4, N, N)
        dense_temporal, _ = SelfAttention(
            self.tem_in_dims, self.embedding_dims, name="temporal_attention")(
            temporal_graph)                                # (N, 4, T, T)

        # SpatialTemporalFusion (model.py:112-123): 1x1 conv over the T axis.
        st = jnp.transpose(dense_spatial, (1, 0, 2, 3))    # (4, T, N, N)
        st = TorchConv2d(self.obs_len, self.obs_len, (1, 1), name="spa_fusion_conv")(st)
        st = PReLU(name="spa_fusion_prelu")(st) + jnp.transpose(dense_spatial, (1, 0, 2, 3))
        st = jnp.transpose(st, (1, 0, 2, 3))               # (T, 4, N, N)
        ts = dense_temporal

        spatial_mask, temporal_mask = InteractionMask(
            self.n_asym, name="interaction_mask")(st, ts, valid)

        # self-connected (model.py:160-161)
        spatial_mask = spatial_mask + identity[0][:, None]   # (1,1,N,N) bcast
        temporal_mask = temporal_mask + identity[1][:, None]

        # optional group mask (model.py:163-165, used by GP-Graph intra stream)
        if pair_mask is not None:
            spatial_mask = spatial_mask * pair_mask

        norm_spatial = zero_softmax(dense_spatial * spatial_mask, axis=-1)
        norm_temporal = zero_softmax(dense_temporal * temporal_mask, axis=-1)
        return norm_spatial, norm_temporal


class GraphConvolution(nn.Module):
    """GraphConvolution (sgcn/model.py:174-187); dropout p=0 in the ET wiring."""

    in_dims: int
    embedding_dims: int

    @nn.compact
    def __call__(self, graph, adjacency):
        feats = TorchLinear(self.embedding_dims, use_bias=False, name="embedding")(
            adjacency @ graph)
        return PReLU(name="activation")(feats)


class SparseGraphConvolution(nn.Module):
    """SparseGraphConvolution (sgcn/model.py:190-221): dual st/ts streams."""

    in_dims: int = 1
    embedding_dims: int = 16
    drop_first_channel: bool = False

    @nn.compact
    def __call__(self, graph, norm_spatial, norm_temporal):
        # graph: (1, T, N, d); GP-Graph variant drops loc_pos for the GCN
        # (gpgraphsgcn/model_baseline.py SparseGraphConvolution.forward).
        if self.drop_first_channel:
            graph = graph[:, :, :, 1:]
        spa_graph = jnp.transpose(graph, (1, 0, 2, 3))     # (T, 1, N, d)
        tem_graph = jnp.transpose(spa_graph, (2, 1, 0, 3))  # (N, 1, T, d)

        g = GraphConvolution(self.in_dims, self.embedding_dims, name="st_gcn_0")(
            spa_graph, norm_spatial)                        # (T, 4, N, e)
        g = jnp.transpose(g, (2, 1, 0, 3))                  # (N, 4, T, e)
        gcn_st = GraphConvolution(self.embedding_dims, self.embedding_dims,
                                  name="st_gcn_1")(g, norm_temporal)

        h = GraphConvolution(self.in_dims, self.embedding_dims, name="ts_gcn_0")(
            tem_graph, norm_temporal)                       # (N, 4, T, e)
        h = jnp.transpose(h, (2, 1, 0, 3))                  # (T, 4, N, e)
        gcn_ts = GraphConvolution(self.embedding_dims, self.embedding_dims,
                                  name="ts_gcn_1")(h, norm_spatial)

        return gcn_st, jnp.transpose(gcn_ts, (2, 1, 0, 3))


class SGCNTrajectoryModel(nn.Module):
    """TrajectoryModel (sgcn/model.py:224-272) with the ET wiring."""

    n_asym: int = 7
    embedding_dims: int = 64
    obs_len: int = 8
    pred_len: int = 6
    n_tcn: int = 5
    in_dims: int = 1
    out_dims: int = 20
    num_heads: int = 4
    gpgraph_variant: bool = False  # loc_pos channel handling, see model_baseline.py

    @nn.compact
    def __call__(self, graph, identity, valid, pair_mask=None, train: bool = False):
        # graph: (1, T, N, in_dims) — GP-Graph variant: (1, T, N, in_dims+1)
        # with loc_pos in channel 0; spatial attention sees in_dims, temporal
        # sees in_dims+1 (model_baseline.py TrajectoryModel.__init__).
        tem_in = self.in_dims + 1 if self.gpgraph_variant else self.in_dims
        norm_spatial, norm_temporal = SparseWeightedAdjacency(
            self.in_dims, tem_in, self.embedding_dims, self.obs_len,
            self.n_asym, drop_first_channel=self.gpgraph_variant,
            name="sparse_adjacency")(graph[0], identity, valid, pair_mask)

        gcn_ts, gcn_st = SparseGraphConvolution(
            self.in_dims, self.embedding_dims // self.num_heads,
            drop_first_channel=self.gpgraph_variant, name="stsgcn")(
            graph, norm_spatial, norm_temporal)             # both (N, 4, T, e)

        fused = TorchConv2d(self.num_heads, self.num_heads, (1, 1),
                            use_bias=False, name="fusion")(gcn_ts) + gcn_st
        rep = jnp.transpose(fused, (0, 2, 1, 3))            # (N, T, 4, e)

        feats = PReLU(name="tcn_prelu_0")(
            TorchConv2d(self.obs_len, self.pred_len, (3, 3), padding=(1, 1),
                        name="tcn_0")(rep))
        for j in range(1, self.n_tcn):
            feats = PReLU(name=f"tcn_prelu_{j}")(
                TorchConv2d(self.pred_len, self.pred_len, (3, 3), padding=(1, 1),
                            name=f"tcn_{j}")(feats)) + feats

        pred = TorchLinear(self.out_dims, name="output")(feats)  # (N, Tp, 4, s)
        pred = jnp.mean(pred, axis=-2)                           # (N, Tp, s)
        return jnp.transpose(pred, (1, 0, 2))                    # (Tp, N, s)


def make_model(cfg):
    return SGCNTrajectoryModel(
        n_asym=7, embedding_dims=64, obs_len=cfg.k + 2, pred_len=cfg.k,
        n_tcn=5, in_dims=1, out_dims=cfg.num_samples, num_heads=4)


def prepare(c_obs: jnp.ndarray, obs_ori: jnp.ndarray, aux: Dict) -> Tuple:
    """Pre-hook (sgcn/bridge.py:4-13): identity matrices instead of adjacency."""
    valid = aux["ped_valid"]
    obs = jnp.concatenate([c_obs, obs_ori], axis=0)       # (T, N)
    obs = zero_invalid(obs, valid, axis=1)
    v = jax.lax.stop_gradient(obs)[None, :, :, None]      # (1, T, N, 1)
    n = v.shape[2]
    # bridge.py:9-10: eye(N) with leading broadcast dims (masked for padding)
    eye_n = jnp.eye(n) * (valid[:, None] & valid[None, :])
    identity = (eye_n[None], jnp.eye(v.shape[3])[None])
    return (v, identity, valid)


def finalize(output_data: jnp.ndarray, aux: Dict) -> jnp.ndarray:
    """Post-hook (sgcn/bridge.py:21-24): passthrough (k, N, s)."""
    return output_data


BATCHING = "sequenced"
