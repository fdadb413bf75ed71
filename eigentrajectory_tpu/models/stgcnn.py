"""ET-STGCNN: Social-STGCNN predictor in ET coefficient space.

Rebuilt from the behaviour of baseline/stgcnn/model.py (social_stgcnn:
1x st_gcn graph conv + temporal-CNN stack) and baseline/stgcnn/bridge.py
(inverse-distance normalized-Laplacian adjacency over coefficient "nodes"),
with the trainer wiring n_stgcnn=1, n_txpcnn=5, input_feat=1, output_feat=s,
seq_len=k+2, pred_seq_len=k (utils/trainer.py:274-275).

Quirks reproduced deliberately:
  * the channel/time "view" between the GCN and TXP-CNN stages is a raw
    memory reinterpretation, not a transpose (model.py:128 / :140) —
    jnp.reshape on the same row-major layout is bit-identical;
  * tpcnns[n_txpcnn-1] is constructed but never called (model.py:133-137:
    the residual loop stops at n_txpcnn-2 and the output conv is a separate
    layer) — we create it too so parameter structure matches;
  * the TXP-CNN 3x3 convs convolve over (channel, ped) as spatial dims, so
    padded ped slots are re-zeroed before every V-mixing op to emulate the
    reference's ragged edge (padding discipline).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import MaskedBatchNorm2d, PReLU, TorchConv2d, zero_invalid


def generate_adjacency_matrix(
    v: jnp.ndarray, valid: jnp.ndarray, pair_mask=None
) -> jnp.ndarray:
    """Inverse-distance normalized-Laplacian adjacency (stgcnn/bridge.py:4-21).

    v: (1, 1, T, V) coefficient sequence; valid: (V,) bool; pair_mask: optional
    (V, V) bool multiplying the inverse-distance kernel (the GP-Graph intra
    stream's group mask, gpgraphstgcnn/model_groupwrapper.py:227).
    Returns (T, V, V). Padded nodes are isolated (their rows/cols vanish),
    which reproduces the reference graph over the valid sub-block exactly.
    """
    x = v[0, 0]                                        # (T, V)
    a = jnp.abs(x[:, :, None] - x[:, None, :])         # (T, V, V) |c_i - c_j|
    a_inv = jnp.where(a == 0, 0.0, 1.0 / jnp.where(a == 0, 1.0, a))
    mask = (valid[:, None] & valid[None, :])
    if pair_mask is not None:
        mask = mask & pair_mask
    mask = mask.astype(x.dtype)
    a_inv = a_inv * mask[None]
    n = x.shape[1]
    eye = jnp.eye(n, dtype=x.dtype)
    a_hat = a_inv + eye[None]
    deg = a_hat.sum(axis=-1)                           # (T, V)
    dinv = jnp.where(deg > 0, deg ** -0.5, 0.0)
    d = eye[None] * dinv[:, :, None]
    return eye[None] - d @ a_hat @ d


class STGCN(nn.Module):
    """st_gcn block (stgcnn/model.py:55-108): graph conv + temporal conv +
    residual, PReLU output."""

    in_channels: int
    out_channels: int
    t_kernel: int        # temporal kernel (3)
    spatial_kernel: int  # == seq_len; number of per-timestep adjacency slices
    single_relation: bool = False  # GP-Graph STGCNN variant
                                   # (gpgraphstgcnn/model_baseline.py): the
                                   # graph conv emits out_channels (no *K) and
                                   # contracts 'nctv,tvw->nctw'

    @nn.compact
    def __call__(self, x, a, valid, train: bool):
        # x: (1, C_in, T, V); a: (K=T, V, V)
        # --- residual branch (in != out in the ET wiring) ---
        if self.in_channels == self.out_channels:
            res = x
        else:
            res = TorchConv2d(self.in_channels, self.out_channels, (1, 1), name="res_conv")(x)
            res = MaskedBatchNorm2d(self.out_channels, name="res_bn")(
                res, valid, use_running_average=not train)

        # --- graph conv (ConvTemporalGraphical, model.py:36-52) ---
        if self.single_relation:
            h = TorchConv2d(self.in_channels, self.out_channels, (1, 1),
                            name="gcn_conv")(x)
            h = jnp.einsum("nctv,tvw->nctw", h, a)
        else:
            h = TorchConv2d(
                self.in_channels, self.out_channels * self.spatial_kernel, (1, 1),
                name="gcn_conv")(x)
            n, kc, t, v = h.shape
            h = h.reshape(n, self.spatial_kernel, kc // self.spatial_kernel, t, v)
            h = jnp.einsum("nkctv,kvw->nctw", h, a)

        # --- temporal conv (model.py:84-88) ---
        h = MaskedBatchNorm2d(self.out_channels, name="tcn_bn1")(
            h, valid, use_running_average=not train)
        h = PReLU(name="tcn_prelu")(h)
        pad = (self.t_kernel - 1) // 2
        h = TorchConv2d(self.out_channels, self.out_channels,
                        (self.t_kernel, 1), padding=(pad, 0), name="tcn_conv")(h)
        h = MaskedBatchNorm2d(self.out_channels, name="tcn_bn2")(
            h, valid, use_running_average=not train)

        return PReLU(name="out_prelu")(h + res)


class SocialSTGCNN(nn.Module):
    """social_stgcnn (stgcnn/model.py:111-146) with the ET wiring."""

    n_stgcnn: int = 1
    n_txpcnn: int = 5
    input_feat: int = 1
    output_feat: int = 20
    seq_len: int = 8
    pred_seq_len: int = 6
    kernel_size: int = 3
    single_relation: bool = False  # GP-Graph STGCNN variant graph conv

    @nn.compact
    def __call__(self, v, a, valid, train: bool = False):
        # v: (1, input_feat, T, V)
        for i in range(self.n_stgcnn):
            cin = self.input_feat if i == 0 else self.output_feat
            v = STGCN(cin, self.output_feat, self.kernel_size, self.seq_len,
                      single_relation=self.single_relation,
                      name=f"st_gcn_{i}")(v, a, valid, train)

        # raw memory reinterpretation (model.py:128), NOT a transpose
        v = v.reshape(v.shape[0], v.shape[2], v.shape[1], v.shape[3])

        v = zero_invalid(v, valid, axis=3)
        v = PReLU(name="prelu_0")(
            TorchConv2d(self.seq_len, self.pred_seq_len, (3, 3), padding=(1, 1),
                        name="tpcnn_0")(v))
        v = zero_invalid(v, valid, axis=3)

        for k in range(1, self.n_txpcnn - 1):
            v = PReLU(name=f"prelu_{k}")(
                TorchConv2d(self.pred_seq_len, self.pred_seq_len, (3, 3), padding=(1, 1),
                            name=f"tpcnn_{k}")(v)) + v
            v = zero_invalid(v, valid, axis=3)

        # Constructed-but-unused layer in the reference (model.py:120-123 vs
        # :133-137); instantiated for structural fidelity, never applied.
        if self.n_txpcnn >= 2:
            TorchConv2d(self.pred_seq_len, self.pred_seq_len, (3, 3), padding=(1, 1),
                        name=f"tpcnn_{self.n_txpcnn - 1}")
            PReLU(name=f"prelu_{self.n_txpcnn - 1}")

        v = TorchConv2d(self.pred_seq_len, self.pred_seq_len, (3, 3), padding=(1, 1),
                        name="tpcnn_output")(v)
        v = zero_invalid(v, valid, axis=3)

        # reinterpretation back (model.py:140)
        v = v.reshape(v.shape[0], v.shape[2], v.shape[1], v.shape[3])
        return v


def make_model(cfg) -> nn.Module:
    return SocialSTGCNN(
        n_stgcnn=1, n_txpcnn=5, input_feat=1, output_feat=cfg.num_samples,
        seq_len=cfg.k + 2, pred_seq_len=cfg.k, kernel_size=3)


def prepare(c_obs: jnp.ndarray, obs_ori: jnp.ndarray, aux: Dict) -> Tuple:
    """Pre-hook (stgcnn/bridge.py:24-32): concat origin rows, build graph."""
    valid = aux["ped_valid"]
    obs = jnp.concatenate([c_obs, obs_ori], axis=0)     # (k+2, V)
    obs = zero_invalid(obs, valid, axis=1)
    v = jax.lax.stop_gradient(obs)[None, None]          # (1, 1, T, V)
    a = jax.lax.stop_gradient(generate_adjacency_matrix(v, valid))
    return (v, a, valid)


def finalize(output_data: jnp.ndarray, aux: Dict) -> jnp.ndarray:
    """Post-hook (stgcnn/bridge.py:40-43): (1, s, k, V) -> (k, V, s)."""
    return jnp.transpose(output_data, (0, 2, 3, 1))[0]


BATCHING = "sequenced"
