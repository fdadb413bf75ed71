"""ET-GP-Graph-SGCN: group-pooled SGCN predictor in ET coefficient space.

Rebuilt from baseline/gpgraphsgcn/{model,model_baseline,model_groupwrapper}.py:
a weight-shared SGCN (the GP-Graph variant with a loc_pos channel, see
models/sgcn.py `gpgraph_variant`) applied to three graphs — original,
inter-group pooled, intra-group masked — then mixed by an MLP GroupIntegrator.
ET wiring: obs k+2, pred k, in_dims=1, out_dims=s (utils/trainer.py:505-516);
bridge (gpgraphsgcn/bridge.py:4-18) uses coefficients as "v_rel" and concats a
loc_pos (1..T) channel.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import zero_invalid
from .gpgraph_common import (
    GroupGenerator,
    GroupIntegrator,
    ped_group_mask,
    ped_group_pool,
    ped_group_unpool,
)
from .sgcn import SGCNTrajectoryModel


def _identity_for(v, valid):
    """generate_identity_matrix (model_groupwrapper.py:173-177): v is NCTV.

    Unlike the base SGCN bridge (whose shape confusion yields eye(1), see
    models/sgcn.py prepare), the GP-Graph wrapper builds true spatial eye(N)
    and temporal eye(T) identities.
    """
    n, t = v.shape[3], v.shape[2]
    eye_n = jnp.eye(n) * (valid[:, None] & valid[None, :])
    return (eye_n[None], jnp.eye(t)[None])


class GPGraphSGCN(nn.Module):
    """GPGraph wrapper (model_groupwrapper.py:181-240) with an SGCN baseline,
    weight_share=True, group_type=(True, True, True), mix_type='mlp'."""

    obs_len: int = 8
    pred_len: int = 6
    in_dims: int = 1
    out_dims: int = 20

    def setup(self):
        self.baseline_model = SGCNTrajectoryModel(
            n_asym=7, embedding_dims=64, obs_len=self.obs_len,
            pred_len=self.pred_len, n_tcn=5, in_dims=self.in_dims,
            out_dims=self.out_dims, num_heads=4, gpgraph_variant=True)
        self.group_gen = GroupGenerator(in_channels=self.in_dims, hid_channels=8)
        self.group_mix = GroupIntegrator(out_channels=self.out_dims,
                                         pred_seq_len=self.pred_len, n_mix=3)

    def __call__(self, v_abs, v_rel, valid, train: bool = False):
        # v_abs: (1, 1, T, N) coefficients; v_rel: (1, 2, T, N) loc_pos+coeff.
        n = v_abs.shape[-1]
        v_stack = []

        def run_baseline(v_nctv, stream_valid, pair_mask=None):
            # baseline expects (1, T, N, C) (model_groupwrapper.py:208-211)
            g = jnp.transpose(v_nctv, (0, 2, 3, 1))
            i = _identity_for(v_nctv, stream_valid)
            out = self.baseline_model(g, i, stream_valid, pair_mask, train)
            # (Tp, N, s) -> (1, s, Tp, N)
            return jnp.transpose(out, (2, 0, 1))[None]

        # 1. original ped graph
        v_stack.append(run_baseline(v_rel, valid))

        # 2./3. group streams
        v_grouped, ranks, n_groups = self.group_gen(v_rel, v_abs, valid)
        v_grouped = zero_invalid(v_grouped, valid, 3)

        n_invalid = jnp.sum(~valid)
        pooled_valid = jnp.arange(n) < (n_groups - n_invalid)

        v_pool = ped_group_pool(v_grouped, ranks)
        v_pool = zero_invalid(v_pool, pooled_valid, 3)
        out_pool = run_baseline(v_pool, pooled_valid)
        v_stack.append(ped_group_unpool(out_pool, ranks))

        mask = ped_group_mask(ranks)
        v_stack.append(run_baseline(v_grouped, valid, mask))

        return self.group_mix(v_stack)


def make_model(cfg):
    return GPGraphSGCN(obs_len=cfg.k + 2, pred_len=cfg.k, in_dims=1,
                       out_dims=cfg.num_samples)


def prepare(c_obs: jnp.ndarray, obs_ori: jnp.ndarray, aux: Dict) -> Tuple:
    """Pre-hook (gpgraphsgcn/bridge.py:4-18): loc_pos channel concat."""
    valid = aux["ped_valid"]
    obs = jnp.concatenate([c_obs, obs_ori], axis=0)       # (T, N)
    obs = zero_invalid(obs, valid, axis=1)
    v_abs = jax.lax.stop_gradient(obs)[None, None]        # (1, 1, T, N)
    t = v_abs.shape[2]
    loc_pos = jnp.arange(1, t + 1, dtype=v_abs.dtype)[None, None, :, None]
    loc_pos = jnp.broadcast_to(loc_pos, v_abs.shape)
    v_rel = jnp.concatenate([loc_pos, v_abs], axis=1)     # (1, 2, T, N)
    return (v_abs, v_rel, valid)


def finalize(output_data: jnp.ndarray, aux: Dict) -> jnp.ndarray:
    """Post-hook (gpgraphsgcn/bridge.py:26-29): (1, s, k, N) -> (k, N, s)."""
    return jnp.transpose(output_data, (0, 2, 3, 1))[0]


BATCHING = "sequenced"
