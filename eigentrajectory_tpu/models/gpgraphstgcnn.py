"""ET-GP-Graph-STGCNN: group-pooled Social-STGCNN predictor in ET space.

Rebuilt from baseline/gpgraphstgcnn/{model,model_baseline,model_groupwrapper}.py:
the same GPGraph wrapper as the SGCN variant, but the weight-shared baseline is
the single-relation social_stgcnn (model_baseline.py: graph conv 'nctv,tvw')
and each stream builds an inverse-distance Laplacian adjacency instead of
identity matrices (gpgraphstgcnn/model_groupwrapper.py:208-228); the intra
stream masks the adjacency by group membership. ET wiring: obs k+2, pred k,
in_dims=1, out_dims=s (utils/trainer.py:526-530); the bridge adds no loc_pos
channel (gpgraphstgcnn/bridge.py:4-14).
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
from .stgcnn import SocialSTGCNN, generate_adjacency_matrix


class GPGraphSTGCNN(nn.Module):
    """GPGraph wrapper with a single-relation Social-STGCNN baseline."""

    obs_len: int = 8
    pred_len: int = 6
    in_dims: int = 1
    out_dims: int = 20

    def setup(self):
        self.baseline_model = SocialSTGCNN(
            n_stgcnn=1, n_txpcnn=5, input_feat=self.in_dims,
            output_feat=self.out_dims, seq_len=self.obs_len,
            pred_seq_len=self.pred_len, kernel_size=3, single_relation=True)
        self.group_gen = GroupGenerator(in_channels=self.in_dims, hid_channels=8)
        self.group_mix = GroupIntegrator(out_channels=self.out_dims,
                                         pred_seq_len=self.pred_len, n_mix=3)

    def __call__(self, v_abs, v_rel, valid, train: bool = False):
        # v_abs == v_rel: (1, 1, T, N) coefficients (bridge.py:11-13).
        n = v_abs.shape[-1]
        v_stack = []

        def run_baseline(v_nctv, stream_valid, pair_mask=None):
            a = generate_adjacency_matrix(
                jax.lax.stop_gradient(v_nctv), stream_valid,
                pair_mask=pair_mask)
            out = self.baseline_model(v_nctv, jax.lax.stop_gradient(a),
                                      stream_valid, train)
            return out                                     # (1, s, Tp, N)

        v_stack.append(run_baseline(v_rel, valid))

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
    return GPGraphSTGCNN(obs_len=cfg.k + 2, pred_len=cfg.k, in_dims=1,
                         out_dims=cfg.num_samples)


def prepare(c_obs: jnp.ndarray, obs_ori: jnp.ndarray, aux: Dict) -> Tuple:
    """Pre-hook (gpgraphstgcnn/bridge.py:4-14)."""
    valid = aux["ped_valid"]
    obs = jnp.concatenate([c_obs, obs_ori], axis=0)
    obs = zero_invalid(obs, valid, axis=1)
    v_abs = jax.lax.stop_gradient(obs)[None, None]        # (1, 1, T, N)
    return (v_abs, v_abs, valid)


def finalize(output_data: jnp.ndarray, aux: Dict) -> jnp.ndarray:
    """Post-hook (gpgraphstgcnn/bridge.py:24-26): (1, s, k, N) -> (k, N, s)."""
    return jnp.transpose(output_data, (0, 2, 3, 1))[0]


BATCHING = "sequenced"
