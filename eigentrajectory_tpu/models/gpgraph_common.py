"""GP-Graph group machinery, XLA-reformulated.

Rebuilt from the behaviour of baseline/gpgraph{sgcn,stgcnn}/model_groupwrapper.py:
learned L2-norm pair distances -> sequential group relabeling -> straight-through
group pooling -> three streams (original / inter-group pooled / intra-group
masked) through a weight-shared baseline -> MLP GroupIntegrator.

The reference's grouping (find_group_indices, model_groupwrapper.py:24-37) is a
data-dependent Python loop producing a ragged pooled graph. Here it becomes:
  * the same sequential relabeling as a lax.fori_loop over row-major (r, c)
    pairs (NOT classic union-find — assigning the raw column index c is a
    reference quirk reproduced exactly);
  * compaction of unique group labels to ranks via a presence/cumsum scan, so
    the pooled graph lives in the SAME N-slot buffer with the first n_group
    slots valid — static shapes, masked downstream.
Padded peds get sentinel labels beyond any valid label, so they become
trailing invalid singleton groups.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import PReLU, TorchConv2d


def find_group_indices(dist_mat: jnp.ndarray, th: jnp.ndarray, valid: jnp.ndarray):
    """Sequential relabeling (model_groupwrapper.py:24-37), exactly.

    dist_mat: (N, N); th: scalar; valid: (N,) bool.
    Returns (ranks (N,) int32 in [0, N), n_groups incl. invalid singletons).
    """
    n = dist_mat.shape[0]
    pair_ok = (valid[:, None] & valid[None, :])
    tril = jnp.tril(jnp.ones((n, n), bool), k=-1)
    merge = (dist_mat <= th) & tril & pair_ok          # (N, N) row-major pairs

    labels0 = jnp.arange(n, dtype=jnp.int32)
    # Padded slots start at sentinel labels beyond all valid ones.
    labels0 = jnp.where(valid, labels0, labels0 + n)

    def body(p, labels):
        r, c = p // n, p % n
        lab_r = labels[r]
        return jnp.where(merge[r, c] & (labels == lab_r),
                         jnp.asarray(c, labels.dtype), labels)

    labels = jax.lax.fori_loop(0, n * n, body, labels0)

    # unique -> 0..n_groups-1 ranks, sorted ascending (torch.unique order).
    presence = jnp.zeros((2 * n,), jnp.int32).at[labels].set(1)
    rank_of_value = jnp.cumsum(presence) - 1            # (2N,)
    ranks = rank_of_value[labels].astype(jnp.int32)
    n_groups = presence.sum()
    return ranks, n_groups


class GroupGenerator(nn.Module):
    """GroupGenerator with d_type='learned_l2norm', learned threshold
    (model_groupwrapper.py:8-37, 59-96)."""

    in_channels: int = 1
    hid_channels: int = 8

    @nn.compact
    def __call__(self, v_rel, v_abs, valid, tau: float = 0.1):
        # v_rel, v_abs: (1, C, T, N); valid: (N,)
        feat = TorchConv2d(self.in_channels, self.hid_channels, (3, 1),
                           padding=(1, 0), name="group_cnn")(v_abs)  # (1,8,T,N)
        diff = feat[..., :, None] - feat[..., None, :]   # (1, 8, T, N, N)
        dist = jnp.linalg.norm(diff, axis=1)             # (1, T, N, N)
        dist_mat = jnp.mean(dist[0], axis=0)             # (N, N)
        # Padded pairs at +large so they never merge and sig ~ 0.
        pair_ok = (valid[:, None] & valid[None, :]).astype(dist_mat.dtype)
        dist_mat = dist_mat * pair_ok + (1.0 - pair_ok) * 1e6

        th = self.param("th", lambda k, s: jnp.ones(s), (1,))[0]
        ranks, n_groups = find_group_indices(jax.lax.stop_gradient(dist_mat),
                                             jax.lax.stop_gradient(th), valid)

        # Straight-through soft grouping (model_groupwrapper.py:52-65).
        sig = jax.nn.sigmoid(-(dist_mat - th) / tau)
        sig_norm = sig / jnp.maximum(sig.sum(axis=0, keepdims=True), 1e-12)
        v_soft = v_rel @ sig_norm
        v_hard = jax.lax.stop_gradient(v_rel - v_soft) + v_soft
        return v_hard, ranks, n_groups


def ped_group_pool(v: jnp.ndarray, ranks: jnp.ndarray) -> jnp.ndarray:
    """Group-mean pooling into the same N-slot buffer
    (model_groupwrapper.py:98-108). v: (1, C, T, N) -> (1, C, T, N)."""
    n = v.shape[-1]
    one_hot = jax.nn.one_hot(ranks, n, dtype=v.dtype)    # (N, Ngroups-slots)
    counts = one_hot.sum(axis=0)                          # (N,)
    pooled = jnp.einsum("nctv,vg->nctg", v, one_hot)
    return pooled / jnp.maximum(counts, 1.0)


def ped_group_unpool(v_pool: jnp.ndarray, ranks: jnp.ndarray) -> jnp.ndarray:
    """Unpool by gathering each ped's group slot (model_groupwrapper.py:110-113)."""
    return v_pool[..., ranks]


def ped_group_mask(ranks: jnp.ndarray) -> jnp.ndarray:
    """Same-group boolean mask incl. self (model_groupwrapper.py:115-122)."""
    return ranks[:, None] == ranks[None, :]


class GroupIntegrator(nn.Module):
    """GroupIntegrator with mix_type='mlp' (model_groupwrapper.py:125-152)."""

    out_channels: int
    pred_seq_len: int
    n_mix: int = 3

    @nn.compact
    def __call__(self, v_stack):
        # each: (1, s, Tp, N)
        n_batch, n_ped = v_stack[0].shape[0], v_stack[0].shape[3]
        v = jnp.mean(jnp.stack(v_stack, axis=0), axis=0)
        cat = jnp.concatenate(v_stack, axis=1).reshape(n_batch, -1, 1, n_ped)
        h = PReLU(name="mix_prelu")(cat)
        h = TorchConv2d(self.out_channels * self.pred_seq_len * self.n_mix,
                        self.out_channels * self.pred_seq_len, (1, 1),
                        name="mix_conv")(h)
        return v + h.reshape(n_batch, -1, self.pred_seq_len, n_ped)
