"""On-device anchor generation: jitted k-means++ over ET coefficients.

The reference ships coefficients to the host and runs sklearn KMeans
(EigenTrajectory/anchor.py:65-74) — a GPU->CPU->numpy round trip flagged in
SURVEY §2c P3. Here the whole fit runs jitted on device: k-means++ seeding via
lax.scan, Lloyd iterations via lax.while_loop, `n_init` restarts batched with
vmap, best-inertia selection. Distributional parity with sklearn
(random_state=0, n_init=10) is the target; bitwise parity is impossible across
RNGs (SURVEY §7 hard part 3).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _pairwise_sq_dist(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """(N, d) x (S, d) -> (N, S) squared distances."""
    return (
        jnp.sum(x * x, axis=1, keepdims=True)
        - 2.0 * x @ c.T
        + jnp.sum(c * c, axis=1)[None, :]
    )


def _kmeanspp_init(key: jax.Array, x: jnp.ndarray, n_clusters: int) -> jnp.ndarray:
    """k-means++ seeding: sample each next center with prob proportional to D^2."""
    n = x.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    c0 = x[first]
    d2 = jnp.sum((x - c0) ** 2, axis=1)

    def body(d2, k):
        # log-prob sampling; guard all-zero d2 (duplicate points) with uniform.
        logits = jnp.where(jnp.sum(d2) > 0, jnp.log(jnp.maximum(d2, 1e-38)), jnp.zeros_like(d2))
        idx = jax.random.categorical(k, logits)
        c = x[idx]
        d2 = jnp.minimum(d2, jnp.sum((x - c) ** 2, axis=1))
        return d2, c

    keys = jax.random.split(key, n_clusters - 1)
    _, rest = jax.lax.scan(body, d2, keys)
    return jnp.concatenate([c0[None], rest], axis=0)


def _lloyd(
    x: jnp.ndarray, centers: jnp.ndarray, max_iter: int, tol: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd iterations until center shift < tol. Returns (centers, inertia)."""
    n_clusters = centers.shape[0]

    def assign_update(c):
        d2 = _pairwise_sq_dist(x, c)
        lbl = jnp.argmin(d2, axis=1)
        one_hot = jax.nn.one_hot(lbl, n_clusters, dtype=x.dtype)   # (N, S)
        counts = one_hot.sum(axis=0)                               # (S,)
        sums = one_hot.T @ x                                       # (S, d)
        new_c = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], c
        )
        inertia = jnp.sum(jnp.min(d2, axis=1))
        return new_c, inertia

    def cond(state):
        _, _, shift, it = state
        return jnp.logical_and(shift > tol, it < max_iter)

    def body(state):
        c, _, _, it = state
        new_c, inertia = assign_update(c)
        shift = jnp.sum((new_c - c) ** 2)
        return new_c, inertia, shift, it + 1

    init = (centers, jnp.inf, jnp.inf, 0)
    c, _, _, _ = jax.lax.while_loop(cond, body, init)
    # Final inertia with converged centers.
    _, inertia = assign_update(c)
    return c, inertia


@functools.partial(jax.jit, static_argnames=("n_clusters", "n_init", "max_iter"))
def kmeans_fit(
    key: jax.Array,
    x: jnp.ndarray,
    n_clusters: int,
    n_init: int = 10,
    max_iter: int = 300,
    tol: float = 1e-6,
) -> jnp.ndarray:
    """Fit k-means with `n_init` restarts; return best centers (S, d)."""

    def one_run(k):
        c0 = _kmeanspp_init(k, x, n_clusters)
        return _lloyd(x, c0, max_iter, tol)

    keys = jax.random.split(key, n_init)
    centers, inertias = jax.vmap(one_run)(keys)
    best = jnp.argmin(inertias)
    return centers[best]


@jax.jit
def kmeans_predict(centers: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Assign points (N, d) to nearest centers (S, d) -> labels (N,)."""
    return jnp.argmin(_pairwise_sq_dist(x, centers), axis=1)


def batch_kmeans_fit(
    key: jax.Array,
    x: jnp.ndarray,
    n_clusters: int,
    n_init: int = 10,
    max_iter: int = 300,
    tol: float = 1e-6,
) -> jnp.ndarray:
    """Fit INDEPENDENT k-means problems over a leading batch axis in one
    jitted program: x (B, N, d) -> centers (B, S, d).

    Equivalent of the reference's BatchKMeans (EigenTrajectory/kmeans.py:7-279
    — dead code there: never imported by the ET pipeline, which uses sklearn
    via anchor.py). Where the reference hand-batches every k-means++ and
    Lloyd step with einsum/scatter over a torch batch dim, here the live
    jitted single-problem k-means is simply vmapped; XLA fuses the batch the
    same way, and each problem still takes the best of `n_init` restarts.
    """
    keys = jax.random.split(key, x.shape[0])
    return jax.vmap(
        lambda k, xi: kmeans_fit(k, xi, n_clusters, n_init, max_iter, tol)
    )(keys, x)


def generate_anchors(
    key: jax.Array,
    pred_traj_norm: jnp.ndarray,
    u_pred_trunc: jnp.ndarray,
    num_samples: int,
) -> jnp.ndarray:
    """Anchor generation (anchor.py:54-74): k-means over projected GT pred
    coefficients. Returns C_anchor (k, num_samples)."""
    n = pred_traj_norm.shape[0]
    m = pred_traj_norm.reshape(n, -1)                                # (N, T*dim)
    c_pred = (m @ u_pred_trunc)                                      # (N, k)
    centers = kmeans_fit(key, c_pred.astype(jnp.float32), num_samples)
    return centers.T                                                 # (k, s)


def refine(c_anchor: jnp.ndarray, c_pred_refine: jnp.ndarray) -> jnp.ndarray:
    """Anchor refinement (anchor.py:77-88): broadcast add, anchors frozen.

    c_anchor: (k, s), c_pred_refine: (k, N, s) -> (k, N, s).
    """
    return jax.lax.stop_gradient(c_anchor)[:, None, :] + c_pred_refine
