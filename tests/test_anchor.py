"""Jitted k-means quality vs sklearn (reference: EigenTrajectory/anchor.py:65-74)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eigentrajectory_tpu.etspace.anchor import kmeans_fit, refine


def _blobs(rng, n_clusters=20, per=100, d=6, spread=0.1):
    centers = rng.normal(size=(n_clusters, d)) * 3
    pts = centers[:, None, :] + rng.normal(size=(n_clusters, per, d)) * spread
    return pts.reshape(-1, d).astype(np.float32), centers


def test_kmeans_recovers_blobs():
    x, true_centers = _blobs(np.random.default_rng(7))
    centers = np.asarray(kmeans_fit(jax.random.PRNGKey(0), jnp.asarray(x), 20))
    # every true center has a fitted center nearby
    d = np.linalg.norm(true_centers[:, None] - centers[None], axis=-1)
    assert d.min(axis=1).max() < 0.5


def test_kmeans_inertia_close_to_sklearn():
    sklearn_cluster = pytest.importorskip("sklearn.cluster")
    # Dedicated rng: the shared session fixture's state depends on test
    # ordering, which made this comparison flaky.
    x, _ = _blobs(np.random.default_rng(42), spread=1.0)
    ref = sklearn_cluster.KMeans(n_clusters=20, random_state=0, init="k-means++", n_init=10).fit(x)
    centers = np.asarray(kmeans_fit(jax.random.PRNGKey(0), jnp.asarray(x), 20))

    def inertia(c):
        d2 = ((x[:, None] - c[None]) ** 2).sum(-1)
        return d2.min(axis=1).sum()

    ours, theirs = inertia(centers), inertia(ref.cluster_centers_)
    assert ours <= theirs * 1.05, (ours, theirs)


def test_refine_broadcast():
    anchor = jnp.arange(6.0).reshape(6, 1) * jnp.ones((6, 3))  # (k=6, s=3)
    c = jnp.ones((6, 5, 3))
    out = refine(anchor, c)
    assert out.shape == (6, 5, 3)
    np.testing.assert_allclose(np.asarray(out[:, 2, 1]), np.arange(6.0) + 1.0)


def test_batch_kmeans_matches_per_problem_fit():
    """batch_kmeans_fit (the reference's dead BatchKMeans, kmeans.py:7-279)
    is exactly a vmap of the live k-means: same keys => identical centers,
    and each batch problem clusters its own blobs."""
    from eigentrajectory_tpu.etspace.anchor import batch_kmeans_fit

    rng = np.random.default_rng(7)
    xs = []
    for b in range(3):
        x, _ = _blobs(np.random.default_rng(100 + b), spread=1.0)
        xs.append(x[:120])
    x = jnp.asarray(np.stack(xs))

    key = jax.random.PRNGKey(3)
    batched = np.asarray(batch_kmeans_fit(key, x, 5, n_init=4, max_iter=50))
    keys = jax.random.split(key, 3)
    for b in range(3):
        solo = np.asarray(kmeans_fit(keys[b], x[b], 5, n_init=4, max_iter=50))
        np.testing.assert_allclose(batched[b], solo, atol=1e-6)

    # quality: batched centers beat a random-subset baseline on every problem
    for b in range(3):
        d2 = ((np.asarray(x[b])[:, None] - batched[b][None]) ** 2).sum(-1)
        inertia = d2.min(axis=1).sum()
        rand = np.asarray(x[b])[rng.choice(len(x[b]), 5, replace=False)]
        d2r = ((np.asarray(x[b])[:, None] - rand[None]) ** 2).sum(-1)
        assert inertia < d2r.min(axis=1).sum()
