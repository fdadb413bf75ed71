"""Data-parallel mesh training on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import pytest

from eigentrajectory_tpu.config import ExpConfig
from eigentrajectory_tpu.parallel.mesh import make_mesh, shard_batch
from eigentrajectory_tpu.train.trainer import ETJaxTrainer
from tests.test_trainer import _synthetic_data


def test_mesh_construction():
    mesh = make_mesh(n_data=8)
    assert mesh.shape == {"data": 8, "model": 1}


def test_sharded_training_matches_single_device(tmp_path, monkeypatch):
    """Data-parallel training over an 8-way mesh computes the same losses as
    single-device training (parameters drift only by float reassociation,
    which AdamW's 1/sqrt(v) normalization amplifies — so we compare the
    per-epoch loss trajectory, which is the well-conditioned quantity)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    def build(mesh_axes):
        cfg = ExpConfig(baseline="stgcnn", batch_size=8, num_epochs=1,
                        checkpoint_dir=str(tmp_path), dataset="synthetic",
                        mesh_data_axis=mesh_axes)
        data = tuple(_synthetic_data(np.random.default_rng(1)) for _ in range(3))
        tr = ETJaxTrainer(cfg, tag=f"mesh{mesh_axes}", test_mode=True, datasets=data)
        tr.init_descriptor()
        for epoch in range(3):
            tr.train(epoch)
        return tr

    t1 = build(1)
    t8 = build(8)
    np.testing.assert_allclose(t1.log["train_loss"], t8.log["train_loss"],
                               rtol=2e-3)
    # and training actually progressed identically in direction
    assert t8.log["train_loss"][-1] < t8.log["train_loss"][0]


def test_sharded_gradients_match_unsharded():
    """One batch, one step, pre-optimizer: the gradient tree computed with
    inputs sharded over an 8-way 'data' mesh (params replicated, XLA inserts
    the all-reduce) matches the single-device gradient tree at tight
    tolerance. This is the actual data-parallel correctness claim, without the
    AdamW 1/sqrt(v) amplification the loss-level test works around."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from eigentrajectory_tpu.data.batching import pad_scenes

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    cfg = ExpConfig(baseline="stgcnn", batch_size=8, dataset="synthetic",
                    checkpoint_dir="/tmp/et_grad_parity")
    data = tuple(_synthetic_data(np.random.default_rng(1)) for _ in range(3))
    tr = ETJaxTrainer(cfg, tag="gradparity", test_mode=True, datasets=data)
    tr.init_descriptor()

    batch = pad_scenes(tr.data_train, list(range(8)), tr.n_max, 8)
    obs = jnp.asarray(batch.obs)
    pred = jnp.asarray(batch.pred)
    valid = jnp.asarray(batch.ped_valid)
    scene_valid = jnp.asarray(batch.scene_valid)
    rngs = jax.random.split(jax.random.PRNGKey(7), 8)

    def batch_loss(p, obs, pred, valid, scene_valid, rngs):
        def one(o, g, v, r):
            out = tr._scene_forward(p, tr.batch_stats, o, g, v, r,
                                    tr._make_aux_template(o.shape[0]), train=True)
            return (out["loss_eigentraj"] + out["loss_euclidean_ade"]
                    + out["loss_euclidean_fde"])

        losses = jax.vmap(one)(obs, pred, valid, rngs)
        w = scene_valid.astype(losses.dtype)
        return (jnp.nan_to_num(losses) * w).sum() / cfg.batch_size

    grad_fn = jax.jit(jax.grad(batch_loss))

    g_single = grad_fn(tr.params, obs, pred, valid, scene_valid, rngs)

    mesh = make_mesh(n_data=8)
    data_sh = NamedSharding(mesh, P("data"))
    rep_sh = NamedSharding(mesh, P())
    params_r = jax.device_put(tr.params, rep_sh)
    g_sharded = grad_fn(
        params_r,
        jax.device_put(obs, data_sh), jax.device_put(pred, data_sh),
        jax.device_put(valid, data_sh), jax.device_put(scene_valid, data_sh),
        jax.device_put(rngs, data_sh))

    flat1, _ = jax.tree_util.tree_flatten(g_single)
    flat8, _ = jax.tree_util.tree_flatten(g_sharded)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in flat1), "degenerate grads"
    # Global relative L2 over the whole gradient vector: catches any real
    # divergence (a wrong collective or dropped scene is O(1)); the tight
    # bound holds because reassociation noise is incoherent across leaves.
    v1 = np.concatenate([np.asarray(g, np.float64).ravel() for g in flat1])
    v8 = np.concatenate([np.asarray(g, np.float64).ravel() for g in flat8])
    global_rel = np.linalg.norm(v1 - v8) / np.linalg.norm(v1)
    # observed ~1e-5 on CPU f32 (pure reassociation); divergence bugs are O(1)
    assert global_rel < 5e-5, f"global grad rel-L2 {global_rel:.2e}"
    # Per-leaf: loose rtol absorbs f32 reassociation on cancellation-heavy
    # scalars (PReLU alphas sum thousands of signed terms; observed ~9e-4).
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_collated_sharded_gradients_match_unsharded():
    """Collated regime (pecnet): the gradient tree with the flat PED axis
    sharded over an 8-way 'data' mesh matches single-device. Unlike the
    sequenced test above, the block-diagonal scene_mask spans the sharded
    axis, so XLA must insert cross-device collectives for the interaction
    terms — this pins the batch layout half the predictor zoo trains under."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from eigentrajectory_tpu.data.batching import CollatedBatcher

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    cfg = ExpConfig(baseline="pecnet", batch_size=16, dataset="synthetic",
                    checkpoint_dir="/tmp/et_grad_parity_col")
    data = tuple(_synthetic_data(np.random.default_rng(1)) for _ in range(3))
    tr = ETJaxTrainer(cfg, tag="gradparity-col", test_mode=True, datasets=data)
    tr.init_descriptor()

    p_max = -(-tr.p_max // 8) * 8  # pad the ped axis to the mesh
    batch = next(iter(CollatedBatcher(tr.data_train, cfg.batch_size, False,
                                      p_max)))
    obs = jnp.asarray(batch.obs)
    pred = jnp.asarray(batch.pred)
    valid = jnp.asarray(batch.ped_valid)
    scene_ids = jnp.asarray(batch.scene_ids)
    rng = jax.random.PRNGKey(7)

    def batch_loss(p, obs, pred, valid, scene_ids, rng):
        aux = tr._make_aux_template(obs.shape[0], scene_ids)
        out = tr._scene_forward(p, tr.batch_stats, obs, pred, valid, rng,
                                aux, train=True)
        loss = (out["loss_eigentraj"] + out["loss_euclidean_ade"]
                + out["loss_euclidean_fde"])
        return jnp.nan_to_num(loss)

    grad_fn = jax.jit(jax.grad(batch_loss))
    g_single = grad_fn(tr.params, obs, pred, valid, scene_ids, rng)

    mesh = make_mesh(n_data=8)
    data_sh = NamedSharding(mesh, P("data"))
    rep_sh = NamedSharding(mesh, P())
    g_sharded = grad_fn(
        jax.device_put(tr.params, rep_sh),
        jax.device_put(obs, data_sh), jax.device_put(pred, data_sh),
        jax.device_put(valid, data_sh), jax.device_put(scene_ids, data_sh),
        jax.device_put(rng, rep_sh))

    flat1, _ = jax.tree_util.tree_flatten(g_single)
    flat8, _ = jax.tree_util.tree_flatten(g_sharded)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in flat1), "degenerate grads"
    v1 = np.concatenate([np.asarray(g, np.float64).ravel() for g in flat1])
    v8 = np.concatenate([np.asarray(g, np.float64).ravel() for g in flat8])
    global_rel = np.linalg.norm(v1 - v8) / np.linalg.norm(v1)
    assert global_rel < 5e-5, f"global grad rel-L2 {global_rel:.2e}"
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("baseline,kwargs", [
    ("stgcnn", dict(eval_batch=8)),
    ("pecnet", dict(eval_ped_batch=16)),
])
def test_sharded_eval_metrics_match_single_device(baseline, kwargs):
    """trainer.test() over an 8-way mesh returns the same per-split metrics
    as single-device eval, for both batch regimes. The sharded collated path
    additionally pads the ped axis wider (p_eval rounded to the mesh), so
    this also pins padding-slot invariance of the packed eval."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    data = tuple(_synthetic_data(np.random.default_rng(3), n_scenes=12)
                 for _ in range(3))

    def run(mesh_axes):
        cfg = ExpConfig(baseline=baseline, batch_size=8, dataset="synthetic",
                        checkpoint_dir="/tmp/et_eval_parity",
                        mesh_data_axis=mesh_axes)
        tr = ETJaxTrainer(cfg, tag=f"evalpar{mesh_axes}", test_mode=True,
                          datasets=data)
        tr.init_descriptor()  # deterministic given seed + data
        return tr.test(**kwargs)

    m1 = run(1)
    m8 = run(8)
    assert m1.keys() == m8.keys()
    for k in m1:
        np.testing.assert_allclose(m1[k], m8[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)
