"""The single vmapped train step must equal the reference's sequential
per-scene gradient accumulation (utils/trainer.py:135-152):
grad((1/B) sum_b loss_b) == (1/B) sum_b grad(loss_b)."""
import numpy as np
import jax
import jax.numpy as jnp

from eigentrajectory_tpu.config import ExpConfig
from eigentrajectory_tpu.data.batching import pad_scenes
from eigentrajectory_tpu.train.trainer import ETJaxTrainer
from tests.test_trainer import _synthetic_data


def test_vmapped_step_equals_sequential_accumulation(tmp_path):
    cfg = ExpConfig(baseline="stgcnn", batch_size=4, checkpoint_dir=str(tmp_path),
                    dataset="synthetic")
    data = tuple(_synthetic_data(np.random.default_rng(1)) for _ in range(3))
    tr = ETJaxTrainer(cfg, tag="accum", test_mode=True, datasets=data)
    tr.init_descriptor()

    batch = pad_scenes(tr.data_train, [0, 1, 2, 3], tr.n_max, 4)
    obs, pred = jnp.asarray(batch.obs), jnp.asarray(batch.pred)
    valid = jnp.asarray(batch.ped_valid)

    def scene_loss(params, o, g, v):
        out = tr._scene_forward(params, tr.batch_stats, o, g, v, None,
                                tr._make_aux_template(o.shape[0]), train=False)
        return (out["loss_eigentraj"] + out["loss_euclidean_ade"]
                + out["loss_euclidean_fde"])

    # Sequential accumulation (the reference's loop).
    seq_grads = None
    for i in range(4):
        g = jax.grad(scene_loss)(tr.params, obs[i], pred[i], valid[i])
        seq_grads = g if seq_grads is None else jax.tree_util.tree_map(
            jnp.add, seq_grads, g)
    seq_grads = jax.tree_util.tree_map(lambda x: x / 4.0, seq_grads)

    # Batched vmapped loss.
    def batched(params):
        losses = jax.vmap(lambda o, g, v: scene_loss(params, o, g, v))(
            obs, pred, valid)
        return losses.sum() / 4.0

    bat_grads = jax.grad(batched)(tr.params)

    for a, b in zip(jax.tree_util.tree_leaves(seq_grads),
                    jax.tree_util.tree_leaves(bat_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
