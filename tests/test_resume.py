"""Crash-recovery resume: optimizer state + RNG + epoch counter round-trip."""
import numpy as np

from tests.test_trainer import tiny_trainer  # noqa: F401  (fixture)


def test_resume_roundtrip(tiny_trainer):  # noqa: F811
    tr = tiny_trainer("stgcnn")
    tr.init_descriptor()
    tr.fit(num_epochs=2, verbose=False, checkpoint_every=1)

    tr2 = tiny_trainer("stgcnn")
    tr2.init_descriptor()
    start = tr2.load_resume_state()
    assert start == 2
    # parameters restored exactly
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(tr.params),
                    jax.tree_util.tree_leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored (count equals number of steps taken)
    for a, b in zip(jax.tree_util.tree_leaves(tr.opt_state),
                    jax.tree_util.tree_leaves(tr2.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # continues without error
    tr2.fit(num_epochs=3, verbose=False, resume=True)
    assert len(tr2.log["train_loss"]) == 3
