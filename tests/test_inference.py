"""Serving API: checkpoint -> compiled predict -> multi-modal futures."""
import numpy as np

from eigentrajectory_tpu.inference import ETPredictor
from tests.test_trainer import tiny_trainer  # noqa: F401 (fixture)
from tests.conftest import make_scene


def test_predict_from_checkpoint(tiny_trainer):  # noqa: F811
    tr = tiny_trainer("stgcnn")
    tr.init_descriptor()
    tr.fit(num_epochs=1, verbose=False)

    pred = ETPredictor(tr, bucket=16)
    rng = np.random.default_rng(7)
    obs, _ = make_scene(rng, n_ped=5)
    out = pred.predict(obs)
    assert out.shape == (20, 5, 12, 2)
    assert np.isfinite(out).all()

    # two scenes batched together == each scene predicted alone
    obs2, _ = make_scene(rng, n_ped=3)
    both = pred.predict(np.concatenate([obs, obs2]),
                        np.array([0] * 5 + [1] * 3))
    alone = pred.predict(obs2, np.zeros(3, np.int32))
    np.testing.assert_allclose(both[:, 5:], alone, atol=1e-4)
