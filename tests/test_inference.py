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


def test_predict_sharded_matches_single(tiny_trainer):  # noqa: F811
    """Scene-sharded serving over an 8-device mesh == single-device predict.

    Serving analogue of SURVEY §2c P1: params replicated, scene axis sharded
    over 'data', no collectives. Scene counts that don't divide the mesh are
    padded with all-invalid scenes."""
    from eigentrajectory_tpu.parallel import make_mesh

    tr = tiny_trainer("stgcnn")
    tr.init_descriptor()
    tr.fit(num_epochs=1, verbose=False)

    single = ETPredictor(tr, bucket=16)
    sharded = ETPredictor(tr, bucket=16, mesh=make_mesh(8))

    rng = np.random.default_rng(11)
    obs_list, sids = [], []
    for s, n_ped in enumerate([5, 3, 4]):       # 3 scenes -> pads to 8
        obs_list.append(make_scene(rng, n_ped=n_ped)[0])
        sids += [s] * n_ped
    obs = np.concatenate(obs_list)
    sids = np.array(sids, np.int32)

    a = single.predict(obs, sids)
    b = sharded.predict(obs, sids)
    assert a.shape == b.shape == (20, len(sids), 12, 2)
    np.testing.assert_allclose(a, b, atol=1e-5)
