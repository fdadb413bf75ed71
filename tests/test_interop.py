"""Reference-checkpoint import (interop.py): a torch-trained EigenTrajectory
state_dict evaluates identically in this framework."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eigentrajectory_tpu.etspace.facade import et_forward
from eigentrajectory_tpu.interop import import_state_dict
from tests.conftest import make_scene
from tests.test_facade import _mixed_scene

K, S, STATIC_DIST = 6, 20, 0.35


class CFG:
    k = K
    num_samples = S


class HP(dict):
    __getattr__ = dict.get


def test_import_stgcnn_checkpoint_forward_parity(rng):
    """Build the REAL reference EigenTrajectory(social_stgcnn) module, fit its
    descriptor/anchors, export state_dict, import it here, and compare the
    full eval forward (facade + predictor + reconstruction) on a scene."""
    torch = pytest.importorskip("torch")
    from tests._reference import patch_torch_cpu, reference_module

    et_mod = reference_module("EigenTrajectory")
    patch_torch_cpu()
    from baseline.stgcnn import bridge as ref_bridge
    from baseline.stgcnn.model import social_stgcnn

    hp = HP(obs_len=8, pred_len=12, obs_svd=True, pred_svd=True, k=K,
            num_samples=S, traj_dim=2, static_dist=STATIC_DIST)
    hooks = HP(model_forward_pre_hook=ref_bridge.model_forward_pre_hook,
               model_forward=ref_bridge.model_forward,
               model_forward_post_hook=ref_bridge.model_forward_post_hook)
    predictor = social_stgcnn(n_stgcnn=1, n_txpcnn=5, input_feat=1,
                              output_feat=S, seq_len=K + 2, pred_seq_len=K,
                              kernel_size=3)
    ref = et_mod.EigenTrajectory(predictor, hooks, hp)

    obs_fit, pred_fit = _mixed_scene(rng, 150, 60)
    ref.calculate_parameters(torch.from_numpy(obs_fit), torch.from_numpy(pred_fit))
    ref.eval()

    # --- the actual interop path: state_dict -> our params/stats/ETParams ---
    params, batch_stats, et = import_state_dict("stgcnn", ref.state_dict())

    from eigentrajectory_tpu.models import stgcnn as ours

    model = ours.make_model(CFG)

    obs, pred = _mixed_scene(rng, 7, 3)
    valid = jnp.ones(obs.shape[0], bool)
    aux = {"ped_valid": valid}

    def predictor_fn(c_obs, obs_ori, a):
        inputs = ours.prepare(c_obs, obs_ori, a)
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          *inputs, train=False)
        return ours.finalize(out, a)

    out = et_forward(et, predictor_fn, jnp.asarray(obs), valid, STATIC_DIST,
                     pred_traj=jnp.asarray(pred), aux=aux)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(obs), torch.from_numpy(pred))

    np.testing.assert_allclose(np.asarray(out["recon_traj"]),
                               ref_out["recon_traj"].numpy(), atol=2e-3)
    for key in ("loss_eigentraj", "loss_euclidean_ade", "loss_euclidean_fde"):
        np.testing.assert_allclose(float(out[key]), float(ref_out[key]),
                                   atol=1e-3)


def test_import_unknown_baseline_raises():
    with pytest.raises(NotImplementedError):
        import_state_dict("no-such-baseline", {})


@pytest.mark.parametrize("baseline", ["stgcnn", "pecnet"])
def test_trainer_eval_matches_plain_path(rng, baseline):
    """Regression for the ghost-ped bug in BOTH batching regimes: the
    trainer's batched/padded eval step must equal the plain per-scene facade
    forward — i.e. the predictor's interaction graph sees exactly the scene's
    real peds, with padded slots excluded (et_forward overwrites any
    aux['ped_valid'] placeholder)."""
    import jax

    from eigentrajectory_tpu.config import ExpConfig
    from eigentrajectory_tpu.data.synthetic import make_synthetic_data
    from eigentrajectory_tpu.train.trainer import ETJaxTrainer

    cfg = ExpConfig(baseline=baseline, dataset="synthetic", batch_size=4,
                    checkpoint_dir="/tmp/et_eval_parity")
    data = tuple(make_synthetic_data(n_scenes=8, seed=s) for s in (0, 1, 2))
    tr = ETJaxTrainer(cfg, tag=f"evalparity-{baseline}", test_mode=True,
                      datasets=data)
    tr.init_descriptor()

    batched = tr.test(eval_batch=4)

    pf = tr._predictor_fn(tr.params, tr.batch_stats, None, False)
    ades = []
    for i in range(tr.data_test.num_scenes):
        obs, gt = tr.data_test.scene(i)
        n = obs.shape[0]
        valid = jnp.ones(n, bool)
        aux = {"ped_valid": valid, "num_samples": cfg.num_samples,
               "scene_ids": jnp.zeros(n, jnp.int32),
               "scene_mask": jnp.ones((n, n), bool)}
        out = et_forward(tr.et, pf, jnp.asarray(obs), valid, cfg.static_dist,
                         aux=aux)
        recon = np.asarray(out["recon_traj"])
        ades.extend(np.linalg.norm(recon - gt[None], axis=-1)
                    .mean(-1).min(0).tolist())
    np.testing.assert_allclose(batched["ADE"], float(np.mean(ades)), atol=1e-5)
