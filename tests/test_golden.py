"""Golden-value tests pinning descriptor reconstruction errors on the real ETH
split (SURVEY §4 implication (b)) and end-to-end training determinism."""
import os

import numpy as np
import pytest

DATA = "/root/reference/datasets"

# Golden values computed by this framework's descriptor_evaluation on the ETH
# test split (matching the reference's Table-1 pipeline; see
# analysis/descriptor_evaluation.py). SVD errors are backend-independent to
# ~1e-4 (tests/test_analysis.py::test_svd_errors_match_reference_formula).
GOLDEN_ETH_SVD_PRED = {1: 0.4653, 2: 0.2639, 3: 0.1467, 4: 0.1065,
                       6: 0.0654, 8: 0.0498, 12: 0.0329}
GOLDEN_ETH_SVD_OBS = {6: 0.0269}
GOLDEN_ETH_LINEAR = (0.0760, 0.1931)  # obs, pred


@pytest.fixture(scope="module")
def eth_rows():
    if not os.path.isdir(DATA):
        pytest.skip("reference datasets not available")
    from eigentrajectory_tpu.analysis.descriptor_evaluation import eval_dataset

    return eval_dataset(os.path.join(DATA, "eth"))


def test_eth_svd_golden(eth_rows):
    svd = {r["k"]: r for r in eth_rows if r["method"] == "svd"}
    for k, want in GOLDEN_ETH_SVD_PRED.items():
        assert abs(svd[k]["pred_error"] - want) < 5e-4, (k, svd[k]["pred_error"])
    for k, want in GOLDEN_ETH_SVD_OBS.items():
        assert abs(svd[k]["obs_error"] - want) < 5e-4


def test_eth_linear_golden(eth_rows):
    lin = next(r for r in eth_rows if r["method"] == "linear")
    assert abs(lin["obs_error"] - GOLDEN_ETH_LINEAR[0]) < 5e-4
    assert abs(lin["pred_error"] - GOLDEN_ETH_LINEAR[1]) < 5e-4


def test_training_determinism(tmp_path, monkeypatch):
    """Same seed -> bit-identical training trajectory (the reference's
    reproducibility_settings equivalent, utils/utils.py:8-17)."""
    from eigentrajectory_tpu.config import ExpConfig
    from eigentrajectory_tpu.train.trainer import ETJaxTrainer
    from tests.test_trainer import _synthetic_data

    def run():
        cfg = ExpConfig(baseline="stgcnn", batch_size=4, num_epochs=2,
                        checkpoint_dir=str(tmp_path), dataset="synthetic")
        data = tuple(_synthetic_data(np.random.default_rng(1)) for _ in range(3))
        tr = ETJaxTrainer(cfg, tag="det", test_mode=True, datasets=data)
        tr.init_descriptor()
        tr.fit(num_epochs=2, verbose=False)
        return tr.log["train_loss"]

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)
