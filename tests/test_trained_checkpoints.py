"""End-to-end quality pins: evaluate committed trained checkpoints on the real
test splits (SURVEY §4 implication (d)). CPU eval; skipped when the
checkpoint or datasets are absent."""
import os

import pytest

from eigentrajectory_tpu.config import load_config, resolve_dataset_dir
from eigentrajectory_tpu.train.trainer import ETJaxTrainer

CASES = [
    # (tag, baseline, dataset, max ADE, max FDE) — trained values + slack
    ("parity", "stgcnn", "hotel", 0.140, 0.225),
    ("parity", "sgcn", "zara1", 0.212, 0.372),
    ("parity", "pecnet", "univ", 0.256, 0.456),
]


@pytest.mark.parametrize("tag,baseline,dataset,max_ade,max_fde", CASES)
def test_trained_checkpoint_quality(tag, baseline, dataset, max_ade, max_fde):
    ckpt = f"checkpoints/{tag}/{dataset}/model_best.msgpack"
    cfg_path = f"configs/eigentrajectory-{baseline}-{dataset}.json"
    if not (os.path.exists(ckpt) and os.path.exists(cfg_path)):
        pytest.skip("trained checkpoint not available")
    cfg = load_config(cfg_path, checkpoint_dir="./checkpoints")
    if not os.path.isdir(resolve_dataset_dir(cfg.dataset_dir, dataset)):
        pytest.skip("datasets not available")
    tr = ETJaxTrainer(cfg, tag=tag, test_mode=True)
    tr.load_model()
    results = tr.test()
    assert results["ADE"] < max_ade, results
    assert results["FDE"] < max_fde, results


def test_matches_measured_reference_targets():
    """Compare our trained Table-2 cells against MEASURED reference numbers
    (the reference implementation trained by benchmarks/train_reference.py,
    recorded in benchmarks/reference_measured.json). Ours must be within
    +0.01 ADE / +0.015 FDE of the measured reference — or better."""
    import json

    ref_path = "benchmarks/reference_measured.json"
    ours_path = "benchmarks/table2_sweep.json"
    if not (os.path.exists(ref_path) and os.path.exists(ours_path)):
        pytest.skip("measured targets not available")
    with open(ref_path) as f:
        ref = json.load(f)
    with open(ours_path) as f:
        ours = json.load(f)
    compared = 0
    for key, entry in ref.items():
        if entry.get("num_epochs", 0) < 256:
            continue  # probes are not targets
        cell = ours.get(f"{entry['baseline']}/{entry['dataset']}")
        if not cell or "ADE" not in cell:
            continue
        compared += 1
        assert cell["ADE"] <= entry["metrics"]["ADE"] + 0.010, (key, cell)
        assert cell["FDE"] <= entry["metrics"]["FDE"] + 0.015, (key, cell)
    assert compared >= 1, "no overlapping measured cells"
