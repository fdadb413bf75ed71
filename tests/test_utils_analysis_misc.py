"""Smoke tests: visualization, profiling utils, print_arguments."""
import os

import numpy as np
import pytest

from eigentrajectory_tpu.utils.misc import print_arguments
from eigentrajectory_tpu.utils.profiling import StepTimer, trace_annotation
from tests.test_dataset import _write_synthetic_split


def test_print_arguments(capsys):
    print_arguments({"alpha": 1, "beta": "two", "gamma": [3]})
    out = capsys.readouterr().out
    assert "alpha: 1" in out and "beta: two" in out


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t.measure():
            pass
    s = t.summary()
    assert s["count"] == 3 and s["mean_s"] >= 0


def test_trace_annotation_noop():
    with trace_annotation("phase"):
        x = 1 + 1
    assert x == 2


def test_plot_fig3_smoke(tmp_path, rng):
    mpl = pytest.importorskip("matplotlib")
    from eigentrajectory_tpu.analysis.visualization import plot_fig3

    split = _write_synthetic_split(tmp_path, rng, n_frames=120, n_peds=30)
    # plot_fig3 expects a dataset dir with a train/ subdir
    os.makedirs(tmp_path / "ds" / "train", exist_ok=True)
    os.rename(os.path.join(split, "synthetic.txt"),
              tmp_path / "ds" / "train" / "synthetic.txt")
    out = plot_fig3(str(tmp_path / "ds"), str(tmp_path / "fig3.png"), k=4)
    assert os.path.exists(out) and os.path.getsize(out) > 1000
