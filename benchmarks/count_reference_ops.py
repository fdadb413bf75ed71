"""Count aten op dispatches in ONE reference eval pass (torch.profiler).

Purpose: sensitivity analysis for the torch-CPU proxy used as bench.py's
denominator (benchmarks/reference_baseline.json). Every aten op in the eval
loop is one CUDA kernel launch (or more) on GPU; multiplying the measured
op count by a typical 5-10 us launch latency bounds how fast the reference
eval could possibly run on a GPU, independent of kernel speed. Matches the
loop at /root/reference/utils/trainer.py:172-195.

Usage: python benchmarks/count_reference_ops.py [--dataset hotel] [--baseline stgcnn]
"""
import argparse
import json
import os
import sys

REFERENCE = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="hotel")
    ap.add_argument("--baseline", default="stgcnn")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sys.path.insert(0, REFERENCE)
    os.chdir(REFERENCE)
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    import baseline as ref_baseline
    from EigenTrajectory import EigenTrajectory
    from utils import trainer as ref_trainer
    from utils.utils import DotDict, get_exp_config

    cfg_path = f"{REFERENCE}/config/eigentrajectory-{{baseline}}-{args.dataset}.json"
    hp = get_exp_config(cfg_path)
    hp.baseline = args.baseline

    bmod = getattr(ref_baseline, args.baseline)
    hooks = DotDict({
        "model_forward_pre_hook": bmod.model_forward_pre_hook,
        "model_forward": bmod.model_forward,
        "model_forward_post_hook": bmod.model_forward_post_hook,
    })
    trainer_cls = getattr(
        ref_trainer,
        *[s for s in ref_trainer.__dict__.keys() if args.baseline in s.lower()])
    targs = DotDict({"tag": "bench-ref-opcount", "test": True})
    tr = trainer_cls(base_model=bmod.TrajectoryPredictor, model=EigenTrajectory,
                     hook_func=hooks, args=targs, hyper_params=hp)
    tr.init_descriptor()
    tr.test()  # warmup (also builds any lazy state)

    n_scenes = len(tr.loader_test.dataset)
    n_peds = int(sum(tr.loader_test.dataset.num_peds_in_seq))

    from torch.profiler import profile, ProfilerActivity
    with profile(activities=[ProfilerActivity.CPU]) as prof:
        tr.test()
    events = prof.key_averages()
    aten = [e for e in events if e.key.startswith("aten::")]
    total_calls = sum(e.count for e in aten)

    top = sorted(aten, key=lambda e: -e.count)[:15]
    result = {
        "dataset": args.dataset,
        "baseline": args.baseline,
        "n_scenes": n_scenes,
        "n_trajectories": n_peds,
        "aten_op_calls_total": total_calls,
        "aten_op_calls_per_scene": round(total_calls / n_scenes, 1),
        "top_ops": {e.key: e.count for e in top},
        "note": ("each aten call is >=1 CUDA kernel launch on GPU; "
                 "launch latency 5-10us bounds GPU-side eval time from below"),
    }
    out = args.out or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "reference_opcount.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
