"""One-time measurement of the REFERENCE implementation's eval throughput.

Runs the upstream EigenTrajectory (torch) test loop on this machine and stores
trajectories/sec to benchmarks/reference_baseline.json, which bench.py uses as
vs_baseline denominator. torch here is CPU-only, so `.cuda()` is monkeypatched
to a no-op; for these tiny per-scene models the reference is Python/launch
overhead bound (SURVEY §3.3 hot-loop notes), so CPU torch is a close proxy for
its single-GPU behaviour.

Usage: python benchmarks/measure_reference.py [--dataset hotel] [--baseline stgcnn]
"""
import argparse
import json
import os
import sys
import time

REFERENCE = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="hotel")
    ap.add_argument("--baseline", default="stgcnn")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=None,
                    help="output JSON (default: reference_baseline.json, "
                         "the bench.py denominator — override for additional "
                         "configs so the flagship denominator is preserved)")
    args = ap.parse_args()

    sys.path.insert(0, REFERENCE)
    os.chdir(REFERENCE)
    import torch

    # CPU-only torch: neutralize .cuda() moves.
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
    targs = DotDict({"tag": "bench-ref", "test": True})
    tr = trainer_cls(base_model=bmod.TrajectoryPredictor, model=EigenTrajectory,
                     hook_func=hooks, args=targs, hyper_params=hp)
    # Random-weight eval: throughput does not depend on trained weights, but
    # the descriptor/anchors must exist for the forward path.
    tr.init_descriptor()

    n_peds = int(sum(tr.loader_test.dataset.num_peds_in_seq))
    # Warmup
    tr.test()
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        tr.test()
        times.append(time.perf_counter() - t0)
    best = min(times)
    result = {
        "dataset": args.dataset,
        "baseline": args.baseline,
        "trajectories_per_sec": n_peds / best,
        "n_trajectories": n_peds,
        "seconds": best,
        "hardware": "torch-cpu (reference GPU code with .cuda() no-op; "
                    "reference is launch-overhead-bound so CPU is a close proxy)",
    }
    out = args.out or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "reference_baseline.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
