"""Record a finished experiment run (seed-variance / knob study) into
benchmarks/experiments.json, keyed by a run name.

Usage:
  python scripts/record_experiment.py --name pecnet-univ-seed1 \
      --baseline pecnet --dataset univ --seed 1 --tag expt-pecnet-seed1 [--notes ...]

Evaluates the run's best-val checkpoint through trainer.test() (same eval as
the Table-2 sweep) so recorded numbers are directly comparable, then appends
{name: {baseline, dataset, seed, ADE, FDE, TCC, COL, notes}}.
tests/test_trained_checkpoints.py reads this file as additional valid runs
when checking measured-reference parity.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eigentrajectory_tpu.config import load_config
from eigentrajectory_tpu.train.trainer import ETJaxTrainer

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "benchmarks", "experiments.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True)
    ap.add_argument("--cfg", default=None,
                    help="config path (default: configs/eigentrajectory-<b>-<d>.json)")
    ap.add_argument("--baseline", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--tag", required=True)
    ap.add_argument("--notes", default="")
    args = ap.parse_args()

    cfg_path = args.cfg or os.path.join(
        HERE, "configs", f"eigentrajectory-{args.baseline}-{args.dataset}.json")
    overrides = {} if args.seed is None else {"seed": args.seed}
    cfg = load_config(cfg_path, **overrides)
    tr = ETJaxTrainer(cfg, tag=args.tag, test_mode=True)
    tr.load_model()
    results = {k: float(v) for k, v in tr.test().items()}

    table = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            table = json.load(f)
    table[args.name] = {"baseline": args.baseline, "dataset": args.dataset,
                        "seed": args.seed, "tag": args.tag,
                        "notes": args.notes, **results}
    # Atomic publish (same pattern as sweep.py's flush_out): a crash mid-dump
    # must not corrupt previously recorded runs.
    with open(OUT + ".tmp", "w") as f:
        json.dump(table, f, indent=2)
    os.replace(OUT + ".tmp", OUT)
    print(json.dumps({args.name: table[args.name]}))


if __name__ == "__main__":
    main()
