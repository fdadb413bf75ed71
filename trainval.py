"""CLI entry point (reference: trainval.py:8-39).

Usage:
  python trainval.py --cfg configs/eigentrajectory-stgcnn-hotel.json --tag mytag
  python trainval.py --cfg ... --test
"""
import argparse

from eigentrajectory_tpu.config import load_config
from eigentrajectory_tpu.train.trainer import ETJaxTrainer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default="./configs/eigentrajectory-stgcnn-eth.json",
                        type=str, help="config file path")
    parser.add_argument("--tag", default="EigenTrajectory-TPU-TEMP", type=str,
                        help="personal tag for the model")
    parser.add_argument("--test", default=False, action="store_true",
                        help="evaluation mode")
    parser.add_argument("--epochs", default=None, type=int,
                        help="override number of epochs")
    parser.add_argument("--resume", default=False, action="store_true",
                        help="resume from resume.msgpack (full optimizer state)")
    parser.add_argument("--ckpt_every", default=0, type=int,
                        help="write resume state every N epochs")
    parser.add_argument("--baseline", default=None, type=str,
                        help="override baseline name")
    parser.add_argument("--dataset_dir", default=None, type=str)
    args = parser.parse_args()

    overrides = {}
    if args.baseline:
        overrides["baseline"] = args.baseline
    if args.dataset_dir:
        overrides["dataset_dir"] = args.dataset_dir
    cfg = load_config(args.cfg, **overrides)
    print(f"Config: {cfg}", flush=True)

    trainer = ETJaxTrainer(cfg, tag=args.tag, test_mode=args.test)

    if not args.test:
        trainer.init_descriptor()
        trainer.fit(num_epochs=args.epochs, resume=args.resume,
                    checkpoint_every=args.ckpt_every)
        trainer.load_model()
        results = trainer.test()
    else:
        trainer.load_model()
        print("Testing...", end=" ")
        results = trainer.test()
    print(f"Scene: {cfg.dataset}",
          *[f"{k}: {v:.8f}" for k, v in results.items()], flush=True)
    return results


if __name__ == "__main__":
    main()
