"""Train + evaluate the UPSTREAM reference (torch, CPU) to produce *measured*
parity targets for BASELINE.json `published`.

The reference's released pretrained checkpoints are network-blocked in this
environment (zero egress), so per VERDICT.md task 2 we train the reference
itself with its own code and hyper-parameters (/root/reference/utils/trainer.py)
and record the resulting min-of-20 ADE/FDE/TCC/COL. torch here is CPU-only, so
`.cuda()` is monkeypatched to a no-op; results are hardware-independent up to
RNG (the reference itself fixes seed 0 + deterministic cudnn).

Usage:
  python benchmarks/train_reference.py --baseline stgcnn --dataset hotel \
      [--epochs 256] [--out benchmarks/reference_measured.json]

Writes/updates a JSON dict keyed "{baseline}-{dataset}" with the final test
metrics and the best-val epoch, and leaves the reference checkpoint under
/tmp/ref_checkpoints (the reference tree itself is read-only).
"""
import argparse
import json
import os
import subprocess
import sys
import time

REFERENCE = "/root/reference"


def _seed_suffix(seed) -> str:
    """One keying scheme for snapshot filenames AND result-JSON keys — the
    three call sites must never drift apart or --eval-snapshot would look up
    a snapshot under a different name than _fit_resumable writes."""
    return "" if not seed else f"-seed{seed}"


def _snap_path(baseline: str, dataset: str, seed) -> str:
    resume_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "ref_resume")
    os.makedirs(resume_dir, exist_ok=True)
    return os.path.join(resume_dir,
                        f"{baseline}-{dataset}{_seed_suffix(seed)}.pt")


def _fit_resumable(tr, hp, torch, args):
    """Replicate the reference fit loop (utils/trainer.py:68-87) epoch by
    epoch, snapshotting full training state after every epoch.

    The descriptor/anchors are deterministic given seed 0 (sklearn
    random_state=0, deterministic SVD), so re-running init_descriptor on
    restart reproduces them exactly; torch/numpy RNG states are saved so the
    dataloader shuffle stream continues where it left off.
    """
    import random

    import numpy as np

    snap = _snap_path(args.baseline, args.dataset, getattr(args, "seed", 0))

    start = 0
    if os.path.exists(snap):
        state = torch.load(snap, weights_only=False)
        tr.model.load_state_dict(state["model"])
        tr.optimizer.load_state_dict(state["optimizer"])
        if hp.lr_schd:
            tr.scheduler.load_state_dict(state["scheduler"])
        tr.log = state["log"]
        torch.set_rng_state(state["torch_rng"])
        np.random.set_state(state["np_rng"])
        random.setstate(state["py_rng"])
        if state.get("best_model") is not None:
            os.makedirs(tr.checkpoint_dir, exist_ok=True)
            with open(tr.checkpoint_dir + "model_best.pth", "wb") as f:
                f.write(state["best_model"])
        start = state["epoch"] + 1
        print(f"resumed {args.baseline}-{args.dataset} at epoch {start}")

    print("Training started...")
    for epoch in range(start, hp.num_epochs):
        ep_t0 = time.perf_counter()
        tr.train(epoch)
        tr.valid(epoch)
        if hp.lr_schd:
            tr.scheduler.step()
        if epoch == 0 or tr.log["val_loss"][-1] < min(tr.log["val_loss"][:-1]):
            tr.save_model()

        best_blob = None
        best_path = tr.checkpoint_dir + "model_best.pth"
        if os.path.exists(best_path):
            with open(best_path, "rb") as f:
                best_blob = f.read()
        torch.save({
            "epoch": epoch,
            "model": tr.model.state_dict(),
            "optimizer": tr.optimizer.state_dict(),
            "scheduler": tr.scheduler.state_dict() if hp.lr_schd else None,
            "log": tr.log,
            "torch_rng": torch.get_rng_state(),
            "np_rng": np.random.get_state(),
            "py_rng": random.getstate(),
            "best_model": best_blob,
        }, snap + ".tmp")
        # Atomic publish: --eval-snapshot copies this file from a live run,
        # so it must never observe a half-written archive.
        os.replace(snap + ".tmp", snap)
        # Durable publish: VM reboots (rounds 3 and 4) deleted the gitignored
        # snapshots and cost whole multi-hour CPU runs, so the snapshot is
        # periodically committed to main — the one store proven to survive
        # reboots here (a local side ref/branch may not survive a re-clone).
        # Per the round-4 advisor findings the cadence is 16 epochs (halving
        # history bloat vs round 4) and the commit is pathspec-scoped so a
        # concurrently staged file (sweep.py's auto-committer runs in
        # parallel by design) can never ride along under this message.
        # index.lock contention is non-fatal (the next multiple retries).
        if epoch % 16 == 0:
            try:
                repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                subprocess.run(["git", "add", "-f", "--", snap], cwd=repo,
                               check=True, capture_output=True)
                if subprocess.run(["git", "diff", "--cached", "--quiet", "--",
                                   snap], cwd=repo).returncode != 0:
                    subprocess.run(
                        ["git", "commit", "-q", "-m",
                         f"ref-resume snapshot: {args.baseline}-{args.dataset} "
                         f"@ep{epoch}", "--", snap], cwd=repo, check=True,
                        capture_output=True)
            except subprocess.CalledProcessError as e:
                print(f"(snapshot auto-commit failed @ep{epoch}: "
                      f"{e.stderr or e})", flush=True)
        print(f"Dataset: {hp.dataset}, Epoch: {epoch}, "
              f"Train_loss: {tr.log['train_loss'][-1]:.8f}, "
              f"Val_loss: {tr.log['val_loss'][-1]:.8f}, "
              f"epoch_s: {time.perf_counter() - ep_t0:.1f}", flush=True)
    print("Done.")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--epochs", type=int, default=None,
                    help="override num_epochs (default: reference config value)")
    ap.add_argument("--tag", default="ref-measured")
    ap.add_argument("--out", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="snapshot model/optimizer/scheduler/RNG each epoch to "
                         "benchmarks/ref_resume/ and restore if present, so "
                         ">12h reference runs can span driver rounds")
    ap.add_argument("--seed", type=int, default=0,
                    help="override the reference's fixed seed 0 — used to "
                         "measure the reference's own run-to-run spread "
                         "(results keyed <baseline>-<dataset>-seed<N>)")
    ap.add_argument("--eval-snapshot", action="store_true",
                    help="instead of training, load the resumable snapshot in "
                         "benchmarks/ref_resume/ and test() its best-val-so-far "
                         "checkpoint — a measured MID-TRAINING reference target "
                         "(keyed <baseline>-<dataset>@ep<N>) for runs too slow "
                         "to reach 256 epochs inside one round. Safe to run "
                         "while the training process is live: the snapshot is "
                         "copied first and a distinct checkpoint tag is used.")
    args = ap.parse_args()

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "reference_measured.json")
    out_path = os.path.abspath(out_path)

    sys.path.insert(0, REFERENCE)
    # The reference writes checkpoints relative to CWD; run from a scratch dir
    # so we never write into the read-only reference tree.
    workdir = "/tmp/ref_train"
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)
    # The reference reads baseline assets (pecnet/optimal.yaml,
    # agentformer/agentformer_pre.yml) via CWD-relative paths
    # (utils/trainer.py:304, :385) — symlink them into the scratch dir.
    for link in ("datasets", "baseline", "config", "utils", "EigenTrajectory"):
        dst = os.path.join(workdir, link)
        if not os.path.islink(dst):
            os.symlink(os.path.join(REFERENCE, link), dst)

    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    # Some baselines hardcode device='cuda' in factory calls
    # (e.g. baseline/sgcn/model.py:53); remap those to CPU too.
    _zeros_like = torch.zeros_like

    def _zeros_like_cpu(x, *a, **k):
        if str(k.get("device")) == "cuda":
            k["device"] = "cpu"
        return _zeros_like(x, *a, **k)

    torch.zeros_like = _zeros_like_cpu
    torch.cuda.manual_seed_all = lambda *a, **k: None

    import baseline as ref_baseline
    from EigenTrajectory import EigenTrajectory
    from utils import trainer as ref_trainer
    from utils.utils import DotDict, get_exp_config

    if args.seed != 0:
        # ETTrainer.__init__ hardcodes reproducibility_settings(seed=0)
        # (utils/trainer.py:16, imported via `from . import *`); patch the
        # name it resolves so every RNG (torch/numpy/python) seeds from
        # args.seed before model construction.
        _orig_repro = ref_trainer.reproducibility_settings
        ref_trainer.reproducibility_settings = (
            lambda seed=0: _orig_repro(seed=args.seed))

    cfg_path = f"{REFERENCE}/config/eigentrajectory-{{baseline}}-{args.dataset}.json"
    hp = get_exp_config(cfg_path)
    hp.baseline = args.baseline
    hp.dataset_dir = os.path.join(REFERENCE, "datasets") + "/"
    if args.epochs is not None:
        hp.num_epochs = args.epochs

    bmod = getattr(ref_baseline, args.baseline)
    hooks = DotDict({
        "model_forward_pre_hook": bmod.model_forward_pre_hook,
        "model_forward": bmod.model_forward,
        "model_forward_post_hook": bmod.model_forward_post_hook,
    })
    trainer_names = [s for s in ref_trainer.__dict__.keys()
                     if args.baseline in s.lower()]
    trainer_cls = getattr(ref_trainer, trainer_names[0])
    if args.eval_snapshot:
        # Distinct tag => distinct checkpoint_dir, so writing model_best.pth
        # below can never race with the live training process using args.tag.
        args.tag = args.tag + "-snapeval"
    targs = DotDict({"tag": args.tag, "test": False})
    tr = trainer_cls(base_model=bmod.TrajectoryPredictor, model=EigenTrajectory,
                     hook_func=hooks, args=targs, hyper_params=hp)
    tr.init_descriptor()

    if args.eval_snapshot:
        import shutil

        snap = _snap_path(args.baseline, args.dataset, args.seed)
        # Copy first: the live --resume process republishes the snapshot
        # (atomically, via .tmp + os.replace) after every epoch; copying
        # pins one complete version for the slow torch.load below.
        snap_copy = snap + ".evalcopy"
        shutil.copyfile(snap, snap_copy)
        state = torch.load(snap_copy, weights_only=False)
        os.remove(snap_copy)
        epoch = state["epoch"]
        if state.get("best_model") is None:
            raise SystemExit(f"snapshot {snap} has no best-val checkpoint yet")
        os.makedirs(tr.checkpoint_dir, exist_ok=True)
        with open(tr.checkpoint_dir + "model_best.pth", "wb") as f:
            f.write(state["best_model"])
        tr.load_model()
        metrics = tr.test()
        print(f"snapshot test metrics @epoch {epoch}:", metrics)
        entry = {
            "baseline": args.baseline,
            "dataset": args.dataset,
            "epochs_done": epoch + 1,
            "num_epochs": hp.num_epochs,
            "seed": args.seed,
            "metrics": {k: float(v) for k, v in metrics.items()},
            "hardware": ("torch-cpu (reference code, .cuda() no-op, "
                         f"seed {args.seed}) — MID-TRAINING snapshot"),
        }
        data = {}
        if os.path.exists(out_path):
            with open(out_path) as f:
                data = json.load(f)
        data[f"{args.baseline}-{args.dataset}{_seed_suffix(args.seed)}"
             f"@ep{epoch + 1}"] = entry
        with open(out_path + ".tmp", "w") as f:
            json.dump(data, f, indent=2, sort_keys=True)
        os.replace(out_path + ".tmp", out_path)
        print(json.dumps(entry))
        return

    t0 = time.perf_counter()
    if args.resume:
        _fit_resumable(tr, hp, torch, args)
    else:
        tr.fit()
    train_s = time.perf_counter() - t0

    tr.load_model()
    metrics = tr.test()
    print("test metrics:", metrics)

    entry = {
        "baseline": args.baseline,
        "dataset": args.dataset,
        "num_epochs": hp.num_epochs,
        "seed": args.seed,
        "metrics": {k: float(v) for k, v in metrics.items()},
        "train_seconds": round(train_s, 1),
        "hardware": f"torch-cpu (reference code, .cuda() no-op, seed {args.seed})",
    }
    data = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            data = json.load(f)
    data[f"{args.baseline}-{args.dataset}{_seed_suffix(args.seed)}"] = entry
    with open(out_path + ".tmp", "w") as f:
        json.dump(data, f, indent=2, sort_keys=True)
    os.replace(out_path + ".tmp", out_path)
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
