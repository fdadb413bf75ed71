"""Experiment sweep runner: train/evaluate a grid of (baseline, dataset) pairs
sequentially on one chip and emit a Table-2-style results table.

The reference fans out five OS processes pinned to five GPUs
(script/train.sh:51-59); on TPU a sweep is a single process reusing one
device, with per-experiment compiled steps.

Usage:
  python scripts/sweep.py --baselines stgcnn sgcn --datasets hotel zara1 \
      --tag sweep1 [--test-only] [--epochs N] [--out results.json]
  python scripts/sweep.py --cells stgcnn:eth implicit:univ --tag t2 --out r.json

With --out, results are written incrementally after every cell and cells
already present in the file are skipped, so a crashed sweep resumes where it
left off. Checkpoints land under <tag>-<baseline>/<dataset> so baselines
sharing a tag never overwrite each other.
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eigentrajectory_tpu.config import load_config
from eigentrajectory_tpu.train.trainer import ETJaxTrainer


def commit_results(out_path, key):
    """Commit the sweep's result artifacts after every finished cell.

    Two VM reboots (rounds 3 and 4) erased everything not committed —
    including finished cells and measured-reference resume state — so results
    now land in git the moment they exist. Only the known result files are
    staged (never -A), and failures are non-fatal: a concurrent manual commit
    holding index.lock just means this cell rides along with the next one.
    """
    if not out_path:
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = [p for p in (out_path, os.path.join(repo, "docs", "TABLE2.md"))
             if os.path.exists(p)]
    try:
        subprocess.run(["git", "add", "--"] + paths,
                       cwd=repo, check=True, capture_output=True)
        diff = subprocess.run(["git", "diff", "--cached", "--quiet", "--"]
                              + paths, cwd=repo)
        if diff.returncode != 0:
            # Pathspec'd commit: only the sweep's own artifacts land in this
            # commit, never whatever a concurrent auto-committer (e.g.
            # train_reference.py) happens to have staged at the same moment.
            subprocess.run(["git", "commit", "-q", "-m",
                            f"sweep: record {key}", "--"] + paths,
                           cwd=repo, check=True, capture_output=True)
            print(f"(committed results for {key})", flush=True)
    except subprocess.CalledProcessError as e:
        print(f"(auto-commit failed for {key}: {e.stderr or e}) — results "
              f"are still on disk; commit them manually", flush=True)


def regen_table2(out_path):
    """Keep docs/TABLE2.md in sync with the sweep output (it went stale in
    round 2 when make_table2 wasn't re-run after late sweep commits)."""
    if not out_path or "table2" not in os.path.basename(out_path):
        return
    try:
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                     "make_table2.py")], check=False)
    except Exception as e:
        print(f"(table2 regen failed: {e})", flush=True)


def run_one(baseline: str, dataset: str, tag: str, epochs, test_only: bool,
            config_dir: str, micro_batches=None):
    cfg = load_config(os.path.join(config_dir, f"eigentrajectory-{baseline}-{dataset}.json"))
    if micro_batches:
        cfg.micro_batches = micro_batches
    t0 = time.time()
    tr = ETJaxTrainer(cfg, tag=tag, test_mode=test_only)
    if test_only:
        tr.load_model()
    else:
        tr.init_descriptor()
        tr.fit(num_epochs=epochs)
        tr.load_model()
    results = tr.test()
    results["wall_s"] = round(time.time() - t0, 1)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--baselines", nargs="+", default=["stgcnn"])
    ap.add_argument("--datasets", nargs="+",
                    default=["eth", "hotel", "univ", "zara1", "zara2"])
    ap.add_argument("--tag", default="sweep")
    ap.add_argument("--config_dir", default="./configs")
    ap.add_argument("--epochs", default=None, type=int)
    ap.add_argument("--test-only", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cells", nargs="+", default=None,
                    help="explicit baseline:dataset pairs (overrides the grid)")
    ap.add_argument("--fork", action=argparse.BooleanOptionalAction, default=True,
                    help="run each cell in a fresh subprocess (memory reclaim)")
    ap.add_argument("--micro_batches", default=None, type=int,
                    help="override the config's micro_batches for every cell "
                         "(used by the automatic SIGKILL-retry path)")
    args = ap.parse_args()

    if args.cells:
        cells = [tuple(c.split(":")) for c in args.cells]
    else:
        cells = [(b, d) for b in args.baselines for d in args.datasets]

    table = {}
    if args.out and os.path.exists(args.out):
        with open(args.out) as f:
            table = json.load(f)

    def flush_out():
        if args.out:
            tmp = args.out + ".tmp"
            with open(tmp, "w") as f:
                json.dump(table, f, indent=2)
            os.replace(tmp, args.out)

    # One cell per SUBPROCESS by default: each experiment compiles several XLA
    # programs whose executables/buffers are never freed in-process (~10 GB
    # per cell — a 13-cell in-process sweep OOM-killed a 125 GB box), so the
    # process boundary is the memory reclaim.
    if args.fork and args.out and len(cells) > 1:
        def run_cell(b, d, micro_batches=None):
            """One cell in a fresh subprocess; returns (rc, table-after)."""
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--cells", f"{b}:{d}", "--tag", args.tag, "--out", args.out,
                 "--config_dir", args.config_dir, "--no-fork"]
                + (["--epochs", str(args.epochs)] if args.epochs else [])
                + (["--test-only"] if args.test_only else [])
                + (["--micro_batches", str(micro_batches)] if micro_batches
                   else [])).returncode
            # The subprocess may die (OOM/SIGKILL) before ever creating the
            # output file on a fresh run — fall back to the in-memory table.
            t = table
            if os.path.exists(args.out):
                with open(args.out) as f:
                    t = json.load(f)
            return rc, t

        for b, d in cells:
            key = f"{b}/{d}"
            if key in table and "error" not in table[key]:
                print(f"=== {key} already done, skipping ===", flush=True)
                continue
            rc, table = run_cell(b, d)
            if key not in table or (rc != 0 and "error" not in table.get(key, {})):
                table[key] = {"error": f"cell subprocess exited rc={rc}"}
                flush_out()
            # Compile-helper SIGKILL (the AOT helper gets OOM/limit-killed on
            # XL graphs): retry with escalating micro_batches, which shrinks
            # the per-chunk compiled graph while keeping the optimizer step
            # bit-identical (trainer micro-batching proof in
            # tests/test_micro_batching.py). Round-3 lost two cells to this
            # failure mode because the sweep recorded the error and moved on.
            err = table.get(key, {}).get("error", "")
            if "SIGKILL" in err or rc in (-9, 137):
                try:
                    base_mb = load_config(os.path.join(
                        args.config_dir,
                        f"eigentrajectory-{b}-{d}.json")).micro_batches
                except Exception:
                    base_mb = 1
                mb = max(4, base_mb * 2)
                while mb <= 32 and "error" in table.get(key, {}):
                    print(f"=== {key} SIGKILL — retrying with "
                          f"micro_batches={mb} ===", flush=True)
                    rc, table = run_cell(b, d, micro_batches=mb)
                    if "error" not in table.get(key, {}):
                        table[key]["micro_batches_retry"] = mb
                        flush_out()
                        break
                    mb *= 2
            if "error" not in table.get(key, {}):
                regen_table2(args.out)
                commit_results(args.out, key)
        regen_table2(args.out)
        return

    for b, d in cells:
        key = f"{b}/{d}"
        if key in table and "error" not in table[key]:
            print(f"=== {key} already done, skipping ===", flush=True)
            continue
        print(f"=== {b} / {d} ===", flush=True)
        try:
            table[key] = run_one(b, d, f"{args.tag}-{b}", args.epochs,
                                 args.test_only, args.config_dir,
                                 micro_batches=args.micro_batches)
        except Exception as e:  # keep sweeping
            table[key] = {"error": str(e)}
        print(f"{key}: {table[key]}", flush=True)
        flush_out()

    print("\n| experiment | ADE | FDE | TCC | COL% |")
    print("|---|---|---|---|---|")
    for k, v in table.items():
        if "error" in v:
            print(f"| {k} | error: {v['error'][:40]} | | | |")
        else:
            print(f"| {k} | {v['ADE']:.4f} | {v['FDE']:.4f} "
                  f"| {v['TCC']:.4f} | {v['COL']:.2f} |")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(table, f, indent=2)
        regen_table2(args.out)


if __name__ == "__main__":
    main()
