"""Render the full Table-2 matrix (10 baselines x 5 splits) as markdown from
the post-fix sweep output (benchmarks/table2_sweep.json) ONLY. The pre-fix
"ghost regime" round-1/2 cells (table2_ghost_*.json) are archived and
deliberately excluded — they trained under wrong interaction-graph semantics.

Usage: python scripts/make_table2.py [--out docs/TABLE2.md]
Cells still missing or errored print as "—". Per-baseline ETH-UCY averages are
shown once all five splits exist.
"""
import argparse
import json
import os

BASELINES = ["stgcnn", "sgcn", "pecnet", "agentformer", "lbebm", "dmrgcn",
             "gpgraphsgcn", "gpgraphstgcnn", "graphtern", "implicit"]
DATASETS = ["eth", "hotel", "univ", "zara1", "zara2"]
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_cells():
    # Only post-fix (reference-semantics) results are merged. The pre-fix
    # "ghost regime" cells (padded slots leaked into interaction graphs; see
    # the ghost-pedestrian fix commit) are archived as table2_ghost_*.json
    # for the record and excluded here.
    cells = {}
    for name in ("table2_sweep.json",):
        path = os.path.join(HERE, "benchmarks", name)
        if os.path.exists(path):
            with open(path) as f:
                for k, v in json.load(f).items():
                    if "ADE" in v:
                        cells[k] = v
    return cells


def render(cells):
    lines = ["# Table 2 — min-of-20 ADE/FDE on ETH-UCY (TPU v5e, this framework)",
             "",
             "| baseline | " + " | ".join(DATASETS) + " | avg |",
             "|---|" + "---|" * (len(DATASETS) + 1)]
    for b in BASELINES:
        row, vals = [], []
        for d in DATASETS:
            c = cells.get(f"{b}/{d}")
            if c:
                row.append(f"{c['ADE']:.3f}/{c['FDE']:.3f}")
                vals.append((c["ADE"], c["FDE"]))
            else:
                row.append("—")
        if len(vals) == len(DATASETS):
            avg = (sum(v[0] for v in vals) / 5, sum(v[1] for v in vals) / 5)
            row.append(f"**{avg[0]:.3f}/{avg[1]:.3f}**")
        else:
            row.append("—")
        lines.append(f"| {b} | " + " | ".join(row) + " |")
    n = len([1 for b in BASELINES for d in DATASETS if f"{b}/{d}" in cells])
    lines += ["", f"{n}/50 cells trained; see RESULTS.md for details and the "
                  "paper-range comparison."]
    return "\n".join(lines) + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(HERE, "docs", "TABLE2.md"))
    args = ap.parse_args()
    md = render(load_cells())
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
