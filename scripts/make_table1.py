"""Render the paper-Table-1 descriptor comparison (linear / Bézier / B-spline /
truncated-SVD reconstruction error per split) from
benchmarks/table1_descriptor.json into docs/TABLE1.md.

Regenerate the JSON with:
  python -m eigentrajectory_tpu.analysis.descriptor_evaluation --cpu \
      --json benchmarks/table1_descriptor.json
(the harness mirrors /root/reference/script/descriptor_evaluation.py:17-112,
with the reference's 100k-step Adam curve fit replaced by the closed-form
least-squares solve — the problem is linear).
"""
import argparse
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPLITS = ["eth", "hotel", "univ", "zara1", "zara2"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=os.path.join(
        HERE, "benchmarks", "table1_descriptor.json"))
    ap.add_argument("--out", default=os.path.join(HERE, "docs", "TABLE1.md"))
    args = ap.parse_args()

    with open(args.json) as f:
        data = json.load(f)

    # Collect the (method, num_params) rows common to all splits, in the
    # order the harness emits them for the first split.
    keys = [(r["method"], r["num_params"], tuple(
        sorted((k, v) for k, v in r.items()
               if k not in ("method", "num_params", "obs_error", "pred_error"))))
        for r in data[SPLITS[0]]]

    lines = [
        "# Table 1 — descriptor reconstruction error (L2, meters)",
        "",
        "Observed/predicted-trajectory reconstruction error per descriptor on",
        "the ETH-UCY test splits (ori+rot normalization, no scale — matching",
        "/root/reference/script/descriptor_evaluation.py:32-36). k=6 truncated",
        "SVD is the framework's operating point.",
        "",
        "| descriptor | #params | " + " | ".join(
            f"{s} obs/pred" for s in SPLITS) + " |",
        "|---|---|" + "---|" * len(SPLITS),
    ]
    for i, (method, nparams, extra) in enumerate(keys):
        cells = []
        for s in SPLITS:
            r = data[s][i]
            assert (r["method"], r["num_params"]) == (method, nparams)
            cells.append(f"{r['obs_error']:.4f}/{r['pred_error']:.4f}")
        label = method + ("" if not extra else
                          " (" + ", ".join(f"{k}={v}" for k, v in extra) + ")")
        bold = method == "svd" and any(k == "k" and v == 6 for k, v in extra)
        row = f"| {'**' + label + '**' if bold else label} | {nparams} | "
        lines.append(row + " | ".join(
            f"**{c}**" if bold else c for c in cells) + " |")

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out} ({len(keys)} descriptor rows x {len(SPLITS)} splits)")


if __name__ == "__main__":
    main()
