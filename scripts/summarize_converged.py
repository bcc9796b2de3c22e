"""Summarize runs/converged/*.json into the per-conv markdown table for
BENCHMARKS.md (converged benchmark matrix, VERDICT r3 item 1; protocol
reference: /root/reference/example/zinc.py:413-427 best-val test
selection, reproduce.sh tuned hyperparameters).

Usage: python scripts/summarize_converged.py [runs/converged]
"""

import glob
import json
import os
import sys

import numpy as np


def main(root="runs/converged"):
    rows = {}
    for p in sorted(glob.glob(os.path.join(root, "*.json"))):
        with open(p) as f:
            rec = json.load(f)
        key = (rec["conv"], rec["mode"])
        rows.setdefault(key, []).append((rec, os.path.basename(p)))

    print("| conv | mode | seeds | best val MAE | test MAE @ best val "
          "| s/epoch | epochs | artifact |")
    print("|---|---|---|---|---|---|---|---|")
    order = ["NGNN", "SSWL", "DSSGNN", "GNNAK", "SUN", "PPGN", "I2GNN",
             "NGAT"]
    for key in sorted(rows, key=lambda k: (k[1], order.index(k[0])
                                           if k[0] in order else 99)):
        recs = rows[key]
        vals = [r["best_val_mae"] for r, _ in recs]
        tsts = [r["tst_mae_at_best_val"] for r, _ in recs]
        eps = [r["sec_per_epoch_median"] for r, _ in recs]
        names = ", ".join(n for _, n in recs)
        if any(v is None for v in vals + tsts):
            val = tst = "diverged"
        elif len(recs) > 1:
            val = f"{np.mean(vals):.4f} ± {np.std(vals):.4f}"
            tst = f"{np.mean(tsts):.4f} ± {np.std(tsts):.4f}"
        else:
            val, tst = f"{vals[0]:.4f}", f"{tsts[0]:.4f}"
        ep = f"{np.mean([e for e in eps if e]):.2f}" if any(eps) else "-"
        print(f"| {key[0]} | {key[1]} | {len(recs)} | {val} | {tst} "
              f"| {ep} | {recs[0][0]['epochs']} | {names} |")


if __name__ == "__main__":
    main(*sys.argv[1:])
