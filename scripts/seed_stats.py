"""Aggregate per-seed analysis.json files into mean +/- std headline rows.

VERDICT r4 item 3: no headline comparison should rest on a single seed
whose noise exceeds the 0.5% parity criterion.  This aggregates the
chain-reload analysis artifacts (final_avg_acc, bwt) across seeds and
prints a markdown-ready table plus a JSON blob for results/.

Usage:
    python scripts/seed_stats.py results/smnist_r4 results/smnist_s1 results/smnist_s2
"""
from __future__ import annotations

import json
import statistics
import sys


def load(run_dir: str) -> dict:
    with open(f"{run_dir}/analysis.json") as f:
        d = json.load(f)
    return {
        "dir": run_dir,
        "final_avg_acc": d["final_avg_acc"],
        "bwt": d["bwt"],
        "final_accs": d.get("final_accs"),
    }


def main(dirs: list[str]) -> dict:
    rows = [load(d) for d in dirs]
    accs = [r["final_avg_acc"] for r in rows]
    bwts = [r["bwt"] for r in rows]
    out = {
        "runs": rows,
        "n_seeds": len(rows),
        "final_avg_acc_mean": statistics.mean(accs),
        "final_avg_acc_std": statistics.stdev(accs) if len(accs) > 1 else 0.0,
        "bwt_mean": statistics.mean(bwts),
        "bwt_std": statistics.stdev(bwts) if len(bwts) > 1 else 0.0,
    }
    per = " / ".join(f"{a:.4f}" for a in accs)
    print(f"per-seed final_avg_acc: {per}")
    print(
        f"final_avg_acc {out['final_avg_acc_mean']:.4f} +/- "
        f"{out['final_avg_acc_std']:.4f}   "
        f"BWT {out['bwt_mean']:.4f} +/- {out['bwt_std']:.4f}"
    )
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
