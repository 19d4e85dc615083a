"""Eval-semantics A/B (VERDICT r2 Weak #8): shared-theta eval vs the
reference's per-batch resampling, measured as FINAL OUTCOMES, not argument.

The reference re-samples kernel hypers (and with them the AR posterior)
for every eval batch (train_utils.py:24-28); vargp_tpu's default shares
one posterior across the scanned eval (7.1x faster, same MC estimator at
a dataset-level budget).  This script runs full Split-Digits (real data,
notebook budgets) for 3 seeds x both settings and records final average
accuracy + BWT from the chain-reload analysis, writing
results/eval_ab.json.

Usage: python scripts/eval_ab.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import shutil

    from vargp_tpu.experiments.analysis import analyze_sdigits
    from vargp_tpu.experiments.vargp_run import split_digits

    # resumable: completed (tag -> summary) entries are kept; an interrupted
    # run's log_dir is wiped and re-run (a dead TPU tunnel mid-sweep should
    # not cost the finished seeds)
    out = {}
    if os.path.exists("results/eval_ab.json"):
        with open("results/eval_ab.json") as f:
            out = json.load(f)
    for resample in (False, True):
        for seed in (0, 1, 2):
            tag = f"resample={resample}/seed={seed}"
            log_dir = f"results/eval_ab/{'per_batch' if resample else 'shared'}_s{seed}"
            if tag in out:
                print(f"[eval_ab] {tag}: done, skipping", flush=True)
                continue
            if os.path.isdir(log_dir):
                shutil.rmtree(log_dir)
            split_digits(
                seed=seed, log_dir=log_dir,
                eval_resample_per_batch=resample,
            )
            summary = analyze_sdigits(log_dir, out_json=None)
            out[tag] = dict(
                final_avg_acc=summary["final_avg_acc"], bwt=summary["bwt"]
            )
            print(f"[eval_ab] {tag}: {out[tag]}", flush=True)
            with open("results/eval_ab.json", "w") as f:
                json.dump(out, f, indent=2)

    import numpy as np

    for mode in ("False", "True"):
        accs = [v["final_avg_acc"] for k, v in out.items() if f"resample={mode}" in k]
        print(
            f"[eval_ab] resample={mode}: mean {np.mean(accs):.4f} "
            f"+/- {np.std(accs):.4f}", flush=True,
        )


if __name__ == "__main__":
    main()
