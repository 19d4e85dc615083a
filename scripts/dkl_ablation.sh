#!/bin/bash
# DKL stability ablation on Split-Digits (VERDICT r4 item 7): can any
# feature-map regularisation rescue the collapsing DKL variant at this
# data scale?  Baseline (r3): dkl default collapses to 0.4417 / BWT -0.649
# (results/sdigits_dkl).  Arms run sequentially — the TPU is exclusive.
set -u
cd "$(dirname "$0")/.."
OUT=results/dkl_ablation
mkdir -p "$OUT"

run_arm() {
  local name="$1"; shift
  if [ -f "$OUT/$name/analysis.json" ]; then
    echo "== $name: already done, skipping"; return
  fi
  echo "== $name: $*"
  if [ -f "$OUT/$name/ckpt4.npz" ]; then
    echo "   train already complete (ckpt4.npz), analyze only"
  else
    timeout 3600 python -m vargp_tpu s_digits --dkl=True --seed=0 \
      --log_dir="$OUT/$name" "$@" > "$OUT/$name.log" 2>&1
    echo "   train rc=$?"
  fi
  timeout 3600 python -m vargp_tpu analyze_sdigits --log_dir="$OUT/$name" \
    --dkl=True >> "$OUT/$name.log" 2>&1
  echo "   analyze rc=$? $(tail -1 "$OUT/$name.log" | head -c 220)"
}

run_arm freeze_phi   --freeze_phi=True
run_arm phi_lr_01x   --phi_lr=3e-4
run_arm phi_wd       --phi_wd=1e-2
run_arm lr01x_wd     --phi_lr=3e-4 --phi_wd=1e-2
echo "all arms done"
