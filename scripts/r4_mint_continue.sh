#!/bin/bash
# Continuation of scripts/r4_mint_session.sh after the 2026-08-19 session
# interruption: retrain + varying-M points M20..M180 already minted.
# Resumes the sweep (reads finished points back from their metrics), then
# runs the remaining deliverables sequentially — the TPU is exclusive.
cd "$(dirname "$0")/.." || exit 1
L=/tmp/r4s
mkdir -p "$L"

step() {
  name=$1; shift
  echo "=== $name: $* ==="
  "$@" > "$L/$name.log" 2>&1
  echo "=== $name exit $? ==="
}

# VERDICT r3 #5 (continued): finish the real-digits sweep — M200 restarts
# (its partial had no checkpoints), M20..M180 resume from metrics.
step varyingm python -m vargp_tpu varying_m --dataset=s_digits --seed=0 \
    --log_dir=results/varying_m_sdigits --resume

# VERDICT r3 #9: eval-semantics A/B, all arms same platform, current code
step evalab python scripts/eval_ab.py

# S-MNIST full protocol under current defaults + chain-reload analysis
step smnist python -m vargp_tpu s_mnist --seed=0 --log_dir=results/smnist_r4
step smnist_an python -m vargp_tpu analyze_smnist --log_dir=results/smnist_r4 \
    --out_json=results/smnist_r4/analysis.json

# VERDICT r3 #2: P-MNIST full protocol under current defaults + analysis
step pmnist python -m vargp_tpu p_mnist --seed=1 --log_dir=results/pmnist_r4
step pmnist_an python -m vargp_tpu analyze_pmnist --log_dir=results/pmnist_r4 \
    --seed=1 --out_json=results/pmnist_r4/analysis.json

echo "=== session complete ==="
