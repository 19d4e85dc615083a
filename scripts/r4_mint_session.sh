#!/bin/bash
# Round-4 re-mint session: regenerate every named results/ deliverable
# under the CURRENT shipped defaults (factored AR form + fused cross-Gram
# kernel), sequentially — the TPU is exclusive.  Each step logs to
# /tmp/r4s/*.log; steps are independent so a tunnel outage costs one step.
cd "$(dirname "$0")/.." || exit 1
L=/tmp/r4s
mkdir -p "$L"

step() {
  name=$1; shift
  echo "=== $name: $* ==="
  "$@" > "$L/$name.log" 2>&1
  echo "=== $name exit $? ==="
}

# VERDICT r3 #8: retrain ablation at full reference budget (toy protocol)
step retrain python -m vargp_tpu toy_retrain --seed=0 --log_dir=results/toy_retrain_full

# VERDICT r3 #5: inducing-point sweep with signal — REAL digits, full grid
step varyingm python -m vargp_tpu varying_m --dataset=s_digits --seed=0 \
    --log_dir=results/varying_m_sdigits

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
