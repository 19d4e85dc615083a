#!/bin/bash
# Round-5 measurement + minting session (VERDICT r4 items 3, 5, 7) —
# sequential: the TPU is exclusive.  Each step logs to /tmp/r5s/*.log and
# is independent, so a tunnel outage costs one step.  Steps skip if their
# terminal artifact already exists (idempotent resume).  The item-1
# analysis timings (cold/warm compile cache) were measured 2026-08-20 and
# are recorded in ROADMAP.md — not re-run here.
cd "$(dirname "$0")/.." || exit 1
L=/tmp/r5s
mkdir -p "$L"

step() {
  name=$1; art=$2; shift 2
  if [ -n "$art" ] && [ -e "$art" ]; then
    echo "=== $name: artifact $art exists, skip ==="; return
  fi
  echo "=== $name: $* ==="
  local t0=$SECONDS
  "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "$((SECONDS - t0)) s wall" > "$L/$name.time"
  echo "=== $name exit $rc wall=$(cat "$L/$name.time") ==="
}

# -- VERDICT item 5 (fast): the scaled config (BASELINE.json configs[4])
#    end-to-end: M=1024, reduced epochs; loss trajectory + accuracy +
#    checkpoint round-trip prove the regime trains stably.
#    Analysis MC budget: n_var_samples=3 (not the notebook 20) — at
#    S=5*1024 the T x T eval materializes (n_var*10, S, S) covariance
#    factors; 200 heads = ~21 GB f32, over the v5e's 16 GB HBM.  3 matches
#    the train-time eval budget, which the training run proves fits.
step scaled_m1024 results/scaled_m1024/analysis.json bash -c "
  timeout 2400 python -m vargp_tpu s_digits --M=1024 --epochs=60 --eval_interval=10 \
      --seed=0 --log_dir=results/scaled_m1024 &&
  timeout 2400 python -m vargp_tpu analyze_sdigits --log_dir=results/scaled_m1024 \
      --M=1024 --n_f=50 --n_var_samples=3 \
      --out_json=results/scaled_m1024/analysis.json"

# -- VERDICT item 7: DKL stability ablation (4 arms + analyses)
step dkl_ablation results/dkl_ablation/lr01x_wd/analysis.json \
    bash scripts/dkl_ablation.sh

# -- VERDICT item 3: error bars — S-MNIST seeds {0,1,2} (seed 0 =
#    results/smnist_r4), P-MNIST seeds {0,1,2} (seed 1 = results/pmnist_r4).
for s in 1 2; do
  step smnist_s$s results/smnist_s$s/analysis.json bash -c "
    python -m vargp_tpu s_mnist --seed=$s --log_dir=results/smnist_s$s &&
    python -m vargp_tpu analyze_smnist --log_dir=results/smnist_s$s \
        --out_json=results/smnist_s$s/analysis.json"
done
for s in 0 2; do
  step pmnist_s$s results/pmnist_s$s/analysis.json bash -c "
    python -m vargp_tpu p_mnist --seed=$s --log_dir=results/pmnist_s$s &&
    python -m vargp_tpu analyze_pmnist --log_dir=results/pmnist_s$s \
        --seed=$s --out_json=results/pmnist_s$s/analysis.json"
done

echo "=== r5 session complete ==="
