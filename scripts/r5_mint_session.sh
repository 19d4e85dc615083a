#!/bin/bash
# Round-5 measurement + minting session (VERDICT r4 items 1, 3, 5, 7) —
# sequential: the TPU is exclusive.  Each step logs to /tmp/r5s/*.log and
# is independent, so a tunnel outage costs one step.  Steps skip if their
# terminal artifact already exists (idempotent resume).
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

# -- VERDICT item 1 (wall-time half): chain-reload analysis timing with the
#    persistent compile cache (r4: sdigits 1145 s / smnist 2562 s).
#    Run each TWICE: cold-cache process + warm-cache process.
step an_sdigits_cold "" python -m vargp_tpu analyze_sdigits \
    --log_dir=results/sdigits_r4 --out_json=/tmp/r5s/an_sdigits_cold.json
step an_sdigits_warm "" python -m vargp_tpu analyze_sdigits \
    --log_dir=results/sdigits_r4 --out_json=/tmp/r5s/an_sdigits_warm.json
step an_smnist_cold "" python -m vargp_tpu analyze_smnist \
    --log_dir=results/smnist_r4 --out_json=/tmp/r5s/an_smnist_cold.json
step an_smnist_warm "" python -m vargp_tpu analyze_smnist \
    --log_dir=results/smnist_r4 --out_json=/tmp/r5s/an_smnist_warm.json

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

# -- VERDICT item 5: the scaled config (BASELINE.json configs[4]) end-to-end:
#    M=1024, large MC, reduced epochs; loss trajectory + accuracy +
#    checkpoint round-trip prove the regime trains stably.
step scaled_m1024 results/scaled_m1024/run_meta.json python -m vargp_tpu s_digits \
    --M=1024 --epochs=60 --eval_interval=10 --seed=0 \
    --log_dir=results/scaled_m1024

# -- VERDICT item 7: DKL stability ablation (4 arms + analyses)
step dkl_ablation results/dkl_ablation/lr01x_wd/analysis.json \
    bash scripts/dkl_ablation.sh

echo "=== r5 session complete ==="
