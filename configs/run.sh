#!/usr/bin/env bash
# Cluster launcher (parity: reference configs/run.sh — 1 node / 1 GPU SLURM
# job running a wandb sweep agent).  TPU-native equivalent: one experiment
# per TPU VM; scale-out is data-parallel over the mesh (vargp_tpu.parallel).
#
# Usage:
#   sbatch configs/run.sh s_mnist --M=60 --beta=10.0     # under SLURM
#   bash  configs/run.sh s_mnist --M=60                  # directly
#
#SBATCH --job-name=vargp-tpu
#SBATCH --nodes=1
#SBATCH --cpus-per-task=4
#SBATCH --mem=64G
#SBATCH --time=24:00:00

set -euo pipefail

EXPERIMENT=${1:-s_mnist}
shift || true

export VARGP_TPU_LOGDIR=${VARGP_TPU_LOGDIR:-runs}
export JAX_PLATFORMS=${JAX_PLATFORMS:-""}

python -m vargp_tpu "${EXPERIMENT}" "$@"
