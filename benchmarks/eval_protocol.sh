#!/bin/bash
# Full reference eval protocol (VERDICT r2 task #2) on the flagship ckpt:
#   pass 1: evaluate() ancestral @1000 steps, eval.num_samples=10000, all
#           metric blocks, save_graph pickle
#           (reference run_lib.py:163-277, configs/vpsde_qm9_uncond_jodo.py:109)
#   pass 2: method='fast' DPM-Solver @50 on the SAME checkpoint
#           (reference README.md:145)
#   pass 3: re-score the saved pickle through jodo_tpu.eval_pkl — the
#           reference's cross-method oracle loop (eval_rdkit_pkl.py:45-150)
# Usage: benchmarks/eval_protocol.sh [workdir] [ckpt] [n_samples]
set -e
cd "$(dirname "$0")/.."
WORKDIR=${1:-runs/qm9_flagship}
CKPT=${2:-8}
N=${3:-10000}
COMMON="--config qm9_uncond_jodo --workdir $WORKDIR --mode eval
  --config.data.allow_synthetic true --config.data.synthetic_size 4096
  --config.eval.ckpts $CKPT --config.eval.num_samples $N
  --config.eval.batch_size 128 --config.eval.save_graph true"

echo "=== pass 1: ancestral @1000, $N samples, ckpt $CKPT ==="
python -m jodo_tpu.main $COMMON

echo "=== pass 2: DPM-Solver (fast) @50, order 3, same ckpt ==="
python -m jodo_tpu.main $COMMON \
  --config.sampling.method fast --config.sampling.steps 50 \
  --config.sampling.dpm_solver_order 3

echo "=== pass 3: eval_pkl re-score of the ancestral pickle ==="
python -m jodo_tpu.eval_pkl \
  --pkl_path "$WORKDIR/eval/ancestral_ckpt_${CKPT}_42.pkl" \
  --dataset_name qm9 --type both --sub_geometry --allow_synthetic
