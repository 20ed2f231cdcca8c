#!/usr/bin/env bash
# Run a training and render the pearson histogram (reference scripts/run.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m algonauts2025_tpu.grids.defaults "$@"
RUNDIR="${ALGONAUTS_TPU_SAVE:-$HOME/algonauts_runs}/results/algonauts-2025"
python scripts/render_pearson.py "$RUNDIR/pearson.npy" || true
