#!/bin/bash
# Bisect the residual post-3b053d3 train-step regression (~0.02-0.03 s)
# by measuring bench_train at each candidate commit in the .wt-r2 worktree.
# Run AFTER the A/B probe frees the chip (one TPU process at a time).
set -u
cd /root/repo/.wt-r2
cp algonauts2025_tpu/models/transformer.py /tmp/transformer_probe_hooks.py
git checkout -q -- algonauts2025_tpu/models/transformer.py
for c in 3b053d3 16a410a 55782eb d6b4625 7805be5 e912587; do
  git checkout -q "$c" 2>/dev/null || { echo "checkout $c FAILED"; continue; }
  echo "=== $c $(git log --oneline -1 --format=%s) ==="
  python - <<'EOF'
import os
os.environ["BENCH_TRAIN_STEPS"] = "8"
import algonauts2025_tpu  # noqa: F401
import bench
vals = [bench.bench_train() for _ in range(2)]
print("RESULT", ["%.4f" % v for v in vals], flush=True)
EOF
done
git checkout -q 944b0f3
echo "bisect done; worktree restored to 944b0f3"
