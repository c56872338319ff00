#!/bin/bash
# 256^3 full-box validation on the real TPU (z=100 -> 0, ~45-75 min).
# Run inside tmux: checkpoints land in bench_logs/vck256 so a tunnel hang
# can be resumed with --resume-from.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs/vck256
set -o pipefail
exec python scripts/validate_lcdm.py --np-dim 256 --bench-geom --coarse-sort \
    --ckpt-dir bench_logs/vck256 --out bench_logs/validate_lcdm_256_r3.npz \
    "$@" 2>&1 | tee -a bench_logs/validate256_r3.log
