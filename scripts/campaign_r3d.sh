#!/bin/bash
# Session follow-up (after campaign_r3c): the fused 128^3 pp_ext program
# OOMs the 16 GiB chip at compile time (the 27-offset PP_EXT neighborhood
# scan materializes ~20 f32[cap, nc^3] temps; see bench_logs/
# campaign_r3c.log), so the full-history run moves to round 4 on the
# staged path.  Spend the remaining window on the two queue items that
# fit and feed round-4 decisions:
#   1. profile_step phase-table refresh at HEAD (runbook queue #6).
#   2. scatter_bench at the REAL 256^3 operating point (17.6M particles,
#      512^3 fine grid) — settles ROADMAP #2's "profile first" on the
#      deferred fine-NGP counting kernel.
set -u
cd "$(dirname "$0")/.."
LOG=bench_logs/campaign_r3d.log
exec > >(tee -a "$LOG") 2>&1

say() { echo "=== $(date '+%F %T') $*"; }

run_step() {
    local name="$1" budget="$2"; shift 2
    say "step $name: $*"
    local t0=$SECONDS
    timeout "$budget" "$@"
    local rc=$?
    say "step $name: rc=$rc in $((SECONDS - t0))s"
    if [ $rc -ne 0 ]; then
        say "step $name failed; waiting 330s for TPU worker recovery"
        sleep 330
    else
        sleep 20
    fi
    return $rc
}

run_step profile256 700 python scripts/profile_step.py --np-dim 256 \
    --bench --reps 3
run_step scatter512 600 python scripts/scatter_bench.py \
    --n 17616076 --nf 512 --reps 3
say "campaign done"
