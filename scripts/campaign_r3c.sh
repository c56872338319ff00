#!/bin/bash
# Session campaign (round-3 continuation, 2026-08-19): the environment
# snapshot again wiped the gitignored bench_cache/*.exe, so the round-end
# unattended bench would pay a full remote compile.  Also still open from
# the runbook queue: the 128^3 pp_ext full-box validation (BASELINE
# config 3 mode — the pp_ext force stack has only been validated on 64^3
# multi-device boxes so far).
#
# Plan (TPU window is ~45-50 min):
#   1. Re-serialize the 256^3 fused bench executable at HEAD (~8 min,
#      measured 467s last session) so `python bench.py` at round end
#      deserializes in ~2 min instead of compiling ~8-20 min.
#   2. 128^3 pp_ext full-history validation z=100 -> 0 with a clean
#      --kill-after exit before the window closes.
#
# Run:  CAMPAIGN_END=<epoch s> nohup bash scripts/campaign_r3c.sh &
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs bench_cache
LOG=bench_logs/campaign_r3c.log
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

END=${CAMPAIGN_END:-$(( $(date +%s) + 2700 ))}

# 1. bench exe at HEAD (the probe-verdict JSONs are committed, so the
#    sweep's gather-pallas/fft-matmul autos resolve without re-probing).
run_step bench-exe 1400 python bench.py --np-dim 256 --steps 10 \
    --chunk 5 --coarse-sort \
    --save-exe bench_cache/fused256_chunk5_csort.exe

# 2. 128^3 pp_ext validation on the remaining window.
REMAIN=$(( END - $(date +%s) ))
if [ "$REMAIN" -gt 700 ]; then
    KILL=$(( REMAIN - 420 ))
    say "validate128-ppext: window ${REMAIN}s, kill-after ${KILL}s"
    RESUME=""
    if [ -f bench_logs/vck128ppext/ckpt_kill.npz ]; then
        RESUME="--resume-from bench_logs/vck128ppext/ckpt_kill.npz"
    fi
    run_step validate128-ppext "$REMAIN" python scripts/validate_lcdm.py \
        --np-dim 128 --pp-ext --halo-refine 2 --bench-geom \
        --coarse-sort --chunks \
        --ckpt-dir bench_logs/vck128ppext \
        --out bench_logs/validate_lcdm_128_ppext_r3.npz \
        --kill-after "$KILL" $RESUME
else
    say "validate128-ppext: window too small (${REMAIN}s), skipping"
fi
say "campaign done"
