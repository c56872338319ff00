#!/bin/bash
# Round-4 TPU campaign: the 256^3 physics acceptance run (VERDICT r2
# Missing #6 / runbook queue #5) — the last open north-star artifact that
# single-chip hardware can produce.
#
# Lesson from rounds 3a-3c: a full z=100 -> 0 run at 256^3 needs ~3600 s
# of TPU (a=0.5 reached in 2040 s incl. compile; late-time steps ~6 s),
# which no single session window has survived, and kill checkpoints are
# gitignored (~400 MB) so partial runs die with the session.  Strategy:
#   1. validate256 to --z-final 1.0 FIRST (~2200 s): a COMPLETE,
#      committable P(k)+halo artifact at z=1 (compared to linear theory
#      at the same a), writing scheduled checkpoints along the way.
#   2. resume from the z=1 checkpoint toward z=0 on whatever window
#      remains, clean kill-after exit.  If it completes, we get the z=0
#      acceptance run; if not, leg 1's artifact still stands.
#   3. NO bench-exe regen: the round-end `python bench.py` auto path
#      compiles + measures in ~560 s inside its own 3300 s budget
#      (campaign_r3c.log) — the serialized exe is insurance, not a
#      requirement, and this run needs the whole window.
#
# Run FIRST THING in the session:
#   CAMPAIGN_END=<epoch s ~5 min before round end> nohup bash scripts/campaign_r4.sh &
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs bench_cache
LOG=bench_logs/campaign_r4.log
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

END=${CAMPAIGN_END:-$(( $(date +%s) + 3000 ))}

# Leg 1: complete z=1 acceptance run (kill-after still set as a backstop
# against a slower-than-expected window; ~2200 s expected).
# --pp-cap-frac 0.5 pre-sizes the dense-tail buffer from the r3 history
# (pp_autosize grew 0.25 -> 0.5 at a=0.47, a ~160 s mid-run recompile).
# ADVICE r3: guard leg 1 like leg 2 — with REMAIN below ~700 s the
# kill-after would go negative/tiny and burn the step on an immediate
# failure plus the 330 s recovery sleep
REMAIN=$(( END - $(date +%s) ))
if [ "$REMAIN" -le 700 ]; then
    say "validate256-z1: window too small (${REMAIN}s); skipping leg 1"
else
KILL=$(( REMAIN - 420 ))
say "validate256-z1: window ${REMAIN}s, kill-after ${KILL}s"
run_step validate256-z1 "$REMAIN" python scripts/validate_lcdm.py \
    --np-dim 256 --z-final 1.0 --bench-geom --coarse-sort --chunks \
    --ic-host --pk-grid 256 --pp-cap-frac 0.5 \
    --ckpt-dir bench_logs/vck256 \
    --out bench_logs/validate_lcdm_256_z1_r4.npz \
    --kill-after "$KILL"
fi

# Leg 2: continue toward z=0 from the z=1 checkpoint if the window allows.
REMAIN=$(( END - $(date +%s) ))
if [ "$REMAIN" -gt 700 ] && [ -f bench_logs/vck256/ckpt_1.000.npz ]; then
    KILL=$(( REMAIN - 420 ))
    say "validate256-z0: window ${REMAIN}s, kill-after ${KILL}s"
    run_step validate256-z0 "$REMAIN" python scripts/validate_lcdm.py \
        --np-dim 256 --bench-geom --coarse-sort --chunks \
        --ic-host --pk-grid 256 --pp-cap-frac 0.75 \
        --ckpt-dir bench_logs/vck256 \
        --out bench_logs/validate_lcdm_256_r4.npz \
        --kill-after "$KILL" \
        --resume-from bench_logs/vck256/ckpt_1.000.npz
else
    say "validate256-z0: window too small (${REMAIN}s) or no z=1 ckpt"
fi
say "campaign done"
