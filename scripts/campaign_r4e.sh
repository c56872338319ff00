#!/bin/bash
# Round-4e extras: runs AFTER campaign_r4d (waits on its pid file).
# Spends any remaining TPU window on the BASELINE config-3 demo AT 256^3
# (bounded lattice-pp_ext continuation of the acceptance checkpoint —
# ROADMAP queue item 8) and re-tries anything r4d had to skip.
#
# Run: CAMPAIGN_END=<epoch s> nohup bash scripts/campaign_r4e.sh &
set -u
REPO=/root/repo
TREE=/tmp/campaign_r4_tree
cd "$REPO"
mkdir -p bench_logs bench_cache
LOG=$REPO/bench_logs/campaign_r4e.log
exec > >(tee -a "$LOG") 2>&1

say() { echo "=== $(date '+%F %T') $*"; }

if [ -f /tmp/campaign_r4d.pid ]; then
    P=$(cat /tmp/campaign_r4d.pid)
    while kill -0 "$P" 2>/dev/null; do sleep 60; done
    say "r4d (pid $P) exited; starting r4e"
    sleep 60
fi

sync_tree() {
    if [ ! -d "$TREE" ]; then
        git -C "$REPO" worktree add --detach "$TREE" main >/dev/null
    fi
    local sha
    sha=$(git -C "$REPO" rev-parse main)
    git -C "$TREE" checkout --detach -f "$sha" >/dev/null 2>&1
    git -C "$TREE" clean -fdq 2>/dev/null
    say "tree synced to $(git -C "$TREE" rev-parse --short HEAD)"
}

run_step() {
    local name="$1" budget="$2"; shift 2
    local remain=$(( END - $(date +%s) ))
    if [ "$remain" -le 600 ]; then
        say "step $name SKIPPED: window exhausted (${remain}s left)"
        return 99
    fi
    if [ "$budget" -gt $(( remain - 360 )) ]; then
        budget=$(( remain - 360 ))
    fi
    sync_tree
    say "step $name (budget ${budget}s): $*"
    local t0=$SECONDS
    (cd "$TREE" && timeout "$budget" "$@")
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

END=${CAMPAIGN_END:-$(( $(date +%s) + 7200 ))}
say "campaign r4e: window $(( END - $(date +%s) ))s"
VCK=$REPO/bench_logs/vck256
export CUBEP3M_FINE_PROBE_FILE="$REPO/bench_cache/fine_pallas_probe.json"

# ---- retry: fine probe / bench exe if r4d never got to them ----------
if [ ! -f "$REPO/bench_cache/fine_pallas_probe.json" ]; then
    run_step fineprobe 1800 python scripts/fine_probe.py --np-dim 256 --reps 3
fi
if [ ! -f "$REPO/bench_cache/fused256_chunk5_csort.exe" ]; then
    run_step bench256 2400 python bench.py --np-dim 256 --steps 10 --chunk 5 \
        --coarse-sort --save-exe "$REPO/bench_cache/fused256_chunk5_csort.exe"
fi

# ---- BASELINE config-3 demo at 256^3: bounded pp_ext continuation ----
SRC=$(ls -t "$VCK"/ckpt_*.npz 2>/dev/null | head -1)
if [ -n "$SRC" ] && ! grep -q "step ppext256: rc=0" "$LOG"; then
    run_step ppext256 3000 python scripts/validate_lcdm.py \
        --np-dim 256 --bench-geom --coarse-sort --chunks --ic-host \
        --pk-grid 256 --pp-ext --halo-refine 2 --max-steps 10 \
        --pp-dense-band 4096 --pp-cap-frac 0.5 --autosize-headroom 0.92 \
        --out "$REPO/bench_logs/validate_lcdm_256_ppext10_r4.npz" \
        --resume-from "$SRC"
fi

git -C "$REPO" worktree remove --force "$TREE" 2>/dev/null
say "campaign r4e done"
