#!/bin/bash
# Round-5 opening TPU campaign — finish the round-4 acceptance ladder.
#
# Priorities (ROADMAP "Open for round 5"):
#   1. 256^3 z=0.15 -> z=0 finish (~15 min chip time) from the COMMITTED
#      rung bench_logs/vck256/ckpt_0.150.npz (band-16384 sizing stored
#      in-file, auto-adopted on resume).  STAGED dispatch only: the fused
#      chunk program crashed this tunnel's worker 4/4 times on late-time
#      256^3 states (campaign_r4e.log 15:17-17:05).
#   2. z=1 re-measure is NOT needed (artifact committed in round 4).
#   3. 128^3 lattice pp_ext continuation (BASELINE config 3) from the
#      COMMITTED bench_logs/vck128ppext/ckpt_prerebuild.npz (a=0.404).
#   4. bench exe regen at HEAD (the committed exe's source key is stale).
#   5. profile refresh (profile_step now survives per-phase failures).
#
# Run: CAMPAIGN_END=<epoch s> nohup bash scripts/campaign_r5.sh &
set -u
REPO=/root/repo
TREE=/tmp/campaign_r5_tree
cd "$REPO"
mkdir -p bench_logs bench_cache
LOG=$REPO/bench_logs/campaign_r5.log
exec > >(tee -a "$LOG") 2>&1
say() { echo "=== $(date '+%F %T') $*"; }

sync_tree() {
    if [ ! -d "$TREE" ]; then
        git -C "$REPO" worktree add --detach "$TREE" main >/dev/null
    fi
    git -C "$TREE" checkout --detach -f "$(git -C "$REPO" rev-parse main)" \
        >/dev/null 2>&1
    git -C "$TREE" clean -fdq 2>/dev/null
    say "tree synced to $(git -C "$TREE" rev-parse --short HEAD)"
}

END=${CAMPAIGN_END:-$(( $(date +%s) + 14400 ))}
export CUBEP3M_JAX_CACHE=$REPO/bench_cache/jax_cache
export CUBEP3M_FINE_PROBE_FILE=$REPO/bench_cache/fine_pallas_probe.json
say "campaign r5: window $(( END - $(date +%s) ))s"

run_step() {  # NAME BUDGET CMD...
    local name=$1 budget=$2; shift 2
    local remain=$(( END - $(date +%s) ))
    if [ "$remain" -le 700 ]; then
        say "step $name: window exhausted (${remain}s); skipping"
        return 1
    fi
    [ "$budget" -gt $(( remain - 360 )) ] && budget=$(( remain - 360 ))
    sync_tree
    say "step $name (budget ${budget}s): $*"
    local t0=$SECONDS
    (cd "$TREE" && timeout "$budget" "$@")
    local rc=$?
    say "step $name: rc=$rc in $(( SECONDS - t0 ))s"
    if [ $rc -ne 0 ]; then
        say "$name failed; waiting 330s for TPU worker recovery"
        sleep 330
    else
        sleep 20
    fi
    return $rc
}

V=$REPO/bench_logs
STAGED="--bench-geom --coarse-sort --chunks --staged --pk-grid 256 \
--pp-cap-frac 0.5 --autosize-headroom 0.92 --rebuild-policy exit"

# Pick the FURTHEST-evolved rung in a checkpoint dir.  Rung files are
# keyed by redshift (ckpt_<z>.npz), so "latest" = LOWEST numeric z —
# mtime ordering (ls -t) is meaningless after a fresh clone checkout
# (all files share the checkout mtime; round-5 opener resumed z=1
# instead of z=0.15).  Non-numeric names (ckpt_prerebuild.npz) sort
# first via sort -g, which is correct only when they are the sole rung,
# so prefer numeric rungs when any exist.
best_rung() {
    local dir=$1 numeric
    numeric=$(ls "$dir"/ckpt_[0-9]*.npz 2>/dev/null \
        | sed 's/.*ckpt_//; s/\.npz//' | sort -g | head -1)
    if [ -n "$numeric" ]; then
        echo "$dir/ckpt_${numeric}.npz"
    else
        ls -t "$dir"/ckpt_*.npz 2>/dev/null | head -1
    fi
}

# ---- leg 1: finish the 256^3 z=0 acceptance (kill-after self-scaled) ----
if [ ! -f "$V/validate_lcdm_256_z0_r4.npz" ]; then
    REM=$(( END - $(date +%s) - 700 )); [ "$REM" -gt 3600 ] && REM=3600
    run_step z0-finish 4200 python scripts/validate_lcdm.py \
        --np-dim 256 --z-final 0.0 $STAGED \
        --ckpt-dir "$V/vck256" --out "$V/validate_lcdm_256_z0_r4.npz" \
        --kill-after "$REM" \
        --resume-from "$(best_rung "$V/vck256")"
fi

# ---- leg 2: 128^3 lattice pp_ext continuation (BASELINE config 3) ----
if [ ! -f "$V/validate_lcdm_128_ppext_r4.npz" ]; then
    REM=$(( END - $(date +%s) - 700 )); [ "$REM" -gt 3600 ] && REM=3600
    if [ "$REM" -gt 900 ]; then
        run_step ppext128-finish 4200 python scripts/validate_lcdm.py \
            --np-dim 128 --pp-ext --halo-refine 2 --bench-geom \
            --coarse-sort --chunks --staged --rebuild-policy exit \
            --autosize-headroom 0.92 --ckpt-dir "$V/vck128ppext" \
            --out "$V/validate_lcdm_128_ppext_r4.npz" --kill-after "$REM" \
            --resume-from "$(best_rung "$V/vck128ppext")"
    fi
fi

# ---- leg 3: bench exe regen at HEAD (stale source key) ----
run_step benchexe 2400 python bench.py --np-dim 256 --steps 10 --chunk 5 \
    --coarse-sort --save-exe "$REPO/bench_cache/fused256_chunk5_csort.exe"

# ---- leg 4: phase-table refresh (now failure-tolerant) ----
run_step profile256 1500 python scripts/profile_step.py --np-dim 256 \
    --bench --reps 3

git -C "$REPO" worktree remove --force "$TREE" 2>/dev/null
say "campaign r5 done"
