#!/bin/bash
# Round-6 TPU campaign — the remaining acceptance ladder after round 5
# closed the 256^3 z=0 run (VALIDATION.md).
#
# Priorities (ROADMAP round-5 status):
#   1. 128^3 lattice pp_ext full box: resume the committed band-2048
#      rung (vck128ppext/ckpt_prerebuild.npz, a=0.427) toward z=0.
#      Three growths already absorbed; expect maybe one more late-time.
#   2. Bounded 256^3 pp_ext + finer-halo-grid demo (BASELINE config 3's
#      literal 256^3 reading): 6 sweeps from the committed z=0.15 rung
#      with --pp-ext --halo-refine 2, then measure.  No --kill-after so
#      the measurement still runs at a<1 (validate_lcdm measures at
#      min(a, target)).
#   3. profile refresh (skipped in r5 to protect the driver bench).
#
# Run: CAMPAIGN_END=<epoch s> nohup bash scripts/campaign_r6.sh &
set -u
REPO=/root/repo
TREE=/tmp/campaign_r6_tree
cd "$REPO"
mkdir -p bench_logs bench_cache
LOG=$REPO/bench_logs/campaign_r6.log
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
say "campaign r6: window $(( END - $(date +%s) ))s"

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

# Furthest-evolved rung.  Numeric rungs are redshift-keyed ckpt_<z>.npz
# (lowest z = furthest); ckpt_prerebuild.npz's scale factor is not in
# its name, but when it is NEWER than every numeric rung it was written
# after them mid-leg and is the furthest state.  On a fresh clone all
# mtimes are equal, in which case the lowest-z numeric rung wins (the
# prerebuild, committed mid-growth, never trails a committed z-rung).
best_rung() {
    local dir=$1 numeric newest
    numeric=$(ls "$dir"/ckpt_[0-9]*.npz 2>/dev/null \
        | sed 's/.*ckpt_//; s/\.npz//' | sort -g | head -1)
    newest=$(ls -t "$dir"/ckpt_*.npz 2>/dev/null | head -1)
    if [ -n "$numeric" ] && [ "$newest" != "$dir/ckpt_prerebuild.npz" ]; then
        echo "$dir/ckpt_${numeric}.npz"
    else
        echo "$newest"
    fi
}

# ---- leg 1: 128^3 lattice pp_ext continuation toward z=0 ----
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

# ---- leg 2: bounded 256^3 pp_ext + halo-refine demo ----
# 6 pp_ext sweeps from the committed z=0.15 rung, then P(k) + refine-2
# halofind at a~0.9 (falls back to refine 1 near the OOM line).  Sized
# pp_ext_band up front from the 128^3 ratchet history (2048 at a=0.43
# on a box with 8x fewer particles per cell — 4096 is conservative at
# this clustering; the reactive backstop still exits cleanly on
# overflow and a re-exec adopts the grown size).
if [ ! -f "$V/validate_lcdm_256_ppext_demo_r6.npz" ]; then
    mkdir -p "$V/vck256ppext"
    cp -n "$V/vck256/ckpt_0.150.npz" "$V/vck256ppext/ckpt_0.150.npz"
    run_step ppext256-demo 3600 python scripts/validate_lcdm.py \
        --np-dim 256 --pp-ext --halo-refine 2 --bench-geom \
        --coarse-sort --staged --rebuild-policy exit \
        --autosize-headroom 0.92 --pp-cap-frac 0.5 --pk-grid 256 \
        --pp-ext-band 4096 --max-steps 6 \
        --ckpt-dir "$V/vck256ppext" \
        --out "$V/validate_lcdm_256_ppext_demo_r6.npz" \
        --resume-from "$(best_rung "$V/vck256ppext")"
fi

# ---- leg 3: phase-table refresh ----
run_step profile256 1500 python scripts/profile_step.py --np-dim 256 \
    --bench --reps 3

git -C "$REPO" worktree remove --force "$TREE" 2>/dev/null
say "campaign r6 done"
