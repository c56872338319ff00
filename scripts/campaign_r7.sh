#!/bin/bash
# Round-7 TPU campaign — short-window (~1h) ordering of the r6 ladder.
#
# Rationale vs campaign_r6.sh: with a ~1h session the 128^3 pp_ext
# continuation cannot reach z=0 anyway, so the bounded 256^3 pp_ext +
# halo-refine demo (a NEW committable artifact, BASELINE config 3's
# literal 256^3 reading) runs FIRST; the 128^3 ratchet takes whatever
# window remains, pre-sized at band 8192 to skip the reactive doubling
# ladder that burned the r5/r6 legs (256->2048 over a=0.40->0.43, one
# re-exec+compile per doubling, campaign_r5.log).
#
# Run: CAMPAIGN_END=<epoch s> nohup bash scripts/campaign_r7.sh &
set -u
REPO=/root/repo
TREE=/tmp/campaign_r7_tree
cd "$REPO"
mkdir -p bench_logs bench_cache
LOG=$REPO/bench_logs/campaign_r7.log
exec > >(tee -a "$LOG") 2>&1
say() { echo "=== $(date '+%F %T') $*"; }

sync_tree() {
    if [ ! -d "$TREE" ]; then
        git -C "$REPO" worktree add --quiet --detach "$TREE" main
    fi
    git -C "$TREE" checkout --detach -f "$(git -C "$REPO" rev-parse main)" \
        >/dev/null 2>&1
    git -C "$TREE" clean -fdq 2>/dev/null
    say "tree synced to $(git -C "$TREE" rev-parse --short HEAD)"
}

END=${CAMPAIGN_END:-$(( $(date +%s) + 3600 ))}
export CUBEP3M_JAX_CACHE=$REPO/bench_cache/jax_cache
export CUBEP3M_FINE_PROBE_FILE=$REPO/bench_cache/fine_pallas_probe.json
say "campaign r7: window $(( END - $(date +%s) ))s"

run_step() {  # NAME BUDGET CMD...
    local name=$1 budget=$2; shift 2
    local remain=$(( END - $(date +%s) ))
    if [ "$remain" -le 500 ]; then
        say "step $name: window exhausted (${remain}s); skipping"
        return 1
    fi
    [ "$budget" -gt $(( remain - 240 )) ] && budget=$(( remain - 240 ))
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

best_rung() {  # see campaign_r6.sh for the rationale
    # ckpt_kill.npz and ckpt_prerebuild.npz both outrank the numeric
    # rungs when they are the newest file: leg 2 runs with --kill-after,
    # so EVERY window ends by writing ckpt_kill.npz — resuming from the
    # older numeric rung would discard the whole window's progress
    # (rungs are sparse at low z; ADVICE r4)
    local dir=$1 numeric newest
    numeric=$(ls "$dir"/ckpt_[0-9]*.npz 2>/dev/null \
        | sed 's/.*ckpt_//; s/\.npz//' | sort -g | head -1)
    newest=$(ls -t "$dir"/ckpt_*.npz 2>/dev/null | head -1)
    case "$newest" in
        "$dir/ckpt_prerebuild.npz"|"$dir/ckpt_kill.npz")
            echo "$newest" ;;
        *)
            if [ -n "$numeric" ]; then
                echo "$dir/ckpt_${numeric}.npz"
            else
                echo "$newest"
            fi ;;
    esac
}

# ---- leg 1: bounded 256^3 pp_ext + halo-refine demo (6 sweeps) ----
if [ ! -f "$V/validate_lcdm_256_ppext_demo_r6.npz" ]; then
    mkdir -p "$V/vck256ppext"
    cp -n "$V/vck256/ckpt_0.150.npz" "$V/vck256ppext/ckpt_0.150.npz"
    run_step ppext256-demo 2600 python scripts/validate_lcdm.py \
        --np-dim 256 --pp-ext --halo-refine 2 --bench-geom \
        --coarse-sort --staged --rebuild-policy exit \
        --autosize-headroom 0.92 --pp-cap-frac 0.5 --pk-grid 256 \
        --pp-dense-band 16384 --pp-ext-band 4096 --max-steps 6 \
        --ckpt-dir "$V/vck256ppext" \
        --out "$V/validate_lcdm_256_ppext_demo_r6.npz" \
        --resume-from "$(best_rung "$V/vck256ppext")"
fi

# ---- leg 2: 128^3 lattice pp_ext ratchet, band pre-sized 8192 ----
# cap scales ~1178x band in the autosize history (campaign_r5.log)
if [ ! -f "$V/validate_lcdm_128_ppext_r4.npz" ]; then
    REM=$(( END - $(date +%s) - 500 )); [ "$REM" -gt 3600 ] && REM=3600
    if [ "$REM" -gt 700 ]; then
        run_step ppext128-ratchet 4200 python scripts/validate_lcdm.py \
            --np-dim 128 --pp-ext --halo-refine 2 --bench-geom \
            --coarse-sort --chunks --staged --rebuild-policy exit \
            --autosize-headroom 0.92 --pp-ext-band 8192 \
            --pp-ext-ghost-cap 9646848 --ckpt-dir "$V/vck128ppext" \
            --out "$V/validate_lcdm_128_ppext_r4.npz" --kill-after "$REM" \
            --resume-from "$(best_rung "$V/vck128ppext")"
    fi
fi

# ---- leg 3: phase-table refresh ----
run_step profile256 1500 python scripts/profile_step.py --np-dim 256 \
    --bench --reps 3

git -C "$REPO" worktree remove --force "$TREE" 2>/dev/null
say "campaign r7 done"
