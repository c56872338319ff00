#!/bin/bash
# Round-5 final TPU campaign ladder (VERDICT r4 "Next round" items),
# reordered from campaign_r8.sh after the 10:48 leg lost 1400s of
# ratchet progress to a host death (only the end-of-window kill
# checkpoint was durable -> every stepping leg now runs with
# --ckpt-every-s 600 so at most 10 min of progress is ever at risk).
#
# Leg A  sort/reorder probe FIRST (VERDICT weak #4): its verdict feeds
#        dev work that happens in parallel with the later legs.
# Leg B  128^3 lattice PP_EXT ratchet to z=0 in looped kill-after
#        sub-legs (VERDICT next #1; crash pattern root-caused in
#        2dcc291: per-shift b5 dispatch + band cap + dense-tail spill).
# Leg C  bounded 256^3 PP_EXT + halo-refine demo (VERDICT next #5):
#        per-phase pp_ext cost at production scale, 6 sweeps from the
#        committed z=0.15 rung.
# Leg D  bench exe regen at current HEAD (--save-exe) so the driver's
#        auto bench deserializes instead of paying the ~270s remote
#        compile (VERDICT weak #5).
# Leg E  cosmological MHD: 128^3 DM + gas from GetU-convention gas ICs
#        (VERDICT next #6), z=100 -> 1 in looped sub-legs for the rest
#        of the window; durable rungs at z=10,5,3,2,1.5,1.25,1.
#
# Run: CAMPAIGN_END=<epoch s> nohup bash scripts/campaign_r9.sh &
set -u
REPO=/root/repo
TREE=/tmp/campaign_r9_tree
cd "$REPO"
mkdir -p bench_logs bench_cache
LOG=$REPO/bench_logs/campaign_r9.log
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
say "campaign r9: window $(( END - $(date +%s) ))s"

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

best_rung() {
    # ckpt_kill.npz / ckpt_prerebuild.npz outrank numeric rungs when
    # newest: the periodic + end-of-window kill checkpoints carry the
    # latest progress between sparse low-z numeric rungs
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

# ---- leg A: sort probe ----------------------------------------------
if [ ! -f "$REPO/bench_cache/sort_probe.json" ]; then
    run_step sort-probe 2400 python scripts/sort_probe.py
fi

# ---- leg B: 128^3 PP_EXT ratchet, looped sub-legs to z=0 ------------
ATTEMPTS=0
while [ ! -f "$V/validate_lcdm_128_ppext_r5.npz" ] \
      && [ "$ATTEMPTS" -lt 8 ] \
      && [ $(( END - $(date +%s) )) -gt 1200 ]; do
    ATTEMPTS=$(( ATTEMPTS + 1 ))
    REM=$(( END - $(date +%s) - 600 )); [ "$REM" -gt 3300 ] && REM=3300
    run_step ppext128-r5-$ATTEMPTS $(( REM + 600 )) \
        python scripts/validate_lcdm.py \
        --np-dim 128 --pp-ext --halo-refine 2 --bench-geom \
        --coarse-sort --chunks --staged --rebuild-policy exit \
        --autosize-headroom 0.92 --ckpt-every-s 600 \
        --ckpt-dir "$V/vck128ppext" \
        --out "$V/validate_lcdm_128_ppext_r5.npz" --kill-after "$REM" \
        --resume-from "$(best_rung "$V/vck128ppext")"
done

# ---- leg C: bounded 256^3 pp_ext + halo-refine demo (6 sweeps) ------
if [ ! -f "$V/validate_lcdm_256_ppext_demo_r5.npz" ]; then
    mkdir -p "$V/vck256ppext"
    cp -n "$V/vck256/ckpt_0.150.npz" "$V/vck256ppext/ckpt_0.150.npz" \
        2>/dev/null
    run_step ppext256-demo 3300 python scripts/validate_lcdm.py \
        --np-dim 256 --pp-ext --halo-refine 2 --bench-geom \
        --coarse-sort --staged --rebuild-policy exit \
        --autosize-headroom 0.92 --pp-cap-frac 0.5 --pk-grid 256 \
        --pp-dense-band 16384 --max-steps 6 \
        --ckpt-dir "$V/vck256ppext" \
        --out "$V/validate_lcdm_256_ppext_demo_r5.npz" \
        --resume-from "$(best_rung "$V/vck256ppext")"
fi

# ---- leg D: bench exe regen (auto bench then deserializes) ----------
if [ ! -f "$REPO/bench_cache/fused256_chunk5_csort.exe" ]; then
    run_step bench-exe 3300 python bench.py --np-dim 256 --steps 10 \
        --chunk 5 --coarse-sort \
        --save-exe "$REPO/bench_cache/fused256_chunk5_csort.exe"
fi

# ---- leg E: cosmological MHD 128^3 DM+gas, z=100 -> 1, looped -------
ATTEMPTS=0
while [ ! -f "$V/validate_lcdm_128_mhd_r5.npz" ] \
      && [ "$ATTEMPTS" -lt 8 ] \
      && [ $(( END - $(date +%s) )) -gt 1200 ]; do
    ATTEMPTS=$(( ATTEMPTS + 1 ))
    mkdir -p "$V/vck128mhd"
    RES="$(best_rung "$V/vck128mhd")"
    RESARG=""
    [ -n "$RES" ] && RESARG="--resume-from $RES"
    REM=$(( END - $(date +%s) - 600 )); [ "$REM" -gt 3300 ] && REM=3300
    run_step mhd128-$ATTEMPTS $(( REM + 600 )) \
        python scripts/validate_lcdm.py \
        --np-dim 128 --mhd --bench-geom --coarse-sort --chunks \
        --staged --rebuild-policy exit --z-final 1.0 \
        --ckpt-every-s 600 --ckpt-dir "$V/vck128mhd" \
        --out "$V/validate_lcdm_128_mhd_r5.npz" \
        --kill-after "$REM" $RESARG
done

git -C "$REPO" worktree remove --force "$TREE" 2>/dev/null
say "campaign r9 done"
