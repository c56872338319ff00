#!/bin/bash
# Round-4c TPU campaign (supersedes r4b, whose leg 1 died twice in TPU
# worker crashes around a~0.091-0.10).  Both crashed runs used
# --pp-cap-frac 0.5 from step 1; the ONLY proven 256^3 recipe
# (bench_logs/validate256_r3.log: ICs -> a=0.50 in 2037 s, incl. the
# 160 s mid-run autosize 0.25 -> 0.5 at a=0.47) used 0.25.  Leg 1
# therefore replays the r3 recipe exactly, adding only --z-final 1.0 so
# the run STOPS at a=0.5 with committable measurements instead of a
# kill.  The for_resume f32-landing-eps fix also stops resumed legs from
# re-writing the 470 MB checkpoint they resumed from.
#
# Run: CAMPAIGN_END=<epoch s> nohup bash scripts/campaign_r4c.sh &
set -u
REPO=/root/repo
TREE=/tmp/campaign_r4_tree
cd "$REPO"
mkdir -p bench_logs bench_cache
LOG=$REPO/bench_logs/campaign_r4c.log
exec > >(tee -a "$LOG") 2>&1

say() { echo "=== $(date '+%F %T') $*"; }

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

END=${CAMPAIGN_END:-$(( $(date +%s) + 25200 ))}
say "campaign r4c: window $(( END - $(date +%s) ))s"
VCK=$REPO/bench_logs/vck256
PCK=$REPO/bench_logs/vck128ppext

# ---- leg 1: 256^3 z=100 -> z=1 acceptance, r3-proven recipe ----------
# attempt a: FROM ICs, cap 0.25 (the exact proven program shapes).
# attempt b: resume the freshest checkpoint (kill > z=10) if a crashed.
for attempt in a b; do
    if [ -f "$REPO/bench_logs/validate_lcdm_256_z1_r4.npz" ]; then break; fi
    RESUME=""
    if [ "$attempt" = b ]; then
        [ -f "$VCK/ckpt_10.000.npz" ] && RESUME="--resume-from $VCK/ckpt_10.000.npz"
        [ -f "$VCK/ckpt_5.000.npz" ] && RESUME="--resume-from $VCK/ckpt_5.000.npz"
        [ -f "$VCK/ckpt_3.000.npz" ] && RESUME="--resume-from $VCK/ckpt_3.000.npz"
        [ -f "$VCK/ckpt_2.000.npz" ] && RESUME="--resume-from $VCK/ckpt_2.000.npz"
        [ -f "$VCK/ckpt_kill.npz" ] && RESUME="--resume-from $VCK/ckpt_kill.npz"
    fi
    B=4800; R=$(( END - $(date +%s) ))
    K=$(( (R < B ? R : B) - 420 ))
    [ "$K" -le 300 ] && { say "leg1$attempt: window too small"; break; }
    run_step validate256-z1-$attempt $B python scripts/validate_lcdm.py \
        --np-dim 256 --z-final 1.0 --bench-geom --coarse-sort --chunks \
        --ic-host --pk-grid 256 --pp-cap-frac 0.25 \
        --ckpt-dir "$VCK" --out "$REPO/bench_logs/validate_lcdm_256_z1_r4.npz" \
        --kill-after "$K" $RESUME
done

# ---- leg 2: continue to z=0 from the z=1 checkpoint (+ one retry) ----
for attempt in a b; do
    if [ -f "$REPO/bench_logs/validate_lcdm_256_r4.npz" ]; then break; fi
    SRC=""
    [ -f "$VCK/ckpt_1.000.npz" ] && SRC="$VCK/ckpt_1.000.npz"
    [ "$attempt" = b ] && [ -f "$VCK/ckpt_kill.npz" ] \
        && [ "$VCK/ckpt_kill.npz" -nt "$VCK/ckpt_1.000.npz" ] \
        && SRC="$VCK/ckpt_kill.npz"
    if [ -z "$SRC" ]; then say "leg2$attempt: no resume source; skipping"; break; fi
    B=5400; R=$(( END - $(date +%s) ))
    K=$(( (R < B ? R : B) - 420 ))
    [ "$K" -le 300 ] && { say "leg2$attempt: window too small"; break; }
    run_step validate256-z0-$attempt $B python scripts/validate_lcdm.py \
        --np-dim 256 --bench-geom --coarse-sort --chunks \
        --ic-host --pk-grid 256 --pp-cap-frac 0.5 \
        --ckpt-dir "$VCK" --out "$REPO/bench_logs/validate_lcdm_256_r4.npz" \
        --kill-after "$K" --resume-from "$SRC"
done

# ---- leg 3: BASELINE config 3 — 128^3 full box with lattice pp_ext ----
# (the 64^3 on-TPU smoke ran under r4b; check its artifact before
# spending a 128^3 window)
if [ -f "$REPO/bench_logs/validate_lcdm_64_ppext_r4.npz" ]; then
  mkdir -p "$PCK"
  for attempt in a b; do
    if [ -f "$REPO/bench_logs/validate_lcdm_128_ppext_r4.npz" ]; then break; fi
    RESUME=""
    [ "$attempt" = b ] && [ -f "$PCK/ckpt_kill.npz" ] && RESUME="--resume-from $PCK/ckpt_kill.npz"
    B=4800; R=$(( END - $(date +%s) ))
    K=$(( (R < B ? R : B) - 420 ))
    [ "$K" -le 300 ] && { say "ppext128-$attempt: window too small"; break; }
    run_step ppext128-$attempt $B python scripts/validate_lcdm.py \
        --np-dim 128 --pp-ext --halo-refine 2 --bench-geom --coarse-sort \
        --chunks --ckpt-dir "$PCK" \
        --out "$REPO/bench_logs/validate_lcdm_128_ppext_r4.npz" \
        --kill-after "$K" $RESUME
  done
else
    say "ppext128 SKIPPED: no 64^3 smoke artifact (rerun the smoke first)"
    run_step ppext64-smoke 1500 python scripts/validate_lcdm.py \
        --np-dim 64 --pp-ext --bench-geom --coarse-sort --chunks \
        --out "$REPO/bench_logs/validate_lcdm_64_ppext_r4.npz"
fi

# ---- leg 4: profile refresh at 256^3 ----
run_step profile256 1200 python scripts/profile_step.py --np-dim 256 \
    --bench --reps 3

# ---- leg 5: staged sweep at the 512^3-per-device geometry on the chip ----
# A full single-chip 512^3 box is 8x the proven 13 GiB program peak; the
# north-star 512^3 run is 2x2x2 devices each holding EXACTLY this
# program: 21.8M particle slots (buffer 1.30), 8x 288^3 fine tiles,
# 256^3-per-device coarse grid, staged dispatch.  Per-stage logs turn
# ROADMAP's working-set equivalence into an on-chip measurement.
run_step staged512geom 2400 env CUBEP3M_LOG_STAGES=1 \
    python bench.py --np-dim 256 --staged --coarse-sort --buffer 1.30 \
    --steps 3

# ---- leg 6: on-hardware MHD bench ----
run_step mhd128 1200 python scripts/mhd_bench.py --nf 128 --reps 3

git -C "$REPO" worktree remove --force "$TREE" 2>/dev/null
say "campaign done"
