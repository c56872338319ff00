#!/bin/bash
# Round-4b TPU campaign (supersedes campaign_r4.sh, whose first leg died
# in a TPU worker crash at a=0.091 — bench_logs/campaign_r4.log — but
# left a usable z=10 checkpoint):
#   1. validate256-z1:  resume z=10 ckpt -> COMPLETE z=1 acceptance
#      artifact (P(k) + halos; VERDICT r3 Missing #1).
#   2. validate256-z0:  resume z=1 ckpt -> z=0 acceptance artifact.
#      2b retries from the kill checkpoint if the window truncated it.
#   3. ppext64-smoke:   first on-TPU run of the lattice PP_EXT sweep
#      (ops/pp_lattice.py) at 64^3 before burning a 128^3 window.
#   4. ppext128:        BASELINE config 3 at production scale — full
#      z=100->0 128^3 run with pp_ext + refine-2 halofind (the round-3
#      fused bucket attempt OOM'd; the lattice path is O(N) memory).
#      4b retries from its kill checkpoint.
#   5. profile256:      phase-table refresh (r3d timed out at 700 s).
#   6. staged512:       ONE staged-sweep bench at 512^3 on the real chip
#      (VERDICT r3 Missing #4: turn the virtual-mesh smoke into an
#      on-chip measurement).
#   7. mhd64:           on-hardware MHD bench (VERDICT r3 Weak #6).
#
# Legs run from a DETACHED WORKTREE synced to main's latest commit at
# each leg start, so mid-session edits to the live tree can never race a
# starting leg.  All outputs land in the real repo's bench_logs/.
#
# Run: CAMPAIGN_END=<epoch s> nohup bash scripts/campaign_r4b.sh &
set -u
REPO=/root/repo
TREE=/tmp/campaign_r4_tree
cd "$REPO"
mkdir -p bench_logs bench_cache
LOG=$REPO/bench_logs/campaign_r4b.log
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

END=${CAMPAIGN_END:-$(( $(date +%s) + 28800 ))}
say "campaign r4b: window $(( END - $(date +%s) ))s"
VCK=$REPO/bench_logs/vck256
PCK=$REPO/bench_logs/vck128ppext

# ---- leg 1: 256^3 to z=1, resumed from the crashed run's z=10 ckpt ----
if [ -f "$REPO/bench_logs/validate_lcdm_256_z1_r4.npz" ]; then
    say "leg1 already complete (artifact exists)"
else
    B=4800; R=$(( END - $(date +%s) ))
    K=$(( (R < B ? R : B) - 420 ))
    RESUME=""
    [ -f "$VCK/ckpt_10.000.npz" ] && RESUME="--resume-from $VCK/ckpt_10.000.npz"
    [ -f "$VCK/ckpt_kill.npz" ] && RESUME="--resume-from $VCK/ckpt_kill.npz"
    run_step validate256-z1 $B python scripts/validate_lcdm.py \
        --np-dim 256 --z-final 1.0 --bench-geom --coarse-sort --chunks \
        --ic-host --pk-grid 256 --pp-cap-frac 0.5 \
        --ckpt-dir "$VCK" --out "$REPO/bench_logs/validate_lcdm_256_z1_r4.npz" \
        --kill-after "$K" $RESUME
fi

# ---- leg 2: continue to z=0 from the z=1 checkpoint (+ one retry) ----
for attempt in a b; do
    if [ -f "$REPO/bench_logs/validate_lcdm_256_r4.npz" ]; then break; fi
    SRC=""
    [ -f "$VCK/ckpt_1.000.npz" ] && SRC="$VCK/ckpt_1.000.npz"
    # a kill ckpt from a truncated z=0 attempt is FURTHER along than z=1
    [ "$attempt" = b ] && [ -f "$VCK/ckpt_kill.npz" ] && SRC="$VCK/ckpt_kill.npz"
    if [ -z "$SRC" ]; then say "leg2$attempt: no resume source; skipping"; break; fi
    B=5400; R=$(( END - $(date +%s) ))
    K=$(( (R < B ? R : B) - 420 ))
    [ "$K" -le 300 ] && { say "leg2$attempt: window too small"; break; }
    run_step validate256-z0-$attempt $B python scripts/validate_lcdm.py \
        --np-dim 256 --bench-geom --coarse-sort --chunks \
        --ic-host --pk-grid 256 --pp-cap-frac 0.75 \
        --ckpt-dir "$VCK" --out "$REPO/bench_logs/validate_lcdm_256_r4.npz" \
        --kill-after "$K" --resume-from "$SRC"
done

# ---- leg 3: lattice PP_EXT on-TPU smoke at 64^3 ----
run_step ppext64-smoke 1500 python scripts/validate_lcdm.py \
    --np-dim 64 --pp-ext --bench-geom --coarse-sort --chunks \
    --out "$REPO/bench_logs/validate_lcdm_64_ppext_r4.npz"
PPEXT_OK=$?

# ---- leg 4: BASELINE config 3 — 128^3 full box with pp_ext (+ retry) ----
if [ "$PPEXT_OK" -eq 0 ]; then
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
    say "ppext128 SKIPPED: 64^3 smoke failed"
fi

# ---- leg 5: profile refresh at 256^3 ----
run_step profile256 1200 python scripts/profile_step.py --np-dim 256 \
    --bench --reps 3

# ---- leg 6: staged sweep at the 512^3-per-device geometry on the chip ----
# A full single-chip 512^3 box is 8x the proven 13 GiB program peak — it
# cannot fit; the north-star 512^3 run is 2x2x2 devices each holding
# EXACTLY this program: 21.8M particle slots (buffer 1.30), 8x 288^3
# fine tiles, 256^3-per-device coarse grid, staged dispatch.  Executing
# it on the real chip with per-stage logs turns ROADMAP's working-set
# equivalence argument into an on-chip measurement (VERDICT r3 #10).
run_step staged512geom 2400 env CUBEP3M_LOG_STAGES=1 \
    python bench.py --np-dim 256 --staged --coarse-sort --buffer 1.30 \
    --steps 3

# ---- leg 7: on-hardware MHD bench ----
if [ -f "$TREE/scripts/mhd_bench.py" ] || [ -f scripts/mhd_bench.py ]; then
    run_step mhd64 1200 python scripts/mhd_bench.py --nf 128 --reps 3
else
    say "mhd64 SKIPPED: scripts/mhd_bench.py not written yet"
fi

git -C "$REPO" worktree remove --force "$TREE" 2>/dev/null
say "campaign done"
