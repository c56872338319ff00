#!/bin/bash
# Round-4d rescue campaign: runs AFTER campaign_r4c exits (waits on its
# pid file).  r4c's leg 1 died twice in TPU worker crashes during the
# SAME mid-run pp_autosize rebuild (pp_dense_band 4096 -> 8192 at
# a=0.33, preemptive headroom rule on the shake-invariant occupancy
# BOUND 2892 — the r3 run finished a=0.5 on band 4096 with the bound at
# 2693-2892 and ZERO dropped pairs, so the doubling was conservative).
# Rescue strategy: resume the a=1/3 checkpoint with the r3-PROVEN
# program shapes (band 4096, cap 0.5) and a 0.92 headroom so the
# preemptive rebuild never fires mid-leg; presize-from-state (new) moves
# any genuinely-needed growth to t=0, before the sweep compiles.  Then
# continue to z=0, probe the ranked fine kernels, and refresh the bench.
#
# Run: CAMPAIGN_END=<epoch s> nohup bash scripts/campaign_r4d.sh &
set -u
REPO=/root/repo
TREE=/tmp/campaign_r4_tree
cd "$REPO"
mkdir -p bench_logs bench_cache
LOG=$REPO/bench_logs/campaign_r4d.log
exec > >(tee -a "$LOG") 2>&1

say() { echo "=== $(date '+%F %T') $*"; }

# ---- wait for r4c to release the TPU (single-client constraint) ------
if [ -f /tmp/campaign_r4c.pid ]; then
    P=$(cat /tmp/campaign_r4c.pid)
    while kill -0 "$P" 2>/dev/null; do sleep 60; done
    say "r4c (pid $P) exited; starting r4d"
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

END=${CAMPAIGN_END:-$(( $(date +%s) + 18000 ))}
say "campaign r4d: window $(( END - $(date +%s) ))s"
VCK=$REPO/bench_logs/vck256
# verdicts must land in the MAIN repo: sync_tree's git clean would wipe
# an untracked json written inside the worktree between steps
export CUBEP3M_FINE_PROBE_FILE="$REPO/bench_cache/fine_pallas_probe.json"

freshest_ckpt() {
    ls -t "$VCK"/ckpt_*.npz 2>/dev/null | head -1
}

# ---- leg 1: finish the z=1 acceptance from the freshest checkpoint ----
for attempt in a b; do
    if [ -f "$REPO/bench_logs/validate_lcdm_256_z1_r4.npz" ]; then break; fi
    SRC=$(freshest_ckpt)
    if [ -z "$SRC" ]; then say "z1-$attempt: no checkpoint; skipping"; break; fi
    # attempt a: r3-proven shapes (band 4096 cap 0.5), damped headroom;
    # attempt b: presize the band to 8192 AT T=0 (fresh compile, no
    # resident old program) via the default 0.7 headroom
    if [ "$attempt" = a ]; then
        EXTRA="--pp-dense-band 4096 --pp-cap-frac 0.5 --autosize-headroom 0.92"
    else
        EXTRA="--pp-dense-band 4096 --pp-cap-frac 0.5 --autosize-headroom 0.7"
    fi
    B=4200; R=$(( END - $(date +%s) ))
    K=$(( (R < B ? R : B) - 420 ))
    [ "$K" -le 300 ] && { say "z1-$attempt: window too small"; break; }
    run_step z1-$attempt $B python scripts/validate_lcdm.py \
        --np-dim 256 --z-final 1.0 --bench-geom --coarse-sort --chunks \
        --ic-host --pk-grid 256 $EXTRA \
        --ckpt-dir "$VCK" --out "$REPO/bench_logs/validate_lcdm_256_z1_r4.npz" \
        --kill-after "$K" --resume-from "$SRC"
done

# ---- leg 2: continue to z=0 ------------------------------------------
for attempt in a b; do
    if [ -f "$REPO/bench_logs/validate_lcdm_256_r4.npz" ]; then break; fi
    SRC=""
    [ -f "$VCK/ckpt_1.000.npz" ] && SRC="$VCK/ckpt_1.000.npz"
    K1=$(freshest_ckpt)
    [ "$attempt" = b ] && [ -n "$K1" ] && SRC="$K1"
    if [ -z "$SRC" ]; then say "z0-$attempt: no resume source; skipping"; break; fi
    B=5400; R=$(( END - $(date +%s) ))
    K=$(( (R < B ? R : B) - 420 ))
    [ "$K" -le 300 ] && { say "z0-$attempt: window too small"; break; }
    run_step z0-$attempt $B python scripts/validate_lcdm.py \
        --np-dim 256 --bench-geom --coarse-sort --chunks \
        --ic-host --pk-grid 256 --pp-dense-band 4096 --pp-cap-frac 0.5 \
        --autosize-headroom 0.92 \
        --ckpt-dir "$VCK" --out "$REPO/bench_logs/validate_lcdm_256_r4.npz" \
        --kill-after "$K" --resume-from "$SRC"
done

# ---- leg 3: ranked fine-kernel probe (A/B + exactness verdict) --------
run_step fineprobe 1800 python scripts/fine_probe.py --np-dim 256 --reps 3

# ---- leg 4: bench refresh (auto-picks the fine kernels iff verdict ok)
# + regenerate the serialized exe the driver's end-of-round bench loads
# (step.py changed this round -> the old key is stale)
run_step bench256 2400 python bench.py --np-dim 256 --steps 10 --chunk 5 \
    --coarse-sort --save-exe "$REPO/bench_cache/fused256_chunk5_csort.exe"

# ---- leg 5: any r4c legs that never ran (window exhaustion / crashes) -
if ! grep -q "step profile256: rc=0" "$REPO/bench_logs/campaign_r4c.log"; then
    run_step profile256 1200 python scripts/profile_step.py --np-dim 256 \
        --bench --reps 3
fi
if ! grep -q "step staged512geom: rc=0" "$REPO/bench_logs/campaign_r4c.log"; then
    run_step staged512geom 2400 env CUBEP3M_LOG_STAGES=1 \
        python bench.py --np-dim 256 --staged --coarse-sort --buffer 1.30 \
        --steps 3
fi
if ! grep -q "step mhd128: rc=0" "$REPO/bench_logs/campaign_r4c.log"; then
    run_step mhd128 1200 python scripts/mhd_bench.py --nf 128 --reps 3
fi

git -C "$REPO" worktree remove --force "$TREE" 2>/dev/null
say "campaign r4d done"
