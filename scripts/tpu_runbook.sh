#!/bin/bash
# Unattended TPU-return campaign (round 3).  Run inside tmux:
#   tmux new -d -s runbook 'bash scripts/tpu_runbook.sh'
#
# The axon tunnel relay died mid-round; when the harness restores it this
# script runs the whole runbook in order, ONE TPU client at a time, with
# wedged-worker recovery waits between failures (a killed/crashed client
# wedges the remote worker for minutes; the next client would hang at its
# first compile).  Every step is a FRESH process (one failed compile
# poisons later compiles in the same process).
#
# Steps:
#   1. 512^3 c2c FFT limit probe      -> decides validation IC/P(k) flags
#   2. Pallas ranked-gather probe     -> records the auto verdict
#   3. XLA/Pallas A/B + equality      -> DESIGN.md numbers
#   4. bench exe refresh at HEAD      -> driver's round-end bench loads it
#   5. 256^3 z=0 physics validation   -> VALIDATION.md (resumable)
#   6. per-phase profile refresh
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs
LOG=bench_logs/runbook_r3.log
exec > >(tee -a "$LOG") 2>&1

say() { echo "=== $(date '+%F %T') $*"; }

relay_up() {
    timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8113' 2>/dev/null
}

# one step = one fresh client process with a wall budget; after a failure
# wait out the worker's crashed-client recovery before the next step
FAILED=0
run_step() {
    local name="$1" budget="$2"; shift 2
    say "step $name: $*"
    local t0=$SECONDS
    timeout "$budget" "$@"
    local rc=$?
    say "step $name: rc=$rc in $((SECONDS - t0))s"
    if [ $rc -ne 0 ]; then
        FAILED=1
        say "step $name failed; waiting 330s for TPU worker recovery"
        sleep 330
    else
        FAILED=0
        sleep 30
    fi
    return $rc
}

say "waiting for tunnel relay (127.0.0.1:8113)"
until relay_up; do sleep 30; done
say "relay is up; letting the backend settle 60s"
sleep 60

# -- 1. FFT limit: can this backend do a 512^3 c2c? ------------------------
VAL_FLAGS=()
if run_step fft512 1200 python scripts/fft_limit_probe.py 512; then
    say "512^3 c2c OK: validation uses on-device ICs and 512-grid P(k)"
else
    say "512^3 c2c failed: validation falls back to --ic-host --pk-grid 256"
    VAL_FLAGS=(--ic-host --pk-grid 256)
fi

# -- 2+3. gather kernel: verdict probe, then A/B ---------------------------
if run_step gather-pallas 1500 python scripts/gather_probe.py --only pallas; then
    run_step gather-ab 2400 python scripts/gather_probe.py || true
else
    say "Pallas gather failed Mosaic/runtime; verdict recorded, auto is OFF"
    run_step gather-xla 1500 python scripts/gather_probe.py --only xla || true
fi

# -- 3b. MXU matmul DFT vs XLA FFT A/B (records the fft_matmul auto verdict)
run_step fft-matmul 2400 python scripts/fft_matmul_probe.py || true

# -- 4. refresh the serialized bench executable at HEAD --------------------
# (the driver's round-end `python bench.py` tries this file first; a stale
# source key would force a ~20 min remote compile inside its budget)
run_step bench-exe 3600 python bench.py --np-dim 256 --steps 10 --chunk 5 \
    --coarse-sort --save-exe bench_cache/fused256_chunk5_csort.exe || true

# -- 5. 256^3 full-box physics validation (z=100 -> 0, resumable) ----------
RESUME=()
LAST_CKPT=$(ls -t bench_logs/vck256/*.npz 2>/dev/null | head -1 || true)
if [ -n "${LAST_CKPT:-}" ]; then
    say "resuming validation from $LAST_CKPT"
    RESUME=(--resume-from "$LAST_CKPT")
fi
run_step validate256 10800 bash scripts/run_validate256.sh \
    "${VAL_FLAGS[@]}" "${RESUME[@]}" || true

# -- 6. per-phase profile refresh -------------------------------------------
run_step profile 3600 python scripts/profile_step.py --np-dim 256 --bench \
    --only coarsesortedgath,coarsecsum,fine || true

# -- 7. BASELINE config-3 mode: 128^3 full box with extended-range PP -------
run_step validate-ppext 7200 python scripts/validate_lcdm.py --np-dim 128 \
    --pp-ext --out bench_logs/validate_lcdm_128_ppext_r3.npz || true

# -- 8. BASELINE config 3 AT SCALE: 256^3 + pp_ext + finer halo grid --------
# bounded demo: resume the 256^3 validation's latest checkpoint and run a
# short pp_ext stretch with a refine-2 halofind (full-history pp_ext at
# 256^3 is a multi-hour TPU run; the mode itself is what config 3 names)
CK256=$(ls -t bench_logs/vck256/*.npz 2>/dev/null | head -1 || true)
if [ -n "${CK256:-}" ]; then
    run_step config3-256 7200 python scripts/validate_lcdm.py --np-dim 256 \
        --pp-ext --halo-refine 2 --coarse-sort --bench-geom \
        --max-steps 10 --pk-grid 256 --resume-from "$CK256" \
        --out bench_logs/validate_lcdm_256_ppext_r3.npz || true
fi

say "runbook complete"
