"""Falsified-on-hardware kernel experiments (kept for the record).

Production op surfaces live in `cubep3m_tpu.ops`; everything in this
package was A/B-measured on a real TPU v5e and LOST, and is retained
only as (a) a reference implementation for the on-chip probes that gate
it off and (b) a record of the negative result (the same habit as the
reference's `_old` variants, but with the verdicts written down):

* `fine_pallas` — ranked streaming-window fine NGP deposit/gather.
  On-chip A/B (2026-08-19, campaign_r4d/r7 profile tables): deposit
  1304 ms vs 185 ms XLA sorted scatter, gather 895 ms vs 215 ms, and
  the deposit is INEXACT on hardware (max abs diff 2.6e4;
  `scripts/fine_probe.py` verdict ok=false, recorded in
  bench_cache/fine_pallas_probe.json).  At fine-mesh occupancy ~1
  particle/cell the one-hot MXU contraction does ~128x the useful work
  per lane.  The COARSE-level sibling (`ops/gather_pallas.py`, ~8
  particles per corner window) WINS 610 -> 237 ms and stays in
  production.  `auto_enabled()` consults the recorded probe verdict, so
  config `fine_pallas=None` resolves to False on hardware.
* `deposit_pallas` — segmented coarse CIC deposit.  Fails Mosaic
  lowering on real TPUs (dynamic-lane-index column RMW: "cannot
  statically prove index in dim 1 is a multiple of 128"); survives only
  in interpret mode.  The production segmented deposit is the pure-XLA
  compensated-cumsum form (`ops/deposit.cic_deposit_corner_csum_t`,
  8.8x the windowed scatter).

Both remain opt-in via their config flags (`cfg.fine_pallas=True`,
`cfg.coarse_pallas=True`) for interpret-mode validation and future
re-probing on new hardware/compilers.
"""
