"""Headline benchmark: particle-steps/sec/chip on the P3M sweep.

Baseline (BASELINE.md): the reference evolves 128^3 particles (576^3 fine
mesh) at ~23.8 s/step on a 2007 8-core node = 8.8e4 particle-steps/s/node.
BASELINE.json's north-star metric is particle-steps/sec/chip at 256^3.

Prints ONE JSON line:
  {"metric": "particle-steps/sec/chip at 256^3", "value": N,
   "unit": "particles/s", "vs_baseline": N}

Run on the real TPU: `python bench.py` (first compile ~minutes over the
tunnel).  `python bench.py --small` runs a 64^3 box for smoke testing.
"""
import argparse
import hashlib
import json
import os
import pickle
import subprocess
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
EXE_CACHE = os.path.join(_HERE, "bench_cache")


def _source_key():
    """Hash of the package source: a serialized executable is only valid
    for the exact code that produced it."""
    import glob
    h = hashlib.sha256()
    for f in sorted(glob.glob(os.path.join(_HERE, "cubep3m_tpu", "**",
                                           "*.py"), recursive=True)):
        with open(f, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:16]


def _run_config(args_list, budget_s):
    """Run one bench configuration in a SUBPROCESS (a failed/poisoned
    compile must not contaminate the fallback) with a wall budget.
    Returns the parsed JSON result line or None."""
    cmd = [sys.executable, os.path.abspath(__file__)] + args_list
    print(f"# bench auto: {' '.join(args_list)} (budget {budget_s}s)",
          file=sys.stderr, flush=True)
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=budget_s)
    except subprocess.TimeoutExpired:
        print("# bench auto: budget exceeded", file=sys.stderr, flush=True)
        return None
    sys.stderr.write(proc.stderr)
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            out = json.loads(line)
            if "metric" in out:
                return out
        except json.JSONDecodeError:
            continue
    print(f"# bench auto: no result (rc={proc.returncode})",
          file=sys.stderr, flush=True)
    return None


def _tunnel_alive():
    """TCP-probe the axon relay (a dead relay blocks jax backend init
    FOREVER — fail fast with a diagnosis instead of burning budgets)."""
    sys.path.insert(0, _HERE)
    from cubep3m_tpu import relay_alive
    return relay_alive()


def auto_main():
    """Driver entry (`python bench.py` with no arguments): try the
    north-star 256^3 fused config with a wall budget; on failure wait out
    the TPU worker's crashed-client recovery and fall back to the proven
    128^3 config so a wedged remote compiler can never leave the round
    without a number."""
    budget = int(os.environ.get("CUBEP3M_BENCH256_BUDGET", "3300"))
    if not _tunnel_alive():
        # the relay can take minutes to come back after a crash; give it
        # a bounded grace period before declaring the hardware gone
        print("# bench auto: TPU tunnel relay down (127.0.0.1:8113 "
              "refused); waiting up to 600s", file=sys.stderr, flush=True)
        for _ in range(60):
            time.sleep(10)
            if _tunnel_alive():
                break
        else:
            raise SystemExit(
                "bench auto: TPU tunnel relay is down (all axon relay "
                "ports connection-refused; the relay process exited and "
                "cannot be restarted from inside the container).  Last "
                "measured result: 10.25M particle-steps/s/chip at 256^3 "
                "(116.5x), bench_logs/runbook_r3.log 13:28.")
    out = None
    # pre-serialized executables: deserialization + first-run warmup is
    # ~2 min vs ~20 min remote compile, so try these first with a tight
    # budget; the key check inside main() falls back to compiling if the
    # source changed, which would blow the budget -> the full paths below
    # still run.
    for exe, extra in [
            (os.path.join(EXE_CACHE, "fused256_chunk5_csort.exe"),
             ["--steps", "10", "--chunk", "5", "--coarse-sort"]),
            (os.path.join(EXE_CACHE, "fused256_chunk5.exe"),
             ["--steps", "10", "--chunk", "5", "--no-corner-deposit"]),
            (os.path.join(EXE_CACHE, "fused256.exe"),
             ["--steps", "5", "--no-corner-deposit"])]:
        if out is None and os.path.exists(exe):
            out = _run_config(["--np-dim", "256", "--load-exe", exe]
                              + extra, 1500)
    if out is None:
        out = _run_config(["--np-dim", "256", "--steps", "10",
                           "--chunk", "5", "--coarse-sort"], budget)
    if out is None:
        # a killed TPU client wedges the worker for minutes; the fallback
        # process would otherwise hang at its first compile
        print("# bench auto: waiting 330s for TPU worker recovery",
              file=sys.stderr, flush=True)
        time.sleep(330)
        # proven kernel-free 256^3 config (80.5x landed with
        # --no-gather-pallas semantics before the Pallas gather existed)
        out = _run_config(["--np-dim", "256", "--steps", "10",
                           "--chunk", "5", "--coarse-sort",
                           "--no-gather-pallas"], budget)
    if out is None:
        # the fused 256^3 chunk program crashed the tunneled worker on
        # four consecutive runs late in round 4 (campaign_r4e.log
        # 15:17-17:05) while the STAGED dispatch ran clean the same day
        # at 512^3 bench geometry (campaign_r4c.log 14:08, 5.08M
        # p-steps/s) — smaller compile units, same physics
        print("# bench auto: waiting 330s for TPU worker recovery",
              file=sys.stderr, flush=True)
        time.sleep(330)
        out = _run_config(["--np-dim", "256", "--steps", "3", "--staged",
                           "--coarse-sort", "--buffer", "1.30"], budget)
    if out is None:
        print("# bench auto: waiting 330s for TPU worker recovery",
              file=sys.stderr, flush=True)
        time.sleep(330)
        out = _run_config(["--np-dim", "128", "--steps", "10"], 2400)
    if out is None:
        raise SystemExit("bench auto: both configurations failed")
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="64^3 particles (smoke test)")
    ap.add_argument("--np-dim", type=int, default=None,
                    help="particles per dimension (default 128; the "
                         "tunneled TPU's remote compiler has not completed "
                         "a 512^3-mesh sweep compile within 40 min, so "
                         "256^3 is opt-in)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fast", action="store_true",
                    help="stencil coarse kick + potential fine solve "
                         "(quantized variants; see DESIGN.md)")
    ap.add_argument("--buffer", type=float, default=1.05,
                    help="density_buffer (single-chip runs conserve "
                         "np_local exactly, so the default 1.05 cuts "
                         "~20%% of every index op's padding-slot "
                         "traversals; multi-chip runs need headroom)")
    ap.add_argument("--corner-deposit", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="corner-split coarse CIC deposit (identical "
                         "physics, 1.5x faster steady state, longer "
                         "first-time compile)")
    ap.add_argument("--staged", action="store_true",
                    help="multi-jit staged sweep (the fused 512^3-mesh "
                         "program OOM-kills the tunnel's compile helper)")
    ap.add_argument("--merged-sort", action="store_true",
                    help="fuse the exchange class sort into the cell sort "
                         "(one argsort/step; cfg.merged_exchange_sort)")
    ap.add_argument("--coarse-sort", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="re-sort by coarse base key before the coarse CIC "
                         "(cfg.coarse_sort).  Measured at 256^3: the "
                         "sorted-indices hint does NOT speed the windowed "
                         "corner scatter (1140 vs 1139 ms) — off by default")
    ap.add_argument("--gather-pallas", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="cfg.coarse_gather_pallas: ranked-window Pallas "
                         "coarse force gather (None = auto: on for TPU "
                         "with --coarse-sort)")
    ap.add_argument("--fine-pallas", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="cfg.fine_pallas: ranked streaming-window fine "
                         "NGP deposit/gather kernels (None = auto: on "
                         "only with a recorded ok probe verdict, "
                         "scripts/fine_probe.py)")
    ap.add_argument("--fft-matmul", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="cfg.fft_matmul: force-solve c2c transforms as "
                         "MXU matmul DFTs (None = auto: the recorded "
                         "scripts/fft_matmul_probe.py verdict)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="scan CHUNK fixed-dt sweeps per dispatch "
                         "(amortizes the tunnel's per-dispatch latency; "
                         "physics identical to --chunk 0)")
    ap.add_argument("--save-exe", default=None, metavar="PATH",
                    help="serialize the compiled step executable to PATH "
                         "(jax.experimental.serialize_executable) so a "
                         "later run can skip the remote compile")
    ap.add_argument("--load-exe", default=None, metavar="PATH",
                    help="deserialize a previously saved executable "
                         "instead of compiling (falls back to compiling "
                         "if the source/config key does not match)")
    args = ap.parse_args()

    import jax
    import cubep3m_tpu
    cubep3m_tpu.enable_compilation_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cubep3m_tpu.config import SimConfig
    from cubep3m_tpu import kernels as kernels_mod
    from cubep3m_tpu import state as state_mod
    from cubep3m_tpu.core import step as step_mod
    from cubep3m_tpu.parallel.mesh import make_sim_mesh

    np_dim = args.np_dim or (64 if args.small else 128)
    nf = 2 * np_dim                      # fine mesh = 2x particles per dim
    # single chip: one node, 2 tiles/dim; nf_buf covers the fine kernel
    # support (nf_cutoff=16).  The fine solve runs as tile FFTs of at most
    # 288^3 (=256+2*16): the axon TPU backend compiles 288^3 c2c but
    # reports UNIMPLEMENTED at 576^3.
    fft_tiles = max(1, nf // 256)
    cfg = SimConfig(nodes_dim=1, tiles_node_dim=2,
                    nf_tile=nf // 2 + 2 * 16, nf_cutoff=16, buf_extra=0,
                    density_buffer=args.buffer, shake=True, pid=False,
                    z_i=100.0, coarse_corner_deposit=args.corner_deposit,
                    fine_fft_tiles=fft_tiles,
                    merged_exchange_sort=args.merged_sort,
                    coarse_sort=args.coarse_sort,
                    coarse_gather_pallas=args.gather_pallas,
                    fine_pallas=args.fine_pallas,
                    fft_matmul=args.fft_matmul,
                    coarse_from_fine=args.fast, fine_potential=args.fast)
    cfg.validate()
    assert cfg.nf_physical_dim == nf

    t0 = time.time()
    kern_f, kern_c = kernels_mod.build_kernels(cfg)
    kern_f = jnp.asarray(kern_f)
    kern_c = jnp.asarray(kern_c)
    mesh = make_sim_mesh(1)
    sweep = (step_mod.make_staged_sweep(cfg, mesh) if args.staged
             else step_mod.make_sweep(cfg, mesh))
    print(f"# kernels built in {time.time() - t0:.1f}s; "
          f"{cfg.summary()}", file=sys.stderr)

    n = cfg.np_total
    rng = np.random.default_rng(1)
    # slightly perturbed lattice: realistic early-universe load (uniform
    # occupancy, ~1 particle per 8 cells)
    g = np.arange(np_dim, dtype=np.float32) * 2.0 + 0.5
    x = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    x = (x + rng.uniform(-0.5, 0.5, x.shape)).astype(np.float32) % nf
    v = (0.05 * rng.normal(size=x.shape)).astype(np.float32)
    st = state_mod.particles_ic(cfg, x, v)
    st = step_mod.shard_state(st, mesh)

    if args.chunk > 0:
        target = step_mod.make_fixed_chunk(cfg, mesh, sweep, args.chunk)
        call_args = (st, kern_f, kern_c, jnp.float32(0.05))
        steps_per_dispatch = args.chunk
    else:
        one = jnp.float32(1.0)
        dt = jnp.float32(0.05)
        target = sweep
        call_args = (st, kern_f, kern_c, one, dt, one, st.tau + dt,
                     st.t + dt)
        steps_per_dispatch = 1

    # key ties a serialized executable to the exact source + config that
    # produced it: a stale executable would silently run OLD physics
    # resolve the gather-pallas AUTO decision into the key: the compiled
    # program differs with/without the kernel, and the probe verdict file
    # can flip the auto between save and load
    from cubep3m_tpu.ops import gather_pallas as _gp
    from cubep3m_tpu.ops import dftmm as _dftmm
    gather_resolved = (args.gather_pallas if args.gather_pallas is not None
                       else (_gp.auto_enabled() and args.coarse_sort))
    fft_mm_resolved = (args.fft_matmul if args.fft_matmul is not None
                       else _dftmm.auto_enabled())
    exe_key = (_source_key(), jax.__version__, np_dim, args.chunk,
               args.fast, args.buffer, args.corner_deposit, args.staged,
               args.merged_sort, args.coarse_sort, args.gather_pallas,
               gather_resolved, args.fft_matmul, fft_mm_resolved)
    compiled = None
    if args.load_exe:
        try:
            with open(args.load_exe, "rb") as f:
                d = pickle.load(f)
            if d["key"] != exe_key:
                print(f"# load-exe: stale key (saved {d['key']}, want "
                      f"{exe_key}) — recompiling", file=sys.stderr,
                      flush=True)
            else:
                from jax.experimental.serialize_executable import (
                    deserialize_and_load)
                t0 = time.time()
                compiled = deserialize_and_load(d["payload"], d["in_tree"],
                                                d["out_tree"])
                print(f"# load-exe: deserialized in {time.time() - t0:.1f}s",
                      file=sys.stderr, flush=True)
        except Exception as e:  # corrupt file, plugin mismatch, ...
            print(f"# load-exe failed ({e!r}) — recompiling",
                  file=sys.stderr, flush=True)
    if compiled is None and args.save_exe:
        t0 = time.time()
        compiled = target.lower(*call_args).compile()
        print(f"# save-exe: compiled in {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        try:
            m = compiled.memory_analysis()
            gb = 1024 ** 3
            print(f"# save-exe: memory args {m.argument_size_in_bytes/gb:.2f}"
                  f" out {m.output_size_in_bytes/gb:.2f}"
                  f" temps {m.temp_size_in_bytes/gb:.2f}"
                  f" aliased {m.alias_size_in_bytes/gb:.2f} GiB",
                  file=sys.stderr, flush=True)
        except Exception:
            pass
        from jax.experimental.serialize_executable import serialize
        payload, in_tree, out_tree = serialize(compiled)
        os.makedirs(os.path.dirname(os.path.abspath(args.save_exe)),
                    exist_ok=True)
        tmp = args.save_exe + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump({"key": exe_key, "payload": payload,
                         "in_tree": in_tree, "out_tree": out_tree}, f)
        os.replace(tmp, args.save_exe)
        print(f"# save-exe: {len(payload)} bytes -> {args.save_exe}",
              file=sys.stderr, flush=True)

    if compiled is not None:
        if args.chunk > 0:
            def one_dispatch(st):
                return compiled(st, kern_f, kern_c, jnp.float32(0.05))
        else:
            def one_dispatch(st):
                return compiled(st, kern_f, kern_c, one, dt, one,
                                st.tau + dt, st.t + dt)
    elif args.chunk > 0:
        def one_dispatch(st):
            return target(st, kern_f, kern_c, jnp.float32(0.05))
    else:
        def one_dispatch(st):
            return target(st, kern_f, kern_c, one, dt, one, st.tau + dt,
                          st.t + dt)

    def fence(s):
        # the axon backend's block_until_ready returns early; materializing
        # bytes on host is the only reliable completion fence
        np.asarray(jax.device_get(s.tau))

    t0 = time.time()
    st = one_dispatch(st)
    fence(st)
    print(f"# first step (compile) {time.time() - t0:.1f}s", file=sys.stderr)

    n_dispatch = max(1, args.steps // steps_per_dispatch)
    t0 = time.time()
    for i in range(n_dispatch):
        st = one_dispatch(st)
    fence(st)
    dt_step = (time.time() - t0) / (n_dispatch * steps_per_dispatch)
    print(f"# {dt_step:.3f} s/step over {n_dispatch * steps_per_dispatch} "
          f"steps ({n_dispatch} dispatches)", file=sys.stderr)

    # sanity: particles conserved, forces sane, no pp overflow
    vfin = np.asarray(st.v[: min(100000, n)])
    assert int(np.asarray(st.np_local).sum()) == n, "particle count changed"
    assert np.all(np.isfinite(vfin)), "non-finite velocities"
    print(f"# sanity OK: np={n} pp_overflow={int(st.pp_overflow)} "
          f"v_rms={float(np.sqrt((vfin ** 2).mean())):.4f}", file=sys.stderr)

    value = n / dt_step
    baseline = 8.8e4  # reference particle-steps/s/node (BASELINE.md)
    print(json.dumps({
        "metric": f"particle-steps/sec/chip at {np_dim}^3",
        "value": round(value, 1),
        "unit": "particles/s",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    if len(sys.argv) == 1:
        auto_main()
    else:
        main()
