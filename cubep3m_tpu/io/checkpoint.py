"""Checkpoint / restart.

Two formats:

* **native** (.npz): the full SimState pytree + output cursors + config
  fingerprint — bit-faithful resume of the integrator state including the
  dt-limiter accumulators and shake offset (the same resume contract as the
  reference header, checkpoint.f90:73-78 / particle_initialization.f90:88-190).

* **reference-compatible** per-rank stream binaries `{z}xv{rank}.dat`
  (+ `{z}PID{rank}.dat`): the reference's -DBINARY layout — header
  `np_local,a,t,tau,nts,dt_f_acc,dt_pp_acc,dt_c_acc,cur_checkpoint,
  cur_projection,cur_halofind,mass_p` followed by xv(6) per particle with
  the shake offset subtracted (checkpoint.f90:73-95).  This lets reference
  post-processing tools (`cic_power`, `halofind`, `recompose`) consume our
  snapshots and vice versa.  An `{z}xvaux.npz` sidecar carries the
  integrator state the Fortran header omits (dt_old, dt_pp_ext_acc,
  dt_gas_acc, shake offset, rng) so OUR reader restarts bit-faithfully;
  without it (a genuine Fortran snapshot) the restart re-primes those
  exactly like the reference does (variable_initialization.f90:27).

Wall-clock kill checkpoints (`cubepm_kill.f90:231-258`) reuse the same
writers with the `xvres` prefix via `kill=True`.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..state import SimState
from ..core.timestep import Cursors


_HEADER_DTYPE = np.dtype([
    ("np_local", "<i4"), ("a", "<f4"), ("t", "<f4"), ("tau", "<f4"),
    ("nts", "<i4"), ("dt_f_acc", "<f4"), ("dt_pp_acc", "<f4"),
    ("dt_c_acc", "<f4"), ("cur_checkpoint", "<i4"),
    ("cur_projection", "<i4"), ("cur_halofind", "<i4"), ("mass_p", "<f4"),
])


def z_string(a: float) -> str:
    """Redshift file prefix, reference style (e.g. '10.000')."""
    return f"{1.0 / a - 1.0:.3f}"


# ----------------------------------------------------------------------
# native format
# ----------------------------------------------------------------------
_PARTICLE_FIELDS = ("x", "v", "pid")
_CHUNK_ROWS = 1 << 22   # ~48 MB of xv per pull (32 MB-blocked writes role,
                        # checkpoint.f90:87-95)


def save_native(path: str, cfg: SimConfig, state: SimState,
                cursors: Cursors) -> None:
    """Write a bit-faithful native checkpoint (format 2).

    Particle arrays are pulled COMPACTED (valid slots only, per device,
    in bounded chunks) so a checkpoint moves ~np rows instead of
    nodes*max_np — on a remote-tunneled TPU at ~50 MB/s the padding
    slots would otherwise dominate the stall.  Stored uncompressed:
    deflate on fp32 phase-space data gains a few % and costs minutes of
    host CPU at production sizes.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    counts = np.asarray(state.np_local)
    cap = state.x.shape[0] // counts.size
    flat = {}
    for f in dataclasses.fields(state):
        if f.name in _PARTICLE_FIELDS:
            continue
        flat[f.name] = np.asarray(getattr(state, f.name))
    for name in _PARTICLE_FIELDS:
        arr = getattr(state, name)
        parts = []
        for d in range(counts.size):
            n = int(counts[d])
            for s in range(0, n, _CHUNK_ROWS):
                e = min(n, s + _CHUNK_ROWS)
                # device-side slice: only valid rows cross the link
                parts.append(np.asarray(arr[d * cap + s:d * cap + e]))
        flat[name] = (np.concatenate(parts) if parts
                      else np.asarray(arr[:0]))
    # write-then-rename: a process dying mid-write (e.g. an AsyncWriter
    # daemon thread at interpreter exit) can never leave a truncated file
    # that would be mistaken for a valid checkpoint
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(
            f, __fmt=np.int32(2), __cap=np.int32(cap), __config=repr(cfg),
            __cursors=np.array([cursors.checkpoint, cursors.projection,
                                cursors.halofind], np.int32),
            **flat)
    os.replace(tmp, path)


class AsyncWriter:
    """Background checkpoint drain: the simulation keeps stepping while the
    previous snapshot is pulled and written (orbax-async-style overlap;
    the reference instead stalls every rank on 32 MB-blocked synchronous
    writes, checkpoint.f90:87-95).

    jax arrays are immutable, so a submitted SimState is a consistent
    snapshot no matter how far the sweep advances afterwards.  One write in
    flight at a time: submitting while busy first drains the previous write
    (checkpoint cadence >> write time in production).  Exceptions surface
    on the next submit()/wait().
    """

    def __init__(self):
        self._thread = None
        self._err = None
        self._atexit = False

    def _run(self, fn, args, kwargs):
        try:
            fn(*args, **kwargs)
        except BaseException as e:   # surfaced on next wait()
            self._err = e

    def _drain(self) -> None:
        """atexit hook: join any in-flight write without raising."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def submit(self, fn, *args, **kwargs) -> None:
        import threading
        self.wait()
        if not self._atexit:
            # processes that exit without finish() (manual stepping, an
            # exception before the drain) must not kill a write mid-file
            import atexit
            atexit.register(self._drain)
            self._atexit = True
        self._thread = threading.Thread(
            target=self._run, args=(fn, args, kwargs), daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err


#: pp_autosize-grown knobs recoverable from a native checkpoint's stored
#: config repr (driver.RebuildRequired relaunch contract)
SIZING_KNOBS = ("pp_dense_band", "pp_dense_cap_frac", "pp_ext_band",
                "pp_ext_tail_band", "pp_ext_dense_cap", "pp_ext_ghost_cap",
                "pp_coarse_capacity")


def stored_sizing(path: str) -> dict:
    """Read the pp_autosize sizing knobs a native checkpoint was written
    with, from the `__config` repr save_native embeds.

    A run relaunched after driver.RebuildRequired (rebuild_policy="exit")
    takes max(CLI knob, stored knob) so the fresh process compiles once
    at the sizing the crashed-out leg had already grown to, instead of
    rediscovering it through another mid-run rebuild.  Returns {} for
    format-1 files (no stored config)."""
    import re
    with np.load(path, allow_pickle=False) as data:
        if "__config" not in data:
            return {}
        rep = str(data["__config"])
    out = {}
    for name in SIZING_KNOBS:
        m = re.search(rf"\b{name}=([0-9eE.+-]+)", rep)
        if m:
            v = m.group(1)
            out[name] = float(v) if ("." in v or "e" in v or "E" in v) \
                else int(v)
    return out


def load_native(path: str, cfg: SimConfig) -> Tuple[SimState, Cursors]:
    data = np.load(path, allow_pickle=False)
    fmt = int(data["__fmt"]) if "__fmt" in data else 1
    kw = {}
    if fmt >= 2:
        counts = np.asarray(data["np_local"])
        cap = int(data["__cap"])
        offs = np.concatenate([[0], np.cumsum(counts)])
        for name in _PARTICLE_FIELDS:
            compact = data[name]
            shape = (counts.size * cap,) + compact.shape[1:]
            full = np.zeros(shape, compact.dtype)
            for d in range(counts.size):
                n = int(counts[d])
                full[d * cap:d * cap + n] = compact[offs[d]:offs[d] + n]
            kw[name] = jnp.asarray(full)
    for f in dataclasses.fields(SimState):
        if f.name not in kw:
            if f.name not in data:
                # field added after the checkpoint was written (e.g.
                # exchange_overflow): scalar diagnostics default to 0
                kw[f.name] = jnp.asarray(0, jnp.int32)
            else:
                kw[f.name] = jnp.asarray(data[f.name])
    cur = data["__cursors"]
    return SimState(**kw), Cursors(checkpoint=int(cur[0]),
                                   projection=int(cur[1]),
                                   halofind=int(cur[2]))


# ----------------------------------------------------------------------
# reference-compatible format
# ----------------------------------------------------------------------
def write_reference_checkpoint(outdir: str, cfg: SimConfig, state: SimState,
                               cursors: Cursors, kill: bool = False,
                               z: float | None = None) -> list:
    """Write per-rank `{z}xv{rank}.dat` (+PID) stream binaries.

    Positions are written with the accumulated shake offset subtracted
    (checkpoint.f90:93, move_grid_back semantics); resume re-applies it.
    Returns the list of files written.
    """
    os.makedirs(outdir, exist_ok=True)
    a = float(state.a)
    prefix = f"{z:.3f}" if z is not None else z_string(a)
    tag = "xvres" if kill else "xv"
    x = np.asarray(state.x)
    v = np.asarray(state.v)
    pid = np.asarray(state.pid)
    counts = np.asarray(state.np_local)
    shake = np.asarray(state.shake_offset)
    cap = cfg.max_np
    files = []
    for rank in range(counts.size):
        n = int(counts[rank])
        hdr = np.zeros((), dtype=_HEADER_DTYPE)
        hdr["np_local"] = n
        hdr["a"] = a
        hdr["t"] = float(state.t)
        hdr["tau"] = float(state.tau)
        hdr["nts"] = int(state.nts)
        hdr["dt_f_acc"] = float(state.dt_f_acc)
        hdr["dt_pp_acc"] = float(state.dt_pp_acc)
        hdr["dt_c_acc"] = float(state.dt_c_acc)
        # callers pass post-trigger cursors (reference increments
        # cur_checkpoint before writing, checkpoint.f90:68)
        hdr["cur_checkpoint"] = cursors.checkpoint
        hdr["cur_projection"] = cursors.projection
        hdr["cur_halofind"] = cursors.halofind
        hdr["mass_p"] = cfg.mass_p
        sl = slice(rank * cap, rank * cap + n)
        xv = np.empty((n, 6), np.float32)
        xv[:, 0:3] = x[sl] - shake[None, :]
        xv[:, 3:6] = v[sl]
        fn = os.path.join(outdir, f"{prefix}{tag}{rank}.dat")
        with open(fn, "wb") as f:
            f.write(hdr.tobytes())
            f.write(xv.tobytes())
        files.append(fn)
        if cfg.pid:
            fn_pid = os.path.join(outdir, f"{prefix}PID{rank}.dat")
            with open(fn_pid, "wb") as f:
                f.write(hdr.tobytes())
                # reference PIDs are integer(8)
                f.write(pid[sl].astype("<i8").tobytes())
            files.append(fn_pid)
    # integrator-state sidecar: the reference header (checkpoint.f90:73-78)
    # does NOT carry dt_old, dt_pp_ext_acc, dt_gas_acc, the shake offset or
    # the RNG — the Fortran restart re-primes them
    # (variable_initialization.f90:27), so a header-only restart is
    # reference-faithful but not bit-faithful to the interrupted run.  The
    # sidecar closes that gap for OUR reader; foreign tools ignore it.
    fn_aux = os.path.join(outdir, f"{prefix}{tag}aux.npz")
    with open(fn_aux, "wb") as f:
        np.savez(f, dt_old=np.float32(state.dt_old),
                 dt_pp_ext_acc=np.float32(state.dt_pp_ext_acc),
                 dt_gas_acc=np.float32(state.dt_gas_acc),
                 shake_offset=shake.astype(np.float32),
                 rng=np.asarray(state.rng))
    files.append(fn_aux)
    return files


def write_reference_gas(outdir: str, cfg: SimConfig, state: SimState,
                        z: Optional[float] = None) -> list:
    """Write the MHD gas state as per-field stream binaries
    (`mpi_tvd_mhd_state_output`, mpi_tvd_mhd.f90:70-104 role):
    `{z}gas_u.dat` (5, nf^3 f32) and `{z}gas_b.dat` (3, nf^3 f32)."""
    if state.gas_u.ndim != 4:
        return []
    os.makedirs(outdir, exist_ok=True)
    prefix = f"{z:.3f}" if z is not None else z_string(float(state.a))
    files = []
    for tag, arr in (("gas_u", state.gas_u), ("gas_b", state.gas_b)):
        fn = os.path.join(outdir, f"{prefix}{tag}.dat")
        np.asarray(arr).astype("<f4").tofile(fn)
        files.append(fn)
    return files


def read_reference_gas(outdir: str, cfg: SimConfig, z: float
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Read the MHD gas state written by `write_reference_gas` — the
    `mpi_tvd_mhd_restart` role (mpi_tvd_mhd.f90:139-184): gas runs restart
    from `{z}gas_u.dat`/`{z}gas_b.dat` like particles do from xv files.

    Returns (gas_u (5, nf, nf, nf), gas_b (3, nf, nf, nf)) as f32 arrays;
    raises FileNotFoundError/ValueError on missing or mis-sized files.
    """
    nf = cfg.nf_physical_dim
    prefix = f"{z:.3f}"
    out = []
    for tag, nfield in (("gas_u", 5), ("gas_b", 3)):
        fn = os.path.join(outdir, f"{prefix}{tag}.dat")
        arr = np.fromfile(fn, dtype="<f4")
        want = nfield * nf ** 3
        if arr.size != want:
            raise ValueError(
                f"{fn}: expected {want} f32 values "
                f"({nfield} fields x {nf}^3), got {arr.size}")
        out.append(jnp.asarray(arr.reshape(nfield, nf, nf, nf)))
    return out[0], out[1]


def read_reference_checkpoint(outdir: str, cfg: SimConfig, z: float,
                              kill: bool = False
                              ) -> Tuple[SimState, Cursors]:
    """Restart from per-rank `{z}xv{rank}.dat` files
    (`particle_initialization.f90:88-190` restart_ic path)."""
    from ..state import SimState as SS
    prefix = f"{z:.3f}"
    tag = "xvres" if kill else "xv"
    nodes = cfg.nodes
    cap = cfg.max_np
    xs = np.zeros((nodes * cap, 3), np.float32)
    vs = np.zeros((nodes * cap, 3), np.float32)
    pids = np.zeros((nodes * cap,), np.int32)
    counts = np.zeros((nodes,), np.int32)
    hdr = None
    for rank in range(nodes):
        fn = os.path.join(outdir, f"{prefix}{tag}{rank}.dat")
        with open(fn, "rb") as f:
            hdr = np.frombuffer(f.read(_HEADER_DTYPE.itemsize),
                                dtype=_HEADER_DTYPE)[0]
            n = int(hdr["np_local"])
            xv = np.frombuffer(f.read(n * 24), dtype="<f4").reshape(n, 6)
        xs[rank * cap:rank * cap + n] = xv[:, 0:3]
        vs[rank * cap:rank * cap + n] = xv[:, 3:6]
        counts[rank] = n
        fn_pid = os.path.join(outdir, f"{prefix}PID{rank}.dat")
        if cfg.pid and os.path.exists(fn_pid):
            with open(fn_pid, "rb") as f:
                f.seek(_HEADER_DTYPE.itemsize)
                pid8 = np.frombuffer(f.read(n * 8), dtype="<i8")
            # reference PIDs are integer(8); SimState.pid is int32 (x64 is
            # disabled on device) — refuse to wrap silently
            if pid8.size and (pid8.max() > np.iinfo(np.int32).max
                              or pid8.min() < np.iinfo(np.int32).min):
                raise OverflowError(
                    f"{fn_pid}: PIDs exceed int32 range "
                    f"(max {pid8.max()}); >2^31 particle runs are not "
                    f"representable in SimState.pid")
            pids[rank * cap:rank * cap + n] = pid8.astype(np.int32)
        else:
            pids[rank * cap:rank * cap + n] = np.arange(1, n + 1)
    from ..state import _default_gas
    _dg = _default_gas(cfg)
    if cfg.mhd and os.path.exists(
            os.path.join(outdir, f"{prefix}gas_u.dat")):
        # gas restart rides along when the files exist
        # (mpi_tvd_mhd_restart role)
        _dg = read_reference_gas(outdir, cfg, z)
    # integrator-state sidecar (see write_reference_checkpoint): restores
    # the fields the reference header omits, making the round trip
    # bit-faithful.  WITHOUT it (a genuine Fortran-produced snapshot) the
    # restart matches the reference's own semantics instead: dt_old=0,
    # dt_pp_ext_acc/dt_gas_acc re-primed to 1000
    # (variable_initialization.f90:27), shake offset zero (positions were
    # written shake-subtracted, so the zero offset is CONSISTENT — only
    # the next shake delta differs from the uninterrupted run).
    f32 = lambda v_: jnp.asarray(float(v_), jnp.float32)
    fn_aux = os.path.join(outdir, f"{prefix}{tag}aux.npz")
    if os.path.exists(fn_aux):
        aux = np.load(fn_aux)
        dt_old = f32(aux["dt_old"])
        dt_pp_ext_acc = f32(aux["dt_pp_ext_acc"])
        dt_gas_acc = f32(aux["dt_gas_acc"])
        shake = aux["shake_offset"].astype(np.float32)
        rng = jnp.asarray(aux["rng"])
        # positions in the file are shake-subtracted; re-add the offset so
        # the resumed state is identical to the writer's
        for rank in range(nodes):
            n = int(counts[rank])
            xs[rank * cap:rank * cap + n] += shake[None, :]
        shake_offset = jnp.asarray(shake)
    else:
        dt_old = f32(0.0)
        dt_pp_ext_acc = f32(1000.0)
        dt_gas_acc = f32(1000.0)
        shake_offset = jnp.zeros(3, jnp.float32)
        rng = jax.random.PRNGKey(int(hdr["nts"]))
    state = SS(
        x=jnp.asarray(xs), v=jnp.asarray(vs), pid=jnp.asarray(pids),
        np_local=jnp.asarray(counts),
        a=f32(hdr["a"]), tau=f32(hdr["tau"]), t=f32(hdr["t"]),
        dt_old=dt_old, nts=jnp.asarray(int(hdr["nts"]), jnp.int32),
        dt_f_acc=f32(hdr["dt_f_acc"]), dt_pp_acc=f32(hdr["dt_pp_acc"]),
        dt_pp_ext_acc=dt_pp_ext_acc, dt_c_acc=f32(hdr["dt_c_acc"]),
        dt_gas_acc=dt_gas_acc,
        shake_offset=shake_offset,
        pp_overflow=jnp.asarray(0, jnp.int32),
        exchange_overflow=jnp.asarray(0, jnp.int32),
        bucket_overflow=jnp.asarray(0, jnp.int32),
        clamp_count=jnp.asarray(0, jnp.int32),
        rng=rng,
        gas_u=_dg[0], gas_b=_dg[1],
    )
    cursors = Cursors(checkpoint=int(hdr["cur_checkpoint"]),
                      projection=int(hdr["cur_projection"]),
                      halofind=int(hdr["cur_halofind"]))
    return state, cursors
