"""Runtime configuration for cubep3m_tpu.

Replaces the reference's compile-time configuration stack — the `parameters`
file of Fortran constants, `source_threads/cubepm.par` secondary constants,
and the ~30 cpp `-D` makefile flags (reference `parameters.example`,
`source_threads/cubepm.par`, `source_threads/Make_PP_THREADS`) — with a single
frozen dataclass whose fields become static arguments at `jit` time.

Also subsumes the sizing calculator `utils/mem_usage.f90` (memory_estimate).

Unit system (reference `cubepm.par:148-157`): comoving fine-mesh cell units,
`G = 1/(6*pi)`, mean density 1, particle mass `mass_p = nf**3 / np_total`.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

PI = math.pi
# Gravitational constant in grid units (cubepm.par:149).
G = 1.0 / (6.0 * PI)
# Expansion-limiter defaults (cubepm.par:27-32).
DEFAULT_RA_MAX = 0.01
DEFAULT_DA_MAX = 0.01
DEFAULT_DT_MAX = 1.0
DEFAULT_DT_SCALE = 1.0
# dt_pp limiter scale (cubepm.par:77-79).
DEFAULT_DT_PP_SCALE = 1.0


@dataclasses.dataclass(frozen=True)
class Cosmology:
    """FLRW background + primordial power settings.

    Mirrors `parameters.example:37-46` (omega fractions, dark-energy EoS)
    and the Chaplygin-gas extension (`cubepm.par`, `timestep.f90:296-339`).
    """

    omega_m: float = 0.24
    omega_l: float = 0.76
    omega_b: float = 0.04
    h0: float = 0.7          # H0 / (100 km/s/Mpc); used by ICs/analysis only
    sigma8: float = 0.8      # normalization for ICs
    n_s: float = 0.96        # primordial spectral index
    wde: float = -1.0        # dark energy EoS
    # Chaplygin gas (optional alternative background)
    chaplygin: bool = False
    omega_ch: float = 0.7
    A_ch: float = 1.0
    alpha_ch: float = 0.0

    @property
    def omega_k(self) -> float:
        if self.chaplygin:
            return 1.0 - self.omega_m - self.omega_ch
        return 1.0 - self.omega_m - self.omega_l


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Full simulation configuration.

    Geometry contract (parameters.example, cubepm.par:190-215):
      nf_physical_tile_dim = nf_tile - 2*nf_buf
      nf_physical_node_dim = nf_physical_tile_dim * tiles_node_dim
      nf_physical_dim      = nf_physical_node_dim * nodes_dim   (global)
      coarse mesh = fine / mesh_scale
      particles   = (nf_physical_dim / 2)**3  (one per 8 fine cells)
    """

    # --- decomposition ---
    nodes_dim: int = 1          # devices per mesh axis; devices = nodes_dim**3
    tiles_node_dim: int = 2     # fine tiles per device per axis
    nf_tile: int = 96           # fine tile size incl. 2*nf_buf cells of buffer

    # --- force split geometry ---
    nf_cutoff: int = 16         # fine force cutoff radius (fine cells)
    buf_extra: int = 8          # nf_buf = nf_cutoff + buf_extra (parameters.example)
    mesh_scale: int = 4         # fine cells per coarse cell (cubepm.par:157)

    # --- physics ---
    box: float = 200.0          # Mpc/h box side (for ICs/analysis)
    z_i: float = 200.0          # initial redshift
    cosmo: Cosmology = dataclasses.field(default_factory=Cosmology)
    cosmo_expansion: bool = True  # `cosmo` flag: False = static force tests

    # --- force options (cpp flags PPINT/PP_EXT/NGP in the reference) ---
    pp: bool = True             # particle-particle force within fine cells
    pp_ext: bool = False        # extended pp over pp_range fine-cell neighborhood
    pp_range: int = 2
    ngp: bool = True            # NGP fine deposit/gather (reference default build)
    rsoft: float = 0.1          # pp softening: no force below (cubepm.par:76)
    pp_bias: float = 1.0        # pp force bias (cubepm.par:80)
    lrckcorr: bool = True       # long-range coarse kernel k-space correction
    coarse_pencil_fft: bool = False  # distributed coarse FFT (all_to_all
                                     # pencils) instead of replicated
                                     # all_gather solve (p3dfft role)
    fine_potential: bool = False     # fine solve via scalar potential +
                                     # central differences (wg1.ascii mode:
                                     # 2 FFTs + 1/3 kernel memory; slightly
                                     # noisier in fp32 from the phi
                                     # differencing cancellation)
    coarse_from_fine: bool = False   # regular-stencil coarse deposit/kick
                                     # from the fine grid (fast; quantizes
                                     # positions to fine-cell centers)

    # --- time stepping ---
    dt_scale: float = DEFAULT_DT_SCALE
    dt_max: float = DEFAULT_DT_MAX
    ra_max: float = DEFAULT_RA_MAX
    da_max: float = DEFAULT_DA_MAX
    restrict_da: bool = False
    dt_pp_scale: float = DEFAULT_DT_PP_SCALE
    dt_pp_ext_scale: float = DEFAULT_DT_PP_SCALE
    max_nts: int = 4000         # max timesteps (cubepm.par:36)

    # --- particle capacity ---
    density_buffer: float = 2.0  # max_np headroom factor (parameters.example)
    pp_band: int = 32            # PPINT pair window in cell-sorted order;
                                 # cells denser than band+1 fall through to
                                 # the dense-tail pass (never dropped)
    pp_dense_band: int = 512     # dense-tail pair window: max supported
                                 # same-fine-cell occupancy - 1; beyond this
                                 # pairs are dropped and counted
    pp_dense_cap_frac: float = 0.25  # dense-tail buffer capacity as a
                                     # fraction of max_np
    pp_autosize: bool = False    # driver-adaptive dense band: probe the max
                                 # same-cell occupancy every
                                 # `pp_autosize_every` steps and rebuild the
                                 # sweep with a larger pp_dense_band BEFORE
                                 # the dense-tail window overflows (the
                                 # reference sizes max_llf statically and
                                 # aborts on overflow,
                                 # particle_mesh_threaded.f90:280-284)
    pp_autosize_every: int = 25  # probe cadence in sweeps (occupancy grows
                                 # smoothly with structure formation)
    pp_autosize_headroom: float = 0.7  # grow when occ > headroom*(band+1)
    rebuild_policy: str = "inplace"  # what a pp_autosize growth does once
                                     # a sweep has executed: "inplace" =
                                     # recompile in this process (the
                                     # default); "exit" = checkpoint +
                                     # raise driver.RebuildRequired so a
                                     # FRESH process resumes with the
                                     # grown sizing — mid-run recompiles
                                     # crashed the tunneled TPU worker
                                     # 5/5 times in round 4
                                     # (bench_logs/campaign_r4c.log)
    pp_cell_capacity: int = 32   # max particles per fine cell for pp bucketing
    pp_coarse_capacity: int = 256  # max particles per coarse cell (pp bucket)
    pp_ext_impl: str = "lattice"  # "lattice": 8 shifted super-cell sorts,
                                  # O(N) memory at any clustering
                                  # (ops/pp_lattice.py) — the production
                                  # path; "bucket": dense coarse-cell
                                  # position grids (ops/pp.py) — memory
                                  # scales as capacity * nc^3 and OOMs at
                                  # >= 128^3 once halos collapse
    pp_ext_band: int = 0         # lattice PP_EXT same-super-cell pair
                                 # window (super cell = 2*pp_range fine
                                 # cells; mean occupancy is (2*pp_range)^3
                                 # x the mean fine-cell occupancy); denser
                                 # super cells fall through to the shared
                                 # dense-tail pass (pp_dense_band window).
                                 # 0 = auto: 4x the mean super-cell
                                 # occupancy (pp_ext_band_eff) — a flat
                                 # band below the MEAN occupancy would
                                 # classify half the box "dense" and swamp
                                 # the tail buffer
    pp_ext_band_cap: int = 512   # ceiling on pp_ext_band growth: a band
                                 # pass costs O(8 * band * N) per sweep
                                 # REGARDLESS of clustering (every
                                 # particle pays every offset), so
                                 # occupancy beyond the cap must spill to
                                 # the dense tail (cost O(8 * dense_band
                                 # * dense_cap) — only dense-cell
                                 # particles pay).  The r4/r7 reactive
                                 # ladder doubled the band to 8192, whose
                                 # single-dispatch wall time killed the
                                 # tunneled TPU worker 3/3 times
                                 # (bench_logs/r8_ppext128_leg1.log b5)
    pp_ext_dense_cap: int = 0    # lattice PP_EXT dense-tail COMPACTION
                                 # buffer (particles living in super
                                 # cells denser than the band): 0 =
                                 # share the PPINT cap (max_np *
                                 # pp_dense_cap_frac).  Sized separately
                                 # because the tail pass costs
                                 # O(tail_band * cap) per shift whether
                                 # or not the slots are used — the probe
                                 # right-sizes it from the measured
                                 # dense-population bound (4x tighter
                                 # than the shared cap at the 128^3
                                 # ratchet's resume point)
    pp_ext_tail_band: int = 0    # lattice PP_EXT dense-tail window (max
                                 # supported SUPER-cell occupancy): 0 =
                                 # share pp_dense_band.  Separate knob
                                 # because super-cell occupancy (64 fine
                                 # cells) runs ~4x the fine-cell max, and
                                 # a shared window would make the PPINT
                                 # tail pay the super-cell ceiling
    pp_ext_tail_chunk: int = 0   # staged lattice PP_EXT: split each
                                 # shift's dense-tail pass into
                                 # ceil(n_dense/chunk) separate
                                 # dispatches of `chunk` lefts each
                                 # (plus the tail-window overlap), so
                                 # no dispatch exceeds the tunnel's
                                 # per-execution ceiling at any
                                 # clustering (the single-dispatch
                                 # tail is O(dense_cap * tail_band) —
                                 # ~6e11 lanes at 256^3 z<=1, the
                                 # campaign_r9 ppext256-demo crash).
                                 # 0 = single dispatch (fused path
                                 # always single-dispatch)
    pp_ext_ghost_cap: int = 0    # lattice PP_EXT per-face ghost-copy
                                 # buffer; 0 = auto from the face-skin
                                 # volume with 4x clustering headroom
    pp_pallas: Optional[bool] = None  # PPINT band pass as the fused Pallas
                                      # TPU kernel (ops/pp_pallas.py);
                                      # None = auto (on when backend is TPU)
    fine_fft_tiles: int = 1     # fine solve: 1 = single padded-node FFT;
                                # t>1 = t^3 overlapping tile FFTs (the
                                # reference's tile strategy) — required
                                # when the padded transform exceeds the
                                # backend's FFT limits (axon TPU: 288^3 ok,
                                # 576^3 UNIMPLEMENTED)
    staged_sweep: bool = False  # run the sweep as 3 separately-compiled
                                # jits (step.make_staged_sweep): identical
                                # physics, much smaller compile units —
                                # required at 512^3-mesh scale where AOT
                                # compilers OOM on the fused program.
                                # Chunked stepping dispatches staged steps
                                # with on-device dt (make_staged_stepper).
    coarse_pallas: Optional[bool] = None  # with coarse_sort: run the coarse
                                # deposit as the Pallas segmented-sum
                                # kernel (ops/deposit_pallas.py) instead of
                                # an XLA scatter.  None = OFF: the kernel's
                                # dynamic lane-dim column RMW fails Mosaic
                                # lowering on real TPUs ("index in dim 1
                                # not provably a multiple of 128"); kept
                                # for interpret-mode reference.  Use
                                # coarse_csum (auto-on) instead.
    coarse_csum: Optional[bool] = None  # with coarse_sort: segmented-sum
                                # coarse deposit in pure XLA (compensated
                                # cumsum + run-boundary gathers, ~N/8
                                # indices; deposit.cic_deposit_corner_
                                # csum_t).  Run boundaries pool for free
                                # from the fine NGP histogram when
                                # cfg.ngp.  None = auto (on with
                                # coarse_sort).  fp32-ulp-exact vs the
                                # scatter deposit (coarse_deposit_probe)
    coarse_gather_pallas: Optional[bool] = None  # with coarse_sort: run the
                                # coarse force gather as the Pallas ranked-
                                # window kernel (ops/gather_pallas.py):
                                # occupied-cell ranks + one-hot MXU column
                                # selection replace the ~600 ms 24-wide XLA
                                # windowed gather at 256^3.  None = auto (on
                                # for TPU backends when the per-cell counts
                                # are available, i.e. ngp + coarse_csum).
                                # Exact vs the XLA gather (test_gather_pallas)
    fine_pallas: Optional[bool] = None  # with ngp: run the fine NGP
                                # deposit AND force gather as ranked
                                # streaming-window Pallas kernels
                                # (ops/fine_pallas.py): per-rank one-hot
                                # MXU sums + sequential grid-window
                                # expansion replace the last two
                                # ~185 ms N-index ops in the 256^3 step.
                                # None = auto: on only where an
                                # on-hardware probe recorded ok
                                # (scripts/fine_probe.py).  Bit-equal to
                                # the scatter deposit for power-of-two
                                # masses; gather exact (test_fine_pallas)
    fft_matmul: Optional[bool] = None  # run the fine/coarse force-solve
                                # c2c transforms as MXU matmul DFTs
                                # (ops/dftmm.py) instead of XLA's VPU FFT
                                # (~10x off roofline at 288^3 on v5e).
                                # fp32-equivalent numerics (HIGHEST-
                                # precision matmuls; tests/test_dftmm.py).
                                # None = auto: on only where an on-
                                # hardware A/B probe recorded ok
                                # (scripts/fft_matmul_probe.py)
    coarse_sort: bool = False  # re-sort particles by coarse base-cell key
                               # before the coarse CIC section: turns the
                               # UNSORTED corner scatter/gather (~3x the
                               # sorted index-op floor at 256^3) into
                               # segment-sum-class sorted ops, at the cost
                               # of one extra argsort + packed reorder.
                               # Particles leave the sweep in coarse order
                               # (the next sweep's cell sort re-sorts).
                               # Identical physics (fp32 sum order aside)
    single_node_wrap: bool = True  # nodes_dim==1 fast path: the ownership
                                   # exchange degenerates to the periodic
                                   # wrap x mod nf (exact for any drift;
                                   # saves ~0.5 s/step at 256^3).  Off =
                                   # run the full 26-class machinery even
                                   # on one device (equality tests)
    merged_exchange_sort: bool = False  # fuse the exchange's class sort
                                        # into the cell sort: ONE big
                                        # argsort/step (combined keys +
                                        # counting merge of arrivals,
                                        # parallel/exchange.
                                        # exchange_cell_sorted); identical
                                        # physics, fewer index ops
    coarse_corner_deposit: bool = False  # corner-split single-scatter coarse
                                         # CIC deposit: ~1.5x faster steady
                                         # state (153 vs 228 ms at 128^3) but
                                         # the windowed scatter costs ~330 s
                                         # of XLA compile — enable for long
                                         # production runs, off for quick
                                         # benches (the corner GATHER is
                                         # always on: 4x faster, cheap
                                         # compile)

    # --- MHD gas (cpp flag MHD; module mpi_tvd_mhd) ---
    mhd: bool = False
    gas_gamma: float = 5.0 / 3.0
    gas_p_init: float = 1.0e-8   # initial gas pressure (cold start)
    gas_from_delta: bool = True  # gas ICs trace the matter field (mhd_init);
                                 # False forces gas_ic="uniform"
    gas_ic: str = "particles"    # structured-gas IC construction
                                 # (utils/mhd_init/mhd_init.f90):
                                 # "particles" = CIC-deposit the DISPLACED
                                 #   Zel'dovich particles' mass/momentum/
                                 #   kinetic energy onto the gas grid
                                 #   (GetU, mhd_init.f90:774-885 — the
                                 #   reference's production construction)
                                 # "delta" = Eulerian delta-traced fields
                                 #   (rho = 1+delta, mom = rho vf psi) —
                                 #   the round-3 approximation, kept for
                                 #   comparison
    gas_cmb_coupling: bool = True  # z_i > 150 thermal floor from the CMB
                                 # temperature (mhd_init.f90 CMB_coupling
                                 # flag; no-op at lower starting z)
    ic_correct_kernel: bool = False  # Ewald-matched IC potential kernel
                                     # (dist_init correct_kernel option)

    # --- lifecycle / outputs ---
    coarse_ps: bool = False     # per-step coarse-grid P(k) diagnostic
                                # (coarse_ps flag, coarse_power.f90)
    shake: bool = True          # DISP_MESH random mesh shake each step
    move_grid_back: bool = True # subtract accumulated shake before outputs
    pid: bool = True            # track particle IDs (PID_FLAG)
    verbosity: int = 1

    # ------------------------------------------------------------------
    # derived geometry
    # ------------------------------------------------------------------
    @property
    def nf_buf(self) -> int:
        return self.nf_cutoff + self.buf_extra

    @property
    def nf_physical_tile_dim(self) -> int:
        return self.nf_tile - 2 * self.nf_buf

    @property
    def nf_physical_node_dim(self) -> int:
        return self.nf_physical_tile_dim * self.tiles_node_dim

    @property
    def nf_physical_dim(self) -> int:
        """Global fine mesh cells per axis."""
        return self.nf_physical_node_dim * self.nodes_dim

    @property
    def fine_solve_pad(self) -> int:
        """FFT size of the fine solve: the halo-padded node (or tile, when
        fine_fft_tiles > 1) — also the fine kernel's spectrum size."""
        return (self.nf_physical_node_dim // self.fine_fft_tiles
                + 2 * self.nf_buf)

    @property
    def nodes(self) -> int:
        return self.nodes_dim ** 3

    @property
    def tiles_node(self) -> int:
        return self.tiles_node_dim ** 3

    # coarse mesh
    @property
    def nc_tile_dim(self) -> int:
        return self.nf_physical_tile_dim // self.mesh_scale

    @property
    def nc_node_dim(self) -> int:
        return self.nf_physical_node_dim // self.mesh_scale

    @property
    def nc_dim(self) -> int:
        """Global coarse mesh cells per axis."""
        return self.nf_physical_dim // self.mesh_scale

    @property
    def nc_buf(self) -> int:
        return self.nf_buf // self.mesh_scale

    # particles
    @property
    def np_total(self) -> int:
        return (self.nf_physical_dim // 2) ** 3

    @property
    def np_node_avg(self) -> int:
        return (self.nf_physical_node_dim // 2) ** 3

    @property
    def max_np(self) -> int:
        """Per-device particle capacity (cubepm.par:170-172 analog)."""
        return int(self.density_buffer * self.np_node_avg)

    @property
    def mass_p(self) -> float:
        """Particle mass in grid units: nf**3 / np_total = 8 at standard loading."""
        return float(self.nf_physical_dim) ** 3 / float(self.np_total)

    @property
    def pp_ext_band_eff(self) -> int:
        """Resolved lattice PP_EXT band: explicit `pp_ext_band`, or 4x the
        mean super-cell occupancy ((2*pp_range)^3 fine cells each), rounded
        up to a multiple of 32.  At standard loading (1 particle / 8 fine
        cells) and pp_range=2 the mean is 8 and the floor of 64 governs.
        CLAMPED to `pp_ext_band_cap`: a band pays O(band) on EVERY
        particle, so occupancy beyond the cap belongs in the dense tail
        (which only dense-cell particles pay for) — a resumed checkpoint
        whose stored sizing predates the cap (e.g. the band-8192 r7
        ratchet leg) is silently re-routed to the band+tail split, with
        the stored pp_dense_band (>= 2x the stored band under the old
        growth rule) covering the same occupancy."""
        if self.pp_ext_band:
            return min(self.pp_ext_band, self.pp_ext_band_cap)
        mean = ((2 * self.pp_range) ** 3 * float(self.np_total)
                / float(self.nf_physical_dim) ** 3)
        return min(max(64, int(-(-4.0 * mean // 32)) * 32),
                   self.pp_ext_band_cap)

    @property
    def pp_ext_dense_cap_eff(self) -> int:
        """Resolved lattice PP_EXT tail buffer: explicit or the shared
        PPINT dense cap."""
        return self.pp_ext_dense_cap or max(
            64, int(self.max_np * self.pp_dense_cap_frac))

    @property
    def pp_ext_tail_band_eff(self) -> int:
        """Resolved lattice PP_EXT tail window: explicit
        `pp_ext_tail_band` or the shared `pp_dense_band`, floored at 2x
        the band (a tail narrower than the band would silently cover
        nothing — the lattice counts but cannot absorb the residual)."""
        base = self.pp_ext_tail_band or self.pp_dense_band
        return max(base, 2 * self.pp_ext_band_eff)

    def pp_ext_ghost_cap_auto(self) -> int:
        """Per-face ghost buffer for the lattice PP_EXT: the mean
        population of a pp_range-deep face skin, with 4x clustering
        headroom (overflow is counted and pp_autosize doubles it)."""
        nf = self.nf_physical_node_dim
        return max(256, int(4.0 * self.max_np * self.pp_range / nf))

    @property
    def a_i(self) -> float:
        return 1.0 / (1.0 + self.z_i)

    # ------------------------------------------------------------------
    # validation + sizing
    # ------------------------------------------------------------------
    def validate(self) -> None:
        if self.nf_physical_tile_dim <= 0:
            raise ValueError(
                f"nf_tile={self.nf_tile} must exceed 2*nf_buf={2 * self.nf_buf}")
        if self.nf_physical_tile_dim % self.mesh_scale != 0:
            raise ValueError(
                "nf_physical_tile_dim must be divisible by mesh_scale "
                f"({self.nf_physical_tile_dim} % {self.mesh_scale})")
        if self.nf_buf % self.mesh_scale != 0:
            raise ValueError("nf_buf must be divisible by mesh_scale")
        if self.nc_dim % self.nodes_dim != 0:
            raise ValueError("coarse mesh must divide evenly across devices")
        if self.pp_ext and self.pp_range + 1 > self.nf_cutoff:
            raise ValueError("pp_range+1 must be < nf_cutoff")
        if self.nf_physical_node_dim % self.fine_fft_tiles != 0:
            raise ValueError("fine_fft_tiles must divide the node size")
        if self.gas_ic not in ("particles", "delta"):
            raise ValueError(f"gas_ic={self.gas_ic!r} must be "
                             "'particles' or 'delta'")

    def memory_estimate(self) -> dict:
        """Static per-device memory budget in bytes (mem_usage.f90 analog)."""
        f4 = 4
        nf_node = self.nf_physical_node_dim
        nf_halo = nf_node + 2 * self.nf_buf
        est = {
            "particles_xv": self.max_np * 6 * f4,
            "particles_pid": self.max_np * 8 if self.pid else 0,
            "fine_density_halo": nf_halo ** 3 * f4,
            "fine_force": 3 * nf_node ** 3 * f4,
            "fine_kernel_k": 3 * (self.nf_tile // 2 + 1) * self.nf_tile ** 2 * 2 * f4,
            "coarse_density": (self.nc_node_dim + 2) ** 3 * f4,
            "coarse_force": 3 * (self.nc_node_dim + 2) ** 3 * f4,
            "coarse_kernel_k": 3 * (self.nc_dim // 2 + 1) * self.nc_dim
                               * (self.nc_dim // self.nodes) * 2 * f4,
        }
        est["total"] = sum(est.values())
        return est

    def summary(self) -> str:
        m = self.memory_estimate()
        return (
            f"cubep3m_tpu config: {self.np_total} particles "
            f"({self.nf_physical_dim // 2}^3), fine mesh {self.nf_physical_dim}^3, "
            f"coarse {self.nc_dim}^3, devices {self.nodes} "
            f"({self.nodes_dim}^3), tiles/device {self.tiles_node}, "
            f"tile {self.nf_tile}^3 (physical {self.nf_physical_tile_dim}^3), "
            f"max_np/device {self.max_np}, est. memory "
            f"{m['total'] / 2**30:.2f} GiB/device"
        )


def small_config(nodes_dim: int = 1, tiles_node_dim: int = 2,
                nf_tile: int = 40, **kw) -> SimConfig:
    """Small config for unit tests: cutoff 8, buf 12, tile 40 -> physical 16."""
    defaults = dict(
        nodes_dim=nodes_dim, tiles_node_dim=tiles_node_dim, nf_tile=nf_tile,
        nf_cutoff=8, buf_extra=4, box=20.0, shake=False, pid=False,
    )
    defaults.update(kw)
    cfg = SimConfig(**defaults)
    cfg.validate()
    return cfg
