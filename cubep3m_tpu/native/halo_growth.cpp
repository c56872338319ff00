// Exclusive spherical-overdensity growth — the inherently sequential core
// of the halofinder (reference: source_threads/halofind.f90:683-717, the
// per-peak shell walk with consumed-mass zeroing).  The surrounding
// pipeline (density, peaks, statistics) runs on the TPU; this loop is
// data-dependent and serial by construction (mass exclusivity), so it runs
// native on the host.  Plain C ABI, loaded via ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC halo_growth.cpp -o libhalogrowth.so
#include <cstdint>
#include <cmath>

extern "C" {

// rho: nf^3 density grid (row-major), modified in place (consumed cells
//      zeroed).
// peaks: (npeaks, 3) int64 cell indices, density-sorted descending.
// offsets: (noff, 3) int64 shell offsets sorted by radius; rdist: (noff).
// out_mass/out_radius/out_stop: per-peak results; out_kept: 1 if the halo
//      passed min_mass and consumed its cells, else 0.
void grow_halos(float* rho, int64_t nf,
                const int64_t* peaks, int64_t npeaks,
                const int64_t* offsets, const float* rdist, int64_t noff,
                float odc, float min_mass,
                float* out_mass, float* out_radius, int32_t* out_kept,
                int64_t* out_ncells) {
  const int64_t nf2 = nf * nf;
  for (int64_t h = 0; h < npeaks; ++h) {
    const int64_t cx = peaks[3 * h];
    const int64_t cy = peaks[3 * h + 1];
    const int64_t cz = peaks[3 * h + 2];
    out_kept[h] = 0;
    out_mass[h] = 0.0f;
    out_radius[h] = 0.0f;
    out_ncells[h] = 0;
    if (rho[cx * nf2 + cy * nf + cz] <= 0.0f) continue;  // consumed

    double csum = 0.0;
    int64_t stop = noff;
    for (int64_t i = 0; i < noff; ++i) {
      int64_t x = cx + offsets[3 * i];
      int64_t y = cy + offsets[3 * i + 1];
      int64_t z = cz + offsets[3 * i + 2];
      // periodic wrap (offsets bounded by nf/4 in practice)
      x += (x < 0) ? nf : 0; x -= (x >= nf) ? nf : 0;
      y += (y < 0) ? nf : 0; y -= (y >= nf) ? nf : 0;
      z += (z < 0) ? nf : 0; z -= (z >= nf) ? nf : 0;
      csum += rho[x * nf2 + y * nf + z];
      // mean overdensity over consumed cell volume (mean density = 1)
      if (i > 0 && csum / double(i + 1) < odc) { stop = i; break; }
    }
    if (stop < 1) stop = 1;
    // csum includes the threshold-breaking cell when stop < noff;
    // the halo mass/zeroing cover cells [0, stop) only
    double mass_in = csum;
    if (stop < noff) {
      int64_t x = cx + offsets[3 * stop];
      int64_t y = cy + offsets[3 * stop + 1];
      int64_t z = cz + offsets[3 * stop + 2];
      x += (x < 0) ? nf : 0; x -= (x >= nf) ? nf : 0;
      y += (y < 0) ? nf : 0; y -= (y >= nf) ? nf : 0;
      z += (z < 0) ? nf : 0; z -= (z >= nf) ? nf : 0;
      mass_in -= rho[x * nf2 + y * nf + z];
    }
    if (mass_in < min_mass) continue;

    // zero consumed cells [0, stop)
    for (int64_t i = 0; i < stop; ++i) {
      int64_t x = cx + offsets[3 * i];
      int64_t y = cy + offsets[3 * i + 1];
      int64_t z = cz + offsets[3 * i + 2];
      x += (x < 0) ? nf : 0; x -= (x >= nf) ? nf : 0;
      y += (y < 0) ? nf : 0; y -= (y >= nf) ? nf : 0;
      z += (z < 0) ? nf : 0; z -= (z >= nf) ? nf : 0;
      rho[x * nf2 + y * nf + z] = 0.0f;
    }
    out_mass[h] = float(mass_in);
    out_radius[h] = (stop > 1) ? rdist[stop - 1] : 1.0f;
    out_kept[h] = 1;
    out_ncells[h] = stop;  // actual mean overdensity = mass_in / stop
  }
}

}  // extern "C"
