// pcr_tpu native host router — fused assign/flatten/pack kernels.
//
// The reference implements routing in C++ (src/engine/tile_router.cpp:89-122
// assign; OpenMP). On this framework the device does the heavy accumulation,
// but the per-point world→cell math still runs on the host in float64 for
// geo precision; this kernel fuses what the numpy path does in ~10 memory
// passes (bounds test, two floor-divides, clamps, flatten, invalid-sentinel
// encode) into one OpenMP pass.
//
// Semantics are bit-identical to GridConfig::world_to_cell
// (grid_config.cpp:24-43): bbox-inclusive contains, floor, clamp to range.
//
// Built as a plain C ABI shared library; loaded via ctypes
// (pcr_tpu/native/__init__.py). No Python headers needed.

#include <cstdint>
#include <cmath>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// world→cell assignment: col/row (clamped) + valid mask.
void pcr_assign(const double* x, const double* y, int64_t n,
                double min_x, double min_y, double max_x, double max_y,
                double origin_x, double origin_y,
                double inv_csx, double inv_csy,
                int32_t width, int32_t height,
                int32_t* out_col, int32_t* out_row, uint8_t* out_valid)
{
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        const double wx = x[i];
        const double wy = y[i];
        const bool ok = (wx >= min_x) & (wx <= max_x)
                      & (wy >= min_y) & (wy <= max_y);
        int64_t col = (int64_t)std::floor((wx - origin_x) * inv_csx);
        int64_t row = (int64_t)std::floor((wy - origin_y) * inv_csy);
        if (col < 0) col = 0;
        if (col > width - 1) col = width - 1;
        if (row < 0) row = 0;
        if (row > height - 1) row = height - 1;
        out_col[i] = ok ? (int32_t)col : 0;
        out_row[i] = ok ? (int32_t)row : 0;
        out_valid[i] = ok ? 1 : 0;
    }
}

// Fused assign + flatten + sentinel encode: flat cell id, or `sentinel`
// for out-of-bounds points (the device scatter drops them).
void pcr_assign_cells(const double* x, const double* y, int64_t n,
                      double min_x, double min_y, double max_x, double max_y,
                      double origin_x, double origin_y,
                      double inv_csx, double inv_csy,
                      int32_t width, int32_t height, int32_t sentinel,
                      int32_t* out_cells)
{
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        const double wx = x[i];
        const double wy = y[i];
        const bool ok = (wx >= min_x) & (wx <= max_x)
                      & (wy >= min_y) & (wy <= max_y);
        int64_t col = (int64_t)std::floor((wx - origin_x) * inv_csx);
        int64_t row = (int64_t)std::floor((wy - origin_y) * inv_csy);
        if (col < 0) col = 0;
        if (col > width - 1) col = width - 1;
        if (row < 0) row = 0;
        if (row > height - 1) row = height - 1;
        out_cells[i] = ok ? (int32_t)(row * (int64_t)width + col) : sentinel;
    }
}

// Fused fractional-cell computation for glyph footprints
// (glyph_kernels.cu:119-123): integer center cell + float32 sub-cell offset.
void pcr_fractional_cells(const double* x, const double* y, int64_t n,
                          double origin_x, double origin_y,
                          double inv_csx, double inv_csy,
                          int32_t* out_icx, int32_t* out_icy,
                          float* out_sub_cx, float* out_sub_cy)
{
#pragma omp parallel for schedule(static)
    const double lim = 1073741824.0;   // clamp to int32-safe range before
    for (int64_t i = 0; i < n; ++i) {  // casting (wild out-of-bounds points)
        const double fcx = (x[i] - origin_x) * inv_csx;
        const double fcy = (y[i] - origin_y) * inv_csy;
        double icx = std::floor(fcx);
        double icy = std::floor(fcy);
        if (icx > lim) icx = lim;
        if (icx < -lim) icx = -lim;
        if (icy > lim) icy = lim;
        if (icy < -lim) icy = -lim;
        out_icx[i] = (int32_t)icx;
        out_icy[i] = (int32_t)icy;
        out_sub_cx[i] = (float)(fcx - icx);
        out_sub_cy[i] = (float)(fcy - icy);
    }
}

int pcr_native_version() { return 1; }

int pcr_native_threads()
{
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

} // extern "C"
