// Native mesh-ingestion core: triangle-soup voxelization + greedy box cover.
//
// The reference gets its asset pipeline (FBX import, mesh processing, baked
// occlusion data) from Unity's native C++ engine; this is the framework's
// equivalent for the ingestion bake (models/voxelize.py documents the
// algorithm and remains the reference implementation + fallback). The C++
// core mirrors the numpy semantics BIT-EXACTLY — same sample positions
// (double math), same float32 density accumulation order, same first-max
// argmax tie-break, same float64 slab-fill compares — so the Python tests
// assert equality, not tolerance.
//
// Build (done on demand by volumetricrenderer_tpu/io/native.py):
//   g++ -O3 -shared -fPIC -std=c++17 native/ingest.cpp -o libvringest.so
//
// C ABI only: consumed via ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <vector>

extern "C" {

// Grid geometry for a mesh AABB: mirrors voxelize_triangles' header math.
// Returns dims[3], origin[3] (f32), voxel[3] (f32).
void vr_voxel_grid(const double* verts, int64_t n_verts, int res, double pad,
                   int32_t* dims_out, float* origin_out, float* voxel_out) {
    double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
    for (int64_t i = 0; i < n_verts; ++i) {
        for (int a = 0; a < 3; ++a) {
            double v = verts[i * 3 + a];
            lo[a] = std::min(lo[a], v);
            hi[a] = std::max(hi[a], v);
        }
    }
    double diag = 0.0;
    for (int a = 0; a < 3; ++a) diag += (hi[a] - lo[a]) * (hi[a] - lo[a]);
    diag = std::sqrt(diag);
    double ext[3], longest = 0.0;
    for (int a = 0; a < 3; ++a) {
        lo[a] -= pad * diag;
        hi[a] += pad * diag;
        ext[a] = hi[a] - lo[a];
        longest = std::max(longest, ext[a]);
    }
    for (int a = 0; a < 3; ++a) {
        int d = (int)(ext[a] / longest * (double)res);   // trunc, as .astype(int)
        dims_out[a] = std::max(d, 1);
        origin_out[a] = (float)lo[a];
        voxel_out[a] = (float)(ext[a] / (double)dims_out[a]);
    }
}

// Surface-sample triangles into an occupancy grid (voxelize_triangles body).
// occ_out: dims[0]*dims[1]*dims[2] bytes, C-order, caller-zeroed. dims must
// come from vr_voxel_grid(verts, res, pad); the double-precision AABB /
// voxel math is recomputed here so the cell indices match numpy's float64
// path exactly (the f32 origin/voxel returned to Python are display-only).
void vr_voxelize(const double* verts, int64_t n_verts,
                 const int32_t* tris, int64_t n_tris,
                 int res, double pad, const int32_t* dims, uint8_t* occ_out) {
    const int64_t nx = dims[0], ny = dims[1], nz = dims[2];
    double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
    for (int64_t i = 0; i < n_verts; ++i)
        for (int a = 0; a < 3; ++a) {
            double v = verts[i * 3 + a];
            lo[a] = std::min(lo[a], v);
            hi[a] = std::max(hi[a], v);
        }
    double diag = 0.0;
    for (int a = 0; a < 3; ++a) diag += (hi[a] - lo[a]) * (hi[a] - lo[a]);
    diag = std::sqrt(diag);
    (void)res;
    double origin[3], voxel[3];
    for (int a = 0; a < 3; ++a) {
        origin[a] = lo[a] - pad * diag;
        voxel[a] = ((hi[a] + pad * diag) - origin[a])
                   / (double)dims[a];
    }
    double vmin = std::min(voxel[0], std::min(voxel[1], voxel[2]));
    const double step = vmin * 0.5;
    for (int64_t t = 0; t < n_tris; ++t) {
        double a[3], b[3], c[3];
        for (int k = 0; k < 3; ++k) {
            a[k] = verts[(int64_t)tris[t * 3 + 0] * 3 + k];
            b[k] = verts[(int64_t)tris[t * 3 + 1] * 3 + k];
            c[k] = verts[(int64_t)tris[t * 3 + 2] * 3 + k];
        }
        auto elen = [](const double* p, const double* q) {
            double s = 0.0;
            for (int k = 0; k < 3; ++k) s += (q[k] - p[k]) * (q[k] - p[k]);
            return std::sqrt(s);
        };
        double emax = std::max(elen(a, b), std::max(elen(a, c), elen(b, c)));
        // numpy: clip(int64(emax/step) + 1, 1, 64). Branch BEFORE the int
        // cast — a near-degenerate grid (pad=0 on a near-planar mesh drives
        // step -> ~0) would otherwise overflow the cast (UB). numpy's own
        // int64 cast of NaN / inf / >= 2^63 yields INT64_MIN (x86
        // cvttsd2si), which +1 then clips to 1 — mirror that exactly.
        double ratio = emax / step;
        int n;
        if (!(ratio >= 0.0) || ratio >= 9223372036854775808.0) n = 1;
        else if (ratio >= 63.0) n = 64;
        else n = (int)ratio + 1;
        for (int iu = 0; iu <= n; ++iu) {
            double u = n ? (double)iu / (double)n : 0.0;
            for (int iw = 0; iw <= n - iu; ++iw) {
                double w = n ? (double)iw / (double)n : 0.0;
                double one = 1.0 - u - w;
                int64_t idx[3];
                for (int k = 0; k < 3; ++k) {
                    double p = a[k] * one + b[k] * u + c[k] * w;
                    int64_t q = (int64_t)((p - origin[k]) / voxel[k]);
                    int64_t dmax = (k == 0 ? nx : (k == 1 ? ny : nz)) - 1;
                    idx[k] = std::min(std::max(q, (int64_t)0), dmax);
                }
                occ_out[(idx[0] * ny + idx[1]) * nz + idx[2]] = 1;
            }
        }
    }
}

// Greedy box cover (boxes_from_occupancy): returns n boxes as 7 floats each
// (bmin xyz, bmax xyz, opacity), world coords origin + index * voxel.
int32_t vr_greedy_boxes(const uint8_t* occ_in, const int32_t* dims,
                        const float* origin, const float* voxel,
                        int32_t max_boxes, double fill_thresh, double coverage,
                        float* boxes_out) {
    const int64_t nx = dims[0], ny = dims[1], nz = dims[2];
    const int64_t n = nx * ny * nz;
    std::vector<uint8_t> occ(occ_in, occ_in + n);
    std::vector<uint8_t> covered(n, 0), remaining(occ_in, occ_in + n);
    int64_t total = 0;
    for (int64_t i = 0; i < n; ++i) total += occ[i] ? 1 : 0;
    if (total == 0) return 0;

    auto at = [&](const std::vector<uint8_t>& g, int64_t x, int64_t y,
                  int64_t z) -> uint8_t {
        return g[(x * ny + y) * nz + z];
    };

    // 3x3x3 box-filtered occupancy count, float32 accumulation in the same
    // (dx, dy, dz) slice order as the numpy density() for bit-equal argmax.
    // Each offset adds a CONTIGUOUS z-run (clamped overlap ranges, no
    // per-element bounds checks) so gcc vectorizes the u8 -> f32 adds —
    // this is the numpy padded-slice formulation, not a stencil loop.
    std::vector<float> s(n);
    auto density_argmax = [&]() -> int64_t {
        std::fill(s.begin(), s.end(), 0.0f);
        for (int dx = -1; dx <= 1; ++dx)
            for (int dy = -1; dy <= 1; ++dy)
                for (int dz = -1; dz <= 1; ++dz) {
                    const int64_t x0 = std::max<int64_t>(0, -dx);
                    const int64_t x1 = std::min<int64_t>(nx, nx - dx);
                    const int64_t y0 = std::max<int64_t>(0, -dy);
                    const int64_t y1 = std::min<int64_t>(ny, ny - dy);
                    const int64_t z0 = std::max<int64_t>(0, -dz);
                    const int64_t z1 = std::min<int64_t>(nz, nz - dz);
                    for (int64_t x = x0; x < x1; ++x)
                        for (int64_t y = y0; y < y1; ++y) {
                            float* dst = &s[(x * ny + y) * nz + z0];
                            const uint8_t* src =
                                &remaining[((x + dx) * ny + (y + dy)) * nz
                                           + z0 + dz];
                            const int64_t len = z1 - z0;
                            for (int64_t z = 0; z < len; ++z)
                                dst[z] += (float)src[z];
                        }
                }
        int64_t best = 0;
        float bv = s[0];
        for (int64_t i = 1; i < n; ++i)
            if (s[i] > bv) { bv = s[i]; best = i; }
        return best;
    };

    auto covered_count = [&]() -> int64_t {
        int64_t c = 0;
        for (int64_t i = 0; i < n; ++i) c += (occ[i] && covered[i]) ? 1 : 0;
        return c;
    };
    auto any_remaining = [&]() -> bool {
        for (int64_t i = 0; i < n; ++i) if (remaining[i]) return true;
        return false;
    };

    int32_t n_boxes = 0;
    while (n_boxes < max_boxes &&
           (double)covered_count() < coverage * (double)total &&
           any_remaining()) {
        int64_t seed = density_argmax();
        int64_t b0[3] = {seed / (ny * nz), (seed / nz) % ny, seed % nz};
        int64_t b1[3] = {b0[0] + 1, b0[1] + 1, b0[2] + 1};
        const int64_t dmax[3] = {nx, ny, nz};
        bool grew = true;
        while (grew) {
            grew = false;
            for (int axis = 0; axis < 3; ++axis) {
                for (int sign = -1; sign <= 1; sign += 2) {
                    int64_t s0[3] = {b0[0], b0[1], b0[2]};
                    int64_t s1[3] = {b1[0], b1[1], b1[2]};
                    if (sign < 0) {
                        if (b0[axis] == 0) continue;
                        s0[axis] = b0[axis] - 1;
                        s1[axis] = b0[axis];
                    } else {
                        if (b1[axis] == dmax[axis]) continue;
                        s0[axis] = b1[axis];
                        s1[axis] = b1[axis] + 1;
                    }
                    // slab spans the grown box extents on the other axes
                    for (int a2 = 0; a2 < 3; ++a2) {
                        if (a2 == axis) continue;
                        s0[a2] = b0[a2];
                        s1[a2] = b1[a2];
                    }
                    int64_t cnt = 0, sz = 0;
                    for (int64_t x = s0[0]; x < s1[0]; ++x)
                        for (int64_t y = s0[1]; y < s1[1]; ++y)
                            for (int64_t z = s0[2]; z < s1[2]; ++z) {
                                cnt += at(occ, x, y, z) ? 1 : 0;
                                ++sz;
                            }
                    double frac = sz ? (double)cnt / (double)sz : 0.0;
                    if (frac >= fill_thresh) {
                        if (sign < 0) b0[axis] -= 1; else b1[axis] += 1;
                        grew = true;
                    }
                }
            }
        }
        for (int64_t x = b0[0]; x < b1[0]; ++x)
            for (int64_t y = b0[1]; y < b1[1]; ++y)
                for (int64_t z = b0[2]; z < b1[2]; ++z) {
                    covered[(x * ny + y) * nz + z] = 1;
                    remaining[(x * ny + y) * nz + z] = 0;
                }
        // opacity: mean over the 3 axes of (projection .any() coverage)
        double axmean[3];
        const int64_t e[3] = {b1[0] - b0[0], b1[1] - b0[1], b1[2] - b0[2]};
        for (int axis = 0; axis < 3; ++axis) {
            int a1 = (axis + 1) % 3, a2 = (axis + 2) % 3;
            if (a1 > a2) std::swap(a1, a2);      // projection plane order
            int64_t hitcells = 0, cells = e[a1] * e[a2];
            for (int64_t i = 0; i < e[a1]; ++i)
                for (int64_t j = 0; j < e[a2]; ++j) {
                    int64_t q[3];
                    q[a1] = b0[a1] + i;
                    q[a2] = b0[a2] + j;
                    bool any = false;
                    for (int64_t k = 0; k < e[axis] && !any; ++k) {
                        q[axis] = b0[axis] + k;
                        any = at(occ, q[0], q[1], q[2]) != 0;
                    }
                    hitcells += any ? 1 : 0;
                }
            axmean[axis] = cells ? (double)hitcells / (double)cells : 0.0;
        }
        double opacity = (axmean[0] + axmean[1] + axmean[2]) / 3.0;
        float* out = boxes_out + (int64_t)n_boxes * 7;
        for (int a = 0; a < 3; ++a) {
            // numpy promotes int64 * float32 to float64 and rounds ONCE on
            // the f32 cast — compute in double to match that rounding
            out[a] = (float)((double)origin[a]
                             + (double)b0[a] * (double)voxel[a]);
            out[3 + a] = (float)((double)origin[a]
                                 + (double)b1[a] * (double)voxel[a]);
        }
        out[6] = (float)opacity;
        ++n_boxes;
    }
    return n_boxes;
}

}  // extern "C"
