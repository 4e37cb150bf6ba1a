// Native host-side geometry kernels for the data pipeline.
//
// The reference relies on numba-jitted mmdet3d ops for the GT-paste hot path
// (box_np_ops.points_in_rbbox, box_collision_test — SURVEY §2.2); here the
// equivalents are plain C++ with OpenMP-free threading kept simple (the
// loader already runs these inside worker threads). Exposed with C linkage
// for ctypes.
//
// Box layout: bottom-centered box7 rows (cx, cy, cz_bottom, w, l, h, yaw).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// points (n, stride) float32, boxes (m, 7) float32, out (n, m) uint8
void points_in_rbbox(const float* pts, int64_t n, int64_t stride,
                     const float* boxes, int64_t m, uint8_t* out) {
    for (int64_t j = 0; j < m; ++j) {
        const float* b = boxes + j * 7;
        const float cx = b[0], cy = b[1];
        const float cz = b[2] + 0.5f * b[5];
        const float hx = 0.5f * b[3], hy = 0.5f * b[4], hz = 0.5f * b[5];
        const float c = std::cos(b[6]), s = std::sin(b[6]);
        for (int64_t i = 0; i < n; ++i) {
            const float dx = pts[i * stride + 0] - cx;
            const float dy = pts[i * stride + 1] - cy;
            const float dz = pts[i * stride + 2] - cz;
            const float lx = dx * c + dy * s;
            const float ly = -dx * s + dy * c;
            out[i * m + j] =
                (std::fabs(lx) <= hx) && (std::fabs(ly) <= hy) &&
                (std::fabs(dz) <= hz);
        }
    }
}

static inline void bev_corners(const float* b, float* cx4, float* cy4) {
    const float hw = 0.5f * b[3], hl = 0.5f * b[4];
    const float c = std::cos(b[6]), s = std::sin(b[6]);
    const float xs[4] = {hw, hw, -hw, -hw};
    const float ys[4] = {hl, -hl, -hl, hl};
    for (int k = 0; k < 4; ++k) {
        cx4[k] = b[0] + xs[k] * c - ys[k] * s;
        cy4[k] = b[1] + xs[k] * s + ys[k] * c;
    }
}

// SAT overlap of two BEV rectangles given by corners
static bool rect_overlap(const float* ax, const float* ay, const float* bx,
                         const float* by) {
    const float* xs[2] = {ax, bx};
    const float* ys[2] = {ay, by};
    for (int r = 0; r < 2; ++r) {
        for (int e = 0; e < 4; ++e) {
            const int e2 = (e + 1) & 3;
            const float nx = -(ys[r][e2] - ys[r][e]);
            const float ny = xs[r][e2] - xs[r][e];
            float amin = 1e30f, amax = -1e30f, bmin = 1e30f, bmax = -1e30f;
            for (int k = 0; k < 4; ++k) {
                const float pa = ax[k] * nx + ay[k] * ny;
                const float pb = bx[k] * nx + by[k] * ny;
                amin = std::min(amin, pa); amax = std::max(amax, pa);
                bmin = std::min(bmin, pb); bmax = std::max(bmax, pb);
            }
            if (amax < bmin - 1e-6f || bmax < amin - 1e-6f) return false;
        }
    }
    return true;
}

// boxes_a (na, 7), boxes_b (nb, 7) -> out (na, nb) uint8
void box_collision_test(const float* boxes_a, int64_t na,
                        const float* boxes_b, int64_t nb, uint8_t* out) {
    for (int64_t i = 0; i < na; ++i) {
        float axs[4], ays[4];
        bev_corners(boxes_a + i * 7, axs, ays);
        for (int64_t j = 0; j < nb; ++j) {
            float bxs[4], bys[4];
            bev_corners(boxes_b + j * 7, bxs, bys);
            out[i * nb + j] = rect_overlap(axs, ays, bxs, bys);
        }
    }
}

// Remove points inside any box: returns new count, compacting `pts` in place
int64_t remove_points_in_boxes(float* pts, int64_t n, int64_t stride,
                               const float* boxes, int64_t m) {
    int64_t w = 0;
    for (int64_t i = 0; i < n; ++i) {
        bool inside = false;
        for (int64_t j = 0; j < m && !inside; ++j) {
            const float* b = boxes + j * 7;
            const float cz = b[2] + 0.5f * b[5];
            const float dx = pts[i * stride] - b[0];
            const float dy = pts[i * stride + 1] - b[1];
            const float dz = pts[i * stride + 2] - cz;
            const float c = std::cos(b[6]), s = std::sin(b[6]);
            const float lx = dx * c + dy * s;
            const float ly = -dx * s + dy * c;
            inside = (std::fabs(lx) <= 0.5f * b[3]) &&
                     (std::fabs(ly) <= 0.5f * b[4]) &&
                     (std::fabs(dz) <= 0.5f * b[5]);
        }
        if (!inside) {
            if (w != i)
                std::memmove(pts + w * stride, pts + i * stride,
                             sizeof(float) * stride);
            ++w;
        }
    }
    return w;
}

}  // extern "C"
