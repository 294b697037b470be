// Native host-side image preprocessing for the training data path.
//
// The reference's data layer is PIL + torchvision transforms inside torch
// DataLoader workers (/root/reference/src/dataset/stage2_dataset.py:76-121).
// This library provides the hot per-example ops as OpenMP-parallel C++,
// called from Python via ctypes (pcdms_tpu/data/native.py):
//
//   * bicubic resize (cv2 INTER_CUBIC convention, a = -0.75)
//   * [-1, 1] normalization and CLIP mean/std normalization
//   * side-by-side canvas compositing
//   * OpenPose-18 skeleton rasterization (limb ellipses + joint circles,
//     matching pcdms_tpu/pose/skeleton.py's drawing convention)
//
// All buffers are caller-allocated numpy arrays (uint8 HWC or float32 HWC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// bicubic resize (Keys kernel, a = -0.75, zero-padded edges clamped)
// ---------------------------------------------------------------------------

static inline float cubic_weight(float x) {
    const float a = -0.75f;
    x = std::fabs(x);
    if (x <= 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
    if (x < 2.0f) return ((a * x - 5.0f * a) * x + 8.0f * a) * x - 4.0f * a;
    return 0.0f;
}

// src: (sh, sw, c) uint8; dst: (dh, dw, c) uint8
void resize_bicubic_u8(const uint8_t* src, int sh, int sw, int c,
                       uint8_t* dst, int dh, int dw) {
    const float sy = static_cast<float>(sh) / dh;
    const float sx = static_cast<float>(sw) / dw;
#pragma omp parallel for schedule(static)
    for (int y = 0; y < dh; ++y) {
        const float fy = (y + 0.5f) * sy - 0.5f;
        const int iy = static_cast<int>(std::floor(fy));
        float wy[4];
        for (int k = 0; k < 4; ++k) wy[k] = cubic_weight(fy - (iy - 1 + k));
        for (int x = 0; x < dw; ++x) {
            const float fx = (x + 0.5f) * sx - 0.5f;
            const int ix = static_cast<int>(std::floor(fx));
            float wx[4];
            for (int k = 0; k < 4; ++k)
                wx[k] = cubic_weight(fx - (ix - 1 + k));
            for (int ch = 0; ch < c; ++ch) {
                float acc = 0.0f;
                for (int ky = 0; ky < 4; ++ky) {
                    const int yy = std::clamp(iy - 1 + ky, 0, sh - 1);
                    float row = 0.0f;
                    for (int kx = 0; kx < 4; ++kx) {
                        const int xx = std::clamp(ix - 1 + kx, 0, sw - 1);
                        row += wx[kx] * src[(yy * sw + xx) * c + ch];
                    }
                    acc += wy[ky] * row;
                }
                dst[(y * dw + x) * c + ch] = static_cast<uint8_t>(
                    std::clamp(acc + 0.5f, 0.0f, 255.0f));
            }
        }
    }
}

// ---------------------------------------------------------------------------
// normalization
// ---------------------------------------------------------------------------

// uint8 (n) flat -> float32 in [-1, 1]
void normalize_neg1_1(const uint8_t* src, float* dst, int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i)
        dst[i] = src[i] * (2.0f / 255.0f) - 1.0f;
}

// uint8 (h*w, 3) -> CLIP-normalized float32
void normalize_clip(const uint8_t* src, float* dst, int64_t pixels,
                    const float* mean, const float* std_) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < pixels; ++i) {
        for (int ch = 0; ch < 3; ++ch) {
            dst[i * 3 + ch] =
                (src[i * 3 + ch] / 255.0f - mean[ch]) / std_[ch];
        }
    }
}

// ---------------------------------------------------------------------------
// canvas compositing: dst (h, 2w, c) <- [left | right]
// ---------------------------------------------------------------------------

void compose_side_by_side(const uint8_t* left, const uint8_t* right,
                          uint8_t* dst, int h, int w, int c) {
    const int row_bytes = w * c;
#pragma omp parallel for schedule(static)
    for (int y = 0; y < h; ++y) {
        std::memcpy(dst + (int64_t)y * 2 * row_bytes,
                    left + (int64_t)y * row_bytes, row_bytes);
        if (right)
            std::memcpy(dst + (int64_t)y * 2 * row_bytes + row_bytes,
                        right + (int64_t)y * row_bytes, row_bytes);
        else
            std::memset(dst + (int64_t)y * 2 * row_bytes + row_bytes, 0,
                        row_bytes);
    }
}

// ---------------------------------------------------------------------------
// skeleton rasterizer (body-18)
// ---------------------------------------------------------------------------

static const int LIMB_SEQ[19][2] = {
    {2, 3}, {2, 6}, {3, 4}, {4, 5}, {6, 7}, {7, 8}, {2, 9}, {9, 10},
    {10, 11}, {2, 12}, {12, 13}, {13, 14}, {2, 1}, {1, 15}, {15, 17},
    {1, 16}, {16, 18}, {3, 17}, {6, 18}};

static const uint8_t COLORS[18][3] = {
    {255, 0, 0}, {255, 85, 0}, {255, 170, 0}, {255, 255, 0}, {170, 255, 0},
    {85, 255, 0}, {0, 255, 0}, {0, 255, 85}, {0, 255, 170}, {0, 255, 255},
    {0, 170, 255}, {0, 85, 255}, {0, 0, 255}, {85, 0, 255}, {170, 0, 255},
    {255, 0, 255}, {255, 0, 170}, {255, 0, 85}};

static inline void put_px(uint8_t* canvas, int h, int w, int y, int x,
                          const uint8_t* rgb) {
    if (y < 0 || y >= h || x < 0 || x >= w) return;
    uint8_t* p = canvas + ((int64_t)y * w + x) * 3;
    p[0] = rgb[0];
    p[1] = rgb[1];
    p[2] = rgb[2];
}

// filled rotated ellipse centered (cx, cy), semi-axes (ax, ay), angle rad
static void fill_ellipse(uint8_t* canvas, int h, int w, float cx, float cy,
                         float ax, float ay, float angle,
                         const uint8_t* rgb) {
    const float c = std::cos(angle), s = std::sin(angle);
    const float ext = std::max(ax, ay) + 1.0f;
    const int y0 = std::max(0, (int)std::floor(cy - ext));
    const int y1 = std::min(h - 1, (int)std::ceil(cy + ext));
    const int x0 = std::max(0, (int)std::floor(cx - ext));
    const int x1 = std::min(w - 1, (int)std::ceil(cx + ext));
    const float inv_ax2 = 1.0f / (ax * ax + 1e-9f);
    const float inv_ay2 = 1.0f / (ay * ay + 1e-9f);
    for (int y = y0; y <= y1; ++y) {
        for (int x = x0; x <= x1; ++x) {
            const float dx = x - cx, dy = y - cy;
            const float u = dx * c + dy * s;
            const float v = -dx * s + dy * c;
            if (u * u * inv_ax2 + v * v * inv_ay2 <= 1.0f)
                put_px(canvas, h, w, y, x, rgb);
        }
    }
}

static void fill_circle(uint8_t* canvas, int h, int w, int cx, int cy,
                        int r, const uint8_t* rgb) {
    for (int y = cy - r; y <= cy + r; ++y)
        for (int x = cx - r; x <= cx + r; ++x)
            if ((x - cx) * (x - cx) + (y - cy) * (y - cy) <= r * r)
                put_px(canvas, h, w, y, x, rgb);
}

// keypoints: (n_people, 18, 2) normalized xy; visible: (n_people, 18)
// canvas: (h, w, 3) uint8, caller-zeroed
void draw_bodypose_native(uint8_t* canvas, int h, int w,
                          const float* keypoints, const uint8_t* visible,
                          int n_people) {
    const int stickwidth = 4;
    for (int i = 0; i < 17; ++i) {
        const int a = LIMB_SEQ[i][0] - 1, b = LIMB_SEQ[i][1] - 1;
        for (int p = 0; p < n_people; ++p) {
            if (!visible[p * 18 + a] || !visible[p * 18 + b]) continue;
            const float xa = keypoints[(p * 18 + a) * 2 + 0] * w;
            const float ya = keypoints[(p * 18 + a) * 2 + 1] * h;
            const float xb = keypoints[(p * 18 + b) * 2 + 0] * w;
            const float yb = keypoints[(p * 18 + b) * 2 + 1] * h;
            const float mx = 0.5f * (xa + xb), my = 0.5f * (ya + yb);
            const float len =
                std::sqrt((xa - xb) * (xa - xb) + (ya - yb) * (ya - yb));
            const float angle = std::atan2(yb - ya, xb - xa);
            fill_ellipse(canvas, h, w, (float)(int)mx, (float)(int)my,
                         (float)(int)(len / 2), (float)stickwidth, angle,
                         COLORS[i]);
        }
    }
    // dim limbs to 0.6 (reference util.py:102)
    const int64_t total = (int64_t)h * w * 3;
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < total; ++i)
        canvas[i] = (uint8_t)(canvas[i] * 0.6f);

    for (int i = 0; i < 18; ++i) {
        for (int p = 0; p < n_people; ++p) {
            if (!visible[p * 18 + i]) continue;
            const int x = (int)(keypoints[(p * 18 + i) * 2 + 0] * w);
            const int y = (int)(keypoints[(p * 18 + i) * 2 + 1] * h);
            fill_circle(canvas, h, w, x, y, 4, COLORS[i]);
        }
    }
}

}  // extern "C"
