// Native data-path kernels for rdst_tpu (C ABI, ctypes-bound).
//
// The reference's data loader leans on native code throughout (cv2's C++
// for resize/blur, nibabel's C extensions for volume IO); this file is the
// framework's own native equivalent for the host-side hot path: bicubic
// LR synthesis (exact cv2 INTER_CUBIC semantics for float32: half-pixel
// coordinate mapping, 4-tap cubic with A = -0.75, replicated borders) and
// the flip/transpose primitives composing the sampler's dihedral-8
// patch augmentation. All
// entry points release no Python state (pure C ABI) so the sampler thread
// overlaps them with the main loop's dispatches.
//
// Build: g++ -O3 -march=native -shared -fPIC image_ops.cpp -o libimage_ops.so
// (auto-built on first import by rdst_tpu/native/__init__.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// cv2 INTER_CUBIC kernel (A = -0.75), 4 taps for fractional offset t
inline void cubic_coeffs(float t, float* w) {
    const float A = -0.75f;
    w[0] = ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A;
    w[1] = ((A + 2) * t - (A + 3)) * t * t + 1;
    w[2] = ((A + 2) * (1 - t) - (A + 3)) * (1 - t) * (1 - t) + 1;
    w[3] = 1.f - w[0] - w[1] - w[2];
}

inline int clampi(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

}  // namespace

extern "C" {

// Bicubic resize, float32 HWC, cv2 INTER_CUBIC-parity.
void rdst_resize_bicubic_f32(const float* src, int sh, int sw, int c,
                             float* dst, int dh, int dw) {
    const double sy = static_cast<double>(sh) / dh;
    const double sx = static_cast<double>(sw) / dw;

    std::vector<int> xi(dw);
    std::vector<float> xw(dw * 4);
    for (int ox = 0; ox < dw; ++ox) {
        double fx = (ox + 0.5) * sx - 0.5;
        int ix = static_cast<int>(std::floor(fx));
        cubic_coeffs(static_cast<float>(fx - ix), &xw[ox * 4]);
        xi[ox] = ix;
    }

    std::vector<float> row(static_cast<size_t>(sw) * c);
    for (int oy = 0; oy < dh; ++oy) {
        double fy = (oy + 0.5) * sy - 0.5;
        int iy = static_cast<int>(std::floor(fy));
        float wy[4];
        cubic_coeffs(static_cast<float>(fy - iy), wy);

        // vertical pass into a row buffer (border-replicated)
        for (int x = 0; x < sw; ++x) {
            for (int ch = 0; ch < c; ++ch) {
                float acc = 0.f;
                for (int k = 0; k < 4; ++k) {
                    int yy = clampi(iy - 1 + k, 0, sh - 1);
                    acc += wy[k] * src[(static_cast<size_t>(yy) * sw + x) * c + ch];
                }
                row[static_cast<size_t>(x) * c + ch] = acc;
            }
        }
        // horizontal pass
        for (int ox = 0; ox < dw; ++ox) {
            const float* w = &xw[ox * 4];
            for (int ch = 0; ch < c; ++ch) {
                float acc = 0.f;
                for (int k = 0; k < 4; ++k) {
                    int xx = clampi(xi[ox] - 1 + k, 0, sw - 1);
                    acc += w[k] * row[static_cast<size_t>(xx) * c + ch];
                }
                dst[(static_cast<size_t>(oy) * dw + ox) * c + ch] = acc;
            }
        }
    }
}

// Primitive: transpose HWC -> WHC
void rdst_transpose_f32(const float* src, int h, int w, int c, float* dst) {
    for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x)
            std::memcpy(&dst[(static_cast<size_t>(x) * h + y) * c],
                        &src[(static_cast<size_t>(y) * w + x) * c],
                        sizeof(float) * c);
}

// Primitive: flip up-down (rows reversed)
void rdst_flipud_f32(const float* src, int h, int w, int c, float* dst) {
    const size_t rowb = static_cast<size_t>(w) * c;
    for (int y = 0; y < h; ++y)
        std::memcpy(&dst[(static_cast<size_t>(h - 1 - y)) * rowb],
                    &src[static_cast<size_t>(y) * rowb], sizeof(float) * rowb);
}

// Primitive: flip left-right (cols reversed)
void rdst_fliplr_f32(const float* src, int h, int w, int c, float* dst) {
    for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x)
            std::memcpy(&dst[(static_cast<size_t>(y) * w + (w - 1 - x)) * c],
                        &src[(static_cast<size_t>(y) * w + x) * c],
                        sizeof(float) * c);
}

}  // extern "C"
