// FastBlend PatchMatch kernels, native CPU implementation.
//
// TPU-native counterpart of the reference CuPy RawKernel CUDA kernels
// (/root/reference/diffsynth/extensions/FastBlend/cupy_kernels.py:3-119):
// identical semantics (padded NHWC layout, patch-averaged remap, SSD patch
// errors), exposed via a C ABI for ctypes. The host CPU runs these during
// video post-processing while the TPU is busy with the diffusion loop; a
// pure-XLA backend exists for on-device batch use.
//
// Build: g++ -O3 -shared -fPIC -o libfastblend.so fastblend_kernels.cpp

#include <cstdint>
#include <cstring>

extern "C" {

// target_style must be zero-initialized, shape (B, H+2p, W+2p, C).
void remap(int batch, int height, int width, int channel, int patch_size,
           int pad_size, const float* source_style, const int* nnf,
           float* target_style) {
    const int r = (patch_size - 1) / 2;
    const int ph = height + pad_size * 2;
    const int pw = width + pad_size * 2;
    for (int b = 0; b < batch; ++b) {
        const int64_t z = (int64_t)b * ph * pw * channel;
        const int* nnf_b = nnf + (int64_t)b * height * width * 2;
        for (int x = 0; x < height; ++x) {
            for (int y = 0; y < width; ++y) {
                const int64_t pid = ((int64_t)(x + pad_size) * pw + (y + pad_size));
                const int min_px = x < r ? -x : -r;
                const int max_px = x + r > height - 1 ? height - 1 - x : r;
                const int min_py = y < r ? -y : -r;
                const int max_py = y + r > width - 1 ? width - 1 - y : r;
                int num = 0;
                float* out = target_style + z + pid * channel;
                for (int px = min_px; px <= max_px; ++px) {
                    for (int py = min_py; py <= max_py; ++py) {
                        const int nid = (x + px) * width + y + py;
                        const int x_ = nnf_b[nid * 2 + 0] - px;
                        const int y_ = nnf_b[nid * 2 + 1] - py;
                        if (x_ < 0 || y_ < 0 || x_ >= height || y_ >= width) continue;
                        const int64_t pid_ = ((int64_t)(x_ + pad_size) * pw + (y_ + pad_size));
                        ++num;
                        const float* src = source_style + z + pid_ * channel;
                        for (int c = 0; c < channel; ++c) out[c] += src[c];
                    }
                }
                if (num > 0) {
                    const float inv = 1.0f / num;
                    for (int c = 0; c < channel; ++c) out[c] *= inv;
                }
            }
        }
    }
}

void patch_error(int batch, int height, int width, int channel, int patch_size,
                 int pad_size, const float* source, const int* nnf,
                 const float* target, float* error) {
    const int r = (patch_size - 1) / 2;
    const int pw = width + pad_size * 2;
    const int ph = height + pad_size * 2;
    for (int b = 0; b < batch; ++b) {
        const int64_t z = (int64_t)b * ph * pw * channel;
        const int* nnf_b = nnf + (int64_t)b * height * width * 2;
        for (int x = 0; x < height; ++x) {
            for (int y = 0; y < width; ++y) {
                const int x_ = nnf_b[(x * width + y) * 2 + 0];
                const int y_ = nnf_b[(x * width + y) * 2 + 1];
                float e = 0.f;
                for (int px = -r; px <= r; ++px) {
                    for (int py = -r; py <= r; ++py) {
                        const int64_t pid = ((int64_t)(x + pad_size + px) * pw + y + pad_size + py);
                        const int64_t pid_ = ((int64_t)(x_ + pad_size + px) * pw + y_ + pad_size + py);
                        const float* t = target + z + pid * channel;
                        const float* s = source + z + pid_ * channel;
                        for (int c = 0; c < channel; ++c) {
                            const float diff = t[c] - s[c];
                            e += diff * diff;
                        }
                    }
                }
                error[(int64_t)b * height * width + x * width + y] = e;
            }
        }
    }
}

void pairwise_patch_error(int batch, int height, int width, int channel,
                          int patch_size, int pad_size, const float* source_a,
                          const int* nnf_a, const float* source_b,
                          const int* nnf_b, float* error) {
    const int r = (patch_size - 1) / 2;
    const int pw = width + pad_size * 2;
    const int ph = height + pad_size * 2;
    for (int b = 0; b < batch; ++b) {
        const int64_t z = (int64_t)b * ph * pw * channel;
        const int* na = nnf_a + (int64_t)b * height * width * 2;
        const int* nb = nnf_b + (int64_t)b * height * width * 2;
        for (int x = 0; x < height; ++x) {
            for (int y = 0; y < width; ++y) {
                const int64_t zn = (int64_t)(x * width + y) * 2;
                const int xa = na[zn], ya = na[zn + 1];
                const int xb = nb[zn], yb = nb[zn + 1];
                float e = 0.f;
                for (int px = -r; px <= r; ++px) {
                    for (int py = -r; py <= r; ++py) {
                        const int64_t pa = ((int64_t)(xa + pad_size + px) * pw + ya + pad_size + py);
                        const int64_t pb = ((int64_t)(xb + pad_size + px) * pw + yb + pad_size + py);
                        const float* sa = source_a + z + pa * channel;
                        const float* sb = source_b + z + pb * channel;
                        for (int c = 0; c < channel; ++c) {
                            const float diff = sa[c] - sb[c];
                            e += diff * diff;
                        }
                    }
                }
                error[(int64_t)b * height * width + x * width + y] = e;
            }
        }
    }
}

}  // extern "C"
