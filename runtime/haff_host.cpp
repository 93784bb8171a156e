// Native host data-path for haff_tpu.
//
// The training/inference hot loop feeds the TPU from the host; on small
// hosts the per-frame Python/cv2 work (resize-longest-side, normalize,
// pad, contour rasterization — reference aff_dataset.py:186-251) becomes
// the bottleneck. This library implements those transforms as tight
// single-pass C++ loops, exposed through a C ABI consumed via ctypes
// (haff_tpu/data/native.py). Python/cv2 remains the reference
// implementation and fallback.
//
// Build: cc -O3 -fPIC -shared runtime/haff_host.cpp -o runtime/libhaffhost.so
// (driven by haff_tpu/data/native.py on first use).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Bilinear resize uint8 HxWx3 -> OHxOWx3 (half-pixel centers, matching
// cv2.INTER_LINEAR sampling positions).
void resize_bilinear_u8(const uint8_t* src, int h, int w,
                        uint8_t* dst, int oh, int ow) {
  const float sy = (float)h / oh;
  const float sx = (float)w / ow;
  for (int oy = 0; oy < oh; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    int y1 = std::min(std::max(y0 + 1, 0), h - 1);
    y0 = std::min(std::max(y0, 0), h - 1);
    for (int ox = 0; ox < ow; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - x0;
      int x1 = std::min(std::max(x0 + 1, 0), w - 1);
      x0 = std::min(std::max(x0, 0), w - 1);
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(y0 * w + x0) * 3 + c];
        float v01 = src[(y0 * w + x1) * 3 + c];
        float v10 = src[(y1 * w + x0) * 3 + c];
        float v11 = src[(y1 * w + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(oy * ow + ox) * 3 + c] = (uint8_t)std::lround(v);
      }
    }
  }
}

// Fused SAM preprocess: resize longest side to `canvas`, normalize with
// (mean, std), zero-pad bottom/right into a canvas x canvas x 3 f32
// buffer. Returns packed (resize_h << 16) | resize_w.
//
// Single pass — resample, quantize to the uint8 grid (keeps the result
// on the same lattice as the two-pass resize-then-normalize reference),
// normalize, and store; column sample positions/weights are precomputed
// once instead of per row, and only the padding region is zeroed.
int sam_preprocess_f32(const uint8_t* src, int h, int w, int canvas,
                       const float* mean, const float* stdv, float* out) {
  float scale = (float)canvas / (h > w ? h : w);
  int rh = (int)(h * scale + 0.5f);
  int rw = (int)(w * scale + 0.5f);
  const float sy = (float)h / rh;
  const float sx = (float)w / rw;
  std::vector<int> x0s(rw), x1s(rw);
  std::vector<float> wxs(rw);
  for (int ox = 0; ox < rw; ++ox) {
    float fx = (ox + 0.5f) * sx - 0.5f;
    int x0 = (int)std::floor(fx);
    wxs[ox] = fx - x0;
    x1s[ox] = std::min(std::max(x0 + 1, 0), w - 1) * 3;
    x0s[ox] = std::min(std::max(x0, 0), w - 1) * 3;
  }
  const float inv_std[3] = {1.0f / stdv[0], 1.0f / stdv[1], 1.0f / stdv[2]};
  for (int oy = 0; oy < rh; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    int y1 = std::min(std::max(y0 + 1, 0), h - 1);
    y0 = std::min(std::max(y0, 0), h - 1);
    const uint8_t* r0 = src + (size_t)y0 * w * 3;
    const uint8_t* r1 = src + (size_t)y1 * w * 3;
    float* orow = out + (size_t)oy * canvas * 3;
    for (int ox = 0; ox < rw; ++ox) {
      const int x0 = x0s[ox], x1 = x1s[ox];
      const float wx = wxs[ox];
      const float w00 = (1 - wy) * (1 - wx), w01 = (1 - wy) * wx;
      const float w10 = wy * (1 - wx), w11 = wy * wx;
      for (int c = 0; c < 3; ++c) {
        float v = r0[x0 + c] * w00 + r0[x1 + c] * w01 +
                  r1[x0 + c] * w10 + r1[x1 + c] * w11;
        orow[ox * 3 + c] =
            ((float)std::lround(v) - mean[c]) * inv_std[c];
      }
    }
    std::memset(orow + (size_t)rw * 3, 0,
                sizeof(float) * (size_t)(canvas - rw) * 3);
  }
  std::memset(out + (size_t)rh * canvas * 3, 0,
              sizeof(float) * (size_t)(canvas - rh) * canvas * 3);
  return (rh << 16) | rw;
}

// Nearest resize of a binary uint8 mask + placement on a zeroed square
// f32 canvas (mask_to_canvas analog).
void mask_to_canvas_f32(const uint8_t* src, int h, int w, int rh, int rw,
                        int canvas, float* out) {
  std::memset(out, 0, sizeof(float) * (size_t)canvas * canvas);
  for (int y = 0; y < rh; ++y) {
    // cv2.INTER_NEAREST source index: floor(y * (h / rh))
    int sy = std::min((int)((float)y * h / rh), h - 1);
    for (int x = 0; x < rw; ++x) {
      int sx = std::min((int)((float)x * w / rw), w - 1);
      out[(size_t)y * canvas + x] = src[(size_t)sy * w + sx] ? 1.0f : 0.0f;
    }
  }
}

// Even-odd scanline polygon fill (value 1) into a uint8 mask. points:
// flat [x0, y0, x1, y1, ...]. Used for contour rasterization when cv2
// is unavailable; cv2.drawContours stays the parity reference.
void fill_polygon_u8(const int32_t* points, int n_points, int h, int w,
                     uint8_t* out) {
  if (n_points < 3) return;
  std::vector<float> xs;
  for (int y = 0; y < h; ++y) {
    xs.clear();
    float fy = (float)y;
    for (int i = 0; i < n_points; ++i) {
      int j = (i + 1) % n_points;
      float y0 = points[i * 2 + 1], y1 = points[j * 2 + 1];
      float x0 = points[i * 2], x1 = points[j * 2];
      if ((y0 <= fy && y1 > fy) || (y1 <= fy && y0 > fy)) {
        float t = (fy - y0) / (y1 - y0);
        xs.push_back(x0 + t * (x1 - x0));
      }
    }
    std::sort(xs.begin(), xs.end());
    for (size_t k = 0; k + 1 < xs.size(); k += 2) {
      int xa = std::max(0, (int)std::ceil(xs[k]));
      int xb = std::min(w - 1, (int)std::floor(xs[k + 1]));
      for (int x = xa; x <= xb; ++x) out[(size_t)y * w + x] = 1;
    }
  }
}

}  // extern "C"
