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

// Fused CLIP preprocess: bicubic short-side resize to `size`, center
// crop, scale 1/255, normalize. Resampling reproduces PIL's convolution
// resampler (Catmull-Rom a=-0.5, antialias support widening on
// downscale, window-clipped renormalized border taps, separable passes
// with intermediate uint8 rounding — Pillow Resample.c), so pixels match
// the PIL/HF-CLIPImageProcessor parity path to fixed-point rounding.
// Only the crop-region output pixels are resampled. The long side uses
// int-TRUNCATED scaling, matching transformers'
// get_resize_output_image_size (reference mm_utils/CLIPImageProcessor).
static inline double bicubic_filter(double x) {
  const double a = -0.5;
  if (x < 0) x = -x;
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// PIL-style tap windows for one axis: output pixels [crop0, crop0+n) of
// a `scale`-downsampled axis of length in_size. Weights per output pixel
// are stored in a dense (n, kmax) table; count[i] gives the live taps.
static int pil_taps(int in_size, int crop0, int n, double scale,
                    std::vector<int>& first, std::vector<int>& count,
                    std::vector<float>& weights) {
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 2.0 * filterscale;  // bicubic support = 2
  const int kmax = (int)std::ceil(support) * 2 + 1;
  first.resize(n);
  count.resize(n);
  weights.assign((size_t)n * kmax, 0.0f);
  std::vector<double> ww(kmax);
  for (int i = 0; i < n; ++i) {
    const double center = (i + crop0 + 0.5) * scale;
    int x0 = (int)(center - support + 0.5);
    if (x0 < 0) x0 = 0;
    int x1 = (int)(center + support + 0.5);
    if (x1 > in_size) x1 = in_size;
    const int cnt = x1 - x0;
    double sum = 0.0;
    for (int k = 0; k < cnt; ++k) {
      ww[k] = bicubic_filter((k + x0 - center + 0.5) / filterscale);
      sum += ww[k];
    }
    first[i] = x0;
    count[i] = cnt;
    for (int k = 0; k < cnt; ++k)
      weights[(size_t)i * kmax + k] = (float)(sum != 0.0 ? ww[k] / sum : 0.0);
  }
  return kmax;
}

static inline uint8_t clip8(float v) {
  long r = std::lround(v);
  return (uint8_t)(r < 0 ? 0 : (r > 255 ? 255 : r));
}

void clip_preprocess_f32(const uint8_t* src, int h, int w, int size,
                         const float* mean, const float* stdv, float* out) {
  int nh, nw;
  if (h <= w) { nh = size; nw = (int)((float)size * w / h); }
  else        { nw = size; nh = (int)((float)size * h / w); }
  const int top = (nh - size) / 2, left = (nw - size) / 2;

  std::vector<int> xf, xc, yf, yc;
  std::vector<float> xw, yw;
  const int kx = pil_taps(w, left, size, (double)w / nw, xf, xc, xw);
  const int ky = pil_taps(h, top, size, (double)h / nh, yf, yc, yw);

  // Horizontal pass over all input rows (vertical taps span them), with
  // PIL's intermediate rounding to uint8.
  std::vector<uint8_t> tmp((size_t)h * size * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + (size_t)y * w * 3;
    uint8_t* trow = &tmp[(size_t)y * size * 3];
    for (int ox = 0; ox < size; ++ox) {
      const float* wx = &xw[(size_t)ox * kx];
      const uint8_t* p = row + xf[ox] * 3;
      float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f;
      for (int k = 0; k < xc[ox]; ++k) {
        const float wk = wx[k];
        acc0 += wk * p[k * 3 + 0];
        acc1 += wk * p[k * 3 + 1];
        acc2 += wk * p[k * 3 + 2];
      }
      trow[ox * 3 + 0] = clip8(acc0);
      trow[ox * 3 + 1] = clip8(acc1);
      trow[ox * 3 + 2] = clip8(acc2);
    }
  }

  const float inv[3] = {1.0f / (255.0f * stdv[0]), 1.0f / (255.0f * stdv[1]),
                        1.0f / (255.0f * stdv[2])};
  const float bias[3] = {mean[0] / stdv[0], mean[1] / stdv[1],
                         mean[2] / stdv[2]};
  for (int oy = 0; oy < size; ++oy) {
    const float* wy = &yw[(size_t)oy * ky];
    float* orow = out + (size_t)oy * size * 3;
    for (int ox = 0; ox < size; ++ox) {
      for (int c = 0; c < 3; ++c) {
        float acc = 0.f;
        const uint8_t* p = &tmp[((size_t)yf[oy] * size + ox) * 3 + c];
        for (int k = 0; k < yc[oy]; ++k)
          acc += wy[k] * p[(size_t)k * size * 3];
        orow[ox * 3 + c] = clip8(acc) * inv[c] - bias[c];
      }
    }
  }
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
