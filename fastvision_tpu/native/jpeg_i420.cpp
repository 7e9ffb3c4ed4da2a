// Fused JPEG decode -> letterboxed packed I420 host kernel.
//
// The reference's host input stage is cv2 inside torch DataLoader workers
// (ref datasets/detection_dataloader.py:43-79,163-172). Its decode chain
// for our i420 device path is: huffman+IDCT -> chroma upsample -> YCbCr->
// BGR -> BGR->RGB -> bilinear resize -> RGB->I420 subsample. But JPEG
// *stores* YCbCr 4:2:0 — the upsample, two color conversions, and the
// re-subsample are pure waste when the device program consumes I420
// (ops/image.py::i420_packed_to_rgb does the color math on the MXU host's
// behalf). This kernel decodes straight to the stored planes
// (jpeg_read_raw_data: SIMD huffman+IDCT only), then does ONE fused pass
// per plane: full-range JFIF -> studio-swing BT.601 (what cv2's
// RGB2YUV_I420 emits, which the device decode expects) + bilinear
// letterbox resize + pad, writing the packed [S*3/2, S] buffer the
// pipeline ships over the link.
//
// Letterbox geometry matches data/dataset.py::letterbox exactly
// (scale = S/max(h,w), nh = banker's-round(h*scale), center pads) so
// meta/scale/pad stay byte-compatible with the Python path.
//
// Supported: baseline+progressive JFIF YCbCr with luma sampling factors
// (1|2)x(1|2) and 1x1 chroma (covers 4:2:0/4:2:2/4:4:0/4:4:4), and
// grayscale. Anything else (CMYK, 4:1:1, arithmetic-coded oddities)
// returns 1 and the caller falls back to the cv2 path.
//
// Optional DCT-domain reduction (`reduce_target`): same rule as
// data/dataset.py::imread_rgb_scaled — decode at 1/f for the largest
// f in {8,4,2} with max(h,w) >= f*target (libjpeg scale_denom; output
// dims = ceil(orig/f), identical to cv2 IMREAD_REDUCED).

#include <csetjmp>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void error_exit_longjmp(j_common_ptr cinfo) {
  ErrMgr* e = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(e->jb, 1);
}

void emit_nothing(j_common_ptr, int) {}

inline int pad_up(int v, int m) { return (v + m - 1) / m * m; }

// Bilinear resize (cv2 INTER_LINEAR half-pixel mapping) of one plane with
// a fused affine range conversion out = a*in + b, clamped to [0,255].
// Separable fixed-point: the horizontal pass (the only gather) runs once
// per needed source row into uint16 buffers; the vertical blend + affine
// is gather-free and auto-vectorizes.
void resize_affine(const uint8_t* src, int sh, int sw, int sstride,
                   uint8_t* dst, int dh, int dw, int dstride,
                   float a, float b) {
  if (dh <= 0 || dw <= 0) return;
  if (sh == dh && sw == dw) {  // no resize: affine copy (vectorizes)
    for (int y = 0; y < dh; ++y) {
      const uint8_t* s = src + y * sstride;
      uint8_t* d = dst + y * dstride;
      for (int x = 0; x < dw; ++x) {
        float v = a * s[x] + b + 0.5f;
        d[x] = (uint8_t)(v < 0.f ? 0.f : (v > 255.f ? 255.f : v));
      }
    }
    return;
  }
  // horizontal taps: 7-bit weights; hrow values fit uint16 (255*128)
  std::vector<int> x0(dw), x1(dw);
  std::vector<uint16_t> wx1(dw), wx0(dw);
  const float rx = (float)sw / dw, ry = (float)sh / dh;
  for (int x = 0; x < dw; ++x) {
    float sx = (x + 0.5f) * rx - 0.5f;
    if (sx < 0) sx = 0;
    if (sx > sw - 1) sx = (float)(sw - 1);
    x0[x] = (int)sx;
    x1[x] = x0[x] + 1 < sw ? x0[x] + 1 : sw - 1;
    int w = (int)((sx - x0[x]) * 128.f + 0.5f);
    wx1[x] = (uint16_t)w;
    wx0[x] = (uint16_t)(128 - w);
  }
  std::vector<uint16_t> h0(dw), h1(dw);
  int h0_row = -1, h1_row = -1;
  auto hpass = [&](int sy, std::vector<uint16_t>& out) {
    const uint8_t* s = src + (size_t)sy * sstride;
    for (int x = 0; x < dw; ++x)
      out[x] = (uint16_t)(s[x0[x]] * wx0[x] + s[x1[x]] * wx1[x]);
  };
  const float inv = a / (128.f * 128.f);
  for (int y = 0; y < dh; ++y) {
    float sy = (y + 0.5f) * ry - 0.5f;
    if (sy < 0) sy = 0;
    if (sy > sh - 1) sy = (float)(sh - 1);
    int y0 = (int)sy;
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    int wy = (int)((sy - y0) * 128.f + 0.5f);
    if (h0_row != y0) {
      if (h1_row == y0) {  // downscale walks forward: reuse the y1 row
        std::swap(h0, h1);
        h0_row = y0;
        h1_row = -1;
      } else {
        hpass(y0, h0);
        h0_row = y0;
      }
    }
    if (h1_row != y1) {
      if (y1 == y0) {
        h1_row = y0;
        std::copy(h0.begin(), h0.end(), h1.begin());
      } else {
        hpass(y1, h1);
        h1_row = y1;
      }
    }
    uint8_t* d = dst + (size_t)y * dstride;
    const uint16_t* p0 = h0.data();
    const uint16_t* p1 = h1.data();
    const int w1 = wy, w0 = 128 - wy;
    for (int x = 0; x < dw; ++x) {  // gather-free: auto-vectorizes
      float v = inv * (p0[x] * w0 + p1[x] * w1) + b + 0.5f;
      d[x] = (uint8_t)(v < 0.f ? 0.f : (v > 255.f ? 255.f : v));
    }
  }
}

}  // namespace

extern "C" {

// Decode JPEG bytes into a letterboxed packed I420 buffer.
//   out:   [out_size*3/2, out_size] uint8 (Y plane, then U as S/2 x S/2,
//          then V — the cv2 RGB2YUV_I420 packed layout)
//   scale: letterbox scale in DECODED space (after any reduction)
//   pads:  {left, top}
//   dims:  {orig_h, orig_w, decoded_h, decoded_w}
// Returns 0 = ok, 1 = unsupported format (caller should fall back),
// 2 = corrupt/decode error.
int jpeg_decode_i420_letterbox(const uint8_t* data, size_t len,
                               int out_size, uint8_t pad_y,
                               int reduce_target,
                               uint8_t* out, float* scale,
                               int32_t* pads, int32_t* dims) {
  if (out_size < 2 || (out_size & 1)) return 2;
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit_longjmp;
  jerr.pub.emit_message = emit_nothing;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  const int oh = (int)cinfo.image_height, ow = (int)cinfo.image_width;
  dims[0] = oh;
  dims[1] = ow;

  const bool gray = cinfo.jpeg_color_space == JCS_GRAYSCALE;
  if (!gray && cinfo.jpeg_color_space != JCS_YCbCr) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  {
    jpeg_component_info* c = cinfo.comp_info;
    int h0 = c[0].h_samp_factor, v0 = c[0].v_samp_factor;
    bool ok = h0 >= 1 && h0 <= 2 && v0 >= 1 && v0 <= 2;
    if (!gray)
      ok = ok && c[1].h_samp_factor == 1 && c[1].v_samp_factor == 1 &&
           c[2].h_samp_factor == 1 && c[2].v_samp_factor == 1;
    if (!ok) {
      jpeg_destroy_decompress(&cinfo);
      return 1;
    }
  }

  cinfo.out_color_space = gray ? JCS_GRAYSCALE : JCS_YCbCr;
  cinfo.raw_data_out = TRUE;
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  if (reduce_target > 0) {
    int m = oh > ow ? oh : ow;
    for (int f : {8, 4, 2})
      if (m >= f * reduce_target) {
        cinfo.scale_denom = (unsigned)f;
        break;
      }
  }
  jpeg_start_decompress(&cinfo);

  const int ncomp = cinfo.num_components;
  const int dh = (int)cinfo.output_height, dw = (int)cinfo.output_width;
  dims[2] = dh;
  dims[3] = dw;

  // Per-component plane buffers, padded so raw iMCU rows never overrun.
  int pw[3] = {0, 0, 0}, ph[3] = {0, 0, 0}, pstride[3] = {0, 0, 0};
  int rows_per_imcu[3] = {0, 0, 0};
  std::vector<uint8_t> planes[3];
  for (int ci = 0; ci < ncomp && ci < 3; ++ci) {
    jpeg_component_info* c = &cinfo.comp_info[ci];
#if JPEG_LIB_VERSION >= 70
    int dct = c->DCT_v_scaled_size;
#else
    int dct = c->DCT_scaled_size;
#endif
    rows_per_imcu[ci] = c->v_samp_factor * dct;
    pw[ci] = (int)c->downsampled_width;
    ph[ci] = (int)c->downsampled_height;
    pstride[ci] = pad_up(pw[ci], 32);
    planes[ci].resize((size_t)pstride[ci] * pad_up(ph[ci], rows_per_imcu[ci]));
  }
  const int max_lines = cinfo.max_v_samp_factor * cinfo.min_DCT_scaled_size;

  {
    JSAMPROW rows[3][16];
    JSAMPARRAY comp_rows[3] = {rows[0], rows[1], rows[2]};
    int done[3] = {0, 0, 0};
    while (cinfo.output_scanline < cinfo.output_height) {
      for (int ci = 0; ci < ncomp && ci < 3; ++ci) {
        int alloc_rows = (int)(planes[ci].size() / pstride[ci]);
        for (int r = 0; r < rows_per_imcu[ci]; ++r) {
          int rr = done[ci] + r;
          if (rr >= alloc_rows) rr = alloc_rows - 1;  // defensive clamp
          rows[ci][r] = planes[ci].data() + (size_t)rr * pstride[ci];
        }
      }
      JDIMENSION got = jpeg_read_raw_data(&cinfo, comp_rows,
                                          (JDIMENSION)max_lines);
      if (got == 0) {  // suspension cannot happen with mem src; bail
        jpeg_destroy_decompress(&cinfo);
        return 2;
      }
      for (int ci = 0; ci < ncomp && ci < 3; ++ci)
        done[ci] += rows_per_imcu[ci];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // Letterbox geometry — EXACTLY data/dataset.py::letterbox (banker's
  // rounding like Python round()).
  const int S = out_size;
  const double sc = (double)S / (dh > dw ? dh : dw);
  const int nh = (int)std::nearbyint(dh * sc);  // FE_TONEAREST = half-even
  const int nw = (int)std::nearbyint(dw * sc);
  const int top = (S - nh) / 2, left = (S - nw) / 2;
  *scale = (float)sc;
  pads[0] = left;
  pads[1] = top;

  uint8_t* Y = out;
  uint8_t* U = out + (size_t)S * S;
  uint8_t* V = U + (size_t)(S / 2) * (S / 2);
  memset(Y, pad_y, (size_t)S * S);
  memset(U, 128, (size_t)(S / 2) * (S / 2));
  memset(V, 128, (size_t)(S / 2) * (S / 2));

  // Full-range JFIF -> studio-swing BT.601 (cv2 RGB2YUV_I420 convention,
  // pinned by ops/image.py::i420_to_rgb + tests/test_i420.py):
  //   Y' = 16 + Y*219/255        C' = 128 + (C-128)*224/255
  const float ay = 219.f / 255.f, by = 16.f;
  const float ac = 224.f / 255.f, bc = 128.f * (1.f - 224.f / 255.f);

  resize_affine(planes[0].data(), dh, dw, pstride[0],
                Y + (size_t)top * S + left, nh, nw, S, ay, by);

  if (!gray) {
    // Chroma canvas region covering the luma region at half resolution.
    const int ctop = top >> 1, cleft = left >> 1;
    const int cbh = ((top + nh + 1) >> 1) - ctop;
    const int cbw = ((left + nw + 1) >> 1) - cleft;
    const int cs = S / 2;
    resize_affine(planes[1].data(), ph[1], pw[1], pstride[1],
                  U + (size_t)ctop * cs + cleft, cbh, cbw, cs, ac, bc);
    resize_affine(planes[2].data(), ph[2], pw[2], pstride[2],
                  V + (size_t)ctop * cs + cleft, cbh, cbw, cs, ac, bc);
  }
  return 0;
}

}  // extern "C"
