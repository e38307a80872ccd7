// Native host-side PNG codec for the data pipeline.
//
// Why this exists: the training DataLoader (icon_tpu/data/datasets.py) feeds
// a TPU pod-slice from Python threads; PIL's PNG decode holds the GIL, so
// thread workers serialize on image decode (the reference hides this behind
// torch DataLoader *processes*, PIFuDataModule.py:41-44). This module decodes
// PNGs and fuses the reference's imagepath2tensor post-processing
// ((rgb * 2 - 1) * alpha, NormalDataset.py:165) in C++ — called through
// ctypes, which drops the GIL for the duration of the call, so N loader
// threads decode on N cores.
//
// Deliberately minimal: non-interlaced 8/16-bit PNG, color types 0 (gray),
// 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA). Anything else returns an
// error and the Python wrapper falls back to PIL. Inflate comes from zlib
// (the only external dependency, baked into the image).
//
// Build: icon_tpu/native/build.py (g++ -O3 -shared -fPIC, cached .so).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <vector>

#include <zlib.h>

namespace {

constexpr uint8_t kPngSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

// Paeth predictor (PNG spec 9.4).
inline int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

struct PngImage {
  uint32_t width = 0, height = 0;
  int bit_depth = 0, color_type = 0;
  int channels = 0;           // source channels per pixel
  std::vector<uint8_t> rgba;  // always expanded to 8-bit RGBA
};

// Returns 0 on success, negative error code otherwise.
int decode_png(const uint8_t* buf, size_t n, PngImage* img) {
  if (n < 8 || std::memcmp(buf, kPngSig, 8) != 0) return -1;  // not a PNG
  size_t off = 8;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;   // 3 * nentries
  std::vector<uint8_t> trns;      // palette alpha
  bool seen_ihdr = false, interlaced = false;

  while (off + 8 <= n) {
    uint32_t len = be32(buf + off);
    const uint8_t* type = buf + off + 4;
    const uint8_t* data = buf + off + 8;
    if (off + 12 + size_t(len) > n) return -2;  // truncated chunk
    if (!std::memcmp(type, "IHDR", 4)) {
      if (len != 13) return -2;
      img->width = be32(data);
      img->height = be32(data + 4);
      img->bit_depth = data[8];
      img->color_type = data[9];
      interlaced = data[12] != 0;
      seen_ihdr = true;
    } else if (!std::memcmp(type, "PLTE", 4)) {
      palette.assign(data, data + len);
    } else if (!std::memcmp(type, "tRNS", 4)) {
      trns.assign(data, data + len);
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    off += 12 + len;
  }
  if (!seen_ihdr || idat.empty()) return -2;
  if (interlaced) return -3;                      // Adam7: PIL fallback
  if (img->bit_depth != 8 && img->bit_depth != 16) return -3;
  if (img->color_type == 3 && img->bit_depth != 8) return -3;

  static const int kChannels[] = {1, 0, 3, 1, 2, 0, 4};
  if (img->color_type > 6 || kChannels[img->color_type] == 0) return -3;
  img->channels = kChannels[img->color_type];

  const uint64_t W = img->width, H = img->height;
  if (W == 0 || H == 0 || W > (1u << 20) || H > (1u << 20)) return -2;
  const int bpp = img->channels * img->bit_depth / 8;  // bytes per pixel
  const uint64_t stride = W * bpp;

  // inflate the filtered scanlines
  std::vector<uint8_t> raw((stride + 1) * H);
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return -4;
  zs.next_in = idat.data();
  zs.avail_in = static_cast<uInt>(idat.size());
  zs.next_out = raw.data();
  zs.avail_out = static_cast<uInt>(raw.size());
  int zr = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  if (zr != Z_STREAM_END && !(zr == Z_OK && zs.avail_out == 0)) return -4;

  // unfilter in place (prev row = defiltered bytes)
  std::vector<uint8_t> pix(stride * H);
  const uint8_t* prev = nullptr;
  for (uint64_t y = 0; y < H; ++y) {
    const uint8_t* src = raw.data() + y * (stride + 1);
    uint8_t filter = src[0];
    ++src;
    uint8_t* dst = pix.data() + y * stride;
    switch (filter) {
      case 0:
        std::memcpy(dst, src, stride);
        break;
      case 1:  // Sub
        for (uint64_t i = 0; i < stride; ++i)
          dst[i] = src[i] + (i >= uint64_t(bpp) ? dst[i - bpp] : 0);
        break;
      case 2:  // Up
        for (uint64_t i = 0; i < stride; ++i)
          dst[i] = src[i] + (prev ? prev[i] : 0);
        break;
      case 3:  // Average
        for (uint64_t i = 0; i < stride; ++i) {
          int a = i >= uint64_t(bpp) ? dst[i - bpp] : 0;
          int b = prev ? prev[i] : 0;
          dst[i] = src[i] + uint8_t((a + b) >> 1);
        }
        break;
      case 4:  // Paeth
        for (uint64_t i = 0; i < stride; ++i) {
          int a = i >= uint64_t(bpp) ? dst[i - bpp] : 0;
          int b = prev ? prev[i] : 0;
          int c = (prev && i >= uint64_t(bpp)) ? prev[i - bpp] : 0;
          dst[i] = src[i] + uint8_t(paeth(a, b, c));
        }
        break;
      default:
        return -5;
    }
    prev = dst;
  }

  // expand to 8-bit RGBA
  img->rgba.resize(W * H * 4);
  uint8_t* out = img->rgba.data();
  const int step16 = img->bit_depth == 16 ? 2 : 1;  // take the high byte
  for (uint64_t y = 0; y < H; ++y) {
    const uint8_t* row = pix.data() + y * stride;
    for (uint64_t x = 0; x < W; ++x) {
      const uint8_t* p = row + x * bpp;
      uint8_t r, g, b, a = 255;
      switch (img->color_type) {
        case 0:
          r = g = b = p[0];
          break;
        case 2:
          r = p[0];
          g = p[step16];
          b = p[2 * step16];
          break;
        case 3: {
          uint32_t idx = p[0];
          if (3 * idx + 2 >= palette.size()) return -5;
          r = palette[3 * idx];
          g = palette[3 * idx + 1];
          b = palette[3 * idx + 2];
          if (idx < trns.size()) a = trns[idx];
          break;
        }
        case 4:
          r = g = b = p[0];
          a = p[step16];
          break;
        default:  // 6
          r = p[0];
          g = p[step16];
          b = p[2 * step16];
          a = p[3 * step16];
      }
      out[0] = r;
      out[1] = g;
      out[2] = b;
      out[3] = a;
      out += 4;
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Probe: fills *w / *h from the IHDR without decoding. Returns 0 on success.
int icon_png_probe(const uint8_t* buf, size_t n, int* w, int* h) {
  if (n < 33 || std::memcmp(buf, kPngSig, 8) != 0) return -1;
  if (std::memcmp(buf + 12, "IHDR", 4) != 0) return -2;
  *w = int(be32(buf + 16));
  *h = int(be32(buf + 20));
  return 0;
}

// Decode to 8-bit RGBA. `out` must hold 4 * w * h bytes (from probe).
// Returns 0 on success; -3 = unsupported format (caller falls back to PIL).
int icon_png_decode_rgba(const uint8_t* buf, size_t n, uint8_t* out,
                         int w, int h) {
  PngImage img;
  int rc = decode_png(buf, n, &img);
  if (rc != 0) return rc;
  if (int(img.width) != w || int(img.height) != h) return -2;
  std::memcpy(out, img.rgba.data(), size_t(w) * h * 4);
  return 0;
}

// Fused reference imagepath2tensor: decode + (rgb/255 * 2 - 1) * alpha into
// float32 [h, w, channels] (channels <= 3, from RGBA's leading channels).
// Background (alpha 0) becomes exactly 0, matching NormalDataset.py:165.
int icon_png_decode_masked_f32(const uint8_t* buf, size_t n, float* out,
                               int w, int h, int channels) {
  if (channels < 1 || channels > 3) return -2;
  PngImage img;
  int rc = decode_png(buf, n, &img);
  if (rc != 0) return rc;
  if (int(img.width) != w || int(img.height) != h) return -2;
  const uint8_t* src = img.rgba.data();
  const float inv = 1.0f / 255.0f;
  for (int64_t i = 0; i < int64_t(w) * h; ++i) {
    float a = src[4 * i + 3] * inv;
    for (int c = 0; c < channels; ++c)
      out[channels * i + c] = (src[4 * i + c] * inv * 2.0f - 1.0f) * a;
  }
  return 0;
}

// Decode + float32 RGB and separate alpha (the TestDataset path wants the
// un-masked crop and the matte separately).
int icon_png_decode_rgba_f32(const uint8_t* buf, size_t n, float* rgb,
                             float* alpha, int w, int h) {
  PngImage img;
  int rc = decode_png(buf, n, &img);
  if (rc != 0) return rc;
  if (int(img.width) != w || int(img.height) != h) return -2;
  const uint8_t* src = img.rgba.data();
  const float inv = 1.0f / 255.0f;
  for (int64_t i = 0; i < int64_t(w) * h; ++i) {
    rgb[3 * i] = src[4 * i] * inv;
    rgb[3 * i + 1] = src[4 * i + 1] * inv;
    rgb[3 * i + 2] = src[4 * i + 2] * inv;
    alpha[i] = src[4 * i + 3] * inv;
  }
  return 0;
}

}  // extern "C"
