// Minimal OpenEXR scanline decoder (FLOAT/HALF channels, NONE/ZIP/ZIPS
// compression) — the TPU-native framework's replacement for the role the
// vendored tinyexr plays in the reference data path (reference:
// deps/tinyexr/, used at src/inputs/CoFusionReader.cpp:45). Written from the
// public OpenEXR file-format specification; supports exactly the subset the
// SLAM ingest needs (single-part scanline images as produced by Co-Fusion /
// Blender depth dumps).
//
// C ABI so Python binds via ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

struct Channel {
  std::string name;
  int32_t pixel_type;  // 0=UINT, 1=HALF, 2=FLOAT
};

struct Reader {
  const uint8_t* p;
  size_t n;
  size_t off = 0;
  bool ok = true;

  template <typename T>
  T get() {
    T v{};
    if (off + sizeof(T) > n) {
      ok = false;
      return v;
    }
    std::memcpy(&v, p + off, sizeof(T));
    off += sizeof(T);
    return v;
  }
  std::string get_string() {
    std::string s;
    while (off < n && p[off] != 0) s.push_back((char)p[off++]);
    if (off < n) off++;  // skip NUL
    return s;
  }
  void skip(size_t k) {
    if (off + k > n)
      ok = false;
    else
      off += k;
  }
};

static float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h >> 15) << 31;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t mant = h & 0x3ff;
  uint32_t f;
  if (exp == 0) {
    if (mant == 0) {
      f = sign;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while (!(mant & 0x400)) {
        mant <<= 1;
        exp--;
      }
      mant &= 0x3ff;
      f = sign | (exp << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    f = sign | 0x7f800000u | (mant << 13);
  } else {
    f = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float out;
  std::memcpy(&out, &f, 4);
  return out;
}

// EXR ZIP post-inflate reconstruction: undo delta predictor, then
// de-interleave (first half = even bytes, second half = odd bytes).
static void zip_reconstruct(std::vector<uint8_t>& buf) {
  for (size_t i = 1; i < buf.size(); ++i) {
    int d = (int)buf[i - 1] + (int)buf[i] - 128;
    buf[i] = (uint8_t)d;
  }
  std::vector<uint8_t> out(buf.size());
  const size_t half = (buf.size() + 1) / 2;
  size_t a = 0, b = half, k = 0;
  while (k < buf.size()) {
    out[k++] = buf[a++];
    if (k < buf.size()) out[k++] = buf[b++];
  }
  buf.swap(out);
}

static bool inflate_zip(const uint8_t* src, size_t src_n,
                        std::vector<uint8_t>& dst) {
  uLongf dst_n = (uLongf)dst.size();
  int rc = uncompress(dst.data(), &dst_n, src, (uLong)src_n);
  return rc == Z_OK && dst_n == dst.size();
}

}  // namespace

extern "C" {

// Decodes the first FLOAT/HALF channel named `want` (or the alphabetically
// first channel if want=="") into out[h*w] (row-major, top-down). Returns 0
// on success; fills *out_w/*out_h. `out` may be null to query dimensions.
int exr_decode(const uint8_t* data, size_t size, const char* want, float* out,
               int* out_w, int* out_h) {
  Reader r{data, size};
  if (r.get<uint32_t>() != 20000630u) return -1;  // magic
  uint32_t version = r.get<uint32_t>();
  if ((version & 0x200) || (version & 0x800) || (version & 0x1000))
    return -2;  // tiled / deep / multipart unsupported

  std::vector<Channel> channels;
  int32_t compression = -1;
  int32_t xmin = 0, ymin = 0, xmax = -1, ymax = -1;
  int32_t line_order = 0;

  while (r.ok) {
    std::string name = r.get_string();
    if (name.empty()) break;  // end of header
    std::string type = r.get_string();
    int32_t attr_size = r.get<int32_t>();
    size_t next = r.off + (size_t)attr_size;
    if (name == "channels" && type == "chlist") {
      while (r.ok && r.off < next) {
        std::string cname = r.get_string();
        if (cname.empty()) break;
        Channel c;
        c.name = cname;
        c.pixel_type = r.get<int32_t>();
        r.skip(4 + 4 + 8);  // pLinear+fill, xSampling, ySampling
        channels.push_back(c);
      }
    } else if (name == "compression" && type == "compression") {
      compression = r.get<uint8_t>();
    } else if (name == "dataWindow" && type == "box2i") {
      xmin = r.get<int32_t>();
      ymin = r.get<int32_t>();
      xmax = r.get<int32_t>();
      ymax = r.get<int32_t>();
    } else if (name == "lineOrder" && type == "lineOrder") {
      line_order = r.get<uint8_t>();
    }
    r.off = next;
  }
  if (!r.ok || channels.empty() || xmax < xmin || ymax < ymin) return -3;
  // compression: 0=NONE, 2=ZIPS(1 line), 3=ZIP(16 lines)
  if (compression != 0 && compression != 2 && compression != 3) return -4;

  const int w = xmax - xmin + 1;
  const int h = ymax - ymin + 1;
  if (out_w) *out_w = w;
  if (out_h) *out_h = h;
  if (!out) return 0;

  int want_idx = 0;
  if (want && want[0]) {
    want_idx = -1;
    for (size_t i = 0; i < channels.size(); ++i)
      if (channels[i].name == want) want_idx = (int)i;
    if (want_idx < 0) return -5;
  }
  if (channels[want_idx].pixel_type == 0) return -6;  // UINT unsupported

  const int lines_per_block = (compression == 3) ? 16 : 1;
  const int n_blocks = (h + lines_per_block - 1) / lines_per_block;

  size_t bytes_per_line = 0;
  std::vector<size_t> chan_line_off(channels.size());
  for (size_t i = 0; i < channels.size(); ++i) {
    chan_line_off[i] = bytes_per_line;
    bytes_per_line += (size_t)w * (channels[i].pixel_type == 1 ? 2 : 4);
  }

  // Scanline offset table.
  std::vector<uint64_t> offsets(n_blocks);
  for (int b = 0; b < n_blocks; ++b) offsets[b] = r.get<uint64_t>();
  if (!r.ok) return -7;

  std::vector<uint8_t> raw;
  for (int b = 0; b < n_blocks; ++b) {
    Reader br{data, size};
    br.off = (size_t)offsets[b];
    int32_t y = br.get<int32_t>();
    int32_t packed = br.get<int32_t>();
    if (!br.ok || br.off + (size_t)packed > size) return -8;
    int block_lines = lines_per_block;
    if (y + block_lines - 1 > ymax) block_lines = ymax - y + 1;
    const size_t unpacked = bytes_per_line * (size_t)block_lines;

    const uint8_t* payload = data + br.off;
    raw.resize(unpacked);
    if (compression == 0 || (size_t)packed == unpacked) {
      if ((size_t)packed < unpacked) return -9;
      std::memcpy(raw.data(), payload, unpacked);
    } else {
      if (!inflate_zip(payload, (size_t)packed, raw)) return -10;
      zip_reconstruct(raw);
    }

    for (int ly = 0; ly < block_lines; ++ly) {
      int row = (y - ymin) + ly;
      if (line_order == 1) row = h - 1 - row;  // DECREASING_Y
      const uint8_t* line = raw.data() + bytes_per_line * (size_t)ly +
                            chan_line_off[want_idx];
      float* dst = out + (size_t)row * w;
      if (channels[want_idx].pixel_type == 1) {
        const uint16_t* hp = (const uint16_t*)line;
        for (int x = 0; x < w; ++x) dst[x] = half_to_float(hp[x]);
      } else {
        std::memcpy(dst, line, (size_t)w * 4);
      }
    }
  }
  return 0;
}

int exr_decode_file(const char* path, const char* want, float* out, int* out_w,
                    int* out_h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -100;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf((size_t)n);
  size_t rd = std::fread(buf.data(), 1, (size_t)n, f);
  std::fclose(f);
  if (rd != (size_t)n) return -101;
  return exr_decode(buf.data(), buf.size(), want, out, out_w, out_h);
}

}  // extern "C"
