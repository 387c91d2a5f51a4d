// gfe_io: native data-path runtime for the GFE-Mamba TPU framework.
//
// Replaces the Python-side hot path of the host data pipeline (the role
// the reference delegates to MONAI's C-backed transforms + torch
// DataLoader workers, threed_loader.py:55-66): gzip NIfTI-1 decode,
// dtype conversion + scl scaling, trilinear resampling to the canonical
// grid, adaptive percentile normalization, and a std::thread batch
// loader that decodes many volumes concurrently while the TPU computes.
//
// Exposed as a C ABI consumed via ctypes (gfe_mamba_tpu/data/native.py).
// Build: make -C native   (g++ -O3 -shared -fPIC ... -lz -lpthread)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct NiftiHeaderInfo {
  int ndim = 0;
  int64_t shape[7] = {1, 1, 1, 1, 1, 1, 1};
  int16_t datatype = 0;
  float vox_offset = 352.0f;
  float scl_slope = 1.0f;
  float scl_inter = 0.0f;
  bool swap = false;  // big-endian file
};

template <typename T>
T bswap(T v) {
  union {
    T value;
    uint8_t bytes[sizeof(T)];
  } in, out;
  in.value = v;
  for (size_t i = 0; i < sizeof(T); ++i) out.bytes[i] = in.bytes[sizeof(T) - 1 - i];
  return out.value;
}

template <typename T>
T read_at(const uint8_t* buf, size_t off, bool swap) {
  T v;
  std::memcpy(&v, buf + off, sizeof(T));
  return swap ? bswap(v) : v;
}

// ---------------------------------------------------------------------------
// file reading (+ gzip)

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(size);
  size_t got = std::fread(out->data(), 1, size, f);
  std::fclose(f);
  return got == static_cast<size_t>(size);
}

bool gunzip(const std::vector<uint8_t>& in, std::vector<uint8_t>* out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 15 + 32) != Z_OK) return false;  // gzip+zlib
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = in.size();
  out->clear();
  out->reserve(in.size() * 4);
  uint8_t chunk[1 << 16];
  int ret = Z_OK;
  while (ret != Z_STREAM_END) {
    zs.next_out = chunk;
    zs.avail_out = sizeof(chunk);
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out->insert(out->end(), chunk, chunk + (sizeof(chunk) - zs.avail_out));
  }
  inflateEnd(&zs);
  return true;
}

bool is_gzip(const std::vector<uint8_t>& buf) {
  return buf.size() >= 2 && buf[0] == 0x1f && buf[1] == 0x8b;
}

// ---------------------------------------------------------------------------
// NIfTI-1 parsing

bool parse_header(const uint8_t* buf, size_t len, NiftiHeaderInfo* h) {
  if (len < 348) return false;
  int32_t sizeof_hdr = read_at<int32_t>(buf, 0, false);
  h->swap = false;
  if (sizeof_hdr != 348) {
    sizeof_hdr = read_at<int32_t>(buf, 0, true);
    if (sizeof_hdr != 348) return false;
    h->swap = true;
  }
  if (std::memcmp(buf + 344, "n+1", 3) != 0 &&
      std::memcmp(buf + 344, "ni1", 3) != 0)
    return false;
  int16_t ndim = read_at<int16_t>(buf, 40, h->swap);
  if (ndim < 1 || ndim > 7) return false;
  h->ndim = ndim;
  for (int i = 0; i < ndim; ++i)
    h->shape[i] = read_at<int16_t>(buf, 40 + 2 * (i + 1), h->swap);
  h->datatype = read_at<int16_t>(buf, 70, h->swap);
  h->vox_offset = read_at<float>(buf, 108, h->swap);
  h->scl_slope = read_at<float>(buf, 112, h->swap);
  h->scl_inter = read_at<float>(buf, 116, h->swap);
  return true;
}

template <typename T>
void convert(const uint8_t* src, float* dst, int64_t n, bool swap,
             float slope, float inter) {
  const T* in = reinterpret_cast<const T*>(src);
  bool scale = slope != 0.0f && (slope != 1.0f || inter != 0.0f);
  for (int64_t i = 0; i < n; ++i) {
    T v;
    std::memcpy(&v, &in[i], sizeof(T));
    if (swap) v = bswap(v);
    float f = static_cast<float>(v);
    dst[i] = scale ? f * slope + inter : f;
  }
}

bool decode_payload(const std::vector<uint8_t>& raw, NiftiHeaderInfo* h,
                    std::vector<float>* out) {
  if (!parse_header(raw.data(), raw.size(), h)) return false;
  int64_t n = 1;
  for (int i = 0; i < h->ndim; ++i) n *= h->shape[i];
  size_t off = static_cast<size_t>(h->vox_offset);
  out->resize(n);
  const uint8_t* src = raw.data() + off;
  size_t avail = raw.size() - off;
  auto need = [&](size_t isz) { return avail >= static_cast<size_t>(n) * isz; };
  switch (h->datatype) {
    case 2:  if (!need(1)) return false; convert<uint8_t>(src, out->data(), n, false, h->scl_slope, h->scl_inter); break;
    case 256: if (!need(1)) return false; convert<int8_t>(src, out->data(), n, false, h->scl_slope, h->scl_inter); break;
    case 4:  if (!need(2)) return false; convert<int16_t>(src, out->data(), n, h->swap, h->scl_slope, h->scl_inter); break;
    case 512: if (!need(2)) return false; convert<uint16_t>(src, out->data(), n, h->swap, h->scl_slope, h->scl_inter); break;
    case 8:  if (!need(4)) return false; convert<int32_t>(src, out->data(), n, h->swap, h->scl_slope, h->scl_inter); break;
    case 768: if (!need(4)) return false; convert<uint32_t>(src, out->data(), n, h->swap, h->scl_slope, h->scl_inter); break;
    case 16: if (!need(4)) return false; convert<float>(src, out->data(), n, h->swap, h->scl_slope, h->scl_inter); break;
    case 64: if (!need(8)) return false; convert<double>(src, out->data(), n, h->swap, h->scl_slope, h->scl_inter); break;
    default: return false;
  }
  return true;
}

// ---------------------------------------------------------------------------
// trilinear resample (half-pixel centers, matches ops.volumetric)

void resize_trilinear(const float* in, const int64_t is[3], float* out,
                      const int64_t os[3]) {
  const int64_t IX = is[0], IY = is[1], IZ = is[2];
  const int64_t OX = os[0], OY = os[1], OZ = os[2];
  // NIfTI data is Fortran order: index (x, y, z) -> x + IX*(y + IY*z)
  auto src = [&](int64_t x, int64_t y, int64_t z) {
    return in[x + IX * (y + IY * z)];
  };
  std::vector<int64_t> x0(OX), x1(OX); std::vector<float> fx(OX);
  std::vector<int64_t> y0(OY), y1(OY); std::vector<float> fy(OY);
  std::vector<int64_t> z0(OZ), z1(OZ); std::vector<float> fz(OZ);
  auto fill = [](int64_t o, int64_t i, std::vector<int64_t>& a0,
                 std::vector<int64_t>& a1, std::vector<float>& fr) {
    for (int64_t k = 0; k < o; ++k) {
      float c = (k + 0.5f) * static_cast<float>(i) / o - 0.5f;
      c = std::max(0.0f, std::min(c, static_cast<float>(i - 1)));
      int64_t lo = static_cast<int64_t>(c);
      a0[k] = lo;
      a1[k] = std::min(lo + 1, i - 1);
      fr[k] = c - lo;
    }
  };
  fill(OX, IX, x0, x1, fx);
  fill(OY, IY, y0, y1, fy);
  fill(OZ, IZ, z0, z1, fz);
  for (int64_t z = 0; z < OZ; ++z)
    for (int64_t y = 0; y < OY; ++y)
      for (int64_t x = 0; x < OX; ++x) {
        float c00 = src(x0[x], y0[y], z0[z]) * (1 - fx[x]) + src(x1[x], y0[y], z0[z]) * fx[x];
        float c10 = src(x0[x], y1[y], z0[z]) * (1 - fx[x]) + src(x1[x], y1[y], z0[z]) * fx[x];
        float c01 = src(x0[x], y0[y], z1[z]) * (1 - fx[x]) + src(x1[x], y0[y], z1[z]) * fx[x];
        float c11 = src(x0[x], y1[y], z1[z]) * (1 - fx[x]) + src(x1[x], y1[y], z1[z]) * fx[x];
        float c0 = c00 * (1 - fy[y]) + c10 * fy[y];
        float c1 = c01 * (1 - fy[y]) + c11 * fy[y];
        out[x + OX * (y + OY * z)] = c0 * (1 - fz[z]) + c1 * fz[z];
      }
}

// ---------------------------------------------------------------------------
// adaptive percentile normalization (data_normalization.py:20-48 math)

void adaptive_normal_inplace(float* data, int64_t n) {
  std::vector<float> pix;
  pix.reserve(n);
  for (int64_t i = 0; i < n; ++i)
    if (data[i] >= 0.0f) pix.push_back(data[i]);
  if (pix.empty()) {
    for (int64_t i = 0; i < n; ++i)
      data[i] = std::max(-1.0f, std::min(1.0f, data[i]));
    return;
  }
  std::sort(pix.begin(), pix.end());
  auto pick = [&](double p) {
    int64_t idx = static_cast<int64_t>((pix.size() - 1) * p + 0.5);
    idx = std::max<int64_t>(0, std::min<int64_t>(idx, pix.size() - 1));
    return pix[idx];
  };
  float vmin = pick(0.001), vmax = pick(0.999);
  float mean = (vmax + vmin) / 2.0f, stddev = (vmax - vmin) / 2.0f;
  if (stddev <= 0.0f) {
    for (int64_t i = 0; i < n; ++i)
      data[i] = std::max(-1.0f, std::min(1.0f, data[i]));
    return;
  }
  for (int64_t i = 0; i < n; ++i) {
    float v = (data[i] - mean) / stddev;
    data[i] = std::max(-1.0f, std::min(1.0f, v));
  }
}

bool load_one(const char* path, const int64_t target[3], bool normalize,
              float* out) {
  std::vector<uint8_t> raw;
  if (!read_file(path, &raw)) return false;
  if (is_gzip(raw)) {
    std::vector<uint8_t> plain;
    if (!gunzip(raw, &plain)) return false;
    raw.swap(plain);
  }
  NiftiHeaderInfo h;
  std::vector<float> vol;
  if (!decode_payload(raw, &h, &vol)) return false;
  int64_t is[3] = {h.shape[0],
                   h.ndim > 1 ? h.shape[1] : 1,
                   h.ndim > 2 ? h.shape[2] : 1};
  // extra dims (time/channel) -> first frame
  if (normalize) adaptive_normal_inplace(vol.data(), is[0] * is[1] * is[2]);
  resize_trilinear(vol.data(), is, out, target);
  return true;
}

}  // namespace

extern "C" {

// Decode one NIfTI file into caller-provided float32 buffer resampled
// to target shape (x, y, z); optional adaptive normalization first.
// Returns 0 on success.
int gfe_load_volume(const char* path, const int64_t* target_shape,
                    int normalize, float* out) {
  return load_one(path, target_shape, normalize != 0, out) ? 0 : 1;
}

// Decode a batch of files concurrently with `num_threads` workers into
// a contiguous (n, x, y, z) float32 buffer.  Returns number of failures.
int gfe_load_batch(const char** paths, int n, const int64_t* target_shape,
                   int normalize, int num_threads, float* out) {
  if (num_threads < 1) num_threads = 1;
  const int64_t voxels =
      target_shape[0] * target_shape[1] * target_shape[2];
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (!load_one(paths[i], target_shape, normalize != 0,
                    out + static_cast<int64_t>(i) * voxels))
        failures.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  int workers = std::min(num_threads, n);
  threads.reserve(workers);
  for (int t = 0; t < workers; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

// Raw decode: returns malloc'd float32 buffer (caller frees via
// gfe_free) + shape (up to 7 dims).  Returns 0 on success.
int gfe_decode_nifti(const char* path, float** data, int64_t* shape,
                     int* ndim) {
  std::vector<uint8_t> raw;
  if (!read_file(path, &raw)) return 1;
  if (is_gzip(raw)) {
    std::vector<uint8_t> plain;
    if (!gunzip(raw, &plain)) return 2;
    raw.swap(plain);
  }
  NiftiHeaderInfo h;
  std::vector<float> vol;
  if (!decode_payload(raw, &h, &vol)) return 3;
  *ndim = h.ndim;
  for (int i = 0; i < h.ndim; ++i) shape[i] = h.shape[i];
  *data = static_cast<float*>(std::malloc(vol.size() * sizeof(float)));
  if (!*data) return 4;
  std::memcpy(*data, vol.data(), vol.size() * sizeof(float));
  return 0;
}

void gfe_free(void* p) { std::free(p); }

int gfe_version() { return 1; }

}  // extern "C"
