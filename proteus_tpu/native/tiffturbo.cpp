// tiffturbo: native TIFF block codec for proteus_tpu.
//
// The reference delegates all raster compression to the GDAL C++ library
// (core.py:57-74); this is our native equivalent: multithreaded
// DEFLATE tile compression with TIFF predictors applied in place, fast
// DEFLATE/LZW decode, and predictor inversion. Exposed through a plain C
// ABI for ctypes (no pybind11 in this environment).
//
// Build: python -m proteus_tpu.native.build

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <atomic>

#ifdef TT_USE_LIBDEFLATE
#include <libdeflate.h>
#else
#include <zlib.h>
#endif

extern "C" {

// ---------------------------------------------------------------------
// predictors
// ---------------------------------------------------------------------

// TIFF predictor 2 (horizontal differencing), in place.
// data: rows x cols x samples elements of itemsize bytes (native LE).
static void predict_h_row(uint8_t* row, int cols, int samples,
                          int itemsize) {
  const int last = cols * samples - 1;
  if (itemsize == 1) {
    for (int j = last; j >= samples; --j)
      row[j] = (uint8_t)(row[j] - row[j - samples]);
  } else if (itemsize == 2) {
    uint16_t* r = (uint16_t*)row;
    for (int j = last; j >= samples; --j)
      r[j] = (uint16_t)(r[j] - r[j - samples]);
  } else if (itemsize == 4) {
    uint32_t* r = (uint32_t*)row;
    for (int j = last; j >= samples; --j)
      r[j] = (uint32_t)(r[j] - r[j - samples]);
  }
}

static void unpredict_h_row(uint8_t* row, int cols, int samples,
                            int itemsize) {
  if (itemsize == 1) {
    for (int j = samples; j < cols * samples; ++j)
      row[j] = (uint8_t)(row[j] + row[j - samples]);
  } else if (itemsize == 2) {
    uint16_t* r = (uint16_t*)row;
    for (int j = samples; j < cols * samples; ++j)
      r[j] = (uint16_t)(r[j] + r[j - samples]);
  } else if (itemsize == 4) {
    uint32_t* r = (uint32_t*)row;
    for (int j = samples; j < cols * samples; ++j)
      r[j] = (uint32_t)(r[j] + r[j - samples]);
  }
}

void tt_predict_h(uint8_t* data, int rows, int cols, int samples,
                  int itemsize) {
  const long row_bytes = (long)cols * samples * itemsize;
  for (int i = 0; i < rows; ++i)
    predict_h_row(data + i * row_bytes, cols, samples, itemsize);
}

void tt_unpredict_h(uint8_t* data, int rows, int cols, int samples,
                    int itemsize) {
  const long row_bytes = (long)cols * samples * itemsize;
  for (int i = 0; i < rows; ++i)
    unpredict_h_row(data + i * row_bytes, cols, samples, itemsize);
}

// TIFF predictor 3 (floating-point): split bytes big-endian
// significance-major per row, then byte-difference. In/out buffers are
// separate (row_bytes scratch avoided by caller passing out).
void tt_predict_float(const uint8_t* in, uint8_t* out, int rows, int cols,
                      int samples, int itemsize) {
  const long n = (long)cols * samples;        // values per row
  const long row_bytes = n * itemsize;
  std::vector<uint8_t> tmp(row_bytes);
  for (int i = 0; i < rows; ++i) {
    const uint8_t* src = in + i * row_bytes;
    // split: byte k (big-endian significance) of all values first.
    // native little-endian value bytes are reversed: BE byte k = LE byte
    // itemsize-1-k
    for (int k = 0; k < itemsize; ++k) {
      uint8_t* dst = tmp.data() + (long)k * n;
      const int le = itemsize - 1 - k;
      for (long v = 0; v < n; ++v) dst[v] = src[v * itemsize + le];
    }
    uint8_t* orow = out + i * row_bytes;
    uint8_t prev = 0;
    for (long b = 0; b < row_bytes; ++b) {
      uint8_t cur = tmp[b];
      orow[b] = (uint8_t)(cur - prev);
      prev = cur;
    }
  }
}

void tt_unpredict_float(const uint8_t* in, uint8_t* out, int rows,
                        int cols, int samples, int itemsize) {
  const long n = (long)cols * samples;
  const long row_bytes = n * itemsize;
  std::vector<uint8_t> tmp(row_bytes);
  for (int i = 0; i < rows; ++i) {
    const uint8_t* src = in + i * row_bytes;
    uint8_t acc = 0;
    for (long b = 0; b < row_bytes; ++b) {
      acc = (uint8_t)(acc + src[b]);
      tmp[b] = acc;
    }
    uint8_t* orow = out + i * row_bytes;
    for (int k = 0; k < itemsize; ++k) {
      const uint8_t* plane = tmp.data() + (long)k * n;
      const int le = itemsize - 1 - k;
      for (long v = 0; v < n; ++v) orow[v * itemsize + le] = plane[v];
    }
  }
}

// ---------------------------------------------------------------------
// DEFLATE
// ---------------------------------------------------------------------

#ifdef TT_USE_LIBDEFLATE

// libdeflate is 5-25x faster than zlib on post-predictor raster tiles in
// both directions; output stays standard zlib-format DEFLATE.

long tt_deflate(const uint8_t* src, long src_len, int level, uint8_t* dst,
                long dst_cap) {
  if (level < 1) level = 1;
  if (level > 12) level = 12;
  struct libdeflate_compressor* c = libdeflate_alloc_compressor(level);
  if (!c) return -1;
  size_t n = libdeflate_zlib_compress(c, src, (size_t)src_len, dst,
                                      (size_t)dst_cap);
  libdeflate_free_compressor(c);
  return n == 0 ? -1 : (long)n;
}

long tt_inflate(const uint8_t* src, long src_len, uint8_t* dst,
                long dst_cap) {
  struct libdeflate_decompressor* d = libdeflate_alloc_decompressor();
  if (!d) return -1;
  size_t actual = 0;
  enum libdeflate_result rc = libdeflate_zlib_decompress(
      d, src, (size_t)src_len, dst, (size_t)dst_cap, &actual);
  libdeflate_free_decompressor(d);
  if (rc != LIBDEFLATE_SUCCESS) return -1;
  return (long)actual;
}

#else  // zlib fallback

long tt_deflate(const uint8_t* src, long src_len, int level, uint8_t* dst,
                long dst_cap) {
  if (level > 9) level = 9;
  uLongf out_len = (uLongf)dst_cap;
  int rc = compress2(dst, &out_len, src, (uLong)src_len, level);
  if (rc != Z_OK) return -1;
  return (long)out_len;
}

long tt_inflate(const uint8_t* src, long src_len, uint8_t* dst,
                long dst_cap) {
  uLongf out_len = (uLongf)dst_cap;
  int rc = uncompress(dst, &out_len, src, (uLong)src_len);
  if (rc != Z_OK) return -1;
  return (long)out_len;
}

#endif

// Compress n_tiles tiles (each rows x cols x samples x itemsize bytes,
// contiguous) with the predictor applied, in parallel.
// out_buf must be n_tiles * bound bytes where bound =
// compressBound(tile_bytes); out_sizes[i] receives each tile's size.
// Returns 0 on success.
int tt_deflate_tiles(const uint8_t* data, long n_tiles, int rows,
                     int cols, int samples, int itemsize, int predictor,
                     int level, int n_threads, uint8_t* out_buf,
                     long bound, long* out_sizes) {
  const long tile_bytes = (long)rows * cols * samples * itemsize;
  std::atomic<long> next(0);
  std::atomic<int> failed(0);

  auto worker = [&]() {
    std::vector<uint8_t> scratch(tile_bytes);
#ifdef TT_USE_LIBDEFLATE
    int lvl = level < 1 ? 1 : (level > 12 ? 12 : level);
    struct libdeflate_compressor* comp = libdeflate_alloc_compressor(lvl);
    if (!comp) { failed.store(1); return; }
#endif
    while (true) {
      long i = next.fetch_add(1);
      if (i >= n_tiles || failed.load()) break;
      const uint8_t* tile = data + i * tile_bytes;
      const uint8_t* payload = tile;
      if (predictor == 2) {
        std::memcpy(scratch.data(), tile, tile_bytes);
        tt_predict_h(scratch.data(), rows, cols, samples, itemsize);
        payload = scratch.data();
      } else if (predictor == 3) {
        tt_predict_float(tile, scratch.data(), rows, cols, samples,
                         itemsize);
        payload = scratch.data();
      }
#ifdef TT_USE_LIBDEFLATE
      size_t n = libdeflate_zlib_compress(comp, payload,
                                          (size_t)tile_bytes,
                                          out_buf + i * bound,
                                          (size_t)bound);
      long sz = n == 0 ? -1 : (long)n;
#else
      long sz = tt_deflate(payload, tile_bytes, level, out_buf + i * bound,
                           bound);
#endif
      if (sz < 0) { failed.store(1); break; }
      out_sizes[i] = sz;
    }
#ifdef TT_USE_LIBDEFLATE
    libdeflate_free_compressor(comp);
#endif
  };

  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return failed.load() ? -1 : 0;
}

// ---------------------------------------------------------------------
// Cubic-B-spline overview decimation (GDAL CUBICSPLINE semantics)
// ---------------------------------------------------------------------

// Separable decimation of a float32 (h, w, s) raster by ``factor``,
// bit-identical to the NumPy reference implementation in io/cog.py
// (_bspline_decimate_axis0 twice): per output element, taps accumulate
// in ascending-tap order in float64, edge windows renormalize by the
// participating weight sum, and the final cast rounds to float32.
// taps/weights are computed once in Python and passed in so both paths
// share the exact same float64 values.
int tt_bspline_decimate_f32(const float* in, long h, long w, long s,
                            int factor, const long* taps,
                            const double* weights, int ntaps,
                            float* out, int n_threads) {
  const long oh = (h + factor - 1) / factor;
  const long ow = (w + factor - 1) / factor;
  const long row_elems = w * s;
  std::vector<double> mid((size_t)oh * row_elems);

  // pass 1: axis 0
  {
    std::atomic<long> next(0);
    auto worker = [&]() {
      while (true) {
        long j = next.fetch_add(1);
        if (j >= oh) break;
        double* num = mid.data() + (size_t)j * row_elems;
        std::memset(num, 0, sizeof(double) * row_elems);
        double den = 0.0;
        for (int t = 0; t < ntaps; ++t) {
          long r = j * (long)factor + taps[t];
          if (r < 0 || r >= h) continue;
          const float* src = in + (size_t)r * row_elems;
          const double wt = weights[t];
          for (long k = 0; k < row_elems; ++k)
            num[k] += wt * (double)src[k];
          den += weights[t];
        }
        for (long k = 0; k < row_elems; ++k) num[k] /= den;
      }
    };
    if (n_threads <= 1) worker();
    else {
      std::vector<std::thread> pool;
      for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
      for (auto& th : pool) th.join();
    }
  }

  // pass 2: axis 1 (per output row, accumulate over column taps in tap
  // order — element order identical to the transposed-axis0 NumPy pass)
  {
    std::atomic<long> next(0);
    auto worker = [&]() {
      std::vector<double> acc(ow * s);
      std::vector<double> den(ow);
      while (true) {
        long i = next.fetch_add(1);
        if (i >= oh) break;
        const double* row = mid.data() + (size_t)i * row_elems;
        std::fill(acc.begin(), acc.end(), 0.0);
        std::fill(den.begin(), den.end(), 0.0);
        for (int t = 0; t < ntaps; ++t) {
          const double wt = weights[t];
          for (long j = 0; j < ow; ++j) {
            long c = j * (long)factor + taps[t];
            if (c < 0 || c >= w) continue;
            const double* v = row + (size_t)c * s;
            double* a = acc.data() + (size_t)j * s;
            for (long k = 0; k < s; ++k) a[k] += wt * v[k];
            den[j] += wt;
          }
        }
        float* orow = out + (size_t)i * ow * s;
        for (long j = 0; j < ow; ++j)
          for (long k = 0; k < s; ++k)
            orow[j * s + k] = (float)(acc[j * s + k] / den[j]);
      }
    };
    if (n_threads <= 1) worker();
    else {
      std::vector<std::thread> pool;
      for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
      for (auto& th : pool) th.join();
    }
  }
  return 0;
}

// ---------------------------------------------------------------------
// LZW (TIFF variant: MSB-first codes, early change)
// ---------------------------------------------------------------------

long tt_lzw_decode(const uint8_t* src, long src_len, uint8_t* dst,
                   long dst_cap) {
  // string table: prefix link + suffix byte, decoded iteratively
  const int CLEAR = 256, EOI = 257, TABLE_MAX = 4096;
  std::vector<int> prefix(TABLE_MAX, -1);
  std::vector<uint8_t> suffix(TABLE_MAX, 0);
  std::vector<uint8_t> stack(TABLE_MAX);

  long bitpos = 0;
  const long nbits = src_len * 8;
  int width = 9;
  int table_size = 258;
  int prev_code = -1;
  long out = 0;

  auto read_code = [&]() -> int {
    if (bitpos + width > nbits) return EOI;
    long byte0 = bitpos >> 3;
    uint32_t val = ((uint32_t)src[byte0] << 16);
    if (byte0 + 1 < src_len) val |= ((uint32_t)src[byte0 + 1] << 8);
    if (byte0 + 2 < src_len) val |= (uint32_t)src[byte0 + 2];
    val >>= (24 - (bitpos & 7) - width);
    bitpos += width;
    return (int)(val & ((1u << width) - 1));
  };

  auto emit = [&](int code) -> int {
    // walk the prefix chain onto the stack, then pop
    int sp = 0;
    int c = code;
    while (c >= 256) {
      if (sp >= TABLE_MAX || c >= table_size) return -1;
      stack[sp++] = suffix[c];
      c = prefix[c];
    }
    uint8_t first = (uint8_t)c;
    if (out + sp + 1 > dst_cap) return -1;
    dst[out++] = first;
    while (sp > 0) dst[out++] = stack[--sp];
    return first;
  };

  while (true) {
    int code = read_code();
    if (code == EOI) break;
    if (code == CLEAR) {
      width = 9;
      table_size = 258;
      prev_code = -1;
      continue;
    }
    if (prev_code < 0) {
      if (code >= 256) return -1;
      if (out + 1 > dst_cap) return -1;
      dst[out++] = (uint8_t)code;
      prev_code = code;
    } else {
      int first;
      if (code < table_size) {
        first = emit(code);
        if (first < 0) return -1;
        if (table_size < TABLE_MAX) {
          prefix[table_size] = prev_code;
          suffix[table_size] = (uint8_t)first;
          ++table_size;
        }
      } else if (code == table_size) {
        // KwKwK case: new entry is prev + first(prev)
        int c = prev_code;
        while (c >= 256) c = prefix[c];
        if (table_size < TABLE_MAX) {
          prefix[table_size] = prev_code;
          suffix[table_size] = (uint8_t)c;
          ++table_size;
        }
        first = emit(code);
        if (first < 0) return -1;
      } else {
        return -1;  // corrupt stream
      }
      prev_code = code;
    }
    if (table_size + 1 >= (1 << width) && width < 12) ++width;
  }
  return out;
}

}  // extern "C"
