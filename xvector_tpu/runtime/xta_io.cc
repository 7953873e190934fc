// libxta — native data-plane kernels for the xvector_tpu framework.
//
// The reference offloads its data plane to external Kaldi C++ binaries
// (copy-vector, feat-to-dim, the ark-reading inner loops of
// create_tar_files.py run in Python).  Here the host-side hot loops live in
// one small C++ library driven from Python via ctypes
// (xvector_tpu/runtime/native.py):
//
//   * xta_read_mat       — Kaldi binary float/double matrix decode at a
//                          byte offset (the scp random-access path)
//   * xta_read_compressed — Kaldi CompressedMatrix (CM format 1) decode
//   * xta_materialize    — archive materialisation: for a batch of chunk
//                          descriptors, decode each source matrix once,
//                          slice the requested frame ranges, convert to
//                          fp16, and scatter into the caller's output
//                          tensor.  OpenMP-parallel over chunks with a
//                          per-thread matrix cache.
//   * xta_stream_*       — sequential binary-ark iterator (the streaming
//                          read loop of extraction, models.py:373 /
//                          kaldi_io.read_mat_ark in the reference): one
//                          pass, no per-entry reopen/seek.
//
// Build: make -C xvector_tpu/runtime   (g++ -O3 -march=native -fopenmp)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// ---------------------------------------------------------------------------
// fp32 -> fp16 (IEEE binary16), round-to-nearest-even.
// ---------------------------------------------------------------------------
static inline uint16_t f32_to_f16(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  const uint32_t sign = (x >> 16) & 0x8000u;
  x &= 0x7fffffffu;
  if (x >= 0x47800000u) {                 // overflow / inf / nan
    return sign | (x > 0x7f800000u ? 0x7e00u : 0x7c00u);
  }
  if (x < 0x38800000u) {                  // subnormal / zero
    if (x < 0x33000000u) return sign;     // underflow to zero
    const int shift = 126 - (x >> 23);
    uint32_t mant = (x & 0x7fffffu) | 0x800000u;
    uint32_t rounded = mant >> shift;
    if ((mant >> (shift - 1)) & 1u) {     // round half up is fine here
      rounded += 1u;
    }
    return sign | (uint16_t)rounded;
  }
  uint32_t half = ((x >> 13) & 0x3fffu) | (((x >> 23) - 112) << 10);
  // round-to-nearest-even on the dropped 13 bits
  uint32_t dropped = x & 0x1fffu;
  if (dropped > 0x1000u || (dropped == 0x1000u && (half & 1u))) half += 1u;
  return sign | (uint16_t)half;
}

struct Matrix {
  int rows = 0, cols = 0;
  std::vector<float> data;
};

static int read_exact(std::FILE* f, void* dst, size_t n) {
  return std::fread(dst, 1, n, f) == n ? 0 : -1;
}

// Decode a Kaldi binary matrix payload starting AFTER the \0B marker.
static int decode_mat(std::FILE* f, Matrix* out) {
  char hdr[3];
  if (read_exact(f, hdr, 3)) return -1;
  auto read_i32 = [&](int32_t* v) -> int {
    unsigned char size;
    if (read_exact(f, &size, 1) || size != 4) return -1;
    return read_exact(f, v, 4);
  };
  if (!std::memcmp(hdr, "FM ", 3) || !std::memcmp(hdr, "DM ", 3)) {
    const bool dbl = hdr[0] == 'D';
    int32_t rows, cols;
    if (read_i32(&rows) || read_i32(&cols)) return -1;
    out->rows = rows;
    out->cols = cols;
    out->data.resize((size_t)rows * cols);
    if (dbl) {
      std::vector<double> tmp((size_t)rows * cols);
      if (read_exact(f, tmp.data(), tmp.size() * 8)) return -1;
      for (size_t i = 0; i < tmp.size(); ++i) out->data[i] = (float)tmp[i];
    } else {
      if (read_exact(f, out->data.data(), out->data.size() * 4)) return -1;
    }
    return 0;
  }
  if (!std::memcmp(hdr, "CM ", 3)) {   // CompressedMatrix format 1
    float gmin, grange;
    int32_t rows, cols;
    if (read_exact(f, &gmin, 4) || read_exact(f, &grange, 4) ||
        read_exact(f, &rows, 4) || read_exact(f, &cols, 4))
      return -1;
    std::vector<uint16_t> hdrs((size_t)cols * 4);
    if (read_exact(f, hdrs.data(), hdrs.size() * 2)) return -1;
    std::vector<uint8_t> codes((size_t)cols * rows);
    if (read_exact(f, codes.data(), codes.size())) return -1;
    out->rows = rows;
    out->cols = cols;
    out->data.resize((size_t)rows * cols);
    const double inv = 1.0 / 65535.0;
    for (int c = 0; c < cols; ++c) {
      const double p0 = gmin + grange * hdrs[c * 4 + 0] * inv;
      const double p25 = gmin + grange * hdrs[c * 4 + 1] * inv;
      const double p75 = gmin + grange * hdrs[c * 4 + 2] * inv;
      const double p100 = gmin + grange * hdrs[c * 4 + 3] * inv;
      const uint8_t* col = codes.data() + (size_t)c * rows;
      for (int r = 0; r < rows; ++r) {
        const double v = col[r];
        double val;
        if (v <= 64.0)
          val = p0 + (p25 - p0) * (v / 64.0);
        else if (v <= 192.0)
          val = p25 + (p75 - p25) * ((v - 64.0) / 128.0);
        else
          val = p75 + (p100 - p75) * ((v - 192.0) / 63.0);
        out->data[(size_t)r * cols + c] = (float)val;
      }
    }
    return 0;
  }
  return -2;  // unknown header
}

static int read_mat_at(const char* path, int64_t offset, Matrix* out) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  int rc = -1;
  do {
    if (offset > 0 && std::fseek(f, (long)offset, SEEK_SET)) break;
    char marker[2];
    if (read_exact(f, marker, 2) || marker[0] != '\0' || marker[1] != 'B')
      break;
    rc = decode_mat(f, out);
  } while (false);
  std::fclose(f);
  return rc;
}

}  // namespace

extern "C" {

// Probe a matrix's dims.  Returns 0 on success.
int xta_mat_shape(const char* path, int64_t offset, int32_t* rows,
                  int32_t* cols) {
  Matrix m;
  if (read_mat_at(path, offset, &m)) return -1;
  *rows = m.rows;
  *cols = m.cols;
  return 0;
}

// Read a matrix into a caller-provided buffer of capacity cap floats.
int xta_read_mat(const char* path, int64_t offset, float* out, int64_t cap,
                 int32_t* rows, int32_t* cols) {
  Matrix m;
  if (read_mat_at(path, offset, &m)) return -1;
  if ((int64_t)m.data.size() > cap) return -3;
  std::memcpy(out, m.data.data(), m.data.size() * 4);
  *rows = m.rows;
  *cols = m.cols;
  return 0;
}

// Materialise a set of chunks into an fp16 tensor.
//
// n         : number of chunks
// paths     : n C strings — source ark file per chunk
// offsets   : n byte offsets of the \0B marker in the ark
// row_begin : n first-frame indices
// lengths   : n frame counts
// out_index : n destination slot indices into `out`
// out       : fp16 tensor (slots, pad_len, feat_dim), caller-zeroed
// pad_len   : slot length in frames (chunk rows land at [0, length))
// feat_dim  : feature dimension (must match every source matrix)
//
// Returns 0 on success, <0 on the first failing chunk.
int xta_materialize(int64_t n, const char** paths, const int64_t* offsets,
                    const int32_t* row_begin, const int32_t* lengths,
                    const int32_t* out_index, uint16_t* out,
                    int64_t pad_len, int64_t feat_dim) {
  int status = 0;
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    // per-thread decoded-matrix cache keyed by (path, offset)
    std::unordered_map<std::string, Matrix> cache;
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 4)
#endif
    for (int64_t i = 0; i < n; ++i) {
      if (status) continue;
      std::string key = std::string(paths[i]) + ":" +
                        std::to_string(offsets[i]);
      auto it = cache.find(key);
      if (it == cache.end()) {
        if (cache.size() > 64) cache.clear();
        Matrix m;
        if (read_mat_at(paths[i], offsets[i], &m)) {
#ifdef _OPENMP
#pragma omp atomic write
#endif
          status = (int)(-100 - i);
          continue;
        }
        it = cache.emplace(std::move(key), std::move(m)).first;
      }
      const Matrix& m = it->second;
      if (m.cols != feat_dim || row_begin[i] + lengths[i] > m.rows) {
#ifdef _OPENMP
#pragma omp atomic write
#endif
        status = (int)(-200 - i);
        continue;
      }
      uint16_t* dst = out + (size_t)out_index[i] * pad_len * feat_dim;
      const float* src =
          m.data.data() + (size_t)row_begin[i] * feat_dim;
      for (int64_t r = 0; r < lengths[i]; ++r)
        for (int64_t c = 0; c < feat_dim; ++c)
          dst[r * feat_dim + c] = f32_to_f16(src[r * feat_dim + c]);
    }
  }
  return status;
}

// ---------------------------------------------------------------------------
// Sequential ark stream: key<space>\0B<matrix> entries, decoded one by one.
// ---------------------------------------------------------------------------

struct XtaStream {
  std::FILE* f = nullptr;
  Matrix cur;          // decoded payload (CM only)
  char fmt = 0;        // 'F' (float), 'D' (double), 'C' (compressed)
  int32_t rows = 0, cols = 0;
  bool pending = false;  // FM/DM payload not yet consumed from the stream
};

// Open a binary ark for sequential reading.  Returns nullptr on failure.
void* xta_stream_open(const char* path) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  XtaStream* s = new XtaStream;
  s->f = f;
  // larger stdio buffer: ark payloads are ~100 KB sequential reads
  std::setvbuf(f, nullptr, _IOFBF, 1 << 20);
  return s;
}

// Advance to the next entry.  Writes the NUL-terminated key (capacity
// key_cap) and the matrix dims.  FM/DM payloads are left in the stream and
// decoded straight into the caller's buffer by xta_stream_data (single
// copy); CM needs its column-major percentile decode, done here into a
// scratch matrix.  Returns 0 on success, 1 at EOF, <0 on a malformed
// entry.
int xta_stream_next(void* handle, char* key, int64_t key_cap, int32_t* rows,
                    int32_t* cols) {
  XtaStream* s = static_cast<XtaStream*>(handle);
  if (s->pending) {  // caller skipped the previous payload
    const int64_t bytes =
        (int64_t)s->rows * s->cols * (s->fmt == 'D' ? 8 : 4);
    if (std::fseek(s->f, (long)bytes, SEEK_CUR)) return -8;
    s->pending = false;
  }
  int64_t n = 0;
  int ch = std::fgetc(s->f);
  if (ch == EOF) return 1;
  while (ch != EOF && ch != ' ') {
    if (n + 1 >= key_cap) return -4;
    key[n++] = (char)ch;
    ch = std::fgetc(s->f);
  }
  if (ch == EOF || n == 0) return -5;
  key[n] = '\0';
  char marker[2];
  if (read_exact(s->f, marker, 2) || marker[0] != '\0' || marker[1] != 'B')
    return -6;
  char hdr[3];
  if (read_exact(s->f, hdr, 3)) return -7;
  if (!std::memcmp(hdr, "FM ", 3) || !std::memcmp(hdr, "DM ", 3)) {
    unsigned char sz;
    if (read_exact(s->f, &sz, 1) || sz != 4 ||
        read_exact(s->f, &s->rows, 4) ||
        read_exact(s->f, &sz, 1) || sz != 4 ||
        read_exact(s->f, &s->cols, 4))
      return -7;
    s->fmt = hdr[0];
    s->pending = true;
  } else if (!std::memcmp(hdr, "CM ", 3)) {
    // rewind over the 3-byte sub-header and reuse the seekless decoder
    if (std::fseek(s->f, -3, SEEK_CUR)) return -8;
    if (decode_mat(s->f, &s->cur)) return -7;
    s->fmt = 'C';
    s->rows = s->cur.rows;
    s->cols = s->cur.cols;
  } else {
    return -2;
  }
  *rows = s->rows;
  *cols = s->cols;
  return 0;
}

// Write the current entry's payload into a caller buffer of cap floats.
int xta_stream_data(void* handle, float* out, int64_t cap) {
  XtaStream* s = static_cast<XtaStream*>(handle);
  const int64_t count = (int64_t)s->rows * s->cols;
  if (count > cap) return -3;
  if (s->fmt == 'F') {
    if (!s->pending) return -9;
    s->pending = false;
    return read_exact(s->f, out, (size_t)count * 4);
  }
  if (s->fmt == 'D') {
    if (!s->pending) return -9;
    s->pending = false;
    std::vector<double> tmp((size_t)count);
    if (read_exact(s->f, tmp.data(), tmp.size() * 8)) return -1;
    for (int64_t i = 0; i < count; ++i) out[i] = (float)tmp[i];
    return 0;
  }
  std::memcpy(out, s->cur.data.data(), (size_t)count * 4);
  return 0;
}

void xta_stream_close(void* handle) {
  XtaStream* s = static_cast<XtaStream*>(handle);
  if (s->f) std::fclose(s->f);
  delete s;
}

int xta_version() { return 2; }

}  // extern "C"
