// Fast parallel LIBSVM text parser.
//
// Native data-loading path for adaprox_tpu (the reference's loader is the
// single-threaded Julia parser at experiments/libsvm.jl:3-61). Parses
// "label idx:val idx:val ..." lines from an mmap'd file into a dense
// row-major float64 matrix + label vector, splitting the file into
// per-thread line ranges. Exposed through a C ABI consumed via ctypes
// (adaprox_tpu/native/__init__.py) — no pybind11 dependency.
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread (see build.py).

#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Mapped {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;
  char* owned = nullptr;  // heap copy when the file needs NUL termination
  bool ok() const { return data != nullptr; }
};

Mapped map_file(const char* path) {
  Mapped m;
  m.fd = ::open(path, O_RDONLY);
  if (m.fd < 0) return m;
  struct stat st;
  if (fstat(m.fd, &st) != 0 || st.st_size == 0) {
    ::close(m.fd);
    m.fd = -1;
    return m;
  }
  void* p = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, m.fd, 0);
  if (p == MAP_FAILED) {
    ::close(m.fd);
    m.fd = -1;
    return m;
  }
  m.data = static_cast<const char*>(p);
  m.size = st.st_size;
  if (m.data[m.size - 1] != '\n') {
    // strtod/strtol run to the terminator: a file that ends mid-token at
    // an exact page boundary would read one byte past the mapping
    // (SIGSEGV). Rare case (no trailing newline): parse a NUL-terminated
    // heap copy instead.
    m.owned = static_cast<char*>(::malloc(m.size + 1));
    if (m.owned == nullptr) {
      ::munmap(p, m.size);
      ::close(m.fd);
      m = Mapped{};
      return m;
    }
    memcpy(m.owned, m.data, m.size);
    m.owned[m.size] = '\0';
    ::munmap(p, m.size);
    m.data = m.owned;
  }
  return m;
}

void unmap(Mapped& m) {
  if (m.owned) {
    ::free(m.owned);
  } else if (m.data) {
    ::munmap(const_cast<char*>(m.data), m.size);
  }
  if (m.fd >= 0) ::close(m.fd);
  m = Mapped{};
}

// Offsets of the first character of every non-empty line.
std::vector<size_t> line_starts(const Mapped& m) {
  std::vector<size_t> starts;
  starts.reserve(m.size / 64 + 1);
  size_t i = 0;
  while (i < m.size) {
    // skip leading whitespace-only lines
    size_t j = i;
    while (j < m.size && (m.data[j] == ' ' || m.data[j] == '\t')) j++;
    if (j < m.size && m.data[j] != '\n' && m.data[j] != '\r') starts.push_back(i);
    while (i < m.size && m.data[i] != '\n') i++;
    i++;  // past '\n'
  }
  return starts;
}

inline const char* line_end(const Mapped& m, size_t start) {
  const char* p = static_cast<const char*>(
      memchr(m.data + start, '\n', m.size - start));
  return p ? p : m.data + m.size;
}

int n_threads() {
  unsigned hw = std::thread::hardware_concurrency();
  return hw == 0 ? 1 : static_cast<int>(hw > 16 ? 16 : hw);
}

}  // namespace

namespace {

// Per-thread COO triples from a single pass over the thread's line range.
struct CooChunk {
  std::vector<int32_t> rows;
  std::vector<int32_t> cols;
  std::vector<double> vals;
  int64_t max_col = 0;
  int err = 0;
};

}  // namespace

extern "C" {

// Single-pass parse into an opaque COO handle. Returns 0 on success and
// fills rows/cols/nnz; retrieve the data with adaprox_libsvm_coo_fill then
// free with adaprox_libsvm_coo_free.
struct AdaproxCoo {
  std::vector<CooChunk> chunks;
  std::vector<double> labels;
  int64_t rows = 0;
  int64_t cols = 0;
  int64_t nnz = 0;
};

void* adaprox_libsvm_parse_coo(const char* path, int64_t* out_rows,
                               int64_t* out_cols, int64_t* out_nnz) {
  Mapped m = map_file(path);
  if (!m.ok()) return nullptr;
  std::vector<size_t> starts = line_starts(m);
  auto* coo = new AdaproxCoo();
  coo->rows = static_cast<int64_t>(starts.size());
  coo->labels.assign(starts.size(), 0.0);

  int nt = n_threads();
  coo->chunks.resize(nt);
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; t++) {
    threads.emplace_back([&, t]() {
      CooChunk& ck = coo->chunks[t];
      ck.rows.reserve(m.size / (64 * nt));
      for (size_t r = t; r < starts.size(); r += nt) {
        const char* p = m.data + starts[r];
        const char* end = line_end(m, starts[r]);
        char* next;
        coo->labels[r] = strtod(p, &next);
        p = next;
        while (p < end) {
          while (p < end && (*p == ' ' || *p == '\t')) p++;
          if (p >= end || *p == '\n' || *p == '\r') break;
          long col = strtol(p, &next, 10);
          if (next == p || *next != ':') {
            ck.err = 3;
            return;
          }
          p = next + 1;
          double v = strtod(p, &next);
          if (next == p || next > end) {
            // truncated token like "3:" at end of line: strtod skips the
            // newline and consumes the NEXT line's label as this value —
            // next lands past the line end, which must be an error
            ck.err = 5;
            return;
          }
          p = next;
          if (col < 1) {
            ck.err = 4;
            return;
          }
          ck.rows.push_back(static_cast<int32_t>(r));
          ck.cols.push_back(static_cast<int32_t>(col - 1));
          ck.vals.push_back(v);
          if (col > ck.max_col) ck.max_col = col;
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  unmap(m);
  for (auto& ck : coo->chunks) {
    if (ck.err) {
      delete coo;
      return nullptr;
    }
    if (ck.max_col > coo->cols) coo->cols = ck.max_col;
    coo->nnz += static_cast<int64_t>(ck.vals.size());
  }
  *out_rows = coo->rows;
  *out_cols = coo->cols;
  *out_nnz = coo->nnz;
  return coo;
}

// Scatter the COO data into a caller-allocated zeroed dense (rows x ld)
// matrix + labels, then free nothing (call coo_free separately).
int adaprox_libsvm_coo_fill_dense(void* handle, double* x, double* y,
                                  int64_t ld) {
  auto* coo = static_cast<AdaproxCoo*>(handle);
  if (coo == nullptr) return 1;
  for (int64_t r = 0; r < coo->rows; r++) y[r] = coo->labels[r];
  for (auto& ck : coo->chunks) {
    for (size_t i = 0; i < ck.vals.size(); i++) {
      if (ck.cols[i] >= ld) return 4;
      x[static_cast<int64_t>(ck.rows[i]) * ld + ck.cols[i]] = ck.vals[i];
    }
  }
  return 0;
}

void adaprox_libsvm_coo_free(void* handle) {
  delete static_cast<AdaproxCoo*>(handle);
}

}  // extern "C"
