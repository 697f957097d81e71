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
  return m;
}

void unmap(Mapped& m) {
  if (m.data) ::munmap(const_cast<char*>(m.data), m.size);
  if (m.fd >= 0) ::close(m.fd);
  m.data = nullptr;
  m.fd = -1;
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

// Pass 1: rows, max feature index (1-based), and total nnz.
// Returns 0 on success, nonzero errno-style code on failure.
int adaprox_libsvm_dims(const char* path, int64_t* out_rows, int64_t* out_cols,
                        int64_t* out_nnz) {
  Mapped m = map_file(path);
  if (!m.ok()) return 1;
  std::vector<size_t> starts = line_starts(m);
  int64_t rows = static_cast<int64_t>(starts.size());

  int nt = n_threads();
  std::vector<int64_t> max_col(nt, 0), nnz(nt, 0);
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; t++) {
    threads.emplace_back([&, t]() {
      for (size_t r = t; r < starts.size(); r += nt) {
        const char* p = m.data + starts[r];
        const char* end = line_end(m, starts[r]);
        char* next;
        strtod(p, &next);  // label
        p = next;
        while (p < end) {
          while (p < end && (*p == ' ' || *p == '\t')) p++;
          if (p >= end || *p == '\n' || *p == '\r') break;
          long col = strtol(p, &next, 10);
          if (next == p || *next != ':') return;  // malformed; bail this line
          p = next + 1;
          strtod(p, &next);
          p = next;
          if (col > max_col[t]) max_col[t] = col;
          nnz[t]++;
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  int64_t cols = 0, total = 0;
  for (int t = 0; t < nt; t++) {
    if (max_col[t] > cols) cols = max_col[t];
    total += nnz[t];
  }
  unmap(m);
  *out_rows = rows;
  *out_cols = cols;
  *out_nnz = total;
  return 0;
}

// Pass 2: fill a caller-allocated dense row-major (rows x ld) float64 matrix
// (zero-initialized by the caller) and the labels vector. ld >= cols allows
// padded layouts. Rows beyond `rows` are untouched.
int adaprox_libsvm_parse_dense(const char* path, double* x, double* y,
                               int64_t rows, int64_t ld) {
  Mapped m = map_file(path);
  if (!m.ok()) return 1;
  std::vector<size_t> starts = line_starts(m);
  if (static_cast<int64_t>(starts.size()) != rows) {
    unmap(m);
    return 2;
  }

  int nt = n_threads();
  std::vector<int> err(nt, 0);
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; t++) {
    threads.emplace_back([&, t]() {
      for (size_t r = t; r < starts.size(); r += nt) {
        const char* p = m.data + starts[r];
        const char* end = line_end(m, starts[r]);
        char* next;
        y[r] = strtod(p, &next);
        p = next;
        double* row = x + static_cast<int64_t>(r) * ld;
        while (p < end) {
          while (p < end && (*p == ' ' || *p == '\t')) p++;
          if (p >= end || *p == '\n' || *p == '\r') break;
          long col = strtol(p, &next, 10);
          if (next == p || *next != ':') {
            err[t] = 3;
            return;
          }
          p = next + 1;
          double v = strtod(p, &next);
          p = next;
          if (col < 1 || col > ld) {
            err[t] = 4;
            return;
          }
          row[col - 1] = v;
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  unmap(m);
  for (int t = 0; t < nt; t++)
    if (err[t]) return err[t];
  return 0;
}

}  // extern "C"
