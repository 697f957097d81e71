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

extern "C" {

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
