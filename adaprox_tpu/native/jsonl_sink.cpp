// Native JSONL sink for solver telemetry.
//
// The reference writes one JSON object per iteration through Julia's
// FormatLogger (experiments/logging.jl:22-27). Here the records come out of
// the compiled loop as stacked arrays (solvers/common.Records); this sink
// formats and writes N rows from column-major double data in one C call,
// avoiding the per-row dict + json.dumps cost of the Python path (the grid
// writes ~10^5-10^6 rows per experiment sweep).
//
// Shortest-round-trip float formatting via std::to_chars (the same
// contract as Python repr), NaN/Infinity spelled as json.dumps does, so
// files are interchangeable with the Python writer.
//
// C ABI (ctypes): see adaprox_write_jsonl below. Thread-safety: none needed
// (one sink per experiment file, written from the driver thread).

#include <charconv>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

namespace {

// shortest representation of v that round-trips: std::to_chars's default
// (shortest) mode — the same contract as Python repr, ~10x faster than a
// snprintf+strtod precision ladder (which dominated the first version's
// profile at 1.5 us/value)
void format_double(char *buf, size_t cap, double v) {
    auto res = std::to_chars(buf, buf + cap - 1, v);
    *res.ptr = '\0';
}

}  // namespace

extern "C" {

// Write n_rows JSONL records to `path` (mode "a" or "w").
//   method:   UTF-8 string or NULL -> no "method" field
//   keys:     n_keys column names
//   values:   row-major (n_rows, n_keys) doubles
//   is_int:   per-column flag: format as integer
// Returns 0 on success, 1 if NOTHING was written (fopen failed — the caller
// may safely fall back to another writer), 2 if rows may be PARTIALLY
// written (a later write/flush/close error — the caller must NOT re-write
// the same rows or the file gets duplicates).
int adaprox_write_jsonl(const char *path, const char *mode, const char *method,
                        const char **keys, int n_keys, const double *values,
                        const unsigned char *is_int, long long n_rows) {
    // format everything into memory FIRST: formatting cannot fail mid-file,
    // so the only partial-write window left is the single fwrite below
    std::string out;
    out.reserve(static_cast<size_t>(n_rows) * (16 * n_keys + 24));
    char num[64];
    for (long long r = 0; r < n_rows; ++r) {
        out += '{';
        bool first = true;
        if (method) {
            out += "\"method\": \"";
            // method names are plain ASCII identifiers; escape the two
            // JSON-critical characters anyway
            for (const char *p = method; *p; ++p) {
                if (*p == '"' || *p == '\\') out += '\\';
                out += *p;
            }
            out += '"';
            first = false;
        }
        const double *row = values + static_cast<size_t>(r) * n_keys;
        for (int k = 0; k < n_keys; ++k) {
            if (!first) out += ", ";
            first = false;
            out += '"';
            out += keys[k];
            out += "\": ";
            double v = row[k];
            // NaN/inf/out-of-range -> long long is UB ([conv.fpint]); a
            // degraded solve writing NaN into a counter column must fall
            // through to the float formats below (json.dumps parity)
            if (is_int[k] && std::isfinite(v)
                && v >= -9.2233720368547758e18 && v <= 9.2233720368547758e18) {
                snprintf(num, sizeof num, "%lld", static_cast<long long>(v));
            } else if (v != v) {
                snprintf(num, sizeof num, "NaN");  // json.dumps parity
            } else if (std::isinf(v)) {
                // json.dumps writes Infinity/-Infinity (non-standard JSON,
                // but what json.loads round-trips) — to_chars would emit
                // "inf", which json.loads rejects
                snprintf(num, sizeof num, v > 0 ? "Infinity" : "-Infinity");
            } else {
                format_double(num, sizeof num, v);
            }
            out += num;
        }
        out += "}\n";
    }

    FILE *f = fopen(path, mode);
    if (!f) return 1;  // nothing written — safe to fall back
    size_t wrote = fwrite(out.data(), 1, out.size(), f);
    int err = (wrote != out.size()) || ferror(f);
    if (fclose(f) != 0) err = 1;
    return err ? 2 : 0;  // 2: bytes may be on disk — fallback would duplicate
}

}  // extern "C"
