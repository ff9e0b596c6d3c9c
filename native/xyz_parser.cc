// Fast .xyz geometry parser.
//
// The reference parses geometries with a per-line Python loop
// (charge_gn.py:309-338); for bulk featurization of the 4k-molecule mixed set
// and the 2,220-atom protein that loop dominates startup.  This library
// parses a whole file in one pass over a read buffer.
//
// Contract (matches epnn_tpu.data.xyz and SURVEY §2.6):
//   line 1: atom count (ignored; count inferred from remaining lines)
//   line 2: first whitespace token = float net charge Q
//   lines 3+: "<symbol> <x> <y> <z> [extra tokens ignored]"
//
// Exposed C ABI (ctypes-friendly):
//   int epnn_parse_xyz(const char* path, int* natoms_out, double* q_out,
//                      float* xyz_out /* cap*3 */, char* symbols_out /* cap*4 */,
//                      int capacity);
// Returns 0 on success, negative error codes otherwise.  Symbols are written
// as fixed 4-byte zero-padded records.
//
// Build: make -C native   (g++ -O2 -shared -fPIC)

#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// Read the whole file into a string. Returns false on IO error.
bool read_file(const char* path, std::string* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  if (size < 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(size));
  size_t got = size ? std::fread(&(*out)[0], 1, static_cast<size_t>(size), f) : 0;
  std::fclose(f);
  return got == static_cast<size_t>(size);
}

const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

const char* next_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

}  // namespace

extern "C" {

int epnn_parse_xyz(const char* path, int* natoms_out, double* q_out,
                   float* xyz_out, char* symbols_out, int capacity) {
  std::string buf;
  if (!read_file(path, &buf)) return -1;  // IO error
  const char* p = buf.data();
  const char* end = p + buf.size();

  // line 1: atom count — ignored (inferred from atom lines, like the
  // reference loader, so stale headers don't matter)
  p = next_line(p, end);
  if (p >= end) return -2;  // truncated

  // line 2: net charge = first token
  const char* tok = skip_ws(p, end);
  char* q_end = nullptr;
  double q = std::strtod(tok, &q_end);
  if (q_end == tok) return -3;  // not a float (e.g. raw QM9 property line)
  *q_out = q;
  p = next_line(p, end);

  int n = 0;
  while (p < end) {
    const char* line_end = p;
    while (line_end < end && *line_end != '\n') ++line_end;
    const char* s = skip_ws(p, line_end);
    if (s == line_end) {  // blank line — skip
      p = line_end < end ? line_end + 1 : end;
      continue;
    }
    if (n >= capacity) return -4;  // overflow

    // symbol token (≤3 chars used; record padded to 4)
    char* sym = symbols_out + 4 * n;
    std::memset(sym, 0, 4);
    int si = 0;
    while (s < line_end && !std::isspace(static_cast<unsigned char>(*s))) {
      if (si < 3) sym[si++] = *s;
      ++s;
    }

    // three coordinates; extra tokens (e.g. Mulliken column) ignored
    for (int c = 0; c < 3; ++c) {
      s = skip_ws(s, line_end);
      char* num_end = nullptr;
      double v = std::strtod(s, &num_end);
      if (num_end == s || num_end > line_end) return -5;  // malformed
      xyz_out[3 * n + c] = static_cast<float>(v);
      s = num_end;
    }
    ++n;
    p = line_end < end ? line_end + 1 : end;
  }
  if (n == 0) return -6;  // no atoms
  *natoms_out = n;
  return 0;
}

}  // extern "C"
