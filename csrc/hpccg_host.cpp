// Native host-side runtime for hpccg_tpu (the counterpart of the reference's
// C++ host tier: read_HPC_row.cpp's parser and generate_matrix.cpp's
// assembly loop). Compiled to libhpccg_host.so and loaded via ctypes
// (hpccg_tpu/native.py). The TPU compute path stays JAX/Pallas; this library
// covers the host-bound work: file tokenization, ELL assembly, serialization.
//
// Written from the format/problem *specification* in SURVEY.md — not a copy
// of the reference sources.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cerrno>
#include <limits>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Fast numeric tokenizer: parse all whitespace-separated numbers in a file.
// Returns the token count, or -1 on IO error. If out != nullptr it must have
// room for cap tokens; parsing stops at cap.
// ---------------------------------------------------------------------------
int64_t hpccg_tokenize_file(const char* path, double* out, int64_t cap) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size < 0) {
    std::fclose(f);
    return -1;
  }
  char* buf = static_cast<char*>(std::malloc(size + 1));
  if (!buf) {
    std::fclose(f);
    return -1;
  }
  size_t rd = std::fread(buf, 1, size, f);
  std::fclose(f);
  buf[rd] = '\0';

  int64_t n = 0;
  char* p = buf;
  char* end = buf + rd;
  while (p < end) {
    char* next = nullptr;
    errno = 0;
    double v = std::strtod(p, &next);
    if (next == p) {
      ++p;  // skip non-numeric byte
      continue;
    }
    if (out) {
      if (n >= cap) break;
      out[n] = v;
    }
    ++n;
    p = next;
  }
  std::free(buf);
  return n;
}

// ---------------------------------------------------------------------------
// Streaming range tokenizer: parse numeric tokens [skip, skip+cap) of a file
// WITHOUT loading the file (fixed 1 MiB window with a carry for tokens split
// across window edges). This is the bounded-memory distributed-loading tier:
// the reference's read_HPC_row reads only each rank's row block
// (read_HPC_row.cpp:255-293); a pod-scale file must never materialize whole
// per process. Returns tokens written (< cap means the file ended), or -1 on
// IO error, -2 on a token longer than the window (not a real text format).
// ---------------------------------------------------------------------------
int64_t hpccg_tokenize_range(const char* path, int64_t skip, double* out,
                             int64_t cap) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  const size_t CH = 1 << 20;
  char* buf = static_cast<char*>(std::malloc(CH + 1));
  if (!buf) {
    std::fclose(f);
    return -1;
  }
  size_t have = 0;
  int64_t to_skip = skip;
  int64_t emitted = 0;
  bool eof = false;
  while (emitted < cap || out == nullptr) {
    if (!eof) {
      size_t rd = std::fread(buf + have, 1, CH - have, f);
      if (rd < CH - have) eof = true;
      have += rd;
    }
    buf[have] = '\0';
    char* p = buf;
    char* end = buf + have;
    while (p < end && emitted < cap) {
      char* next = nullptr;
      errno = 0;
      double v = std::strtod(p, &next);
      if (next == p) {
        ++p;  // non-numeric byte
        continue;
      }
      if (next == end && !eof) break;  // token may continue in next window
      if (to_skip > 0) {
        --to_skip;
      } else {
        if (out) out[emitted] = v;
        ++emitted;
      }
      p = next;
    }
    if (emitted >= cap) break;
    size_t tail = static_cast<size_t>(end - p);
    if (tail == have && have == CH) {  // no progress: token wider than window
      std::free(buf);
      std::fclose(f);
      return -2;
    }
    std::memmove(buf, p, tail);
    have = tail;
    if (eof && tail == 0) break;
    if (eof && tail == have && p == buf) break;  // nothing parseable left
  }
  std::free(buf);
  std::fclose(f);
  return emitted;
}

// ---------------------------------------------------------------------------
// Chained-cursor variant of the range tokenizer: start parsing at an
// absolute BYTE offset, skip `skip` tokens, emit up to `cap`, and (when
// end_byte != nullptr) report the byte offset just past the last consumed
// token — the next call resumes there with zero re-parsing. This turns the
// distributed loader's per-device reads into ONE forward pass per file
// section instead of O(devices) token-skip re-parses from byte 0
// (tokens are whitespace-delimited, so resuming at a token boundary is
// safe). Returns tokens written, -1 on IO error, -2 on an over-wide token.
// ---------------------------------------------------------------------------
int64_t hpccg_tokenize_range_at(const char* path, int64_t start_byte,
                                int64_t skip, double* out, int64_t cap,
                                int64_t* end_byte) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  if (start_byte > 0 && std::fseek(f, (long)start_byte, SEEK_SET) != 0) {
    std::fclose(f);
    return -1;
  }
  const size_t CH = 1 << 20;
  char* buf = static_cast<char*>(std::malloc(CH + 1));
  if (!buf) {
    std::fclose(f);
    return -1;
  }
  size_t have = 0;
  int64_t base = start_byte;  // absolute file offset of buf[0]
  int64_t last_end = start_byte;
  int64_t to_skip = skip;
  int64_t emitted = 0;
  bool eof = false;
  // skip-only calls (cap == 0) still consume their tokens so end_byte
  // lands after the skipped section
  while (to_skip > 0 || emitted < cap || out == nullptr) {
    if (!eof) {
      size_t rd = std::fread(buf + have, 1, CH - have, f);
      if (rd < CH - have) eof = true;
      have += rd;
    }
    buf[have] = '\0';
    char* p = buf;
    char* end = buf + have;
    while (p < end && (to_skip > 0 || emitted < cap)) {
      char* next = nullptr;
      errno = 0;
      double v = std::strtod(p, &next);
      if (next == p) {
        ++p;  // non-numeric byte
        continue;
      }
      if (next == end && !eof) break;  // token may continue in next window
      if (to_skip > 0) {
        --to_skip;
      } else {
        if (out) out[emitted] = v;
        ++emitted;
      }
      last_end = base + (int64_t)(next - buf);
      p = next;
    }
    if (to_skip <= 0 && emitted >= cap && out != nullptr) break;
    size_t tail = static_cast<size_t>(end - p);
    if (tail == have && have == CH) {  // no progress: token wider than window
      std::free(buf);
      std::fclose(f);
      return -2;
    }
    base += (int64_t)(p - buf);
    std::memmove(buf, p, tail);
    have = tail;
    if (eof && tail == 0) break;
    if (eof && tail == have && p == buf) break;  // nothing parseable left
  }
  std::free(buf);
  std::fclose(f);
  if (end_byte) *end_byte = last_end;
  return emitted;
}

// ---------------------------------------------------------------------------
// Streaming block scan for the HPC-row format: one bounded-memory pass over
// the header + ALL per-row counts, returning [total_nrow, total_nnz,
// prefix_nnz_before_block, block_nnz, block_max_count, global_max_count]
// and the block's own counts. global_max_count spans every row, so all
// processes derive the same uniform ELL width without holding all counts.
// The caller then range-tokenizes exactly its (val, ind) pairs and
// x/b/xexact triples (read_HPC_row.cpp:255-293's per-rank read, TPU-style).
// Returns 0, -1 on IO error, -3 on a malformed/short header.
// ---------------------------------------------------------------------------
int32_t hpccg_scan_block(const char* path, int64_t start_row,
                         int64_t block_rows, int64_t* hdr_out,
                         int64_t* counts_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  const size_t CH = 1 << 20;
  char* buf = static_cast<char*>(std::malloc(CH + 1));
  if (!buf) {
    std::fclose(f);
    return -1;
  }
  size_t have = 0;
  bool eof = false;
  int64_t tok = 0;  // token index in the file
  int64_t total_nrow = -1, total_nnz = -1;
  int64_t prefix = 0, block_nnz = 0, block_max = 0, global_max = 0;
  bool done = false;
  while (!done) {
    if (!eof) {
      size_t rd = std::fread(buf + have, 1, CH - have, f);
      if (rd < CH - have) eof = true;
      have += rd;
    }
    buf[have] = '\0';
    char* p = buf;
    char* end = buf + have;
    while (p < end) {
      char* next = nullptr;
      errno = 0;
      double v = std::strtod(p, &next);
      if (next == p) {
        ++p;
        continue;
      }
      if (next == end && !eof) break;
      if (tok == 0) {
        total_nrow = static_cast<int64_t>(v);
      } else if (tok == 1) {
        total_nnz = static_cast<int64_t>(v);
      } else {
        const int64_t row = tok - 2;
        if (row >= total_nrow) {
          done = true;  // scanned every count
          break;
        }
        const int64_t c = static_cast<int64_t>(v);
        if (c > global_max) global_max = c;
        if (row < start_row) {
          prefix += c;
        } else if (row < start_row + block_rows) {
          counts_out[row - start_row] = c;
          block_nnz += c;
          if (c > block_max) block_max = c;
        }
        if (row + 1 == total_nrow) {
          ++tok;
          done = true;
          break;
        }
      }
      ++tok;
      p = next;
    }
    if (done) break;
    size_t tail = static_cast<size_t>(end - p);
    if (tail == have && have == CH) {
      std::free(buf);
      std::fclose(f);
      return -2;
    }
    std::memmove(buf, p, tail);
    have = tail;
    if (eof && tail == 0) break;
  }
  std::free(buf);
  std::fclose(f);
  if (total_nrow < 0 || total_nnz < 0 || tok < 2 + total_nrow) {
    return -3;
  }
  hdr_out[0] = total_nrow;
  hdr_out[1] = total_nnz;
  hdr_out[2] = prefix;
  hdr_out[3] = block_nnz;
  hdr_out[4] = block_max;
  hdr_out[5] = global_max;
  return 0;
}

// ---------------------------------------------------------------------------
// ELL stencil assembly: the reference's generate_matrix triple loop
// (27-pt or 7-pt), emitting padded ELL directly. Row r of the local block
// owns global row start_row + r; columns are global; invalid slots get
// val=0, col=0, valid=0. width must be 27 (or 7 for seven_pt).
// Also writes b = A@ones into b_out. Returns total valid nnz.
// ---------------------------------------------------------------------------
int64_t hpccg_generate_ell(int32_t nx, int32_t ny, int32_t nz, int32_t rank,
                           int32_t size, int32_t seven_pt, double* vals,
                           int32_t* cols, uint8_t* valid, double* b_out) {
  const int64_t local_nrow = (int64_t)nx * ny * nz;
  const int64_t total_nrow = local_nrow * size;
  const int64_t start_row = local_nrow * rank;
  const int64_t plane = (int64_t)nx * ny;
  const int width = seven_pt ? 7 : 27;

  int64_t nnz = 0;
  for (int32_t iz = 0; iz < nz; ++iz) {
    for (int32_t iy = 0; iy < ny; ++iy) {
      for (int32_t ix = 0; ix < nx; ++ix) {
        const int64_t lrow = (int64_t)iz * plane + (int64_t)iy * nx + ix;
        const int64_t grow = start_row + lrow;
        double* vrow = vals + lrow * width;
        int32_t* crow = cols + lrow * width;
        uint8_t* mrow = valid + lrow * width;
        int slot = 0;
        int nnzrow = 0;
        for (int sz = -1; sz <= 1; ++sz) {
          for (int sy = -1; sy <= 1; ++sy) {
            for (int sx = -1; sx <= 1; ++sx) {
              if (seven_pt && sz * sz + sy * sy + sx * sx > 1) continue;
              const int64_t col = grow + (int64_t)sz * plane + (int64_t)sy * nx + sx;
              const bool ok = ix + sx >= 0 && ix + sx < nx && iy + sy >= 0 &&
                              iy + sy < ny && col >= 0 && col < total_nrow;
              if (ok) {
                vrow[slot] = (col == grow) ? 27.0 : -1.0;
                crow[slot] = (int32_t)col;
                mrow[slot] = 1;
                ++nnzrow;
              } else {
                vrow[slot] = 0.0;
                crow[slot] = 0;
                mrow[slot] = 0;
              }
              ++slot;
            }
          }
        }
        b_out[lrow] = 27.0 - (double)(nnzrow - 1);
        nnz += nnzrow;
      }
    }
  }
  return nnz;
}

// ---------------------------------------------------------------------------
// HPC-row writer (inverse of read_HPC_row's format): header, per-row counts,
// (val, ind) pairs, then x/b/xexact triples. Returns 0 on success.
// ---------------------------------------------------------------------------
int32_t hpccg_write_hpc_row(const char* path, int64_t nrow, int32_t width,
                            const double* vals, const int32_t* cols,
                            const uint8_t* valid, const double* x,
                            const double* b, const double* xexact) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  int64_t nnz = 0;
  for (int64_t i = 0; i < nrow * width; ++i) nnz += valid[i];
  std::fprintf(f, "%lld %lld\n", (long long)nrow, (long long)nnz);
  for (int64_t r = 0; r < nrow; ++r) {
    int cnt = 0;
    for (int32_t w = 0; w < width; ++w) cnt += valid[r * width + w];
    std::fprintf(f, "%d%c", cnt, r + 1 == nrow ? '\n' : ' ');
  }
  for (int64_t r = 0; r < nrow; ++r) {
    bool first = true;
    for (int32_t w = 0; w < width; ++w) {
      const int64_t k = r * width + w;
      if (!valid[k]) continue;
      std::fprintf(f, "%s%.17g %d", first ? "" : " ", vals[k], cols[k]);
      first = false;
    }
    std::fputc('\n', f);
  }
  for (int64_t r = 0; r < nrow; ++r) {
    std::fprintf(f, "%.17g %.17g %.17g\n", x[r], b[r], xexact[r]);
  }
  std::fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Reverse Cuthill-McKee ordering (the setup-phase index-relabeling tier —
// the role of make_local_matrix.cpp's renumbering pass, aimed at the TPU
// kernels' banded formats). BFS from minimum-degree seeds with
// degree-sorted neighbor expansion; output reversed. Graph = symmetric
// union of the given (row, col) edges; duplicates are harmless (visited
// flags). Returns 0, or -1 on bad input.
int32_t hpccg_rcm(int64_t n, int64_t nnz, const int64_t* rows,
                  const int64_t* cols, int64_t* perm_out) {
  if (n < 0 || nnz < 0) return -1;
  std::vector<int64_t> deg(n, 0);
  for (int64_t i = 0; i < nnz; ++i) {
    const int64_t r = rows[i], c = cols[i];
    if (r < 0 || r >= n || c < 0 || c >= n) return -1;
    if (r != c) {
      deg[r]++;
      deg[c]++;
    }
  }
  std::vector<int64_t> indptr(n + 1, 0);
  for (int64_t v = 0; v < n; ++v) indptr[v + 1] = indptr[v] + deg[v];
  std::vector<int64_t> adj(indptr[n]);
  std::vector<int64_t> fill(indptr.begin(), indptr.end() - 1);
  for (int64_t i = 0; i < nnz; ++i) {
    const int64_t r = rows[i], c = cols[i];
    if (r != c) {
      adj[fill[r]++] = c;
      adj[fill[c]++] = r;
    }
  }
  std::vector<int64_t> seeds(n);
  for (int64_t v = 0; v < n; ++v) seeds[v] = v;
  std::stable_sort(seeds.begin(), seeds.end(),
                   [&](int64_t a, int64_t b) { return deg[a] < deg[b]; });
  std::vector<char> visited(n, 0);
  int64_t head = 0, tail = 0;
  std::vector<int64_t> nbrs;
  for (int64_t s : seeds) {
    if (visited[s]) continue;
    visited[s] = 1;
    perm_out[tail++] = s;
    while (head < tail) {
      const int64_t u = perm_out[head++];
      nbrs.clear();
      for (int64_t j = indptr[u]; j < indptr[u + 1]; ++j) {
        const int64_t v = adj[j];
        if (!visited[v]) {
          visited[v] = 1;  // mark now: dedups repeated edges in-place
          nbrs.push_back(v);
        }
      }
      std::stable_sort(nbrs.begin(), nbrs.end(), [&](int64_t a, int64_t b) {
        return deg[a] != deg[b] ? deg[a] < deg[b] : a < b;
      });
      for (int64_t v : nbrs) perm_out[tail++] = v;
    }
  }
  std::reverse(perm_out, perm_out + n);
  return 0;
}

// ---------------------------------------------------------------------------
// Strip-bucketed gather-stack preprocessing (the host half of
// ops/pallas/gell_stack.py). The NumPy prep is a chain of full-array
// passes (per-row argsort, strip ids, run starts, a 26M-element fancy
// scatter) costing ~minutes at 1M x 27; these two single-pass kernels do
// the same work row-at-a-time. Semantics match the NumPy path EXACTLY
// (stable sort by column with invalid entries last; each strip of a
// sorted row is one contiguous run; slot-within-strip = run position).
//
// hpccg_stack_scan: per-strip ELL widths + per-(strip, slot) chunk-scan
// bounds over valid entries. widths must be zero-initialized; lo_sw
// INT32_MAX-initialized and hi_sw (-1)-initialized, both sized S*width.
// Returns 0, or -1 on an out-of-range strip id / window index.
int32_t hpccg_stack_scan(int64_t n, int32_t width, const int32_t* cols,
                         const uint8_t* valid, int64_t pbl, int64_t w_el,
                         int64_t S, int64_t* widths, int32_t* lo_sw,
                         int32_t* hi_sw) {
  if (n < 0 || width <= 0 || w_el <= 0 || S < 0) return -1;
  std::vector<std::pair<int64_t, int32_t>> row;  // (col, original slot)
  row.reserve(width);
  for (int64_t i = 0; i < n; ++i) {
    row.clear();
    const int64_t off = i * width;
    for (int32_t w = 0; w < width; ++w)
      if (valid[off + w]) row.emplace_back((int64_t)cols[off + w], w);
    std::stable_sort(row.begin(), row.end(),
                     [](const auto& a, const auto& b) { return a.first < b.first; });
    const int64_t tile_base = (i / 1024) * 1024;
    int64_t cur_sid = -1, slot = 0;
    for (const auto& e : row) {
      const int64_t sid = (e.first - i + pbl) / w_el;
      if (sid < 0 || sid >= S) return -1;
      slot = (sid == cur_sid) ? slot + 1 : 0;
      cur_sid = sid;
      if (slot + 1 > widths[sid]) widths[sid] = slot + 1;
      const int64_t li = e.first - tile_base - (sid * w_el - pbl);
      if (li < 0 || li > 32767) return -1;
      const int32_t ci = (int32_t)(li >> 7);
      int32_t* lo = &lo_sw[sid * width + slot];
      int32_t* hi = &hi_sw[sid * width + slot];
      if (ci < *lo) *lo = ci;
      if (ci > *hi) *hi = ci;
    }
  }
  return 0;
}

// hpccg_stack_fill: scatter the (value, window-local index) pairs straight
// into the (T, wtot, 8, 128) tile layout. vals arrive as f64 regardless of
// the matrix dtype; dd=0 writes (float)v into vp4 (vp4lo unused), dd=1
// writes the exact double-float split (hi, lo) pair. vp4/vp4lo must be
// zero-initialized and lp4 prefilled with each slot's parking index
// (lo_sw*128 mapped through base — gell_stack.py does this with one
// broadcast). base[s] = first output slot column of strip s (-1 = strip
// empty/dropped). Returns 0, or -1 on inconsistent inputs.
int32_t hpccg_stack_fill(int64_t n, int32_t width, const double* vals,
                         const int32_t* cols, const uint8_t* valid,
                         int64_t pbl, int64_t w_el, int64_t S,
                         const int64_t* base, int64_t wtot, int32_t dd,
                         float* vp4, float* vp4lo, int16_t* lp4) {
  if (n < 0 || width <= 0 || w_el <= 0 || S < 0 || wtot <= 0) return -1;
  std::vector<std::pair<int64_t, int32_t>> row;
  row.reserve(width);
  for (int64_t i = 0; i < n; ++i) {
    row.clear();
    const int64_t off = i * width;
    for (int32_t w = 0; w < width; ++w)
      if (valid[off + w]) row.emplace_back((int64_t)cols[off + w], w);
    std::stable_sort(row.begin(), row.end(),
                     [](const auto& a, const auto& b) { return a.first < b.first; });
    const int64_t t = i / 1024;
    const int64_t tile_base = t * 1024;
    const int64_t s_i = (i % 1024) / 128;
    const int64_t l_i = i % 128;
    int64_t cur_sid = -1, slot = 0;
    for (const auto& e : row) {
      const int64_t sid = (e.first - i + pbl) / w_el;
      if (sid < 0 || sid >= S) return -1;
      slot = (sid == cur_sid) ? slot + 1 : 0;
      cur_sid = sid;
      const int64_t b0 = base[sid];
      if (b0 < 0 || b0 + slot >= wtot) return -1;
      const int64_t li = e.first - tile_base - (sid * w_el - pbl);
      const int64_t flat = ((t * wtot + (b0 + slot)) * 8 + s_i) * 128 + l_i;
      const double v = vals[off + e.second];
      if (dd) {
        const float hi = (float)v;
        vp4[flat] = hi;
        vp4lo[flat] = (float)(v - (double)hi);
      } else {
        vp4[flat] = (float)v;
      }
      lp4[flat] = (int16_t)li;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Lockstep greedy slot assignment for the dynamic-window gather tier (the
// host half of ops/pallas/gell_dynwin.py::_greedy_assign — semantics match
// the NumPy path EXACTLY, pinned by test_gell_dynwin's bitwise test).
// Entries arrive flat, row-major and column-sorted: ci_flat[k] = chunk
// index of entry k in the padded x; row_starts/counts delimit each row's
// run. Per output slot w: each 1024-row tile's base is its min pending
// chunk aligned down to 8 (SUB) chunks — or the tile's previous base once
// it has no pending entries (keeps every stored base inside the tile's
// own window range for shard rebasing) — and every row whose next entry
// falls in [base, base + K) consumes it into slot w. The min row always
// fits, so each round makes progress. bases_out is (max_w, T) row-major
// (caller transposes to (T, W)); slot_out is per-entry. Returns W, or -1
// past max_w slots.
int32_t hpccg_dynwin_greedy(int64_t n, int64_t T, int64_t nnz,
                            const int64_t* ci_flat, const int64_t* row_starts,
                            const int64_t* counts, int64_t K, int64_t max_w,
                            int64_t* slot_out, int64_t* bases_out) {
  if (n < 0 || T <= 0 || nnz < 0 || K <= 0 || max_w <= 0) return -1;
  std::vector<int64_t> ptr(n, 0);
  std::vector<int64_t> prev_base(T, 0);
  int64_t remaining = 0;
  for (int64_t i = 0; i < n; ++i) remaining += counts[i];
  const int64_t INF = std::numeric_limits<int64_t>::max();
  int64_t w = 0;
  while (remaining > 0) {
    if (w >= max_w) return -1;
    int64_t* base_row = bases_out + w * T;
    for (int64_t t = 0; t < T; ++t) {
      const int64_t r0 = t * 1024;
      const int64_t r1 = std::min(n, r0 + 1024);
      int64_t tmin = INF;
      for (int64_t i = r0; i < r1; ++i)
        if (ptr[i] < counts[i]) {
          const int64_t c = ci_flat[row_starts[i] + ptr[i]];
          if (c < tmin) tmin = c;
        }
      const int64_t base = (tmin == INF) ? prev_base[t] : ((tmin >> 3) << 3);
      prev_base[t] = base;
      base_row[t] = base;
      for (int64_t i = r0; i < r1; ++i)
        if (ptr[i] < counts[i]) {
          const int64_t k = row_starts[i] + ptr[i];
          if (ci_flat[k] < base + K) {
            slot_out[k] = w;
            ++ptr[i];
            --remaining;
          }
        }
    }
    ++w;
  }
  return (int32_t)w;
}

// hpccg_dynwin_fill: scatter the (value, window-local index) pairs of the
// greedy assignment straight into the (T, W, 8, 128) tile layout (the
// NumPy fancy-index scatter is the remaining full-nnz pass after the
// greedy went native). Entries arrive flat in the greedy's order
// (row-major, column-sorted): pos_flat = element position in the padded
// x, slot from hpccg_dynwin_greedy, bases (T, W) row-major. vals arrive
// f64 regardless of matrix dtype; dd=1 writes the exact double-float
// (hi, lo) split. vp4/vp4lo/lp4 must be zero-initialized (dynwin parks
// empty slots at window-local 0). Returns 0, or -1 on a slot/index out
// of range.
int32_t hpccg_dynwin_fill(int64_t n, int64_t nnz, const double* vals_flat,
                          const int64_t* pos_flat, const int64_t* row_starts,
                          const int64_t* counts, const int64_t* slot,
                          const int64_t* bases, int64_t W, int64_t K,
                          int32_t dd, float* vp4, float* vp4lo,
                          int16_t* lp4) {
  if (n < 0 || nnz < 0 || W <= 0 || K <= 0) return -1;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t t = i / 1024;
    const int64_t s_i = (i % 1024) / 128;
    const int64_t l_i = i % 128;
    const int64_t k0 = row_starts[i];
    for (int64_t k = k0; k < k0 + counts[i]; ++k) {
      const int64_t w = slot[k];
      if (w < 0 || w >= W) return -1;
      const int64_t li = pos_flat[k] - bases[t * W + w] * 128;
      if (li < 0 || li >= K * 128) return -1;
      const int64_t flat = ((t * W + w) * 8 + s_i) * 128 + l_i;
      const double v = vals_flat[k];
      if (dd) {
        const float hi = (float)v;
        vp4[flat] = hi;
        vp4lo[flat] = (float)(v - (double)hi);
      } else {
        vp4[flat] = (float)v;
      }
      lp4[flat] = (int16_t)li;
    }
  }
  return 0;
}

}  // extern "C"
