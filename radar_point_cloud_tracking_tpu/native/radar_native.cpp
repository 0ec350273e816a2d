// Native runtime for the TPU radar pipeline: fast CSV/PLY codecs.
//
// The reference implements its hot host-side I/O in Rust
// (radar-pipeline-rs/src/core/loaders.rs:200-604, writers.rs:84-334).  This
// library provides the TPU framework's equivalent: a zero-copy CSV number
// parser feeding preallocated NumPy buffers, and ASCII/binary PLY encode /
// decode.  Exposed through a plain C ABI and bound via ctypes (no pybind11).
//
// Build: see build.py (g++ -O3 -march=native -shared -fPIC).

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#if defined(__AVX2__)
#include <immintrin.h>
#endif

// 64-byte class masks for the bit-parallel token scan (bit i = byte cur[i]).
// AVX-512BW produces the 64-bit mask in one compare; the AVX2 fallback
// stitches two 32-byte movemasks.  Loads must stay within the file: callers
// guard cur + 64 <= line_end.
#if defined(__AVX512BW__)
static inline uint64_t comma_mask64(const char *cur) {
    __m512i v = _mm512_loadu_si512((const void *)cur);
    return _mm512_cmpeq_epi8_mask(v, _mm512_set1_epi8(','));
}
static inline uint64_t digit_mask64(const char *cur) {
    // signed compares: bytes >= 0x80 read as negative and fail the range
    // test, matching the AVX2 cmpgt_epi8 fallback bit-for-bit
    __m512i v = _mm512_loadu_si512((const void *)cur);
    return _mm512_cmpgt_epi8_mask(v, _mm512_set1_epi8('0' - 1)) &
           _mm512_cmpgt_epi8_mask(_mm512_set1_epi8('9' + 1), v);
}
#define RADAR_SCAN64 1
#elif defined(__AVX2__)
static inline uint64_t comma_mask64(const char *cur) {
    const __m256i cc = _mm256_set1_epi8(',');
    __m256i lo = _mm256_loadu_si256((const __m256i *)cur);
    __m256i hi = _mm256_loadu_si256((const __m256i *)(cur + 32));
    return (uint32_t)_mm256_movemask_epi8(_mm256_cmpeq_epi8(lo, cc)) |
           ((uint64_t)(uint32_t)_mm256_movemask_epi8(
                _mm256_cmpeq_epi8(hi, cc))
            << 32);
}
static inline uint64_t digit_mask64(const char *cur) {
    const __m256i d_lo = _mm256_set1_epi8('0' - 1);
    const __m256i d_hi = _mm256_set1_epi8('9' + 1);
    __m256i lo = _mm256_loadu_si256((const __m256i *)cur);
    __m256i hi = _mm256_loadu_si256((const __m256i *)(cur + 32));
    return (uint32_t)_mm256_movemask_epi8(_mm256_and_si256(
               _mm256_cmpgt_epi8(lo, d_lo), _mm256_cmpgt_epi8(d_hi, lo))) |
           ((uint64_t)(uint32_t)_mm256_movemask_epi8(_mm256_and_si256(
                _mm256_cmpgt_epi8(hi, d_lo), _mm256_cmpgt_epi8(d_hi, hi)))
            << 32);
}
#define RADAR_SCAN64 1
#endif

extern "C" {

// ---------------------------------------------------------------------------
// Fast float parsing
// ---------------------------------------------------------------------------

// Parse a decimal float starting at *p, advancing *p past the number.
// Handles [+-]digits[.digits][eE[+-]digits].  Falls back to strtof only for
// exponents, which radar CSVs do not contain in practice.
static inline float parse_float_fast(const char **pp, const char *end) {
    const char *p = *pp;
    // skip spaces
    while (p < end && (*p == ' ' || *p == '\t')) p++;
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) {
        neg = (*p == '-');
        p++;
    }
    int64_t int_part = 0;
    bool any = false;
    while (p < end && *p >= '0' && *p <= '9') {
        int_part = int_part * 10 + (*p - '0');
        p++;
        any = true;
    }
    double value = (double)int_part;
    if (p < end && *p == '.') {
        p++;
        double frac = 0.0, scale = 1.0;
        while (p < end && *p >= '0' && *p <= '9') {
            frac = frac * 10.0 + (*p - '0');
            scale *= 10.0;
            p++;
            any = true;
        }
        value += frac / scale;
    }
    if (p < end && (*p == 'e' || *p == 'E')) {
        // rare path: re-parse with strtof for correctness
        char *endptr = nullptr;
        float v = strtof(*pp, &endptr);
        *pp = endptr;
        return v;
    }
    if (!any) {
        // empty field -> 0 (matches pandas fillna(0) in the reference loader,
        // radar-pipeline core/loaders.py:80)
        *pp = p;
        return 0.0f;
    }
    *pp = p;
    return neg ? (float)-value : (float)value;
}

// ---------------------------------------------------------------------------
// Radar CSV parser
// ---------------------------------------------------------------------------

// Parse a numeric CSV with `ncols` columns per row, skipping `skip_rows`
// leading rows (the header).  Writes row-major float32 into `out`
// (capacity max_rows * ncols).  Missing trailing fields fill with 0.
// Returns number of data rows parsed, or -1 on I/O error.
int parse_numeric_csv(const char *path, int ncols, int skip_rows,
                      float *out, int max_rows) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) {
        close(fd);
        return -1;
    }
    size_t size = (size_t)st.st_size;
    if (size == 0) {
        close(fd);
        return 0;
    }
    const char *data =
        (const char *)mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (data == MAP_FAILED) return -1;
    madvise((void *)data, size, MADV_SEQUENTIAL | MADV_WILLNEED);

    const char *p = data;
    const char *end = data + size;

    // skip header rows
    for (int i = 0; i < skip_rows && p < end; i++) {
        const char *nl = (const char *)memchr(p, '\n', (size_t)(end - p));
        p = nl ? nl + 1 : end;
    }

    int row = 0;
    while (p < end && row < max_rows) {
        const char *nl = (const char *)memchr(p, '\n', (size_t)(end - p));
        const char *line_end = nl ? nl : end;
        if (line_end == p || (*p == '\r' && line_end == p + 1)) {
            // empty line
            p = nl ? nl + 1 : end;
            continue;
        }
        float *dst = out + (size_t)row * ncols;
        const char *q = p;
        int col = 0;
        while (col < ncols) {
            if (q >= line_end) {
                dst[col++] = 0.0f;  // missing trailing fields -> 0
                continue;
            }
            dst[col++] = parse_float_fast(&q, line_end);
            // advance past the delimiter
            while (q < line_end && *q != ',') q++;
            if (q < line_end) q++;
        }
        row++;
        p = nl ? nl + 1 : end;
    }

    munmap((void *)data, size);
    return row;
}

// Count data rows (newlines after skip_rows) so the caller can size buffers.
int count_csv_rows(const char *path, int skip_rows) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) {
        close(fd);
        return -1;
    }
    size_t size = (size_t)st.st_size;
    if (size == 0) {
        close(fd);
        return 0;
    }
    const char *data =
        (const char *)mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (data == MAP_FAILED) return -1;
    madvise((void *)data, size, MADV_SEQUENTIAL | MADV_WILLNEED);
    int rows = 0;
    const char *p = data;
    const char *end = data + size;
    bool last_had_content = false;
    while (p < end) {
        const char *nl = (const char *)memchr(p, '\n', (size_t)(end - p));
        const char *line_end = nl ? nl : end;
        if (line_end > p && !(*p == '\r' && line_end == p + 1)) rows++;
        last_had_content = false;
        (void)last_had_content;
        p = nl ? nl + 1 : end;
    }
    munmap((void *)data, size);
    rows -= skip_rows;
    return rows < 0 ? 0 : rows;
}

// Parse a radar CSV and compact it in one pass: keep cells with
// echo > threshold, then every stride-th survivor (row-major order — the
// reference's flatten-then-stride semantics).  Emits per-point (row, bin,
// echo) plus per-row Angle and Scale columns, so the polar->Cartesian trig
// can stay on the accelerator while only surviving points cross the wire.
// Returns the number of points, or -1 on I/O error.  *rows_out receives the
// row count; gain_out the first row's Gain.
// Whole-file input: RADAR_NATIVE_READBUF=1 selects read(2) into a reused
// buffer (pays a full memcpy per file but no faults); the default is mmap
// with MADV_SEQUENTIAL (zero-copy, ~3k minor faults per file).  A/B'd on
// the bench host: mmap wins when the page cache is warm.  The buffer is
// thread_local: parse_radar_points runs concurrently from a thread pool
// (ctypes releases the GIL), so a shared buffer would race.
static thread_local char *g_read_buf = nullptr;
static thread_local size_t g_read_cap = 0;

static const char *read_whole_file(int fd, size_t size) {
    if (size > g_read_cap) {
        size_t cap = g_read_cap ? g_read_cap : (1u << 20);
        while (cap < size) cap *= 2;
        char *nb = (char *)realloc(g_read_buf, cap);
        if (!nb) return nullptr;
        g_read_buf = nb;
        g_read_cap = cap;
    }
    size_t off = 0;
    while (off < size) {
        ssize_t got = read(fd, g_read_buf + off, size - off);
        if (got <= 0) return nullptr;
        off += (size_t)got;
    }
    return g_read_buf;
}

static int use_read_buf() {
    static int cached = -1;
    if (cached < 0) {
        const char *env = getenv("RADAR_NATIVE_READBUF");
        cached = (env && env[0] == '1') ? 1 : 0;
    }
    return cached;
}

// Returns file content either as the reused read buffer or a fresh mmap;
// *mapped_out tells the caller whether munmap is needed.
static const char *load_file(int fd, size_t size, int *mapped_out) {
    if (use_read_buf()) {
        *mapped_out = 0;
        return read_whole_file(fd, size);
    }
    const char *data =
        (const char *)mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (data == MAP_FAILED) return nullptr;
    madvise((void *)data, size, MADV_SEQUENTIAL | MADV_WILLNEED);
    *mapped_out = 1;
    return data;
}

int parse_radar_points(const char *path, int num_echo, float threshold,
                       int stride, uint16_t *pt_row, uint16_t *pt_bin,
                       float *pt_val, float *row_angle, float *row_scale,
                       int max_rows, long long max_pts, int *rows_out,
                       float *gain_out, int *u8_ok_out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  size_t size = (size_t)st.st_size;
  if (size == 0) {
    close(fd);
    *rows_out = 0;
    return 0;
  }
  int mapped = 0;
  const char *data = load_file(fd, size, &mapped);
  close(fd);
  if (data == nullptr) return -1;

  const char *p = data;
  const char *end = data + size;
  // skip header
  {
    const char *nl = (const char *)memchr(p, '\n', (size_t)(end - p));
    p = nl ? nl + 1 : end;
  }

  int row = 0;
  long long npts = 0;
  long long rank = 0;  // survivor rank for stride selection
  int u8_ok = 1;  // all shipped echoes integral in [0,255] -> uint8 wire
  if (stride < 1) stride = 1;

  // Integer-token threshold shortcut: for a plain decimal integer v and
  // threshold >= 0, v > threshold  <=>  v >= floor(threshold) + 1, which a
  // digit-count + lexicographic compare decides without numeric
  // conversion.  Most surviving cells are NOT kept by the stride, so their
  // full float parse (the former per-cell hot path) is skipped entirely;
  // any token that is not a canonical nonneg integer falls back to
  // parse_float_fast with identical semantics.
  const bool thr_nonneg = !(threshold < 0.0f) && threshold < 1e18f;
  char min_str[24];
  int min_len = 0;
  if (thr_nonneg) {
    long long min_int = (long long)threshold;  // floor for thr >= 0
    min_int += 1;
    min_len = snprintf(min_str, sizeof(min_str), "%lld", min_int);
  }

  while (p < end && row < max_rows) {
    const char *nl = (const char *)memchr(p, '\n', (size_t)(end - p));
    const char *line_end = nl ? nl : end;
    if (line_end == p || (*p == '\r' && line_end == p + 1)) {
      p = nl ? nl + 1 : end;
      continue;
    }
    const char *q = p;
    // meta columns: Status, Scale, Range, Gain, Angle
    float meta[5];
    for (int c = 0; c < 5; c++) {
      meta[c] = (q < line_end) ? parse_float_fast(&q, line_end) : 0.0f;
      while (q < line_end && *q != ',') q++;
      if (q < line_end) q++;
    }
    row_scale[row] = meta[1];
    row_angle[row] = meta[4];
    if (row == 0) *gain_out = meta[3];

    const bool zero_below = !(0.0f > threshold);
    // "0,0,0,0," repeated: bulk-skips zero runs 32 cells per 64-byte compare
    // (the compiler vectorizes the fixed-size memcmp), narrowing to one
    // 8-byte word near run ends
    uint64_t zpat;
    memcpy(&zpat, "0,0,0,0,", 8);
    char zpat64[64];
    for (int k = 0; k < 64; k += 8) memcpy(zpat64 + k, "0,0,0,0,", 8);

    int b = 0;

    // one candidate token [ts, te) at column bc: decide the threshold
    // verdict (length + lexicographic compare for canonical integers,
    // numeric parse otherwise) and emit if it is a kept survivor
    auto candidate = [&](const char *ts, const char *te, int bc) {
      long long tl = te - ts;
      // <= 7 digits: the integer is exactly float32-representable
      // (< 2^24), so the integer verdict and stored value are identical
      // to the reference's float32 compare; longer tokens near the
      // threshold could round differently and take the numeric path
      bool plain_int = tl > 0 && tl <= 7 && !(ts[0] == '0' && tl > 1);
      if (plain_int) {
        for (const char *s = ts; s < te; s++) {
          if (*s < '0' || *s > '9') {
            plain_int = false;
            break;
          }
        }
      }
      if (plain_int) {
        bool over = tl > min_len ||
                    (tl == min_len && memcmp(ts, min_str, (size_t)tl) >= 0);
        if (!over) return;
        if (rank % stride == 0 && npts < max_pts) {
          long long iv = 0;
          for (const char *s = ts; s < te; s++) iv = iv * 10 + (*s - '0');
          pt_row[npts] = (uint16_t)row;
          pt_bin[npts] = (uint16_t)bc;
          pt_val[npts] = (float)iv;
          u8_ok &= (iv <= 255);
          npts++;
        }
        rank++;
        return;
      }
      const char *pp = ts;
      float v = parse_float_fast(&pp, te);
      if (v > threshold) {
        if (rank % stride == 0 && npts < max_pts) {
          pt_row[npts] = (uint16_t)row;
          pt_bin[npts] = (uint16_t)bc;
          pt_val[npts] = v;
          u8_ok &= (v >= 0.0f) & (v <= 255.0f) & (v == (float)(int)v);
          npts++;
        }
        rank++;
      }
    };

#if defined(RADAR_SCAN64)
    if (thr_nonneg) {
      // Bit-parallel token scan: 64-byte comma bitmasks; only tokens of
      // length >= 2 become scalar work (a single digit can never exceed
      // min_int >= 1 when its length is below min_len — min_len == 1
      // cases make every 1+ digit token a candidate via the c2 mask being
      // moot, see below), and the column index advances by popcount.
      // Radar rows are ~75% bare "0" cells, so the scalar token walk was
      // the parse floor (~1.4 GB/s); this scan moves it to ~5 GB/s.
      uint64_t prev_cm = ~0ull;  // line start: a comma precedes q
      const char *cur = q;
      const char *tok_start = q;  // start of the token spanning chunks
      while (b < num_echo && cur + 64 <= line_end) {
        uint64_t cm = comma_mask64(cur);
        int ncommas = __builtin_popcountll(cm);
        if (b + ncommas >= num_echo) break;  // row tail: finish scalar
        // a token ending at bit i has length >= 2 iff no comma at i-1, i-2
        uint64_t c1 = (cm << 1) | (prev_cm >> 63);
        uint64_t c2 = (cm << 2) | (prev_cm >> 62);
        uint64_t cand = cm & ~c1 & ~c2;
        if (min_len <= 1) cand = cm & ~c1;  // single digits can qualify
        if (cand) {
          // digit-class mask decides all-digits per token with bit ops
          // (lazy: re-reads the L1-hot 64 bytes only on candidate chunks)
          uint64_t dg = digit_mask64(cur);
          do {
            int pos = __builtin_ctzll(cand);
            cand &= cand - 1;
            const char *te = cur + pos;
            int bc = b + __builtin_popcountll(cm & ((1ull << pos) - 1));
            uint64_t below = cm & ((1ull << pos) - 1);
            if (below) {
              // token starts inside this chunk: start/length/digits all
              // from the masks, no byte re-reads
              int sbit = 63 - __builtin_clzll(below);  // last comma < pos
              const char *ts = cur + sbit + 1;
              long long tl = pos - sbit - 1;
              uint64_t span = (((1ull << pos) - 1)
                              & ~((1ull << (sbit + 1)) - 1));
              if ((dg & span) == span && tl <= 7 &&
                  !(ts[0] == '0' && tl > 1)) {
                bool over =
                    tl > min_len ||
                    (tl == min_len &&
                     memcmp(ts, min_str, (size_t)tl) >= 0);
                if (over) {
                  if (rank % stride == 0 && npts < max_pts) {
                    long long iv = 0;
                    for (const char *s = ts; s < te; s++)
                      iv = iv * 10 + (*s - '0');
                    pt_row[npts] = (uint16_t)row;
                    pt_bin[npts] = (uint16_t)bc;
                    pt_val[npts] = (float)iv;
                    u8_ok &= (iv <= 255);
                    npts++;
                  }
                  rank++;
                }
              } else {
                candidate(ts, te, bc);
              }
            } else {
              candidate(tok_start, te, bc);  // spans a chunk boundary
            }
          } while (cand);
        }
        if (cm) tok_start = cur + (63 - __builtin_clzll(cm)) + 1;
        b += ncommas;
        prev_cm = cm;
        cur += 64;
      }
      // resume the scalar loop at the start of the pending token
      while (cur > q && cur[-1] != ',') cur--;
      q = cur;
    }
#endif

    for (; b < num_echo; b++) {
      // fast path: bare "0" cells dominate radar CSVs (only valid while a
      // zero cannot pass the threshold)
      if (zero_below) {
        while (b + 32 <= num_echo && q + 64 <= line_end &&
               memcmp(q, zpat64, 64) == 0) {
          q += 64;
          b += 32;
        }
        while (b + 4 <= num_echo && q + 8 <= line_end) {
          uint64_t w;
          memcpy(&w, q, 8);
          if (w != zpat) break;
          q += 8;
          b += 4;
        }
        if (b >= num_echo) break;
        if (q + 1 < line_end && q[0] == '0' && q[1] == ',') {
          q += 2;
          continue;
        }
      }
      // token span [q, te): canonical nonneg integers decide the verdict
      // by length + memcmp; only KEPT survivors get a value parse
      const char *te = q;
      while (te < line_end && *te != ',') te++;
      long long tl = te - q;
      bool plain_int = thr_nonneg && tl > 0 && tl <= 7 &&
                       !(q[0] == '0' && tl > 1);
      if (plain_int) {
        for (const char *s = q; s < te; s++) {
          if (*s < '0' || *s > '9') {
            plain_int = false;
            break;
          }
        }
      }
      if (plain_int) {
        bool over = tl > min_len ||
                    (tl == min_len && memcmp(q, min_str, (size_t)tl) >= 0);
        if (over) {
          if (rank % stride == 0 && npts < max_pts) {
            long long iv = 0;
            for (const char *s = q; s < te; s++) iv = iv * 10 + (*s - '0');
            pt_row[npts] = (uint16_t)row;
            pt_bin[npts] = (uint16_t)b;
            pt_val[npts] = (float)iv;
            u8_ok &= (iv <= 255);
            npts++;
          }
          rank++;
        }
        q = (te < line_end) ? te + 1 : line_end;
        continue;
      }
      float v = (q < line_end) ? parse_float_fast(&q, line_end) : 0.0f;
      while (q < line_end && *q != ',') q++;
      if (q < line_end) q++;
      if (v > threshold) {
        if (rank % stride == 0 && npts < max_pts) {
          pt_row[npts] = (uint16_t)row;
          pt_bin[npts] = (uint16_t)b;
          pt_val[npts] = v;
          u8_ok &= (v >= 0.0f) & (v <= 255.0f) & (v == (float)(int)v);
          npts++;
        }
        rank++;
      }
    }
    row++;
    p = nl ? nl + 1 : end;
  }

  if (mapped) munmap((void *)data, size);
  *rows_out = row;
  if (u8_ok_out) *u8_ok_out = u8_ok;
  return (int)npts;
}

// ---------------------------------------------------------------------------
// PLY writers
// ---------------------------------------------------------------------------

static inline char *format_fixed(char *buf, float vf, int precision) {
    // %.{precision}f formatting without printf overhead
    double v = (double)vf;
    if (v < 0) {
        *buf++ = '-';
        v = -v;
    }
    static const double pow10[] = {1, 10, 100, 1000, 10000, 100000, 1000000};
    double scale = pow10[precision];
    // round-half-away like printf's typical behaviour on these magnitudes
    uint64_t scaled = (uint64_t)(v * scale + 0.5);
    uint64_t ip = scaled / (uint64_t)scale;
    uint64_t fp = scaled % (uint64_t)scale;
    // integer part
    char tmp[24];
    int n = 0;
    if (ip == 0) {
        tmp[n++] = '0';
    } else {
        while (ip > 0) {
            tmp[n++] = (char)('0' + ip % 10);
            ip /= 10;
        }
    }
    while (n > 0) *buf++ = tmp[--n];
    if (precision > 0) {
        *buf++ = '.';
        for (int i = precision - 1; i >= 0; i--) {
            uint64_t div = 1;
            for (int k = 0; k < i; k++) div *= 10;
            *buf++ = (char)('0' + (fp / div) % 10);
        }
    }
    return buf;
}

static inline char *format_u8(char *buf, uint8_t v) {
    if (v >= 100) {
        *buf++ = (char)('0' + v / 100);
        *buf++ = (char)('0' + (v / 10) % 10);
        *buf++ = (char)('0' + v % 10);
    } else if (v >= 10) {
        *buf++ = (char)('0' + v / 10);
        *buf++ = (char)('0' + v % 10);
    } else {
        *buf++ = (char)('0' + v);
    }
    return buf;
}

// Write an ASCII PLY body ("x y z r g b\n" per point) after `header`.
// precision selects %.6f (reference package writer, core/writers.py:45-46)
// or %.4f (legacy script writer).  Returns 0 on success.
int write_ply_ascii(const char *path, const char *header, int64_t n,
                    const float *x, const float *y, const float *z,
                    const uint8_t *rgb, int precision) {
    FILE *fh = fopen(path, "wb");
    if (!fh) return -1;
    fwrite(header, 1, strlen(header), fh);

    const size_t CHUNK = 1 << 16;
    // worst case per line: 3 * (1+20+1+6) + 3*4 + 1 ≈ 100 bytes
    char *buf = (char *)malloc(CHUNK * 128);
    if (!buf) {
        fclose(fh);
        return -1;
    }
    for (int64_t start = 0; start < n; start += (int64_t)CHUNK) {
        int64_t stop = start + (int64_t)CHUNK;
        if (stop > n) stop = n;
        char *w = buf;
        for (int64_t i = start; i < stop; i++) {
            w = format_fixed(w, x[i], precision);
            *w++ = ' ';
            w = format_fixed(w, y[i], precision);
            *w++ = ' ';
            w = format_fixed(w, z[i], precision);
            *w++ = ' ';
            w = format_u8(w, rgb[i * 3 + 0]);
            *w++ = ' ';
            w = format_u8(w, rgb[i * 3 + 1]);
            *w++ = ' ';
            w = format_u8(w, rgb[i * 3 + 2]);
            *w++ = '\n';
        }
        fwrite(buf, 1, (size_t)(w - buf), fh);
    }
    free(buf);
    fclose(fh);
    return 0;
}

// Parse `n` whitespace-separated float rows of `ncols` columns starting at
// byte `offset` of the file (ASCII PLY body).  Returns rows parsed or -1.
int parse_ascii_rows(const char *path, int64_t offset, int64_t n, int ncols,
                     float *out) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) {
        close(fd);
        return -1;
    }
    size_t size = (size_t)st.st_size;
    const char *data =
        (const char *)mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (data == MAP_FAILED) return -1;
    madvise((void *)data, size, MADV_SEQUENTIAL | MADV_WILLNEED);
    const char *p = data + offset;
    const char *end = data + size;
    int64_t row = 0;
    while (p < end && row < n) {
        float *dst = out + row * ncols;
        for (int c = 0; c < ncols; c++) {
            while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n'))
                p++;
            dst[c] = parse_float_fast(&p, end);
        }
        // advance to next line
        const char *nl = (const char *)memchr(p, '\n', (size_t)(end - p));
        p = nl ? nl + 1 : end;
        row++;
    }
    munmap((void *)data, size);
    return (int)row;
}

// ---------------------------------------------------------------------------
// Host land-filter streaming kernels
// ---------------------------------------------------------------------------
//
// The persistence land filter (4_temporal_object_tracker.py:359-436) runs on
// the host so filtered points never cross the host->device wire.  These
// kernels stream the sparse parse buffers (rows/bins/vals) directly — no
// per-point Python-heap arrays, whose first-touch page faults are
// pathologically slow and variable on this host.  Caller precomputes the
// per-row float32 tables (scale/num_bins, cos(angle), sin(angle)) with NumPy
// so x = (scale_div[r]*bin)*cos_r[r] reproduces the reference's float32 op
// order bit-for-bit; bin edges arrive as the caller's exact np.arange
// float64 arrays and lookup replicates np.digitize (upper_bound, then -1,
// then clip).

// np.digitize(x, edges) == index of first edge > x (increasing edges).
// The edges are uniform np.arange grids, so a direct divide lands on (or
// within one slot of) the right cell; the adjustment loops then make the
// result exactly np.digitize's — the verdict is always decided by
// comparisons against the caller's true float64 edge values, never by the
// guess itself.
static inline int digitize_clip_c(double x, const double *edges, int n_edges,
                                  int n_cells, double inv_step) {
    int i = (int)((x - edges[0]) * inv_step);
    if (i < 0) i = 0;
    else if (i > n_edges - 2) i = n_edges - 2;
    while (i + 1 < n_edges && edges[i + 1] <= x) i++;
    while (i >= 0 && edges[i] > x) i--;
    if (i < 0) i = 0;
    if (i > n_cells - 1) i = n_cells - 1;
    return i;
}

static inline double edge_inv_step(const double *edges, int n_edges) {
    return n_edges > 1 ? 1.0 / (edges[1] - edges[0]) : 0.0;
}

// Fold one sweep's x/y extents into io_bounds = {xmin, xmax, ymin, ymax}.
void sweep_xy_bounds(const uint16_t *rows, const uint16_t *bins, long long n,
                     const float *scale_div, const float *cos_r,
                     const float *sin_r, float *io_bounds) {
    float xmin = io_bounds[0], xmax = io_bounds[1];
    float ymin = io_bounds[2], ymax = io_bounds[3];
    for (long long i = 0; i < n; i++) {
        int r = rows[i];
        float rr = scale_div[r] * (float)bins[i];
        float x = rr * cos_r[r];
        float y = rr * sin_r[r];
        if (x < xmin) xmin = x;
        if (x > xmax) xmax = x;
        if (y < ymin) ymin = y;
        if (y > ymax) ymax = y;
    }
    io_bounds[0] = xmin; io_bounds[1] = xmax;
    io_bounds[2] = ymin; io_bounds[3] = ymax;
}

// Accumulate one sweep into the occupancy grid: per-cell point count and
// float64 intensity sum in point order (bit-identical to np.bincount).
void land_grid_accumulate(const uint16_t *rows, const uint16_t *bins,
                          const float *vals, long long n,
                          const float *scale_div, const float *cos_r,
                          const float *sin_r, const double *x_edges,
                          int n_x_edges, const double *y_edges, int n_y_edges,
                          long long *count, double *vsum) {
    int nx = n_x_edges - 1, ny = n_y_edges - 1;
    if (nx <= 0 || ny <= 0) return;  // degenerate axis: caller raises
    double ixs = edge_inv_step(x_edges, n_x_edges);
    double iys = edge_inv_step(y_edges, n_y_edges);
    for (long long i = 0; i < n; i++) {
        int r = rows[i];
        float rr = scale_div[r] * (float)bins[i];
        float x = rr * cos_r[r];
        float y = rr * sin_r[r];
        int xi = digitize_clip_c((double)x, x_edges, n_x_edges, nx, ixs);
        int yi = digitize_clip_c((double)y, y_edges, n_y_edges, ny, iys);
        long long cell = (long long)xi * ny + yi;
        count[cell] += 1;
        vsum[cell] += (double)vals[i];
    }
}

// Compact one sweep in place, keeping points whose cell is not land.
// Returns the surviving count.
long long land_filter_sweep(uint16_t *rows, uint16_t *bins, float *vals,
                            long long n, const float *scale_div,
                            const float *cos_r, const float *sin_r,
                            const double *x_edges, int n_x_edges,
                            const double *y_edges, int n_y_edges,
                            const uint8_t *land) {
    int nx = n_x_edges - 1, ny = n_y_edges - 1;
    if (nx <= 0 || ny <= 0) return n;  // degenerate axis: keep all points
    double ixs = edge_inv_step(x_edges, n_x_edges);
    double iys = edge_inv_step(y_edges, n_y_edges);
    long long w = 0;
    for (long long i = 0; i < n; i++) {
        int r = rows[i];
        float rr = scale_div[r] * (float)bins[i];
        float x = rr * cos_r[r];
        float y = rr * sin_r[r];
        int xi = digitize_clip_c((double)x, x_edges, n_x_edges, nx, ixs);
        int yi = digitize_clip_c((double)y, y_edges, n_y_edges, ny, iys);
        if (!land[(long long)xi * ny + yi]) {
            rows[w] = rows[i];
            bins[w] = bins[i];
            vals[w] = vals[i];
            w++;
        }
    }
    return w;
}

}  // extern "C"
