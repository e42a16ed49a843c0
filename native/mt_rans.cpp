// meryl_tpu native host substrate: rANS entropy-decode cores.
//
// C implementations of the two CRAM block codecs' hot loops so CRAM
// ingest runs at production speed (the pure-Python decoders in
// meryl_tpu/io/{cram,rans_nx16}.py remain the reference/fallback):
//   * rANS 4x8  (CRAM 3.0 method 4, htslib rANS_static.c layout)
//   * rANS Nx16 (CRAM 3.1 method 5, htscodecs rANS_static4x16pr.c
//     layout) — order-0/1 entropy cores; the outer transforms
//     (STRIPE/PACK/RLE/CAT) stay in Python where numpy is fast.
// The reference gets these via vendored htslib/htscodecs
// (/root/reference/src/main.mk:92-140).
//
// All readers are bounds-checked; every function returns -1 on
// malformed input instead of reading past the buffer.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kByteL = 1u << 23;   // 4x8 renorm bound
constexpr uint32_t kWordL = 1u << 15;   // Nx16 renorm bound
constexpr int kShift0 = 12;             // order-0 precision (4096)

struct Cur {
  const uint8_t* d;
  int64_t p, n;
  bool ok() const { return p <= n; }
  bool has(int64_t k) const { return p + k <= n; }
  int byte() { return p < n ? d[p++] : (p = n + 1, -1); }
  int64_t uint7() {
    int64_t v = 0;
    for (int i = 0; i < 5; i++) {
      int b = byte();
      if (b < 0) return -1;
      v = (v << 7) | (b & 0x7F);
      if (!(b & 0x80)) return v;
    }
    return -1;
  }
  uint32_t u32le() {
    if (!has(4)) { p = n + 1; return 0; }
    uint32_t v = uint32_t(d[p]) | uint32_t(d[p + 1]) << 8 |
                 uint32_t(d[p + 2]) << 16 | uint32_t(d[p + 3]) << 24;
    p += 4;
    return v;
  }
};

// ------------------------------------------------------------- 4x8

// htslib rANS_static.c frequency table: symbols ascending with
// consecutive-run RLE; freqs are 1 byte, or 2 bytes when >= 128.
bool read_freqs_4x8(Cur& c, uint16_t freq[256]) {
  std::memset(freq, 0, 256 * sizeof(uint16_t));
  int rle = 0;
  int sym = c.byte();
  if (sym < 0) return false;
  for (;;) {
    int j = sym;
    int f = c.byte();
    if (f < 0) return false;
    if (f >= 128) {
      int f2 = c.byte();
      if (f2 < 0) return false;
      f = ((f & 0x7F) << 8) | f2;
    }
    freq[j] = uint16_t(f);
    if (rle > 0) {
      rle--;
      sym = j + 1;
    } else {
      sym = c.byte();
      if (sym < 0) return false;
      if (sym == j + 1) {
        rle = c.byte();
        if (rle < 0) return false;
      }
    }
    if (sym == 0) return true;
  }
}

struct Tab4k {
  uint16_t freq[256];
  uint16_t cum[256];
  uint8_t ssym[1 << kShift0];
};

bool build_tab(const uint16_t freq[256], Tab4k& t) {
  uint32_t acc = 0;
  for (int s = 0; s < 256; s++) {
    t.freq[s] = freq[s];
    t.cum[s] = uint16_t(acc);
    acc += freq[s];
  }
  if (acc > (1u << kShift0)) return false;
  uint32_t at = 0;
  for (int s = 0; s < 256; s++)
    for (uint32_t k = 0; k < freq[s]; k++) t.ssym[at++] = uint8_t(s);
  // unreached slots (acc < 4096) keep whatever; valid streams never
  // index them -- but zero them so malformed input stays deterministic
  for (; at < (1u << kShift0); at++) t.ssym[at] = 0;
  return true;
}

int64_t rans4x8_o0(Cur& c, uint8_t* out, int64_t out_sz) {
  uint16_t freq[256];
  if (!read_freqs_4x8(c, freq)) return -1;
  std::vector<Tab4k> tv(1);
  if (!build_tab(freq, tv[0])) return -1;
  const Tab4k& t = tv[0];
  uint32_t R[4];
  for (int k = 0; k < 4; k++) R[k] = c.u32le();
  if (!c.ok()) return -1;
  const uint8_t* d = c.d;
  int64_t p = c.p, n = c.n;
  for (int64_t i = 0; i < out_sz; i++) {
    uint32_t& st = R[i & 3];
    uint32_t f = st & ((1u << kShift0) - 1);
    uint8_t s = t.ssym[f];
    out[i] = s;
    st = t.freq[s] * (st >> kShift0) + f - t.cum[s];
    while (st < kByteL) {
      if (p >= n) return -1;
      st = (st << 8) | d[p++];
    }
  }
  c.p = p;
  return out_sz;
}

int64_t rans4x8_o1(Cur& c, uint8_t* out, int64_t out_sz) {
  std::vector<Tab4k> tabs(256);
  std::vector<uint8_t> present(256, 0);
  int rle = 0;
  int ctx = c.byte();
  if (ctx < 0) return -1;
  for (;;) {
    uint16_t freq[256];
    if (!read_freqs_4x8(c, freq)) return -1;
    if (!build_tab(freq, tabs[ctx])) return -1;
    present[ctx] = 1;
    int j = ctx;
    if (rle > 0) {
      rle--;
      ctx = j + 1;
    } else {
      ctx = c.byte();
      if (ctx < 0) return -1;
      if (ctx == j + 1) {
        rle = c.byte();
        if (rle < 0) return -1;
      }
    }
    if (ctx == 0) break;
  }
  // absent contexts fall back to context 0's table (decoder-side
  // tolerance, mirroring the Python reference implementation)
  for (int s = 0; s < 256; s++)
    if (!present[s]) tabs[s] = tabs[0];
  uint32_t R[4];
  for (int k = 0; k < 4; k++) R[k] = c.u32le();
  if (!c.ok()) return -1;
  const uint8_t* d = c.d;
  int64_t p = c.p, n = c.n;
  int64_t isz4 = out_sz >> 2;
  int L[4] = {0, 0, 0, 0};
  for (int64_t i = 0; i < isz4; i++) {
    for (int k = 0; k < 4; k++) {
      uint32_t& st = R[k];
      const Tab4k& t = tabs[L[k]];
      uint32_t f = st & ((1u << kShift0) - 1);
      uint8_t s = t.ssym[f];
      out[k * isz4 + i] = s;
      st = t.freq[s] * (st >> kShift0) + f - t.cum[s];
      while (st < kByteL) {
        if (p >= n) return -1;
        st = (st << 8) | d[p++];
      }
      L[k] = s;
    }
  }
  uint32_t st = R[3];
  int lctx = L[3];
  for (int64_t i = 4 * isz4; i < out_sz; i++) {
    const Tab4k& t = tabs[lctx];
    uint32_t f = st & ((1u << kShift0) - 1);
    uint8_t s = t.ssym[f];
    out[i] = s;
    st = t.freq[s] * (st >> kShift0) + f - t.cum[s];
    while (st < kByteL) {
      if (p >= n) return -1;
      st = (st << 8) | d[p++];
    }
    lctx = s;
  }
  c.p = p;
  return out_sz;
}

// ------------------------------------------------------------- Nx16

// alphabet: ascending symbols, consecutive runs RLE'd, 0 terminates
int read_alphabet(Cur& c, uint8_t syms[256]) {
  int nsym = 0, rle = 0;
  int sym = c.byte();
  if (sym < 0) return -1;
  int last = sym;
  for (;;) {
    if (nsym >= 256) return -1;
    syms[nsym++] = uint8_t(sym);
    if (rle > 0) {
      rle--;
      sym++;
    } else {
      sym = c.byte();
      if (sym < 0) return -1;
      if (sym == last + 1) {
        rle = c.byte();
        if (rle < 0) return -1;
      }
    }
    last = sym;
    if (sym == 0) return nsym;
  }
}

struct TabN {
  std::vector<uint32_t> freq, cum;   // 256 each
  std::vector<uint8_t> ssym;         // 1<<shift
};

// freqs for one table: uint7 per present symbol; stored sum is
// (1<<shift) >> k -- double back up (htscodecs normalise_freq_shift)
bool finish_tab(uint32_t F[256], const uint8_t* syms, int nsym,
                int shift, TabN& t) {
  uint32_t tot = 0;
  for (int i = 0; i < nsym; i++) tot += F[syms[i]];
  uint32_t norm = 1u << shift;
  if (tot == 0) return true;  // context never used; leave empty
  while (tot < norm) {
    tot <<= 1;
    for (int i = 0; i < nsym; i++) F[syms[i]] <<= 1;
  }
  if (tot != norm) return false;
  t.freq.assign(256, 0);
  t.cum.assign(257, 0);
  for (int i = 0; i < nsym; i++) t.freq[syms[i]] = F[syms[i]];
  uint32_t acc = 0;
  for (int s = 0; s < 256; s++) {
    t.cum[s] = acc;
    acc += t.freq[s];
  }
  t.ssym.assign(norm, 0);
  for (int i = 0; i < nsym; i++) {
    int s = syms[i];
    for (uint32_t k = 0; k < t.freq[s]; k++) t.ssym[t.cum[s] + k] =
        uint8_t(s);
  }
  return true;
}

int64_t nx16_o0(Cur& c, int N, uint8_t* out, int64_t out_sz) {
  uint8_t syms[256];
  int nsym = read_alphabet(c, syms);
  if (nsym < 0) return -1;
  uint32_t F[256];
  std::memset(F, 0, sizeof F);
  for (int i = 0; i < nsym; i++) {
    int64_t f = c.uint7();
    if (f < 0) return -1;
    F[syms[i]] = uint32_t(f);
  }
  TabN t;
  if (!finish_tab(F, syms, nsym, kShift0, t)) return -1;
  if (t.ssym.empty()) return out_sz == 0 ? 0 : -1;
  std::vector<uint32_t> R(N);
  for (int k = 0; k < N; k++) R[k] = c.u32le();
  if (!c.ok()) return -1;
  const uint8_t* d = c.d;
  int64_t p = c.p, n = c.n;
  const uint32_t mask = (1u << kShift0) - 1;
  int j = 0;
  for (int64_t i = 0; i < out_sz; i++) {
    uint32_t st = R[j];
    uint32_t m = st & mask;
    uint8_t s = t.ssym[m];
    out[i] = s;
    st = t.freq[s] * (st >> kShift0) + m - t.cum[s];
    if (st < kWordL) {
      if (p + 2 > n) return -1;
      st = (st << 16) | (uint32_t(d[p]) | (uint32_t(d[p + 1]) << 8));
      p += 2;
    }
    R[j] = st;
    if (++j == N) j = 0;
  }
  c.p = p;
  return out_sz;
}

int64_t nx16_o1(Cur& c, int N, uint8_t* out, int64_t out_sz) {
  int comp = c.byte();
  if (comp < 0) return -1;
  int shift = comp >> 4;
  if (shift < 1 || shift > 16) return -1;
  std::vector<uint8_t> tbl_buf;
  Cur tc = c;
  bool sub = false;
  if (comp & 1) {
    int64_t u_sz = c.uint7();
    int64_t c_sz = c.uint7();
    if (u_sz < 0 || c_sz < 0 || !c.has(c_sz)) return -1;
    tbl_buf.resize(size_t(u_sz));
    Cur s{c.d + c.p, 0, c_sz};
    if (nx16_o0(s, 4, tbl_buf.data(), u_sz) < 0) return -1;
    c.p += c_sz;
    tc = Cur{tbl_buf.data(), 0, u_sz};
    sub = true;
  } else {
    tc = c;
  }
  Cur& tr = sub ? tc : c;
  uint8_t syms[256];
  int nsym = read_alphabet(tr, syms);
  if (nsym < 0) return -1;
  std::vector<TabN> tabs(256);
  for (int i = 0; i < nsym; i++) {
    uint32_t F[256];
    std::memset(F, 0, sizeof F);
    int run = 0;
    for (int jj = 0; jj < nsym; jj++) {
      if (run > 0) {
        run--;
        continue;
      }
      int64_t f = tr.uint7();
      if (f < 0) return -1;
      F[syms[jj]] = uint32_t(f);
      if (f == 0) {
        run = tr.byte();
        if (run < 0) return -1;
      }
    }
    if (!finish_tab(F, syms, nsym, shift, tabs[syms[i]])) return -1;
  }
  std::vector<uint32_t> R(N);
  for (int k = 0; k < N; k++) R[k] = c.u32le();
  if (!c.ok()) return -1;
  const uint8_t* d = c.d;
  int64_t p = c.p, n = c.n;
  const uint32_t mask = (1u << shift) - 1;
  int64_t seg = out_sz / N;
  std::vector<int> L(N, 0);
  for (int64_t i = 0; i < seg; i++) {
    for (int k = 0; k < N; k++) {
      TabN& t = tabs[L[k]];
      if (t.ssym.empty()) return -1;
      uint32_t st = R[k];
      uint32_t m = st & mask;
      uint8_t s = t.ssym[m];
      out[k * seg + i] = s;
      st = t.freq[s] * (st >> shift) + m - t.cum[s];
      if (st < kWordL) {
        if (p + 2 > n) return -1;
        st = (st << 16) | (uint32_t(d[p]) | (uint32_t(d[p + 1]) << 8));
        p += 2;
      }
      R[k] = st;
      L[k] = s;
    }
  }
  int lctx = L[N - 1];
  uint32_t st = R[N - 1];
  for (int64_t i = N * seg; i < out_sz; i++) {
    TabN& t = tabs[lctx];
    if (t.ssym.empty()) return -1;
    uint32_t m = st & mask;
    uint8_t s = t.ssym[m];
    out[i] = s;
    st = t.freq[s] * (st >> shift) + m - t.cum[s];
    if (st < kWordL) {
      if (p + 2 > n) return -1;
      st = (st << 16) | (uint32_t(d[p]) | (uint32_t(d[p + 1]) << 8));
      p += 2;
    }
    lctx = s;
  }
  c.p = p;
  return out_sz;
}

}  // namespace

extern "C" {

// Full-stream rANS 4x8 decode (CRAM 3.0 method 4).  'in' points at
// the 9-byte header (order u8, comp u32le, raw u32le).  Returns bytes
// written (== header raw size) or -1.
int64_t mt_rans4x8_decode(const uint8_t* in, int64_t n, uint8_t* out,
                          int64_t out_cap) {
  if (n < 9) return -1;
  int order = in[0];
  Cur c{in, 1, n};
  (void)c.u32le();  // compressed size (unused; bounds come from n)
  int64_t out_sz = c.u32le();
  if (!c.ok() || out_sz < 0 || out_sz > out_cap) return -1;
  if (out_sz == 0) return 0;
  if (order == 0) return rans4x8_o0(c, out, out_sz);
  if (order == 1) return rans4x8_o1(c, out, out_sz);
  return -1;
}

// rANS Nx16 entropy core (CRAM 3.1 method 5).  'in' points at the
// frequency table (flags/size/transform meta already consumed by the
// caller).  Writes out_sz bytes; returns bytes CONSUMED or -1.
int64_t mt_ransnx16_core(const uint8_t* in, int64_t n, int32_t order1,
                         int32_t N, uint8_t* out, int64_t out_sz) {
  if (N != 4 && N != 32) return -1;
  Cur c{in, 0, n};
  int64_t r = order1 ? nx16_o1(c, N, out, out_sz)
                     : nx16_o0(c, N, out, out_sz);
  if (r < 0) return -1;
  return c.p;
}

// Bulk ITF8 parse: decode consecutive CRAM ITF8 values (sign-extended
// from 32 bits, matching io/cram.py read_itf8) until the buffer ends.
// Writes each value and its END byte offset.  Returns the count
// parsed; a trailing truncated value stops the parse (not an error —
// the Python caller validates counts against what the slice needs).
int64_t mt_itf8_parse(const uint8_t* in, int64_t n, int64_t* vals,
                      int64_t* ends, int64_t max_out) {
  int64_t p = 0, cnt = 0;
  while (p < n && cnt < max_out) {
    uint8_t b0 = in[p];
    uint32_t v;
    int len;
    if (b0 < 0x80) {
      v = b0;
      len = 1;
    } else if (b0 < 0xC0) {
      len = 2;
      if (p + len > n) break;
      v = (uint32_t(b0 & 0x7F) << 8) | in[p + 1];
    } else if (b0 < 0xE0) {
      len = 3;
      if (p + len > n) break;
      v = (uint32_t(b0 & 0x3F) << 16) | (uint32_t(in[p + 1]) << 8) |
          in[p + 2];
    } else if (b0 < 0xF0) {
      len = 4;
      if (p + len > n) break;
      v = (uint32_t(b0 & 0x1F) << 24) | (uint32_t(in[p + 1]) << 16) |
          (uint32_t(in[p + 2]) << 8) | in[p + 3];
    } else {
      len = 5;
      if (p + len > n) break;
      v = (uint32_t(b0 & 0x0F) << 28) | (uint32_t(in[p + 1]) << 20) |
          (uint32_t(in[p + 2]) << 12) | (uint32_t(in[p + 3]) << 4) |
          (in[p + 4] & 0x0F);
    }
    p += len;
    vals[cnt] = int64_t(int32_t(v));
    ends[cnt] = p;
    cnt++;
  }
  return cnt;
}

// Bulk BAM window scan+decode: walk block_size-framed alignment
// records, expanding each record's 4-bit packed bases straight to
// 2-bit codes (A=00 C=01 T=10 G=11; non-ACGT -> 0xFF breaker), one
// 0xFF separator per record, optional homopolymer compression.
// Stops at the first record that extends past the window and reports
// how many input bytes were consumed so the caller can carry the
// remainder into the next window.  out needs 2*win_len+1 bytes.
// Returns bytes written, or -1 on a structurally bad record.
int64_t mt_bam_scan(const uint8_t* win, int64_t win_len, uint8_t* out,
                    int64_t out_cap, int32_t hpc, int64_t* consumed) {
  // SEQ16 "=ACMGRSVTWYHKDBN" nibble -> 2-bit code (0xFF = breaker)
  static const uint8_t kNib[16] = {0xFF, 0, 1, 0xFF, 3,    0xFF, 0xFF,
                                   0xFF, 2, 0xFF, 0xFF, 0xFF, 0xFF,
                                   0xFF, 0xFF, 0xFF};
  int64_t p = 0, w = 0;
  while (p + 4 <= win_len) {
    int32_t bs;
    std::memcpy(&bs, win + p, 4);
    if (bs < 32) return -1;
    const int64_t end = p + 4 + bs;
    if (end > win_len) break;
    const uint8_t* r = win + p + 4;
    const uint8_t lrn = r[8];
    uint16_t ncig;
    std::memcpy(&ncig, r + 12, 2);
    int32_t ls;
    std::memcpy(&ls, r + 16, 4);
    const int64_t off = 32 + int64_t(lrn) + 4 * int64_t(ncig);
    const int64_t nb = (int64_t(ls) + 1) / 2;
    if (ls < 0 || off + nb > bs) return -1;
    if (w + ls + 1 > out_cap) break;
    const uint8_t* pk = r + off;
    if (hpc) {
      uint8_t prev = 0xFE;  // never matches a first code
      for (int64_t i = 0; i < ls; i++) {
        uint8_t b = pk[i >> 1];
        uint8_t c = kNib[(i & 1) ? (b & 0xF) : (b >> 4)];
        if (c != prev) out[w++] = c;
        prev = c;
      }
    } else {
      int64_t i = 0;
      for (; i + 2 <= ls; i += 2) {
        uint8_t b = pk[i >> 1];
        out[w++] = kNib[b >> 4];
        out[w++] = kNib[b & 0xF];
      }
      if (i < ls) out[w++] = kNib[pk[i >> 1] >> 4];
    }
    out[w++] = 0xFF;  // record separator
    p = end;
  }
  *consumed = p;
  return w;
}

}  // extern "C"
