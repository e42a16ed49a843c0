// Native cores for the CRAM 3.1 adaptive-arithmetic block codec
// (method 6) and the fqzcomp quality codec (method 7).  Exact mirrors
// of the Python reference implementations in meryl_tpu/io/arith.py and
// meryl_tpu/io/fqzcomp.py (which remain the differential oracles and
// the fallback when the library is unavailable): an LZMA-style
// carry-counting range decoder driving adaptively-updated
// symbol-frequency models.  The Python decoders measure ~1 MB/s
// (arith order-1) and ~0.4 MB/s (fqzcomp); these cores are the
// production path for CRAM quality decoding.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t TOP = 1u << 24;
constexpr uint32_t STEP = 8;
constexpr uint32_t MAX_FREQ = (1u << 16) - 32;

struct RangeDecoder {
    const uint8_t* d;
    int64_t p, n;
    uint32_t range, code;
    bool err;

    void init(const uint8_t* data, int64_t len, int64_t pos) {
        d = data;
        n = len;
        p = pos;
        range = 0xFFFFFFFFu;
        err = false;
        uint64_t c = 0;
        for (int i = 0; i < 5; i++) {
            if (p >= n) { err = true; return; }
            c = ((c << 8) | d[p++]) & 0xFFFFFFFFFFull;
        }
        code = (uint32_t)c;
    }

    inline uint32_t get_freq(uint32_t tot) {
        range /= tot;
        return code / range;
    }

    inline void decode(uint32_t start, uint32_t size) {
        code -= start * range;
        range *= size;
        while (range < TOP) {
            if (p >= n) { err = true; return; }
            code = (code << 8) | d[p++];
            range <<= 8;
        }
    }
};

// Adaptive model over nsym symbols; symbols bubble toward the front as
// they gain frequency (identical updates to arith.py _Model).
struct Model {
    uint16_t* syms;
    uint32_t* freqs;
    uint32_t tot;
    uint32_t nsym;

    void init(uint16_t* sym_store, uint32_t* freq_store, uint32_t ns) {
        syms = sym_store;
        freqs = freq_store;
        nsym = ns;
        tot = ns;
        for (uint32_t i = 0; i < ns; i++) {
            syms[i] = (uint16_t)i;
            freqs[i] = 1;
        }
    }

    inline void bump(uint32_t i) {
        freqs[i] += STEP;
        tot += STEP;
        if (tot > MAX_FREQ) {
            uint32_t t = 0;
            for (uint32_t j = 0; j < nsym; j++) {
                freqs[j] -= freqs[j] >> 1;
                t += freqs[j];
            }
            tot = t;
        }
        if (i > 0 && freqs[i] > freqs[i - 1]) {
            uint32_t f = freqs[i];
            freqs[i] = freqs[i - 1];
            freqs[i - 1] = f;
            uint16_t s = syms[i];
            syms[i] = syms[i - 1];
            syms[i - 1] = s;
        }
    }

    inline int decode(RangeDecoder& rc) {
        uint32_t fr = rc.get_freq(tot);
        uint32_t acc = 0, i = 0;
        while (i < nsym && acc + freqs[i] <= fr) {
            acc += freqs[i];
            i++;
        }
        if (i >= nsym) { rc.err = true; return 0; }
        rc.decode(acc, freqs[i]);
        int sym = syms[i];
        bump(i);
        return sym;
    }
};

// fixed-capacity model pool: one contiguous slab for syms/freqs
struct ModelPool {
    std::vector<uint16_t> syms;
    std::vector<uint32_t> freqs;
    std::vector<Model> models;
    std::vector<uint8_t> inited;
    uint32_t nsym;

    void init(uint32_t count, uint32_t ns) {
        nsym = ns;
        syms.resize((size_t)count * ns);
        freqs.resize((size_t)count * ns);
        models.resize(count);
        inited.assign(count, 0);
    }

    inline Model& get(uint32_t idx) {
        Model& m = models[idx];
        if (!inited[idx]) {
            inited[idx] = 1;
            m.init(&syms[(size_t)idx * nsym], &freqs[(size_t)idx * nsym],
                   nsym);
        }
        return m;
    }
};

}  // namespace

// ---------------------------------------------------------------- arith

// Decode an order-0/order-1 (optionally RLE) arith body starting at
// data[pos] (the max-sym byte).  Returns the consumed end position, or
// -1 on malformed input.
extern "C" int64_t mt_arith_decode(const uint8_t* data, int64_t dlen,
                                   int64_t pos, int32_t order1,
                                   int32_t rle, uint8_t* out,
                                   int64_t out_sz) {
    if (pos >= dlen) return -1;
    uint32_t m = data[pos++];
    uint32_t nsym = m ? m : 256;

    ModelPool main_pool;
    main_pool.init(order1 ? nsym : 1, nsym);
    ModelPool run_pool;
    if (rle) run_pool.init(nsym, 4);

    RangeDecoder rc;
    rc.init(data, dlen, pos);
    if (rc.err) return -1;

    uint32_t last = 0;
    if (rle) {
        int64_t i = 0;
        while (i < out_sz) {
            int b = main_pool.get(order1 ? last : 0).decode(rc);
            Model& rm = run_pool.get((uint32_t)b);
            int64_t run = 0;
            for (;;) {
                int part = rm.decode(rc);
                run += part;
                if (part != 3) break;
                if (rc.err) return -1;
            }
            if (rc.err) return -1;
            if (i + run + 1 > out_sz) return -1;  // RLE overrun
            memset(out + i, b, (size_t)(run + 1));
            i += run + 1;
            last = (uint32_t)b;
        }
    } else {
        for (int64_t i = 0; i < out_sz; i++) {
            int b = main_pool.get(order1 ? last : 0).decode(rc);
            if (rc.err) return -1;
            out[i] = (uint8_t)b;
            last = (uint32_t)b;
        }
    }
    return rc.err ? -1 : rc.p;
}

// -------------------------------------------------------------- fqzcomp

struct FqzCParam {
    int32_t context, pflags, max_sym;
    int32_t qbits, qshift, qloc, sloc, ploc, dloc;
    int32_t has_qmap;
    uint8_t qmap[256];
    uint32_t qtab[256];
    uint32_t ptab[1024];
    uint32_t dtab[256];
};

namespace {
constexpr int GFLAG_MULTI = 0x01;
constexpr int GFLAG_STAB = 0x02;
constexpr int GFLAG_REV = 0x04;
constexpr int PFLAG_DEDUP = 0x02;
constexpr int PFLAG_DO_LEN = 0x04;
constexpr int PFLAG_DO_SEL = 0x08;
constexpr int PFLAG_PTAB = 0x20;
constexpr int PFLAG_DTAB = 0x40;
}  // namespace

// Decode the range-coded fqzcomp body at data[pos] into out[out_sz]
// (parameter blocks already parsed by the caller).  Returns the
// consumed end position, or -1 on malformed input.
extern "C" int64_t mt_fqz_decode(const uint8_t* data, int64_t dlen,
                                 int64_t pos, int32_t gflags,
                                 int32_t nparam, int32_t max_sel,
                                 const uint8_t* stab,
                                 const FqzCParam* params, uint8_t* out,
                                 int64_t out_sz) {
    uint32_t nsym = 1;
    for (int i = 0; i < nparam; i++)
        if ((uint32_t)params[i].max_sym > nsym)
            nsym = (uint32_t)params[i].max_sym;

    ModelPool qual;
    qual.init(1 << 16, nsym);
    ModelPool lens;
    lens.init(4, 256);
    ModelPool bits;    // rev, dup
    bits.init(2, 2);
    ModelPool selm;
    selm.init(1, (uint32_t)max_sel + 1);

    RangeDecoder rc;
    rc.init(data, dlen, pos);
    if (rc.err) return -1;

    std::vector<int64_t> rev_start, rev_len;

    const FqzCParam* pm = &params[0];
    int64_t i = 0;
    int64_t last_len = 0;
    bool first = true;
    uint32_t ctx = 0;
    // per-record context state
    uint32_t qctx = 0, prevq = 0, delta = 0, sel = 0;
    int64_t prem = 0;  // bases remaining in the record

    while (i < out_sz) {
        if (first || prem == 0) {
            sel = 0;
            if (gflags & (GFLAG_MULTI | GFLAG_STAB)) {
                sel = (uint32_t)selm.get(0).decode(rc);
                if (rc.err) return -1;
                uint32_t x = stab[sel > 255 ? 255 : sel];
                if ((int32_t)x >= nparam) return -1;
                pm = &params[x];
            }
            if ((pm->pflags & PFLAG_DO_LEN) || first) {
                int64_t b0 = lens.get(0).decode(rc);
                int64_t b1 = lens.get(1).decode(rc);
                int64_t b2 = lens.get(2).decode(rc);
                int64_t b3 = lens.get(3).decode(rc);
                if (rc.err) return -1;
                last_len = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24);
            }
            int64_t rec_len = last_len;
            if (rec_len <= 0 || i + rec_len > out_sz) return -1;
            if (gflags & GFLAG_REV) {
                int r = bits.get(0).decode(rc);
                if (rc.err) return -1;
                if (r) {
                    rev_start.push_back(i);
                    rev_len.push_back(rec_len);
                }
            }
            qctx = 0;
            prevq = 0;
            delta = 0;
            prem = rec_len;
            first = false;
            if (pm->pflags & PFLAG_DEDUP) {
                int dup = bits.get(1).decode(rc);
                if (rc.err) return -1;
                if (dup) {
                    if (i < rec_len) return -1;
                    memmove(out + i, out + i - rec_len, (size_t)rec_len);
                    i += rec_len;
                    prem = 0;
                    continue;
                }
            }
            ctx = (uint32_t)pm->context & 0xFFFF;
        }
        int q = qual.get(ctx).decode(rc);
        if (rc.err) return -1;
        out[i++] = pm->has_qmap ? pm->qmap[q] : (uint8_t)q;
        // context update (mirror of fqzcomp._update_ctx)
        qctx = (qctx << pm->qshift) + pm->qtab[q & 255];
        uint32_t c = (uint32_t)pm->context;
        c += (qctx & ((1u << pm->qbits) - 1)) << pm->qloc;
        if (pm->pflags & PFLAG_PTAB)
            c += pm->ptab[prem > 1023 ? 1023 : prem] << pm->ploc;
        if (pm->pflags & PFLAG_DTAB)
            c += pm->dtab[delta > 255 ? 255 : delta] << pm->dloc;
        if (pm->pflags & PFLAG_DO_SEL) c += sel << pm->sloc;
        prem--;
        delta += (prevq != (uint32_t)q);
        prevq = (uint32_t)q;
        ctx = c & 0xFFFF;
    }
    if (prem != 0) return -1;
    for (size_t r = 0; r < rev_start.size(); r++) {
        uint8_t* a = out + rev_start[r];
        uint8_t* b = a + rev_len[r] - 1;
        while (a < b) {
            uint8_t t = *a;
            *a++ = *b;
            *b-- = t;
        }
    }
    return rc.p;
}
