// Native BACJ query router: stable counting-sort partition of a query
// slab by its top-b1 key bits, emitting the (B1, capA) low-bit plane
// layout ops/bacjoin.bacjoin_kernel consumes.
//
// The numpy router (bacjoin.route_queries_host) pays an O(Q log Q)
// stable argsort plus several full-slab temporaries (~0.3-0.7 s per
// 2^21 queries); this is a two-pass parallel counting sort — one
// histogram pass, one scatter pass — bounded by memory bandwidth.
// The device resolve overlaps the router (lookup._values_bulk_bacj's
// 1-deep pipeline), so the router IS the product wall-clock for
// screening workloads; the reference's analog is the per-thread hash
// probe loop in meryl-lookup (existence.C:81-110).
//
// Keys are 2k-bit (hi, lo) pairs (k <= 64 -> up to 128 bits, via
// __uint128_t).  Stability matches numpy's kind="stable" argsort so
// the python differential is byte-exact.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

static inline unsigned __int128 key128(uint64_t hi, uint64_t lo) {
    return ((unsigned __int128)hi << 64) | lo;
}

struct RouteArgs {
    const uint64_t* hi;
    const uint64_t* lo;
    int64_t q;
    int32_t twok, b1, capA, ps_l;
    uint32_t* qlow;   // ps_l * B1 * capA, caller-zeroed
    int32_t* n_row;   // B1, caller-zeroed
    int64_t* perm;    // B1 * capA, caller-filled with -1
};

}  // namespace

extern "C" {

// returns 0 = ok, 1 = some coarse row overflows capA (caller falls
// back to the exact whole-slab path), 2 = bad arguments, 3 = a key
// routed outside [row_base, row_base + n_rows) (segmented-mode caller
// bug: queries must be pre-partitioned by segment)
int mt_bacj_route(const uint64_t* hi, const uint64_t* lo, int64_t q,
                  int32_t twok, int32_t b1, int64_t row_base,
                  int64_t n_rows, int32_t capA,
                  int32_t ps_l, uint32_t* qlow, int32_t* n_row,
                  int64_t* perm, int32_t n_threads) {
    if (q < 0 || b1 < 1 || b1 > 26 || twok < b1 || twok > 128 ||
        capA < 1 || ps_l < 1 || ps_l > 4 || row_base < 0 ||
        n_rows < 1 || row_base + n_rows > ((int64_t)1 << b1))
        return 2;
    const int64_t B1 = n_rows;
    const int shift = twok - b1;
    const int lbits = twok - b1;
    int T = n_threads < 1 ? 1 : (n_threads > 16 ? 16 : n_threads);
    if (q < (int64_t)1 << 18) T = 1;

    // pass 1: per-thread histograms over contiguous ranges
    std::atomic<bool> bad(false);
    std::vector<std::vector<int64_t>> hist(T,
                                           std::vector<int64_t>(B1, 0));
    std::vector<std::thread> th;
    auto range = [&](int t, int64_t* a, int64_t* b) {
        *a = q * t / T;
        *b = q * (t + 1) / T;
    };
    for (int t = 0; t < T; t++) {
        th.emplace_back([&, t]() {
            int64_t a, b;
            range(t, &a, &b);
            auto& h = hist[t];
            for (int64_t i = a; i < b; i++) {
                int64_t r = (int64_t)(key128(hi[i], lo[i]) >> shift)
                            - row_base;
                if (r < 0 || r >= B1) { bad.store(true); return; }
                h[r]++;
            }
        });
    }
    for (auto& x : th) x.join();
    th.clear();
    if (bad.load()) return 3;

    // global row counts + overflow check + per-thread cursors
    std::vector<int64_t> start(B1 + 1, 0);
    for (int64_t r = 0; r < B1; r++) {
        int64_t c = 0;
        for (int t = 0; t < T; t++) c += hist[t][r];
        if (c > capA) return 1;
        n_row[r] = (int32_t)c;
        start[r + 1] = start[r] + c;  // unused beyond cursor seeding
    }
    // cursor[t][r] = row base (r * capA) + #entries of row r placed
    // by threads < t (stability: thread ranges are contiguous input)
    std::vector<std::vector<int64_t>> cur(T,
                                          std::vector<int64_t>(B1));
    for (int64_t r = 0; r < B1; r++) {
        int64_t off = r * capA;
        for (int t = 0; t < T; t++) {
            cur[t][r] = off;
            off += hist[t][r];
        }
    }

    // pass 2: stable scatter of perm + low-bit suffix planes
    const unsigned __int128 lmask =
        lbits >= 128 ? ~(unsigned __int128)0
                     : (((unsigned __int128)1 << lbits) - 1);
    const int64_t plane_stride = B1 * (int64_t)capA;
    for (int t = 0; t < T; t++) {
        th.emplace_back([&, t]() {
            int64_t a, b;
            range(t, &a, &b);
            auto& c = cur[t];
            for (int64_t i = a; i < b; i++) {
                unsigned __int128 k = key128(hi[i], lo[i]);
                int64_t r = (int64_t)(k >> shift) - row_base;
                int64_t flat = c[r]++;
                perm[flat] = i;
                unsigned __int128 low = k & lmask;
                for (int p = 0; p < ps_l; p++)
                    qlow[p * plane_stride + flat] =
                        (uint32_t)(low >> (32 * p));
            }
        });
    }
    for (auto& x : th) x.join();
    return 0;
}

}  // extern "C"

extern "C" {

// Native BACJ grid builder: scatter a SORTED unique (hi, lo, counts)
// table into the (B, s_cap) top-b-bit bucket grid (suffix planes +
// values, zero = padding).  Keys are sorted, so every bucket is one
// contiguous input run and the scatter is sequential writes —
// parallelized by bucket ranges.  Replaces the numpy builder's
// temporary-heavy path (first-touch page faults dominate there).
// returns 0 ok, 2 bad args.
int mt_bacj_build_grid(const uint64_t* hi, const uint64_t* lo,
                       const uint32_t* counts, int64_t n,
                       int32_t twok, int32_t b, int32_t s_cap,
                       int32_t ps, uint32_t* dbd, uint32_t* dbv,
                       int32_t n_threads) {
    if (n < 0 || b < 1 || b > 26 || twok < b || twok > 128 ||
        s_cap < 1 || ps < 1 || ps > 4)
        return 2;
    const int64_t B = (int64_t)1 << b;
    const int shift = twok - b;
    const int sbits = twok - b;
    const unsigned __int128 smask =
        sbits >= 128 ? ~(unsigned __int128)0
                     : (((unsigned __int128)1 << sbits) - 1);
    int T = n_threads < 1 ? 1 : (n_threads > 16 ? 16 : n_threads);
    if (n < (int64_t)1 << 18) T = 1;

    // bucket start offsets by binary search on the sorted keys: each
    // thread owns a contiguous BUCKET range so its grid region is
    // written exactly once (no sharing)
    std::vector<std::thread> th;
    const int64_t plane_stride = B * (int64_t)s_cap;
    for (int t = 0; t < T; t++) {
        th.emplace_back([&, t]() {
            int64_t b_lo = B * t / T, b_hi = B * (t + 1) / T;
            // first input index in bucket b_lo (lower_bound)
            int64_t lo_i = 0, hi_i = n;
            while (lo_i < hi_i) {
                int64_t mid = (lo_i + hi_i) >> 1;
                if ((int64_t)(key128(hi[mid], lo[mid]) >> shift) <
                    b_lo)
                    lo_i = mid + 1;
                else
                    hi_i = mid;
            }
            int64_t i = lo_i;
            while (i < n) {
                int64_t r = (int64_t)(key128(hi[i], lo[i]) >> shift);
                if (r >= b_hi) break;
                int64_t col = 0;
                int64_t base = r * (int64_t)s_cap;
                while (i < n && col < s_cap) {
                    unsigned __int128 kk = key128(hi[i], lo[i]);
                    if ((int64_t)(kk >> shift) != r) break;
                    unsigned __int128 suf = kk & smask;
                    for (int p = 0; p < ps; p++)
                        dbd[p * plane_stride + base + col] =
                            (uint32_t)(suf >> (32 * p));
                    dbv[base + col] = counts[i];
                    i++;
                    col++;
                }
                // overfull bucket (cannot happen when s_cap comes
                // from the true bucket max): skip the rest exactly
                while (i < n &&
                       (int64_t)(key128(hi[i], lo[i]) >> shift) == r)
                    i++;
            }
        });
    }
    for (auto& x : th) x.join();
    return 0;
}

}  // extern "C"
