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
