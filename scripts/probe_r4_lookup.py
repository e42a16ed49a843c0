"""Round-4 probes: gather strategies for big-DB exact lookup.

Question of record (VERDICT r3 item 1): with N >= 64x the query slab
(Merqury screening regime: genome-scale DB, 2M-query slabs), which
device formulation resolves queries fastest?

Candidates measured here (fetch-grounded per docs/tpu-design.md rules:
distinct inputs per rep, dispatch->int() timing, work >> 27 ms RTT):

  A. flat random gather     — per-element cost at a 2^28-entry table
                              (the binary search's primitive)
  B. sliced gather          — vmap(dynamic_slice): each query pulls a
                              contiguous W-entry bucket slab; if the
                              cost is per-SLICE rather than per-element
                              this wins outright (compare-all in
                              registers afterwards is free)
  B2. computed-index gather — same volume as B but expressed as
                              take(start[:,None]+iota) (general gather;
                              the XLA baseline B must beat)
  C. row-aligned take_along_axis — (G, CQ) indices into (G, LDB) rows
                              (the VERDICT-suggested row-local binary
                              search's primitive)
  D. current _lower_bound   — end-to-end binary search kernel at
                              N=2^28, Q=2^21 (the number to beat)
  E. single-plane search    — D but gathering ONE u32 discriminator
                              plane (valid when 2k - b <= 32)

Usage: python scripts/probe_r4_lookup.py [probe ...]
(no args = all).  ONE process, ONE TPU client (tunnel rule).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

if os.environ.get("PROBE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402

RTT = 0.027
LOGN = int(os.environ.get("PROBE_LOGN", 28))
LOGQ = int(os.environ.get("PROBE_LOGQ", 21))
NTAB = 1 << LOGN                # 256M-entry table (1 GB u32)
Q = 1 << LOGQ                   # queries per slab
S = 8                           # distinct slabs per dispatch


def fetch_time(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    v = int(np.asarray(out))    # fetch grounds the timing
    dt = time.perf_counter() - t0
    return dt, v


def run_probe(name, fn, args, n_elts, reps=2):
    # first call compiles; time the later calls
    fetch_time(fn, *args[0])
    best = 1e9
    for r in range(1, 1 + reps):
        dt, _ = fetch_time(fn, *args[r % len(args)])
        best = min(best, dt)
    ns = (best - RTT) * 1e9 / n_elts
    print(f"{name:36s} {best*1e3:9.1f} ms  {ns:8.2f} ns/elt "
          f"({n_elts/1e6:.1f} M elts)", flush=True)
    return ns


def main(which):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 32, size=NTAB,
                                     dtype=np.uint64).astype(np.uint32))
    table.block_until_ready()

    def idx_slabs(n, lim, seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(r.integers(0, lim, size=(S, n),
                                      dtype=np.int64).astype(np.int32))

    if not which or "A" in which:
        @jax.jit
        def flat_gather(tab, idx):
            def body(c, ix):
                return c + jnp.sum(jnp.take(tab, ix, mode="clip"),
                                   dtype=jnp.uint32), None
            out, _ = jax.lax.scan(body, jnp.uint32(0), idx)
            return out
        args = [(table, idx_slabs(Q, NTAB, s)) for s in (1, 2, 3)]
        run_probe("A flat gather 2^21 x8 of 2^28", flat_gather, args,
                  S * Q)

    if not which or "B" in which:
        W = 32
        QB = Q // 4             # keep output (QB, W) modest

        @jax.jit
        def sliced_gather(tab, starts):
            def body(c, st):
                def one(s):
                    return jax.lax.dynamic_slice(tab, (s,), (W,))
                sl = jax.vmap(one)(st)          # (QB, W)
                return c + jnp.sum(sl, dtype=jnp.uint32), None
            out, _ = jax.lax.scan(body, jnp.uint32(0), starts)
            return out
        args = [(table, idx_slabs(QB, NTAB - W, 10 + s))
                for s in (1, 2, 3)]
        ns = run_probe(f"B vmap dynslice W={W} 2^19 x8", sliced_gather,
                       args, S * QB * W)
        print(f"   -> per-slice: {ns * W:.1f} ns", flush=True)

    if not which or "B2" in which:
        W = 32
        QB = Q // 4

        @jax.jit
        def idx_gather(tab, starts):
            def body(c, st):
                ix = st[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
                sl = jnp.take(tab, ix, mode="clip")
                return c + jnp.sum(sl, dtype=jnp.uint32), None
            out, _ = jax.lax.scan(body, jnp.uint32(0), starts)
            return out
        args = [(table, idx_slabs(QB, NTAB - W, 20 + s))
                for s in (1, 2, 3)]
        ns = run_probe(f"B2 take(start+iota) W={W} 2^19 x8", idx_gather,
                       args, S * QB * W)
        print(f"   -> per-slice: {ns * W:.1f} ns", flush=True)

    if not which or "C" in which:
        G, CQ, LDB = 1 << 11, 1 << 11, 1 << 13
        rows = jnp.asarray(rng.integers(0, 1 << 32, size=(G, LDB),
                                        dtype=np.int64).astype(np.uint32))

        @jax.jit
        def row_taa(rw, idx):
            def body(c, ix):
                v = jnp.take_along_axis(rw, ix, axis=1)
                return c + jnp.sum(v, dtype=jnp.uint32), None
            out, _ = jax.lax.scan(body, jnp.uint32(0), idx)
            return out

        def cidx(seed):
            r = np.random.default_rng(seed)
            return jnp.asarray(r.integers(0, LDB, size=(S, G, CQ),
                                          dtype=np.int64).astype(np.int32))
        args = [(rows, cidx(30 + s)) for s in (1, 2, 3)]
        run_probe("C take_along_axis (2^11,2^11)x8", row_taa, args,
                  S * G * CQ)

    if not which or "D" in which or "E" in which:
        # sorted multiword table: 2 planes; plane1 ~ uniform top bits
        k, b = 21, 24
        hi_bits = 2 * k - 32    # 10 bits in plane1
        keys = np.sort(rng.integers(0, 1 << (2 * k), size=NTAB,
                                    dtype=np.uint64))
        p0 = jnp.asarray((keys & 0xFFFFFFFF).astype(np.uint32))
        p1 = jnp.asarray((keys >> 32).astype(np.uint32))
        pref = (keys >> (2 * k - b)).astype(np.uint64)
        offsets = jnp.asarray(np.searchsorted(
            pref, np.arange((1 << b) + 1, dtype=np.uint64)
        ).astype(np.int32))
        bcount = np.bincount(pref.astype(np.int64), minlength=1 << b)
        iters = max(1, int(bcount.max()).bit_length())
        print(f"   table N=2^28, b={b}, max bucket {bcount.max()}, "
              f"iters {iters}", flush=True)
        del keys, pref, bcount

        def qry(seed):
            r = np.random.default_rng(seed)
            q = r.integers(0, 1 << (2 * k), size=(S, Q), dtype=np.uint64)
            return (jnp.asarray((q & 0xFFFFFFFF).astype(np.uint32)),
                    jnp.asarray((q >> 32).astype(np.uint32)))

        if not which or "D" in which:
            from meryl_tpu.lookup import _lower_bound

            @jax.jit
            def bsearch(pl0, pl1, offs, q0, q1):
                def body(c, qq):
                    idx, found = _lower_bound(
                        [pl0, pl1], offs, [qq[0], qq[1]], k, b, iters)
                    return c + jnp.sum(
                        jnp.where(found, idx, 0).astype(jnp.uint32),
                        dtype=jnp.uint32), None
                out, _ = jax.lax.scan(body, jnp.uint32(0), (q0, q1))
                return out
            args = [(p0, p1, offsets) + qry(40 + s) for s in (1, 2, 3)]
            ns = run_probe("D _lower_bound N=2^28 2^21 x8", bsearch,
                           args, S * Q)
            print(f"   -> {1e3 / ns:.1f} Mq/s", flush=True)

        if not which or "E" in which:
            # single-plane discriminator: all bits below b fit one u32
            # (2k - b = 18 <= 32); search gathers ONE plane
            sb = 2 * k - b
            disc = jnp.asarray(
                ((np.asarray(p0).astype(np.uint64)
                  | (np.asarray(p1).astype(np.uint64) << 32))
                 & ((1 << sb) - 1)).astype(np.uint32))

            @jax.jit
            def bsearch1(dsc, offs, q0, q1):
                def body(c, qq):
                    qq0, qq1 = qq
                    qpref = ((qq1.astype(jnp.uint32) << (b - hi_bits))
                             | (qq0 >> (32 - (b - hi_bits))))
                    qd = qq0 & jnp.uint32((1 << sb) - 1)
                    lo = offs[qpref.astype(jnp.int32)]
                    hi = offs[qpref.astype(jnp.int32) + 1]
                    end = hi
                    for _ in range(iters):
                        mid = (lo + hi) >> 1
                        key = jnp.take(dsc, mid, mode="clip")
                        less = key < qd
                        act = lo < hi
                        lo = jnp.where(act & less, mid + 1, lo)
                        hi = jnp.where(act & ~less, mid, hi)
                    idx = jnp.minimum(lo, NTAB - 1)
                    key = jnp.take(dsc, idx, mode="clip")
                    found = (key == qd) & (lo < end)
                    return c + jnp.sum(
                        jnp.where(found, idx, 0).astype(jnp.uint32),
                        dtype=jnp.uint32), None
                out, _ = jax.lax.scan(body, jnp.uint32(0), (q0, q1))
                return out
            args = [(disc, offsets) + qry(50 + s) for s in (1, 2, 3)]
            ns = run_probe("E 1-plane bsearch N=2^28 2^21 x8", bsearch1,
                           args, S * Q)
            print(f"   -> {1e3 / ns:.1f} Mq/s", flush=True)


if __name__ == "__main__":
    main(set(sys.argv[1:]))
