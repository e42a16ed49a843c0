"""Chip measurement of the bucket-aligned compare-join (ops/bacjoin.py)
at the Merqury-screening scale: N = 2^28 DB entries, 2^21-query slabs.

Measures the full per-slab path (host routing + kernel dispatch +
result download + host decode) with distinct query slabs per rep,
plus the one-time grid build/upload cost.

Usage: python scripts/probe_r4_bacj.py [b c] (default planned geometry)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp                      # noqa: E402
from meryl_tpu.ops import bacjoin as bj      # noqa: E402

K = 21
LOGN = 28
Q = 1 << 21


def main():
    rng = np.random.default_rng(0)
    N = 1 << LOGN
    print("building synthetic DB...", flush=True)
    lo = np.sort(rng.integers(0, 1 << (2 * K), size=N, dtype=np.uint64))
    uniq = np.ones(N, bool)
    uniq[1:] = lo[1:] != lo[:-1]
    lo = lo[uniq]
    hi = np.zeros(len(lo), np.uint64)
    counts = rng.integers(1, 200, size=len(lo)).astype(np.uint32)
    n = len(lo)
    print(f"N = {n}", flush=True)

    top26 = bj._top_bits_np(hi, lo, K, 26)
    c26 = np.bincount(top26, minlength=1 << 26)

    def bucket_max(b):
        return int(c26.reshape(1 << b, -1).sum(axis=1).max())

    if len(sys.argv) >= 3:
        b, c = int(sys.argv[1]), int(sys.argv[2])
        s_cap = bucket_max(b)
        b1 = 13
        lam = Q / (1 << b1)
        capA = int(np.ceil(lam + 5 * np.sqrt(lam) + 8) // 8 * 8 + 8)
        cfg = {"b": b, "B": 1 << b, "b1": b1, "c": c, "s_cap": s_cap,
               "capA": capA, "ps": max(1, -(-(2 * K - b) // 32)),
               "ovfcap": 64}
    else:
        cfg = bj.plan_bacjoin(n, K, bucket_max, Q, 6 * 10**9)
    print(f"cfg: {cfg}", flush=True)

    t0 = time.perf_counter()
    dbd, dbv = bj.build_db_grid(hi, lo, counts, K, cfg)
    t1 = time.perf_counter()
    dbd_d = tuple(jnp.asarray(d) for d in dbd)
    dbv_d = jnp.asarray(dbv)
    for d in dbd_d:
        d.block_until_ready()
    dbv_d.block_until_ready()
    t2 = time.perf_counter()
    gb = cfg["B"] * cfg["s_cap"] * 4 * (cfg["ps"] + 1) / 1e9
    print(f"grid build {t1-t0:.2f}s host, upload {t2-t1:.2f}s "
          f"({gb:.2f} GB)", flush=True)

    kcfg = (K, cfg["b"], cfg["b1"], cfg["c"], cfg["capA"],
            cfg["s_cap"], cfg["ovfcap"])
    d = dict(zip(lo.tolist(), counts.tolist())) if n <= (1 << 22) else None

    def run_slab(seed, check=False):
        r = np.random.default_rng(seed)
        half = Q // 2
        take = r.integers(0, n, size=half)
        qlo = np.concatenate([lo[take], r.integers(
            0, 1 << (2 * K), size=Q - half, dtype=np.uint64)])
        qhi = np.zeros(Q, np.uint64)
        t0 = time.perf_counter()
        routed = bj.route_queries_host(qhi, qlo, K, cfg)
        assert routed is not None
        qlow, n_row, perm = routed
        t1 = time.perf_counter()
        vals, pos, ovf_pos, n_ovf = bj.bacjoin_kernel(
            dbd_d, dbv_d, tuple(jnp.asarray(x) for x in qlow),
            jnp.asarray(n_row), kcfg)
        vals = np.asarray(vals)
        pos = np.asarray(pos)
        novf = int(np.asarray(n_ovf).sum())
        t2 = time.perf_counter()
        out = np.zeros(Q, np.uint32)
        rows, cols = np.nonzero(pos != 0xFFFFFFFF)
        orig = perm[rows * cfg["capA"] + pos[rows, cols]]
        out[orig] = vals[rows, cols]
        t3 = time.perf_counter()
        if check:
            samp = np.random.default_rng(99).integers(0, Q, size=20000)
            import bisect
            bad = 0
            resolved = np.zeros(Q, bool)
            resolved[orig] = True
            for i in samp:
                j = np.searchsorted(lo, qlo[i])
                want = int(counts[j]) if j < n and lo[j] == qlo[i] else 0
                if resolved[i] and int(out[i]) != want:
                    bad += 1
            print(f"  check: {bad} mismatches / 20000 sampled, "
                  f"{novf} overflow ({novf/Q*100:.2f}%)", flush=True)
            assert bad == 0
        return t1 - t0, t2 - t1, t3 - t2, novf

    # ---- device-kernel-only rate (the bench.py lookup convention:
    # scan + scalar checksum; the dev tunnel's d2h is not the product
    # link) ----
    import functools

    import jax
    from jax import lax

    S = 4
    print("staging device-only scan...", flush=True)

    def routed_batch(seed0):
        qs, ns = [], []
        for s in range(S):
            r = np.random.default_rng(seed0 + s)
            half = Q // 2
            take = r.integers(0, n, size=half)
            qlo = np.concatenate([lo[take], r.integers(
                0, 1 << (2 * K), size=Q - half, dtype=np.uint64)])
            qhi = np.zeros(Q, np.uint64)
            qlow, n_row, _ = bj.route_queries_host(qhi, qlo, K, cfg)
            qs.append(np.stack(qlow))     # (ps_l, B1, capA)
            ns.append(n_row)
        return (jnp.asarray(np.stack(qs)), jnp.asarray(np.stack(ns)))

    @functools.partial(jax.jit, static_argnames=("kc",))
    def pipe(dbd_a, dbv_a, xs, nr, kc):
        def body(carry, x):
            ql, nrow = x
            vals, pos, tail, novf = bj.bacjoin_kernel(
                dbd_a, dbv_a, tuple(ql[i] for i in range(ql.shape[0])),
                nrow, kc)
            return (carry + jnp.sum(vals, dtype=jnp.uint32)
                    + jnp.sum(pos, dtype=jnp.uint32)
                    + jnp.sum(tail, dtype=jnp.uint32)
                    + jnp.sum(novf).astype(jnp.uint32)), None
        out, _ = lax.scan(body, jnp.uint32(0), (xs, nr))
        return out

    batches = [routed_batch(100), routed_batch(200), routed_batch(300)]
    t0 = time.perf_counter()
    int(np.asarray(pipe(dbd_d, dbv_d, *batches[0], kc=kcfg)))
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    bestk = 9e9
    for i in (1, 2, 1, 2):
        t0 = time.perf_counter()
        int(np.asarray(pipe(dbd_d, dbv_d, *batches[i], kc=kcfg)))
        dt = time.perf_counter() - t0
        bestk = min(bestk, dt)
        print(f"  scan x{S}: {dt*1e3:.1f} ms -> "
              f"{S*Q/dt/1e6:.1f} Mq/s device", flush=True)
    print(f"DEVICE KERNEL: {S*Q/bestk/1e6:.2f} Mq/s "
          f"({(bestk/S)*1e3:.1f} ms/slab, RTT incl.)", flush=True)

    print("first slab (compile)...", flush=True)
    r0, k0, d0, _ = run_slab(1, check=True)
    best = None
    for s in range(2, 6):
        rt, kt, dt, novf = run_slab(s)
        tot = rt + kt + dt
        print(f"  slab: route {rt*1e3:.1f} ms, kernel+dl {kt*1e3:.1f} "
              f"ms, decode {dt*1e3:.1f} ms -> {Q/tot/1e6:.1f} Mq/s "
              f"(ovf {novf})", flush=True)
        best = min(best or 9e9, tot)
    print(f"BEST: {Q/best/1e6:.1f} Mq/s end-to-end "
          f"({best*1e3:.1f} ms/slab)", flush=True)
    # pipelined bound: host routing/decoding overlaps the device when
    # the driver double-buffers slabs — report the device-side floor
    print("done", flush=True)


if __name__ == "__main__":
    main()
