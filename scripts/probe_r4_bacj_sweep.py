"""Geometry + resolve-layout sweep for the bucket-aligned compare-join
(ops/bacjoin.py) at big-DB scale: N ~ 2^28 DB entries, one grid,
several (slab size Q, coarse bits b1, cell capacity c, fused resolve)
query-side configurations, device-kernel rate per config.

Device-kernel convention matches bench.py: lax.scan over S pre-routed
slabs with a scalar checksum fetch (dispatch -> int grounds the
timing; the dev tunnel's d2h is not the product link).

Usage: python scripts/probe_r4_bacj_sweep.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax                                   # noqa: E402
import jax.numpy as jnp                      # noqa: E402
from jax import lax                          # noqa: E402

from meryl_tpu.ops import bacjoin as bj      # noqa: E402

K = 21
LOGN = 28
S = 2


def synth_db(rng, n):
    """Sorted unique keys as a Poisson process over [0, 2^2K): same
    bucket-occupancy statistics as uniform random draws, no giant
    sort."""
    gaps = rng.exponential(scale=(1 << (2 * K)) / n, size=n)
    keys = np.cumsum(gaps)
    keys = np.floor(keys).astype(np.uint64)
    keep = np.ones(n, bool)
    keep[1:] = keys[1:] != keys[:-1]
    keys = keys[keep & (keys < (1 << (2 * K)))]
    return keys


def main():
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    lo = synth_db(rng, 1 << LOGN)
    hi = np.zeros(len(lo), np.uint64)
    counts = rng.integers(1, 200, size=len(lo)).astype(np.uint32)
    n = len(lo)
    print(f"N = {n} ({time.perf_counter()-t0:.1f}s)", flush=True)

    top26 = bj._top_bits_np(hi, lo, K, 26)
    c26 = np.bincount(top26, minlength=1 << 26)

    def bucket_max(b):
        return int(c26.reshape(1 << b, -1).sum(axis=1).max())

    base = bj.plan_bacjoin(n, K, bucket_max, 1 << 21, 6 * 10**9)
    print(f"planned: {base}", flush=True)
    b, s_cap, ps = base["b"], base["s_cap"], base["ps"]

    t0 = time.perf_counter()
    dbd, dbv = bj.build_db_grid(hi, lo, counts, K, base)
    t1 = time.perf_counter()
    dbd_d = tuple(jnp.asarray(d) for d in dbd)
    dbv_d = jnp.asarray(dbv)
    for d in dbd_d:
        d.block_until_ready()
    dbv_d.block_until_ready()
    gb = base["B"] * s_cap * 4 * (ps + 1) / 1e9
    print(f"grid build {t1-t0:.1f}s host, upload "
          f"{time.perf_counter()-t1:.1f}s ({gb:.2f} GB)", flush=True)

    @functools.partial(jax.jit, static_argnames=("kc", "fused"))
    def pipe(dbd_a, dbv_a, xs, nr, kc, fused):
        def body(carry, x):
            ql, nrow = x
            vals, pos, tail, novf = bj.bacjoin_kernel(
                dbd_a, dbv_a, tuple(ql[i] for i in range(ql.shape[0])),
                nrow, kc, fused=fused)
            return (carry + jnp.sum(vals, dtype=jnp.uint32)
                    + jnp.sum(pos, dtype=jnp.uint32)
                    + jnp.sum(tail, dtype=jnp.uint32)
                    + jnp.sum(novf).astype(jnp.uint32)), None
        out, _ = lax.scan(body, jnp.uint32(0), (xs, nr))
        return out

    def routed_batch(seed0, q, cfg):
        qs, ns, novf_est = [], [], 0
        r = np.random.default_rng(seed0)
        for s in range(S):
            half = q // 2
            take = r.integers(0, n, size=half)
            qlo = np.concatenate([lo[take], r.integers(
                0, 1 << (2 * K), size=q - half, dtype=np.uint64)])
            qhi = np.zeros(q, np.uint64)
            routed = bj.route_queries_host(qhi, qlo, K, cfg)
            assert routed is not None, "router rejected slab"
            qlow, n_row, _ = routed
            qs.append(np.stack(qlow))
            ns.append(n_row)
        return (jnp.asarray(np.stack(qs)), jnp.asarray(np.stack(ns)))

    # (logQ, b1, c, fused)
    configs = [
        (21, 13, 3, False),   # r4-commit baseline (39.8 Mq/s prior)
        (21, 13, 3, True),    # fused resolve, same geometry
        (21, 12, 3, True),
        (22, 13, 5, True),
        (22, 14, 5, True),
        (23, 14, 7, True),
    ]
    results = []
    for logq, b1, c, fused in configs:
        q = 1 << logq
        lam = q / (1 << b1)
        capA = int((np.ceil(lam + 5 * np.sqrt(lam) + 8) // 8 + 1) * 8)
        cfg = {"b": b, "B": 1 << b, "b1": b1, "c": c, "s_cap": s_cap,
               "capA": capA, "ps": ps, "ovfcap": 256}
        kcfg = (K, b, b1, c, capA, s_cap, 256)
        tag = f"Q=2^{logq} b1={b1} c={c} capA={capA} fused={int(fused)}"
        try:
            t0 = time.perf_counter()
            batches = [routed_batch(100 + 7 * i, q, cfg)
                       for i in range(3)]
            troute = time.perf_counter() - t0
            t0 = time.perf_counter()
            int(np.asarray(pipe(dbd_d, dbv_d, *batches[0],
                                kc=kcfg, fused=fused)))
            tc = time.perf_counter() - t0
            best = 9e9
            for i in (1, 2, 1, 2):
                t0 = time.perf_counter()
                int(np.asarray(pipe(dbd_d, dbv_d, *batches[i],
                                    kc=kcfg, fused=fused)))
                best = min(best, time.perf_counter() - t0)
            rate = S * q / best / 1e6
            print(f"{tag}: {rate:.1f} Mq/s "
                  f"({best/S*1e3:.1f} ms/slab; compile {tc:.0f}s, "
                  f"route {troute/3/S*1e3:.0f} ms/slab host)",
                  flush=True)
            results.append((rate, tag))
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
    results.sort(reverse=True)
    print("\n=== ranked ===", flush=True)
    for rate, tag in results:
        print(f"{rate:8.1f} Mq/s  {tag}", flush=True)


if __name__ == "__main__":
    main()
