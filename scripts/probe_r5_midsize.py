"""Does the bucket-grid compare-join win the MID-SIZE lookup regime
[2^16, 2^22) (VERDICT r4 item 4)?

Round 4 left the r3 routed join owning mid-size tables at a captured
50 Mq/s while the grid join wins both neighbors (103 small / 106 big).
This measures the BACJ kernel with the PRODUCT planner at N = 2^21 and
2^19 (and the planner's chosen geometry printed), same scan + checksum
convention as bench_lookup_bigdb.  If it clears ~80 Mq/s the regime
boundary BACJ_MIN_N moves down; if not, docs/tpu-design.md records the
decisive negative.

Run: python scripts/probe_r5_midsize.py  (one TPU process only)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from meryl_tpu import lookup as lk  # noqa: E402
from meryl_tpu.ops import bacjoin as bj  # noqa: E402

K = 21
S = 2
TRIALS = 3


def run_case(logn: int):
    rng = np.random.default_rng(4 + logn)
    n_target = 1 << logn
    gaps = rng.exponential(scale=(1 << (2 * K)) / n_target,
                           size=n_target)
    lo = np.floor(np.cumsum(gaps)).astype(np.uint64)
    keep = np.ones(n_target, bool)
    keep[1:] = lo[1:] != lo[:-1]
    lo = lo[keep & (lo < (1 << (2 * K)))]
    hi = np.zeros(len(lo), np.uint64)
    counts = rng.integers(1, 200, size=len(lo)).astype(np.uint32)
    n = len(lo)

    bm = min(26, 2 * K - 1)
    topM = bj._top_bits_np(hi, lo, K, bm)
    cM = np.bincount(topM, minlength=1 << bm)

    def bucket_max(b):
        return int(cM.reshape(1 << b, -1).sum(axis=1).max())

    q_slab = lk.ExactLookup.BACJ_SLAB
    cfg = bj.plan_bacjoin(n, K, bucket_max, q_slab,
                          float(os.environ.get(
                              "MERYL_TPU_BACJ_CAP_GB", "6")) * 1e9,
                          b_hi=bm)
    if cfg is None:
        print(f"[N=2^{logn}] planner returned None", flush=True)
        return
    dbd, dbv = bj.build_db_grid(hi, lo, counts, K, cfg)
    dbd_d = tuple(jnp.asarray(d) for d in dbd)
    dbv_d = jnp.asarray(dbv)
    jax.block_until_ready((dbd_d, dbv_d))
    kcfg = (K, cfg["b"], cfg["b1"], cfg["c"], cfg["capA"],
            cfg["s_cap"], cfg["ovfcap"])

    @jax.jit
    def pipeline(dbd_a, dbv_a, xs, nr):
        def body(carry, x):
            ql, nrow = x
            vals, pos, tail, novf = bj.bacjoin_kernel(
                dbd_a, dbv_a,
                tuple(ql[i] for i in range(ql.shape[0])), nrow, kcfg)
            return (carry + jnp.sum(vals, dtype=jnp.uint32)
                    + jnp.sum(pos, dtype=jnp.uint32)
                    + jnp.sum(tail, dtype=jnp.uint32)
                    + jnp.sum(novf).astype(jnp.uint32)), None
        out, _ = lax.scan(body, jnp.uint32(0), (xs, nr))
        return out

    def make_batch(seed0):
        qs, ns = [], []
        r = np.random.default_rng(seed0)
        for _ in range(S):
            half = q_slab // 2
            take = r.integers(0, n, size=half)
            qlo = np.concatenate([lo[take], r.integers(
                0, 1 << (2 * K), size=q_slab - half, dtype=np.uint64)])
            qhi = np.zeros(q_slab, np.uint64)
            qlow, n_row, _ = bj.route_queries_host(qhi, qlo, K, cfg)
            qs.append(np.stack(qlow))
            ns.append(n_row)
        return (jax.device_put(jnp.asarray(np.stack(qs))),
                jax.device_put(jnp.asarray(np.stack(ns))))

    inputs = [make_batch(50 + 13 * i) for i in range(TRIALS + 1)]
    jax.block_until_ready(inputs)
    int(pipeline(dbd_d, dbv_d, *inputs[0]))  # compile + warm
    rates = []
    for t in range(TRIALS):
        t0 = time.perf_counter()
        int(pipeline(dbd_d, dbv_d, *inputs[1 + t]))
        rates.append(S * q_slab / (time.perf_counter() - t0) / 1e6)
    geom = {kk: int(cfg[kk]) for kk in
            ("b", "b1", "c", "capA", "s_cap")}
    print(f"[N=2^{logn}] n={n} geom={geom} "
          f"grid_mb={cfg['B'] * cfg['s_cap'] * 4 * (cfg['ps'] + 1) / 1e6:.0f} "
          f"rates={[round(r, 1) for r in rates]} Mq/s "
          f"best={max(rates):.1f}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    logns = [int(a) for a in sys.argv[1:]] or [21, 19, 18]
    for logn in logns:
        run_case(logn)


if __name__ == "__main__":
    main()
