"""Routing-row (L0) sweep through the DEVICE-ACCUMULATOR kernels on
chip (VERDICT r4 item 5 / weak 7).

The r4 rowlen table showed the extract+sort kernel's device knee at
rows of 2^7 — but that kernel's only product users host-merge (the
fan-in argument pinned its default at 2^11 and still applies to
them).  The FLAGSHIP path's kernels are accum.route_chunk +
accum.merge_cells, whose row length is plan_route's L0 (2^16): this
sweeps L0 and measures (a) route ns/base and (b) the M=8-cadence
merge ns per staged slot, both fetch-grounded scan dispatches with
the tunnel RTT subtracted — the accumulator analog of the rowlen
sweep.  Note the trade: halving L0 halves the per-row bucket mean so
the 3-sigma+4 cell slack grows RELATIVELY (more pad slots per real
window through both routing sorts); the knee is where sort-rate gains
beat pad growth.

Run: python scripts/probe_r5_acc_l0.py [logL0 ...]  (default 12..16)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

K = 21
CHUNK = 1 << 22
EXPECTED = 1 << 20  # the e2e bench's unique-set scale
TRIALS = 2


def measure(logl0: int):
    os.environ["MERYL_TPU_ACC_L0"] = str(1 << logl0)
    from meryl_tpu.ops import accum  # plan_route reads the env live

    plan = accum.plan_route(CHUNK, K, EXPECTED)
    cfg = (K, 2, "canonical", plan["B"], plan["R0"], plan["L0"],
           plan["c"], plan["bits"])
    rng = np.random.default_rng(5)

    @jax.jit
    def null(x):
        return x + jnp.uint32(1)

    int(null(jnp.uint32(0)))
    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        int(null(jnp.uint32(i + 10)))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)

    R = max(1, (1 << 24) // CHUNK)

    def body(carry, codes):
        cells, ovf, n_ovf_row, n_allones = accum.route_chunk(codes, cfg)
        s = jnp.sum(n_ovf_row) + n_allones
        for cl in cells:
            s = s + cl[0, 0].astype(jnp.int32)
        for o in ovf:
            s = s + o[0, 0].astype(jnp.int32)
        return carry + s.astype(jnp.uint32), None

    @jax.jit
    def pipe(chunks):
        out, _ = lax.scan(body, jnp.uint32(0), chunks)
        return out

    ins = [jax.device_put(jnp.asarray(
        rng.integers(0, 4, size=(R, CHUNK)).astype(np.uint8)))
        for _ in range(TRIALS + 1)]
    jax.block_until_ready(ins)
    int(pipe(ins[0]))
    ts = []
    for t in range(TRIALS):
        t0 = time.perf_counter()
        int(pipe(ins[1 + t]))
        ts.append(time.perf_counter() - t0)
    route_ns = max(0.1, (min(ts) - rtt)) / (R * CHUNK) * 1e9

    # merge at the M=8 cadence with this geometry's cell width
    from meryl_tpu import kmer as km
    B, R0, c = plan["B"], plan["R0"], plan["c"]
    W = R0 * c
    M, La, S = 8, 2048, 2

    def make_batch():
        a0s, a1s, acs, gps = [], [], [], []
        for _ in range(S):
            accv = np.sort(rng.integers(0, 1 << 42, size=(B, La),
                                        dtype=np.uint64), axis=1)
            a0s.append((accv & 0xFFFFFFFF).astype(np.uint32))
            a1s.append((accv >> 32).astype(np.uint32))
            acs.append(rng.integers(1, 50, size=(B, La))
                       .astype(np.uint32))
            gv = rng.integers(0, 1 << 42, size=(M, B, W),
                              dtype=np.uint64)
            gps.append(np.stack(
                [np.stack([(gv[m] & 0xFFFFFFFF).astype(np.uint32),
                           (gv[m] >> 32).astype(np.uint32)])
                 for m in range(M)]))
        return jax.device_put((jnp.asarray(np.stack(a0s)),
                               jnp.asarray(np.stack(a1s)),
                               jnp.asarray(np.stack(acs)),
                               jnp.asarray(np.stack(gps))))

    def mbody(carry, xs):
        a0, a1, ac, gp = xs
        staged = tuple((gp[m, 0], gp[m, 1]) for m in range(M))
        planes, counts, n_runs = accum.merge_cells(
            [a0, a1], ac, staged, 2, La, int(km.VALUE_MAX))
        return (carry + jnp.sum(n_runs).astype(jnp.uint32)
                + counts[0, 0] + planes[0][0, 0]), None

    @jax.jit
    def mpipe(xs):
        out, _ = lax.scan(mbody, jnp.uint32(0), xs)
        return out

    ins = [make_batch() for _ in range(TRIALS + 1)]
    jax.block_until_ready(ins)
    int(mpipe(ins[0]))
    ts = []
    for t in range(TRIALS):
        t0 = time.perf_counter()
        int(mpipe(ins[1 + t]))
        ts.append(time.perf_counter() - t0)
    # attribute merge to the M chunks' BASES (what e2e pays per base)
    merge_ns_base = max(0.1, (min(ts) - rtt)) / (S * M * CHUNK) * 1e9
    print(f"L0=2^{logl0}: B={B} R0={R0} c={c} cellW={W} "
          f"route={route_ns:.3f} ns/base "
          f"merge={merge_ns_base:.3f} ns/base "
          f"total={route_ns + merge_ns_base:.3f}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    logs = [int(a) for a in sys.argv[1:]] or [16, 15, 14, 13, 12]
    for lg in logs:
        measure(lg)


if __name__ == "__main__":
    main()
