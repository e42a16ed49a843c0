"""Benchmark: canonical k=21 kmer counting throughput on device,
plus bulk-lookup throughput (extra fields in the same JSON line).

Prints one JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
   "trials_bases_per_s": [...], "lookup_mqps": N, ...}

Baseline (BASELINE.md): reference meryl publishes no numbers; the
north-star target is 5 GB/s FASTQ counting on a v5p-16 pod.  A FASTQ
byte stream is ~2 bytes per base (sequence + quality lines), so the
per-pod base target is ~2.5e9 bases/s; per chip (v5p-16 = 8 chips)
~3.125e8 bases/s.  vs_baseline = measured bases/s on this host's chips
divided by the per-chip target times local chip count.

Instrument design (hard-won on the axon tunnel, docs/tpu-design.md):
  * `block_until_ready` on a scalar does NOT block on the axon
    backend — every trial times dispatch -> int(value) fetch, which
    cannot complete before the computation does.
  * Each dispatch+fetch pays ~27 ms of tunnel RTT — the whole
    workload (2^26 bases) runs as ONE `lax.scan` dispatch per trial
    so the RTT is <5% of the measurement, and the scalar carry
    consumes the sorted output (run-start mask needs the full sorted
    order) so nothing is dead-code eliminated.
  * The remote executor can memoize per (executable, input): every
    trial uses a DISTINCT device-resident input, staged before timing.

The measured program is the device count KERNEL: extract (rolling-dot
ladder) + row-batched sort (MERYL_TPU_ROWLEN) + run-start mask, at the
production chunk size (2^22) — the per-chunk program of the host-merge
counting path (batched out-of-core, CPU backend, count-suffix,
overflow recounts) and the cost family of the sharded SPMD step.  The
default single-chip file->DB path is the device ACCUMULATOR
(ops/accum.py), whose end-to-end wall-clock is captured separately as
count_e2e_bases_s.
"""

import json
import os
import time

import numpy as np


def _timeit_fetch(fn, inputs, trials):
    int(fn(inputs[0]))  # compile + warm
    times = []
    for t in range(trials):
        t0 = time.perf_counter()
        int(fn(inputs[1 + t]))
        times.append(time.perf_counter() - t0)
    return times


def bench_counting():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from meryl_tpu.ops import count as cnt
    from meryl_tpu.ops import extract as ext

    K = 21
    CHUNK = 1 << 22          # production device chunk
    TOTAL = 1 << 26          # bases per timed dispatch
    ROWLEN = int(os.environ.get("MERYL_TPU_ROWLEN", 1 << 11))  # = product default (counter._sort_rowlen)
    TRIALS = 3

    def body(carry, codes):
        planes, valid = ext.extract_kmers(codes, K, "canonical")
        splanes, start, n_invalid = cnt.sort_starts(planes, valid, ROWLEN)
        return (carry + jnp.sum(start.astype(jnp.uint32))
                + splanes[0][0] + splanes[-1][-1]
                + jnp.sum(jnp.atleast_1d(n_invalid).astype(jnp.uint32))), None

    @jax.jit
    def pipeline(chunks):
        out, _ = lax.scan(body, jnp.uint32(0), chunks)
        return out

    rng = np.random.default_rng(0)
    R = TOTAL // CHUNK
    inputs = [jax.device_put(jnp.asarray(
        rng.integers(0, 4, size=(R, CHUNK)).astype(np.uint8)))
        for _ in range(TRIALS + 1)]
    jax.block_until_ready(inputs)

    times = _timeit_fetch(pipeline, inputs, TRIALS)
    trials = [TOTAL / dt for dt in times]
    return max(trials), trials


def bench_lookup():
    """Bulk exact-lookup throughput (BASELINE.md workload:
    'meryl-lookup batched queries'): bulk queries against a ~4M-kmer
    table, S slabs per scan dispatch with a scalar checksum out
    (fetch-grounded; measures the lookup kernel, not the dev tunnel's
    device->host link).  The measured program is what the product
    dispatches for this workload: the bucket-aligned compare-join
    (ops/bacjoin.py) at the product slab size — since round 5 the
    grid join owns EVERY bulk table (BACJ_MIN_N = 2^16; the
    lookup_midsize/exists fields measure it at a 2M-entry table)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from meryl_tpu import lookup as lk
    from meryl_tpu.ops import bacjoin as bj

    K = 21
    N_DB = 1 << 22
    S = 2
    TRIALS = 3

    rng = np.random.default_rng(1)
    kmers = np.unique(rng.integers(0, 1 << 42, size=N_DB,
                                   dtype=np.uint64))
    hi = np.zeros(len(kmers), np.uint64)
    counts = rng.integers(1, 100, size=len(kmers)).astype(np.uint32)
    n = len(kmers)

    bm = min(26, 2 * K - 1, n.bit_length() + 3)
    topM = bj._top_bits_np(hi, kmers, K, bm)
    cM = np.bincount(topM, minlength=1 << bm)  # already int64

    def bucket_max(b):
        return int(cM.reshape(1 << b, -1).sum(axis=1).max())

    q_slab = lk.ExactLookup.BACJ_SLAB
    cfg = bj.plan_bacjoin(n, K, bucket_max, q_slab, 6e9, b_hi=bm)
    dbd, dbv = bj.build_db_grid(hi, kmers, counts, K, cfg)
    dbd_d = tuple(jnp.asarray(d) for d in dbd)
    dbv_d = jnp.asarray(dbv)
    jax.block_until_ready((dbd_d, dbv_d))
    kcfg = (K, cfg["b"], cfg["b1"], cfg["c"], cfg["capA"],
            cfg["s_cap"], cfg["ovfcap"])

    @jax.jit
    def pipeline(dbd_a, dbv_a, xs, nr):
        # grids ride as ARGUMENTS: closing over them captures GBs of
        # constants at lowering time and stalls the compile
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
            qlo = np.concatenate([kmers[take], r.integers(
                0, 1 << 42, size=q_slab - half, dtype=np.uint64)])
            qhi = np.zeros(q_slab, np.uint64)
            qlow, n_row, _ = bj.route_queries_host(qhi, qlo, K, cfg)
            qs.append(np.stack(qlow))
            ns.append(n_row)
        return (jax.device_put(jnp.asarray(np.stack(qs))),
                jax.device_put(jnp.asarray(np.stack(ns))))

    inputs = [make_batch(60 + 17 * i) for i in range(TRIALS + 1)]
    jax.block_until_ready(inputs)
    int(pipeline(dbd_d, dbv_d, *inputs[0]))
    times = []
    for t in range(TRIALS):
        t0 = time.perf_counter()
        int(pipeline(dbd_d, dbv_d, *inputs[1 + t]))
        times.append(time.perf_counter() - t0)
    return [S * q_slab / dt / 1e6 for dt in times]


def bench_lookup_midsize():
    """Mid-size bulk lookup kernel in its round-5 product formulation:
    the bucket-grid compare-join (ops/bacjoin.py) at a ~2M-kmer table
    — the BACJ regime extends down to BACJ_MIN_N = 2^16 since round 5
    (the r3 routed join, 50 Mq/s captured in r4, remains only the
    degenerate-skew fallback).  Values mode and the packed exists mode
    that screening callers (existence/include/exclude/-bed/-wig-depth)
    use; half-hit/half-miss slabs, same scan + checksum convention as
    bench_lookup_bigdb."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from meryl_tpu import lookup as lk
    from meryl_tpu.ops import bacjoin as bj

    K = 21
    LOGN = 21
    S = 2
    TRIALS = 3

    rng = np.random.default_rng(25)
    n_target = 1 << LOGN
    gaps = rng.exponential(scale=(1 << (2 * K)) / n_target,
                           size=n_target)
    lo = np.floor(np.cumsum(gaps)).astype(np.uint64)
    keep = np.ones(n_target, bool)
    keep[1:] = lo[1:] != lo[:-1]
    lo = lo[keep & (lo < (1 << (2 * K)))]
    hi = np.zeros(len(lo), np.uint64)
    counts = rng.integers(1, 200, size=len(lo)).astype(np.uint32)
    n = len(lo)

    bm = min(26, 2 * K - 1, n.bit_length() + 3)
    topM = bj._top_bits_np(hi, lo, K, bm)
    cM = np.bincount(topM, minlength=1 << bm)

    def bucket_max(b):
        return int(cM.reshape(1 << b, -1).sum(axis=1).max())

    q_slab = lk.ExactLookup.BACJ_SLAB
    cfg = bj.plan_bacjoin(n, K, bucket_max, q_slab,
                          float(os.environ.get(
                              "MERYL_TPU_BACJ_CAP_GB", "6")) * 1e9,
                          b_hi=bm)
    if cfg is None:  # degenerate cap/skew config: skip the metric,
        return None  # never sink the whole bench line
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

    @jax.jit
    def pipeline_exists(dbd_a, dbv_a, xs, nr):
        def body(carry, x):
            ql, nrow = x
            packed, tail, novf = bj.bacjoin_kernel(
                dbd_a, dbv_a,
                tuple(ql[i] for i in range(ql.shape[0])), nrow, kcfg,
                exists_only=True)
            return (carry + jnp.sum(packed, dtype=jnp.uint32)
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
            routed = bj.route_queries_host(qhi, qlo, K, cfg)
            if routed is None:  # capA overflow (router rejection):
                return None     # skip the metric, not the bench
            qlow, n_row, _ = routed
            qs.append(np.stack(qlow))
            ns.append(n_row)
        return (jax.device_put(jnp.asarray(np.stack(qs))),
                jax.device_put(jnp.asarray(np.stack(ns))))

    inputs = [make_batch(60 + 13 * i) for i in range(TRIALS + 1)]
    if any(b is None for b in inputs):
        return None
    jax.block_until_ready(inputs)
    int(pipeline(dbd_d, dbv_d, *inputs[0]))
    int(pipeline_exists(dbd_d, dbv_d, *inputs[0]))
    times, times_e = [], []
    for t in range(TRIALS):
        t0 = time.perf_counter()
        int(pipeline(dbd_d, dbv_d, *inputs[1 + t]))
        times.append(time.perf_counter() - t0)
    for t in range(TRIALS):
        t0 = time.perf_counter()
        int(pipeline_exists(dbd_d, dbv_d, *inputs[1 + t]))
        times_e.append(time.perf_counter() - t0)
    return ([S * q_slab / dt / 1e6 for dt in times],
            [S * q_slab / dt / 1e6 for dt in times_e])


def bench_v2_action():
    """meryl2 action-engine throughput (the v2 algebra surface):
    union-sum with 64-bit label OR over three 1M-entry labeled inputs,
    row-packed at shared key boundaries (the round-4 layout), S
    batches per scan dispatch, fetch-grounded.  Returns merged
    entries/s in millions.  The measured program is the product's
    action kernel (v2/engine._action_sort_stage + _action_compute_
    stage with the windowed per-run reductions)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from meryl_tpu.optree import BucketEvaluator
    from meryl_tpu.v2.engine import (Assign, Selector,
                                     _action_compute_stage,
                                     _action_sort_stage)

    N = 1 << 20
    M = 3
    S = 4
    TRIALS = 3
    rng = np.random.default_rng(6)
    ev = BucketEvaluator(21)
    va, la, sel = Assign("add"), Assign("or"), Selector()

    def make_input():
        batches = []
        for _ in range(S):
            triples, extras = [], []
            for _ in range(M):
                v = np.unique(rng.integers(0, 1 << 42, size=N,
                                           dtype=np.uint64))
                hi = np.zeros(len(v), np.uint64)
                c = rng.integers(1, 100, size=len(v)).astype(np.uint32)
                lab = rng.integers(0, 1 << 63, size=len(v),
                                   dtype=np.uint64)
                triples.append((hi, v, c))
                extras.append([(lab & 0xFFFFFFFF).astype(np.uint32),
                               (lab >> np.uint64(32)).astype(np.uint32)])
            planes, values, ids, (llo, lhi) = ev._pack_rows(
                triples, M, extras=extras)
            batches.append((planes, values, llo, lhi, ids))
        out = tuple(
            jnp.asarray(np.stack([b[0][p] for b in batches]))
            for p in range(ev.P)) + tuple(
            jnp.asarray(np.stack([b[i] for b in batches]))
            for i in range(1, 5))
        return jax.device_put(out)

    vconst = jnp.uint32(0)
    lc0 = jnp.uint32(0)

    def body(carry, xs):
        planes = list(xs[:ev.P])
        values, llo, lhi, ids = xs[ev.P:]
        sp, v2, l2, h2, i2 = _action_sort_stage(planes, values, llo,
                                                lhi, ids)
        osp, ov, ollo, olhi, keep = _action_compute_stage(
            sp, v2, l2, h2, i2, M, 21, va, la, sel, vconst, lc0, lc0)
        return (carry + jnp.sum(jnp.where(keep, ov, 0),
                                dtype=jnp.uint32)
                + jnp.sum(ollo[:1], dtype=jnp.uint32)
                + osp[0][0, 0]), None

    @jax.jit
    def pipeline(xs):
        out, _ = lax.scan(body, jnp.uint32(0), xs)
        return out

    inputs = [make_input() for _ in range(TRIALS + 1)]
    jax.block_until_ready(inputs)
    times = _timeit_fetch(pipeline, inputs, TRIALS)
    return [S * M * N / dt / 1e6 for dt in times]


def bench_lookup_bigdb():
    """Big-DB bulk lookup (the Merqury screening regime, VERDICT r3
    item 1): a 2^28-entry DB — 128x the 2^21-query slab — resolved by
    the bucket-aligned compare-join (ops/bacjoin.py), device-kernel
    rate by the same scan + scalar-checksum convention as
    bench_lookup.  The r3 routed join collapses to the ~9 Mq/s binary
    search in this regime because it re-sorts the grouped DB side
    every slab; the grid join's only DB touch is a dense streaming
    compare."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from meryl_tpu import lookup as lk
    from meryl_tpu.ops import bacjoin as bj

    K = 21
    LOGN = 28
    S = 2
    TRIALS = 3

    rng = np.random.default_rng(4)
    n_target = 1 << LOGN
    # sorted unique keys as a Poisson process over the key space: same
    # bucket-occupancy statistics as uniform draws, no giant sort
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
    cM = np.bincount(topM, minlength=1 << bm)  # already int64

    def bucket_max(b):
        return int(cM.reshape(1 << b, -1).sum(axis=1).max())

    q_slab = lk.ExactLookup.BACJ_SLAB
    cfg = bj.plan_bacjoin(n, K, bucket_max, q_slab,
                          float(os.environ.get(
                              "MERYL_TPU_BACJ_CAP_GB", "6")) * 1e9,
                          b_hi=bm)
    dbd, dbv = bj.build_db_grid(hi, lo, counts, K, cfg)
    dbd_d = tuple(jnp.asarray(d) for d in dbd)
    dbv_d = jnp.asarray(dbv)
    jax.block_until_ready((dbd_d, dbv_d))
    kcfg = (K, cfg["b"], cfg["b1"], cfg["c"], cfg["capA"],
            cfg["s_cap"], cfg["ovfcap"])

    @jax.jit
    def pipeline(dbd_a, dbv_a, xs, nr):
        # grids ride as ARGUMENTS: closing over them captures GBs of
        # constants at lowering time and stalls the compile
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
    times = []
    for t in range(TRIALS):
        t0 = time.perf_counter()
        int(pipeline(dbd_d, dbv_d, *inputs[1 + t]))
        times.append(time.perf_counter() - t0)
    detail = {"n_db": int(n), "q_slab": int(q_slab),
              "db_over_slab": round(n / q_slab, 1),
              "grid_gb": round(cfg["B"] * cfg["s_cap"] * 4
                               * (cfg["ps"] + 1) / 1e9, 2),
              "geometry": {kk: int(cfg[kk]) for kk in
                           ("b", "b1", "c", "capA", "s_cap")}}
    return [S * q_slab / dt / 1e6 for dt in times], detail


def bench_setop():
    """Set-operation merge-kernel throughput (BASELINE.md workload:
    'union-sum / intersect-min / subtract set ops'): union-sum over
    two 1M-entry sorted unique inputs per batch, 8 batches per scan
    dispatch, fetch-grounded scalar out.  Returns merged entries/s in
    millions.  The measured program is what the op-tree evaluator
    dispatches per bucket group: optree._pack_rows splits the
    pre-sorted inputs at shared key boundaries into (R, L) rows
    (packing itself is host work, overlapped in production and
    untimed here, as with counting's host stages), then one
    row-batched sort + windowed-reduction compute stage."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from meryl_tpu.optree import BucketEvaluator
    from meryl_tpu.ops.setops import _merge_compute_stage, _merge_sort_stage

    N = 1 << 20
    S = 8
    TRIALS = 5   # the tunnel's run-to-run swing is larger than the
    #              kernel's own variance; best-of-5 tightens the
    #              throughput statistic (median still visible in the
    #              e2e detail fields)
    rng = np.random.default_rng(2)
    ev = BucketEvaluator(21)

    def make_input():
        batches = []
        for _ in range(S):
            ins = []
            for inp in range(2):
                v = np.unique(rng.integers(0, 1 << 42, size=N,
                                           dtype=np.uint64))
                v = np.pad(v, (0, N - len(v)),
                           constant_values=(1 << 42) - 1)[:N]
                hi = np.zeros(N, np.uint64)
                vals = rng.integers(1, 100, size=N).astype(np.uint32)
                ins.append((hi, v, vals))
            batches.append(ev._pack_rows(ins, 2))
        planes = [jnp.asarray(np.stack([b[0][p] for b in batches]))
                  for p in range(ev.P)]
        values = jnp.asarray(np.stack([b[1] for b in batches]))
        ids = jnp.asarray(np.stack([b[2] for b in batches]))
        return jax.device_put((tuple(planes), values, ids))

    rowlen = None

    def body(carry, xs):
        planes, vals, ids = xs
        splanes, val, ids2 = _merge_sort_stage(list(planes), vals, ids)
        sp, ov, keep = _merge_compute_stage(splanes, val, ids2,
                                            "union-sum", 2, jnp.uint32(0),
                                            rowlen)
        return (carry + jnp.sum(jnp.where(keep, ov, 0)) + sp[0][0]), None

    @jax.jit
    def pipeline(xs):
        out, _ = lax.scan(body, jnp.uint32(0), xs)
        return out

    inputs = [make_input() for _ in range(TRIALS + 1)]
    rowlen = int(inputs[0][1].shape[-1])
    jax.block_until_ready(inputs)
    times = _timeit_fetch(pipeline, inputs, TRIALS)
    return [S * 2 * N / dt / 1e6 for dt in times]


def bench_calibration():
    """Measured stage costs that feed the multi-chip scaling model
    (parallel/scaling.py reads these fields from the newest
    BENCH_r*.json, so -C's efficiency table is derived from the
    current round's hardware, not hand-entered literals):

      t_local_ns_per_base — the ROUTED shard step's local stage
        (extract + key-range cell routing, accum.route_chunk at the
        SPMD geometry plan_shard_route gives an 8-device mesh), per
        input base.  This is what each device computes before the
        all-to-all (parallel/shard_count.make_routed_step).
      t_merge_ns_per_elt — the owner-side fold of a staged cell grid
        into the accumulator (accum.merge_cells, row-batched), per
        STAGED SLOT (the scaling model's wire/merge volume unit).

    Both are fetch-grounded lax.scan dispatches with the ~27 ms tunnel
    RTT measured by a null dispatch and subtracted."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from meryl_tpu.ops import accum
    from meryl_tpu.parallel.shard_count import plan_shard_route

    K = 21
    N_DEV = 8  # modeled mesh; the geometry is per-device
    rng = np.random.default_rng(7)

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

    # local stage: routed cell build at the sharded per-device chunk
    from meryl_tpu.counter import shard_default_chunk
    CHUNK = shard_default_chunk()
    g = plan_shard_route(CHUNK, K, N_DEV)
    cfg = (K, 2, "canonical", g["B"], g["R0"], g["L0"], g["c"],
           g["bits"], "int")
    R = max(1, (1 << 24) // CHUNK)

    def local_body(carry, codes):
        cells, ovf, n_ovf_row, n_allones = accum.route_chunk(codes, cfg)
        s = jnp.sum(n_ovf_row) + n_allones
        for cl in cells:
            s = s + cl[0, 0].astype(jnp.int32)
        for o in ovf:
            s = s + o[0, 0].astype(jnp.int32)
        return carry + s.astype(jnp.uint32), None

    @jax.jit
    def local_pipe(chunks):
        out, _ = lax.scan(local_body, jnp.uint32(0), chunks)
        return out

    ins = [jax.device_put(jnp.asarray(
        rng.integers(0, 4, size=(R, CHUNK)).astype(np.uint8)))
        for _ in range(3)]
    jax.block_until_ready(ins)
    ts = _timeit_fetch(local_pipe, ins, 2)
    t_local_ns = max(0.1, (min(ts) - rtt)) / (R * CHUNK) * 1e9

    # merge stage: fold MERGE_EVERY staged (rpo, n*Wc) cell grids into
    # a (rpo, La) accumulator — the owner-side shape of the routed
    # step.  Cost attributed to the staged slots (the model's unit).
    rpo, Wc = g["rpo"], g["Wc"]
    STAGED, La, S = 2, 2048, 2
    SW = N_DEV * Wc

    def make_batch():
        outs = []
        for _ in range(S):
            accv = np.sort(rng.integers(0, 1 << 42, size=(rpo, La),
                                        dtype=np.uint64), axis=1)
            apl = [(accv & 0xFFFFFFFF).astype(np.uint32),
                   (accv >> 32).astype(np.uint32)]
            act = rng.integers(1, 50, size=(rpo, La)).astype(np.uint32)
            gv = rng.integers(0, 1 << 42, size=(STAGED, rpo, SW),
                              dtype=np.uint64)
            outs.append((apl, act, gv))
        a0 = jnp.asarray(np.stack([o[0][0] for o in outs]))
        a1 = jnp.asarray(np.stack([o[0][1] for o in outs]))
        ac = jnp.asarray(np.stack([o[1] for o in outs]))
        gp = jnp.asarray(np.stack(
            [[[(o[2][g_] & 0xFFFFFFFF).astype(np.uint32),
               (o[2][g_] >> 32).astype(np.uint32)]
              for g_ in range(STAGED)] for o in outs]))
        return jax.device_put((a0, a1, ac, gp))

    from meryl_tpu import kmer as km

    def merge_body(carry, xs):
        a0, a1, ac, gp = xs
        staged = tuple((gp[g_, 0], gp[g_, 1]) for g_ in range(STAGED))
        planes, counts, n_runs = accum.merge_cells(
            [a0, a1], ac, staged, 2, La, int(km.VALUE_MAX))
        return (carry + jnp.sum(n_runs).astype(jnp.uint32)
                + counts[0, 0] + planes[0][0, 0]), None

    @jax.jit
    def merge_pipe(xs):
        out, _ = lax.scan(merge_body, jnp.uint32(0), xs)
        return out

    ins = [make_batch() for _ in range(3)]
    jax.block_until_ready(ins)
    ts = _timeit_fetch(merge_pipe, ins, 2)
    slots = S * STAGED * rpo * SW
    t_merge_ns = max(0.1, (min(ts) - rtt)) / slots * 1e9
    return round(t_local_ns, 3), round(t_merge_ns, 3)


def measure_link_rates():
    """Measured host->device and device->host rates for LARGE
    contiguous arrays (the transfer shape the e2e counting path uses).
    Small/chatty transfers on the dev tunnel are far slower — these
    rates decompose the e2e wall clock, they do not model dispatch
    latency."""
    import jax
    import jax.numpy as jnp

    mb = 1 << 20
    rng = np.random.default_rng(9)
    h2d = []
    for rep in range(2):
        a = rng.integers(0, 255, size=16 * mb, dtype=np.uint8)
        t0 = time.perf_counter()
        d = jax.device_put(a)
        d.block_until_ready()
        h2d.append(a.nbytes / (time.perf_counter() - t0))
        del d
    d2h = []
    base = jax.device_put(jnp.asarray(
        rng.integers(0, 255, size=8 * mb, dtype=np.uint8)))
    base.block_until_ready()
    for rep in range(2):
        # fetch a DEVICE-COMPUTED array: np.asarray of a device_put
        # result is served from the retained host buffer and measures
        # nothing (a 300 GB/s "rate" on a ~10 MB/s tunnel)
        dev = base + jnp.uint8(rep + 1)
        t0 = time.perf_counter()
        back = np.asarray(dev)
        d2h.append(back.nbytes / (time.perf_counter() - t0))
        del dev, back
    return max(h2d), max(d2h)


def measure_rtt():
    """Median dispatch->fetch round-trip latency for a TINY scalar —
    the per-sync-point cost the e2e counting pipeline pays ~dozens of
    times.  Distinct inputs per rep (the remote executor memoizes per
    (executable, input)); median of 5 rejects warm-up outliers."""
    import jax.numpy as jnp

    base = jnp.asarray(np.uint32(7))
    int(base + jnp.uint32(1))  # warm the signature
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        int(base + jnp.uint32(i + 2))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def bench_count_e2e():
    """END-TO-END counting throughput: wall-clock `count_to_db` from a
    FASTQ file on disk to a decoded-verified DB on disk — the number a
    user of `meryl count` actually gets (BASELINE.md's target is FASTQ
    counting, not kernel throughput).

    Input: 67 Mbases of 150 bp reads at 64x coverage of a 1 Mbase
    random genome (high coverage: the device accumulator dedups on
    device, so only ~1M unique (kmer,count) entries ever cross the
    device->host link).  Run 1 warms the jit signatures (compile time
    is not throughput); run 2 is timed.  On this dev rig the
    device->host tunnel (~10 MB/s) bounds the result — the same path
    on a PCIe-attached TPU host pays ~1000x less for the same bytes;
    the byte volumes are reported so that bound is checkable."""
    import shutil
    import tempfile

    from meryl_tpu.counter import count_to_db
    from meryl_tpu.db import MerylDB

    G = 1 << 20
    rlen = 150
    nreads = (64 * G) // rlen
    bases = nreads * rlen

    def make_fq(path, seed):
        if os.path.exists(path) and os.path.getsize(path) > bases * 2:
            return
        r = np.random.default_rng(seed)
        genome = r.integers(0, 4, size=G).astype(np.uint8)
        alph = np.frombuffer(b"ACTG", np.uint8)
        with open(path, "wb") as f:
            starts = r.integers(0, G - rlen, size=nreads)
            qual = b"I" * rlen
            for i, s in enumerate(starts):
                f.write(b"@r%d\n%s\n+\n%s\n"
                        % (i, alph[genome[s:s + rlen]].tobytes(), qual))

    # EVERY warm rep counts a DISTINCT (same-shape) file: the round-5
    # integrity probe caught the remote executor content-memoizing —
    # re-counting the SAME file measured 2.7 s where fresh data costs
    # 6.5 s through the identical warm pipeline, so rounds 1-4's
    # same-file warm protocol flattered the e2e headline.  The
    # headline is now the fresh-data rate; one same-file repeat is
    # reported alongside (cache_warm_s) for cross-round continuity.
    # file 0 persists (cold-compile + cache-warm rep); the fresh-rep
    # files are REGENERATED with a per-invocation seed — the remote
    # relay outlives client processes, so reusing yesterday's bytes
    # would hand the content memoizer the exact loophole this
    # protocol closes
    fqs = [os.path.join(tempfile.gettempdir(),
                        f"meryl_bench_e2e_i{i}.fq") for i in range(4)]
    make_fq(fqs[0], 42)
    run_seed = int.from_bytes(os.urandom(4), "little")
    for i in (1, 2, 3):
        if os.path.exists(fqs[i]):
            os.remove(fqs[i])
        make_fq(fqs[i], run_seed + i)

    times = []
    n_uniques = 0
    cache_warm_s = None
    for rep in range(5):  # rep 0 warms compiles on file 0; rep 1 is
        # the same-file repeat (the r1-r4 protocol -> cache_warm_s);
        # reps 2-4 each count a FRESH file (distinct content, same
        # shape) — the honest fresh-data times, and the LAST run
        # leaves LAST_WIRE_STATS reflecting fresh work for the
        # decomposition below
        out = os.path.join(tempfile.gettempdir(),
                           f"meryl_bench_e2e_{rep}.meryl")
        shutil.rmtree(out, ignore_errors=True)
        fq = fqs[0] if rep <= 1 else fqs[rep - 1]
        t0 = time.perf_counter()
        db = count_to_db([fq], out, 21)
        dt = time.perf_counter() - t0
        if rep == 1:
            cache_warm_s = dt
        else:
            times.append(dt)  # rep 0 = cold, reps 2-4 = fresh warm
        hi, lo, c = db.load_all()
        n_uniques = len(c)
        assert n_uniques > 0
        shutil.rmtree(out, ignore_errors=True)

    from meryl_tpu.counter import LAST_WIRE_STATS
    warm = sorted(times[1:])
    best = warm[0]
    detail = {
        "bases": bases,
        "uniques": int(n_uniques),
        "cold_s": round(times[0], 2),
        "warm_s": [round(t, 2) for t in times[1:]],
        "warm_median_s": round(warm[len(warm) // 2], 2),
        "cache_warm_s": round(cache_warm_s, 2),
        "in_bytes": os.path.getsize(fqs[0]),
    }
    # wall-clock decomposition: measured large-array link rates x the
    # actual byte volumes the run moved; the residual is device+host
    # compute.  The PCIe projection is then a computed field (VERDICT
    # r3 item 2): same residual, wire at a conservative 8 GB/s PCIe
    # gen4 x8 effective rate.
    try:
        h2d_rate, d2h_rate = measure_link_rates()
        h2d_b = int(LAST_WIRE_STATS.get("h2d_bytes", 0))
        d2h_b = int(LAST_WIRE_STATS.get("d2h_bytes", 0))
        wire_s = h2d_b / h2d_rate + d2h_b / d2h_rate
        residual_s = max(0.0, best - wire_s)
        ws = dict(LAST_WIRE_STATS)
        # sync-point decomposition (VERDICT r4 item 3): every
        # host<->device interaction counted by the counter itself,
        # host-blocked time per category, and a measured per-sync RTT
        # so the residual's "it's the tunnel" attribution is numbers
        # only BLOCKING fetches are sync points: the measured t_h2d_s
        # / t_dispatch_s show device_puts and jit dispatches are async
        # (~0.02 s for ~60 of them), so crediting them with an RTT
        # each would overstate the tunnel's share of the wall
        n_syncs = ws.get("n_fetch", 0)
        rtt = measure_rtt()
        rtt_s = n_syncs * rtt
        host_s = (ws.get("scan_stall_s", 0.0)
                  + ws.get("host_pack_s", 0.0)
                  + ws.get("host_finalize_s", 0.0))
        blocked_s = (ws.get("t_h2d_s", 0.0) + ws.get("t_dispatch_s", 0.0)
                     + ws.get("t_fetch_s", 0.0))
        # PCIe projection: replace the measured tunnel terms (wire at
        # measured rates + n_syncs x measured RTT) with PCIe terms
        # (same bytes at 8 GB/s, ~100 us per sync point), keep
        # everything else — instead of r4's "keep the whole residual".
        # Floor at the terms that do NOT shrink with the link (host
        # work + PCIe wire + PCIe syncs): fetches that overlapped
        # device compute make best - wire - rtt an underestimate, and
        # an arbitrary clamp would turn the projection into a clamp
        # artifact.
        pcie_terms = (h2d_b + d2h_b) / 8e9 + n_syncs * 100e-6
        pcie_s = max(host_s + pcie_terms,
                     best - wire_s - rtt_s + pcie_terms)
        detail.update({
            "h2d_bytes": h2d_b,
            "d2h_bytes": d2h_b,
            "h2d_rate_mbs": round(h2d_rate / 1e6, 1),
            "d2h_rate_mbs": round(d2h_rate / 1e6, 1),
            "wire_s_est": round(wire_s, 2),
            "residual_s": round(residual_s, 2),
            "n_syncs": int(n_syncs),
            "sync_detail": {kk: ws[kk] for kk in
                            ("n_h2d", "n_dispatch", "n_fetch",
                             "t_h2d_s", "t_dispatch_s", "t_fetch_s",
                             "scan_stall_s", "reader_busy_s",
                             "host_pack_s", "host_finalize_s",
                             "t_finalize_s")
                            if kk in ws},
            "rtt_ms": round(rtt * 1e3, 2),
            "rtt_s": round(rtt_s, 2),
            "host_s": round(host_s, 2),
            "blocked_s": round(blocked_s, 2),
            "pcie_proj_bases_s": round(bases / pcie_s, 1),
        })
    except Exception as e:  # decomposition must never sink the bench
        detail["decompose_error"] = str(e)[:200]
    return bases / best, detail


def bench_bam_ingest():
    """Host-side BAM -> 2-bit-code ingest rate (BASELINE.md workload:
    'BAM/CRAM counting'), Mbases/s through the native window scan.
    Pure host work — independent of the device link."""
    import gzip
    import struct
    import tempfile

    from meryl_tpu.io import bam

    rng = np.random.default_rng(3)
    n_reads, rlen = 30000, 150
    seqs = rng.integers(0, 4, size=(n_reads, rlen))
    code2nib = np.array([1, 2, 8, 4], np.uint8)  # ACTG -> SEQ16 nibble
    out = bytearray(b"BAM\x01")
    text = b"@HD\tVN:1.6\n"
    out += struct.pack("<i", len(text)) + text
    out += struct.pack("<i", 0)
    name = b"r\x00"
    for row in code2nib[seqs]:
        packed = ((row[0::2] << 4) | row[1::2]).astype(np.uint8).tobytes()
        rec = struct.pack("<iiBBHHHiiii", -1, -1, len(name), 0, 4680,
                          0, 4, rlen, -1, -1, 0)
        rec += name + packed + b"\xff" * rlen
        out += struct.pack("<i", len(rec)) + rec
    with tempfile.NamedTemporaryFile(suffix=".bam", delete=False) as f:
        with gzip.open(f, "wb", compresslevel=1) as g:
            g.write(bytes(out))
        path = f.name
    sum(len(c) for c in bam.iter_codes(path))  # warm page cache
    t0 = time.perf_counter()
    nc = sum(len(c) for c in bam.iter_codes(path))
    dt = time.perf_counter() - t0
    os.unlink(path)
    return (nc - n_reads) / dt / 1e6


def bench_cram_ingest():
    """Host-side CRAM -> 2-bit-code ingest rate (BASELINE.md workload:
    'BAM/CRAM counting'), Mbases/s through the container-parallel
    decoder.  Pure host work — independent of the device link."""
    import random
    import sys
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests import cram_writer as cw

    from meryl_tpu.io import cram

    random.seed(5)
    n_reads, rlen = 200000, 150
    reads = [(f"r{i}", "".join(random.choices("ACGT", k=rlen)))
             for i in range(n_reads)]
    with tempfile.NamedTemporaryFile(suffix=".cram", delete=False) as f:
        path = f.name
    cw.write_unmapped_cram(path, reads, method=1,
                           reads_per_container=10000)
    sum(len(c) for c in cram.iter_cram_codes(path))  # warm page cache
    t0 = time.perf_counter()
    nc = sum(len(c) for c in cram.iter_cram_codes(path))
    dt = time.perf_counter() - t0
    os.unlink(path)
    return (nc - n_reads) / dt / 1e6


def _wait_for_backend():
    """The axon tunnel occasionally drops and self-recovers within
    ~10-30 min (backend init then either raises UNAVAILABLE or hangs).
    Probe it in a short-lived child process — one tunnel client at a
    time, and the child exits before this process initializes its own
    backend — retrying on a recovery-scaled schedule, so a transient
    outage during a bench run yields a delayed number instead of none.
    After the retry budget we proceed anyway and let the real failure
    surface."""
    import subprocess
    import sys

    tries = int(os.environ.get("MERYL_TPU_BENCH_RETRIES", 8))
    probe = ("import jax, jax.numpy as jnp; "
             "print(int(jnp.arange(8).sum()))")
    for i in range(tries):
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=240)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if i + 1 < tries:
            time.sleep(300)


def main():
    import jax

    _wait_for_backend()
    err = None
    # a wedged tunnel HANGS rather than raising: a watchdog emits the
    # error JSON line and exits if the counting bench never returns
    import threading

    def _watchdog():
        out = {"metric": "count_k21_canonical_throughput", "value": 0.0,
               "unit": "bases/s", "vs_baseline": 0.0,
               "trials_bases_per_s": [],
               "error": "watchdog: counting bench hung (tunnel outage)"}
        print(json.dumps(out), flush=True)
        os._exit(3)

    budget = float(os.environ.get("MERYL_TPU_BENCH_TIMEOUT", 2400))
    dog = threading.Timer(budget, _watchdog)
    dog.daemon = True
    dog.start()
    try:
        best, trials = bench_counting()
    except Exception as e:  # emit a JSON line even through an outage
        best, trials = 0.0, []
        err = f"{type(e).__name__}: {e}"[:200]
    finally:
        dog.cancel()
    try:     # device benches can HANG on a wedged tunnel: skip on error
        lookup_mqps = None if err is not None else bench_lookup()
    except Exception:
        lookup_mqps = None
    try:
        lookup_mid = None if err is not None else bench_lookup_midsize()
    except Exception:
        lookup_mid = None
    try:
        setop_meps = None if err is not None else bench_setop()
    except Exception:
        setop_meps = None
    try:
        bigdb = None if err is not None else bench_lookup_bigdb()
    except Exception:
        bigdb = None
    try:
        v2_meps = None if err is not None else bench_v2_action()
    except Exception:
        v2_meps = None
    try:
        calib = None if err is not None else bench_calibration()
    except Exception:
        calib = None
    try:
        e2e = None if err is not None else bench_count_e2e()
    except Exception:
        e2e = None
    try:
        bam_mbps = bench_bam_ingest()
    except Exception:
        bam_mbps = None
    try:
        cram_mbps = bench_cram_ingest()
    except Exception:
        cram_mbps = None

    try:     # device_count also dials the backend: never hang the line
        n_chips = 1 if err is not None else jax.device_count()
    except Exception:
        n_chips = 1
    per_chip_target = 2.5e9 / 8  # bases/s per chip at 5 GB/s-FASTQ target
    vs = best / (per_chip_target * n_chips)

    out = {
        "metric": "count_k21_canonical_throughput",
        "value": round(best, 1),
        "unit": "bases/s",
        "vs_baseline": round(vs, 4),
        "trials_bases_per_s": [round(t, 1) for t in trials],
    }
    # throughput metrics keep best-of-N as the headline (the tunnel's
    # run-to-run swing exceeds kernel variance) but now report every
    # run + the median alongside (VERDICT r4 item 7), so a regression
    # can be told from link noise round-over-round
    def _spread(field, rates):
        rs = sorted(float(r) for r in rates)
        out[field] = round(rs[-1], 3)
        out[field + "_runs"] = [round(r, 3) for r in rates]
        out[field + "_median"] = round(rs[len(rs) // 2], 3)

    if lookup_mqps is not None:
        _spread("lookup_mqps", lookup_mqps)
    if lookup_mid is not None:
        mid_mqps, exists_mqps = lookup_mid
        _spread("lookup_midsize_mqps", mid_mqps)
        _spread("lookup_exists_mqps", exists_mqps)
    if setop_meps is not None:
        _spread("setop_union_sum_meps", setop_meps)
    if bigdb is not None:
        rates, bdetail = bigdb
        _spread("lookup_bigdb_mqps", rates)
        out["lookup_bigdb_detail"] = bdetail
    if v2_meps is not None:
        _spread("v2_union_label_meps", v2_meps)
    if calib is not None:
        out["t_local_ns_per_base"], out["t_merge_ns_per_elt"] = calib
    if e2e is not None:
        rate, detail = e2e
        out["count_e2e_bases_s"] = round(rate, 1)
        out["count_e2e_vs_baseline"] = round(
            rate / (per_chip_target * n_chips), 4)
        out["count_e2e_detail"] = detail
    if bam_mbps is not None:
        out["bam_ingest_mbases_s"] = round(bam_mbps, 1)
    if cram_mbps is not None:
        out["cram_ingest_mbases_s"] = round(cram_mbps, 1)
    if err is not None:
        out["error"] = err
    print(json.dumps(out))


if __name__ == "__main__":
    main()
