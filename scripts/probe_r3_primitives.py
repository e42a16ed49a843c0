"""On-chip probe for the round-3 kernel designs (lookup join, set-op
row-batching, device accumulator/global sort).

Measures, fetch-grounded (docs/tpu-design.md rules: dispatch->int(),
one lax.scan per dispatch, distinct inputs per trial):

  sort_L<n>     2-plane kmer-like sort at row length 2^n (total 2^22/step)
  bitonic       bitonic merge of two sorted 2^21 halves (2 planes + 1 payload)
  segsum        seg_sum_all of a (i32, u32) pair over 2^22
  gather        jnp.take of 2^21 indices from a 2^22 table
  matgather     one-hot int8 matmul gather: 2^21 queries x 2^11-entry table
  flagsort      1-key u32 stable sort + 3 payloads, rows of 2^11 (compaction)
  transp        (2^11, 2^11) u32 transpose x 3 arrays

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r3_primitives.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

S = 8            # scan steps per dispatch
TRIALS = 2
N = 1 << 22      # elements per scan step
KBITS_TOP = 10   # top plane cardinality for k=21 kmers

rng = np.random.default_rng(7)


def timeit(fn, inputs):
    int(fn(inputs[0]))  # compile + warm
    times = []
    for t in range(TRIALS):
        t0 = time.perf_counter()
        int(fn(inputs[1 + t]))
        times.append(time.perf_counter() - t0)
    return min(times)


def rand_planes(n):
    p0 = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    p1 = rng.integers(0, 1 << KBITS_TOP, size=n,
                      dtype=np.uint64).astype(np.uint32)
    return p0, p1


def stage(mk):
    """TRIALS+1 distinct device-resident inputs."""
    out = [jax.device_put(mk()) for _ in range(TRIALS + 1)]
    jax.block_until_ready(out)
    return out


RTT = None


def report(name, dt, elems):
    # per-element cost with the measured null-dispatch RTT removed
    ns = (dt - RTT) / (S * elems) * 1e9
    print(f"{name:12s} {dt*1e3:8.1f} ms  {ns:7.3f} ns/elt  "
          f"({S}x{elems} elems)", flush=True)
    return ns


def probe_null():
    @jax.jit
    def f(x):
        return x + 1
    ins = [jax.device_put(jnp.uint32(i)) for i in range(TRIALS + 2)]
    jax.block_until_ready(ins)
    int(f(ins[0]))
    times = []
    for i in range(TRIALS + 1):
        t0 = time.perf_counter()
        int(f(ins[1 + i]))
        times.append(time.perf_counter() - t0)
    return min(times)


def probe_sort(logL):
    L = 1 << logL
    R = N // L

    def body(c, xs):
        p0, p1 = xs
        s1, s0 = lax.sort((p1.reshape(R, L), p0.reshape(R, L)),
                          num_keys=2, dimension=-1)
        return c + s0[0, 0] + s1[-1, -1] + s0[-1, -1], None

    @jax.jit
    def f(xs):
        out, _ = lax.scan(body, jnp.uint32(0), xs)
        return out

    def mk():
        p0 = np.stack([rand_planes(N)[0] for _ in range(S)])
        p1 = np.stack([rand_planes(N)[1] for _ in range(S)])
        return (jnp.asarray(p0), jnp.asarray(p1))

    return report(f"sort_L{logL}", timeit(f, stage(mk)), N)


def probe_bitonic():
    """Merge two sorted 2^21 runs: concat(a, rev(b)) is bitonic; then
    log2(N) compare-exchange stages, multiword keys + u32 payload."""
    H = N // 2

    def merge(p0, p1, v):
        logn = N.bit_length() - 1
        for s in range(logn - 1, -1, -1):
            d = 1 << s
            sh = (N // (2 * d), 2, d)
            a0, a1, av = (x.reshape(sh) for x in (p0, p1, v))
            lo0, hi0 = a0[:, 0, :], a0[:, 1, :]
            lo1, hi1 = a1[:, 0, :], a1[:, 1, :]
            lov, hiv = av[:, 0, :], av[:, 1, :]
            swap = (lo1 > hi1) | ((lo1 == hi1) & (lo0 > hi0))
            n0 = jnp.stack([jnp.where(swap, hi0, lo0),
                            jnp.where(swap, lo0, hi0)], axis=1)
            n1 = jnp.stack([jnp.where(swap, hi1, lo1),
                            jnp.where(swap, lo1, hi1)], axis=1)
            nv = jnp.stack([jnp.where(swap, hiv, lov),
                            jnp.where(swap, lov, hiv)], axis=1)
            p0, p1, v = (x.reshape(N) for x in (n0, n1, nv))
        return p0, p1, v

    def body(c, xs):
        p0, p1, v = xs
        s0, s1, sv = merge(p0, p1, v)
        return c + s0[0] + s1[-1] + sv[0], None

    @jax.jit
    def f(xs):
        out, _ = lax.scan(body, jnp.uint32(0), xs)
        return out

    def mk():
        p0s, p1s, vs = [], [], []
        for _ in range(S):
            a0, a1 = rand_planes(H)
            b0, b1 = rand_planes(H)
            ka = np.sort((a1.astype(np.uint64) << 32) | a0)
            kb = np.sort((b1.astype(np.uint64) << 32) | b0)
            k = np.concatenate([ka, kb[::-1]])
            p0s.append((k & 0xFFFFFFFF).astype(np.uint32))
            p1s.append((k >> 32).astype(np.uint32))
            vs.append(rng.integers(0, 100, N).astype(np.uint32))
        return tuple(jnp.asarray(np.stack(x)) for x in (p0s, p1s, vs))

    return report("bitonic", timeit(f, stage(mk)), N)


def probe_segsum():
    sys.path.insert(0, "/root/repo")
    from meryl_tpu.ops import segscan

    def body(c, xs):
        ones, v, start = xs
        a, b = segscan.seg_sum_all((ones, v), start)
        return c + a[0].astype(jnp.uint32) + b[-1], None

    @jax.jit
    def f(xs):
        out, _ = lax.scan(body, jnp.uint32(0), xs)
        return out

    def mk():
        ones = np.ones((S, N), np.int32)
        v = rng.integers(0, 100, (S, N)).astype(np.uint32)
        start = rng.random((S, N)) < 0.3
        start[:, 0] = True
        return (jnp.asarray(ones), jnp.asarray(v), jnp.asarray(start))

    return report("segsum", timeit(f, stage(mk)), N)


def probe_gather():
    Q = N // 2

    def body(c, xs):
        tab, idx = xs
        g = jnp.take(tab, idx, mode="clip")
        return c + g[0] + g[-1], None

    @jax.jit
    def f(xs):
        out, _ = lax.scan(body, jnp.uint32(0), xs)
        return out

    def mk():
        tab = rng.integers(0, 1 << 32, (S, N), dtype=np.uint64).astype(np.uint32)
        idx = rng.integers(0, N, (S, Q)).astype(np.int32)
        return (jnp.asarray(tab), jnp.asarray(idx))

    return report("gather", timeit(f, stage(mk)), Q)


def probe_matgather():
    """Exact gather from a 2^11-entry u32 table via one-hot int8 matmul
    (4 int8 limbs, recombined in int32)."""
    Q = N // 2
    T = 1 << 11

    def body(c, xs):
        idx, tab = xs
        iot = lax.broadcasted_iota(jnp.int32, (1, T), 1)
        oh = (idx[:, None] == iot).astype(jnp.int8)  # (Q, T)
        limbs = jnp.stack([(tab >> (8 * i)) & 0xFF for i in range(4)],
                          axis=1).astype(jnp.int8)   # (T, 4)
        g = lax.dot_general(oh, limbs, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)  # (Q, 4)
        out = (g[:, 0].astype(jnp.uint32)
               | (g[:, 1].astype(jnp.uint32) << 8)
               | (g[:, 2].astype(jnp.uint32) << 16)
               | (g[:, 3].astype(jnp.uint32) << 24))
        return c + out[0] + out[-1], None

    @jax.jit
    def f(xs):
        out, _ = lax.scan(body, jnp.uint32(0), xs)
        return out

    def mk():
        idx = rng.integers(0, T, (S, Q)).astype(np.int32)
        tab = rng.integers(0, 1 << 32, (S, T), dtype=np.uint64).astype(np.uint32)
        return (jnp.asarray(idx), jnp.asarray(tab))

    return report("matgather", timeit(f, stage(mk)), Q)


def probe_flagsort():
    L = 1 << 11
    R = N // L

    def body(c, xs):
        flag, a, b, cc = xs
        sh = (R, L)
        o = lax.sort((flag.reshape(sh), a.reshape(sh), b.reshape(sh),
                      cc.reshape(sh)), num_keys=1, dimension=-1,
                     is_stable=True)
        return c + o[1][0, 0] + o[2][-1, -1] + o[3][0, -1], None

    @jax.jit
    def f(xs):
        out, _ = lax.scan(body, jnp.uint32(0), xs)
        return out

    def mk():
        flag = (rng.random((S, N)) < 0.5).astype(np.uint32)
        a, b, cc = (rng.integers(0, 1 << 32, (S, N), dtype=np.uint64)
                    .astype(np.uint32) for _ in range(3))
        return tuple(jnp.asarray(x) for x in (flag, a, b, cc))

    return report("flagsort", timeit(f, stage(mk)), N)


def probe_transpose():
    D = 1 << 11

    def body(c, xs):
        a, b, cc = (x.reshape(D, D).T for x in xs)
        return c + a[0, 0] + b[-1, -1] + cc[0, -1], None

    @jax.jit
    def f(xs):
        out, _ = lax.scan(body, jnp.uint32(0), xs)
        # force materialization of transposes via a reduction
        return out

    def mk():
        return tuple(jnp.asarray(
            rng.integers(0, 1 << 32, (S, N), dtype=np.uint64)
            .astype(np.uint32)) for _ in range(3))

    return report("transp", timeit(f, stage(mk)), N)


def main():
    global RTT
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          flush=True)
    RTT = probe_null()
    print(f"null RTT: {RTT*1e3:.1f} ms", flush=True)
    which = sys.argv[1:] or ["sort11", "sort14", "sort17", "sort20",
                             "sort22", "bitonic", "segsum", "gather",
                             "matgather", "flagsort", "transp"]
    for w in which:
        if w.startswith("sort"):
            probe_sort(int(w[4:]))
        else:
            {"bitonic": probe_bitonic, "segsum": probe_segsum,
             "gather": probe_gather, "matgather": probe_matgather,
             "flagsort": probe_flagsort, "transp": probe_transpose}[w]()


if __name__ == "__main__":
    main()
