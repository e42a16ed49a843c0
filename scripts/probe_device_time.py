"""Trustworthy on-chip stage timing for the counting pipeline.

Instrument rules learned the hard way on the axon tunnel backend:
  * `jax.block_until_ready` on a SCALAR output does NOT block — timing
    around it measures dispatch enqueue, not compute.  Every
    measurement here times dispatch -> int(value) fetch, which cannot
    complete before the computation does.
  * the remote executor can memoize per (executable, input): every
    timed repetition uses a DISTINCT input, uploaded and forced before
    any timing starts.
  * the whole workload is ONE dispatch (lax.scan over stacked chunks
    inside one jitted program, scalar carry out), so per-dispatch
    tunnel latency is amortized and cannot distort the number.

Run:  python scripts/probe_device_time.py [stage ...]
Stages: extract extract_old sort1p full full_old rowsort sort1d
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

from meryl_tpu.ops import count as cnt          # noqa: E402
from meryl_tpu.ops import extract as ext        # noqa: E402

K = 21
TOTAL = 1 << 24


def timeit_fetch(fn, inputs, reps=3):
    """fn returns a scalar; time dispatch->fetch per distinct input."""
    assert len(inputs) >= reps + 1
    int(fn(inputs[0]))  # compile + warm
    best = 1e9
    for r in range(reps):
        t0 = time.perf_counter()
        int(fn(inputs[1 + r]))
        best = min(best, time.perf_counter() - t0)
    return best


def consume(planes_or_arr):
    if isinstance(planes_or_arr, (list, tuple)):
        s = jnp.uint32(0)
        for p in planes_or_arr:
            s = s + p[0] + p[-1]
        return s
    return planes_or_arr[0] + planes_or_arr[-1]


def _extract_old(codes, k, mode):
    """Pre-rolldot multiword-doubling builder (kept for A/B)."""
    U32 = jnp.uint32
    L = codes.shape[0]
    P = ext.num_planes(k)
    padded = jnp.concatenate(
        [codes.astype(U32), jnp.full((ext._PAD,), ext.INVALID_CODE, U32)])
    is_valid = (padded <= U32(3)).astype(U32)
    c = jnp.where(padded <= U32(3), padded, U32(0))
    zero = jnp.zeros((L + ext._PAD,), U32)
    fmer, rmer, valid = ext._build_windows(
        [c] + [zero] * (P - 1), [c ^ U32(2)] + [zero] * (P - 1),
        is_valid, k, L)
    from meryl_tpu.ops import multiword as mw
    use_f = mw.lt(fmer, rmer)
    out = mw.select(use_f, fmer, rmer)
    pos_ok = jnp.arange(L, dtype=jnp.int32) <= jnp.int32(L - k)
    return out, (valid == U32(1)) & pos_ok


def make_scan(stage, k=K):
    def body(carry, codes):
        if stage == "extract":
            planes, valid = ext.extract_kmers(codes, k, "canonical")
            return carry + consume(planes) + jnp.sum(valid.astype(jnp.uint32)), None
        if stage == "extract_old":
            planes, valid = _extract_old(codes, k, "canonical")
            return carry + consume(planes) + jnp.sum(valid.astype(jnp.uint32)), None
        if stage == "sort1p":
            planes, valid = ext.extract_kmers(codes, k, "canonical")
            s = lax.sort((planes[-1], planes[0]), num_keys=1)
            return carry + consume(s[0]) + consume(s[1]), None
        if stage in ("full", "full_old"):
            exf = (ext.extract_kmers if stage == "full" else _extract_old)
            planes, valid = exf(codes, k, "canonical")
            splanes, start, n_invalid = cnt.sort_starts(planes, valid)
            return (carry + jnp.sum(start.astype(jnp.uint32))
                    + consume(splanes) + n_invalid.astype(jnp.uint32)), None
        raise ValueError(stage)

    @jax.jit
    def pipeline(chunks):
        out, _ = lax.scan(body, jnp.uint32(0), chunks)
        return out
    return pipeline


def make_sort_probe(rows):
    @jax.jit
    def f(a, b):
        sa, sb = lax.sort((a.reshape(rows, -1), b.reshape(rows, -1)),
                          num_keys=2, dimension=-1)
        neq = (sa[:, 1:] != sa[:, :-1]) | (sb[:, 1:] != sb[:, :-1])
        return jnp.sum(neq.astype(jnp.uint32)) + sa[0, 0] + sb[-1, -1]
    return lambda ab: f(*ab)


def main():
    stages = sys.argv[1:] or ["extract", "extract_old", "full", "full_old"]
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    scan_stages = [s for s in stages
                   if s in ("extract", "extract_old", "sort1p", "full",
                            "full_old")]
    if scan_stages:
        for logL in (20,):
            L = 1 << logL
            R = TOTAL // L
            inputs = [jax.device_put(jnp.asarray(
                rng.integers(0, 4, size=(R, L)).astype(np.uint8)))
                for _ in range(4)]
            jax.block_until_ready(inputs)
            for stage in scan_stages:
                fn = make_scan(stage)
                dt = timeit_fetch(fn, inputs)
                print(f"L=2^{logL} {stage:12s}: {dt*1e3:8.1f} ms -> "
                      f"{TOTAL/dt/1e6:7.1f} Mbases/s", flush=True)

    if "rowsort" in stages or "sort1d" in stages:
        rows_list = ([1] if "sort1d" in stages else []) + \
            ([16, 64, 256] if "rowsort" in stages else [])
        ab = [(jax.device_put(jnp.asarray(rng.integers(
                0, 1 << 10, size=TOTAL, dtype=np.int64).astype(np.uint32))),
               jax.device_put(jnp.asarray(rng.integers(
                0, 1 << 32, size=TOTAL, dtype=np.int64).astype(np.uint32))))
              for _ in range(4)]
        jax.block_until_ready(ab)
        for rows in rows_list:
            fn = make_sort_probe(rows)
            dt = timeit_fetch(fn, ab)
            print(f"sort rows={rows:4d} x {TOTAL//rows}: {dt*1e3:8.1f} ms"
                  f" -> {TOTAL/dt/1e6:7.1f} Melt/s", flush=True)


if __name__ == "__main__":
    main()
